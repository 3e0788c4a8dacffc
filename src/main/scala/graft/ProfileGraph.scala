package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical backing for the graph family's "linear in |E| per iteration"
  * claim: build a deterministic synthetic graph (md5-derived endpoints,
  * avg degree 10, with a deliberate 10%-of-edges hot-node skew so the
  * inmass aggregate sees realistic in-degree concentration) and time
  * 3-iteration pageRank at increasing edge counts in one session. Runtime
  * should track edge count ~linearly; anything super-linear is a shuffle
  * or window the plan asserts missed.
  *
  * Usage: runMain graft.ProfileGraph <millionsOfEdges> [more...]
  * Prints [graph] lines; commit the numbers to SCALE.md.
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--triangles")) { triangles(); return }
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (m <- sizes) {
      val nEdges = m * 1000000L
      val nNodes = nEdges / 10
      val hot = math.max(nNodes / 100, 1L)
      // 90% of edges land uniformly, 10% concentrate on nNodes/100 hot dsts
      val edges = spark.range(nEdges).select(
        expr(s"conv(substring(md5(concat('s', cast(id as string))), 1, 8), 16, 10) % $nNodes").as("src"),
        expr(s"case when id % 10 = 0 then conv(substring(md5(concat('h', cast(id as string))), 1, 8), 16, 10) % $hot " +
          s"else conv(substring(md5(concat('d', cast(id as string))), 1, 8), 16, 10) % $nNodes end").as("dst"))
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        graft.operators.ext.Graph.pageRank(edges, "src", "dst", 3)
          .write.format("noop").mode("overwrite").save()
        println(f"[graph] pageRank3 ${m}%3dM edges pass$pass ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }

  /** Orientation comparison on a deliberately hub-skewed graph: a LOW-ID
    * hub wired to every spoke (the worst case for id-orientation — all hub
    * edges orient outward, so the hub's full deg² wedge mass enumerates)
    * plus uniform background edges and closing chords among spokes. Prints
    * both orientations' (wedges, triangles, seconds); triangle counts must
    * match, the degree-oriented wedge mass and time should be the cut.
    */
  private def triangles(): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nSpokes = 20000L
    val nBg = 2000000L
    val nNodes = 1000000L
    // node 0 is the hub: id-orientation sends ALL its edges outward
    val hub = spark.range(nSpokes).select(lit(0L).as("src"), (col("id") + 1).as("dst"))
    // chords among consecutive spokes close hub triangles
    val chords = spark.range(nSpokes - 1).select((col("id") + 1).as("src"), (col("id") + 2).as("dst"))
    val bg = spark.range(nBg).select(
      expr(s"1 + conv(substring(md5(concat('s', cast(id as string))), 1, 8), 16, 10) % $nNodes").as("src"),
      expr(s"1 + conv(substring(md5(concat('d', cast(id as string))), 1, 8), 16, 10) % $nNodes").as("dst"))
    val edges = hub.unionByName(chords).unionByName(bg).filter(col("src") =!= col("dst"))
    val variants: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      "id-oriented " -> (e => graft.operators.ext.Graph.triangleCount(e, "src", "dst")),
      "deg-oriented" -> (e => graft.operators.ext.Graph.triangleCountDegree(e, "src", "dst")))
    for ((name, fn) <- variants) {
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val r = fn(edges).head()
        println(f"[graph] triangles $name pass$pass edges=${r.getLong(0)}%,d wedges=${r.getLong(1)}%,d " +
          f"tri=${r.getLong(2)}%,d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}

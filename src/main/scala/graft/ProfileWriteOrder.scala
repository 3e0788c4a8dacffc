package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Measures the WRITE ORDERED BY payoff (SCALE.md §write-order): an
  * append-grown table whose batches each span the full keyspace is the
  * worst case for envelope skipping — every file of every dir overlaps
  * every range predicate, so a point probe opens O(all files). The same
  * ingest under a declared write order range-sorts each batch, making
  * per-file envelopes disjoint WITHIN each commit: a point probe opens
  * O(#commits) files; after sort compaction, O(1) globally.
  *
  * Builds both shapes honestly — `batches` appends of FULL-keyspace
  * shuffled slices of the orders table, replicated `replicate`× with
  * offset keys — then times the same narrow-range aggregate on each and
  * prints (files scanned / files total) from [[VersionedTable.planRangeFiles]]
  * plus warm wall times, before and after OPTIMIZE.
  *
  * Usage: runMain graft.ProfileWriteOrder <sfDir> [batches] [replicate]
  */
object ProfileWriteOrder {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val replicate = args.drop(2).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._
    def fresh(name: String): String = {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_profile_wrord_$name"
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p)) {
        val w = java.nio.file.Files.walk(p)
        try w.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
        finally w.close()
      }
      root
    }
    val unord = fresh("unord")
    val ord = fresh("ord")

    val base0 = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("id"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("cents"))
    val baseMax = base0.agg(max(col("id"))).head().getLong(0)
    // replicate with offset keys: mass grows k×, key density is unchanged
    val base = (0 until replicate).map(r =>
      base0.select((col("id") + lit(r * (baseMax + 1))).as("id"), col("cents")))
      .reduce(_.unionAll(_))
    val total = base.count()
    val mx = baseMax + (replicate - 1).toLong * (baseMax + 1)

    // every batch spans the FULL keyspace (id % batches slice), shuffled
    // across 32 input partitions — the worst case for envelope skipping
    def ingest(root: String, ordered: Boolean): Unit = {
      if (ordered) {
        VersionedTable.createTable(root,
          org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, cents BIGINT"),
          Nil, Map("graft.write.orderedBy" -> "id"), s"po-create")
      }
      (0 until batches).foreach { b =>
        VersionedTable.commit(
          base.filter(col("id") % batches === b).repartition(32),
          root, "append", s"po-b$b", statsCols = Seq("id"))
      }
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime; val a = f; (a, (System.nanoTime - t0) / 1e9)
    }
    def probe(root: String, tag: String): Unit = {
      val lo = mx / 2
      val hi = lo + mx / 200 // a 0.5 %-wide key window
      val (scanned, totalF) = VersionedTable.planRangeFiles(root, "id", lo, hi)
      // warm: second run measured
      def q = VersionedTable.readRange(spark, root, "id", lo, hi)
        .agg(count(lit(1)), sum(col("cents"))).head()
      q
      val (r, sec) = time(q)
      println(f"""{"tag":"$tag","files_scanned":$scanned,"files_total":$totalF,"rows":${r.getLong(0)},"warm_sec":$sec%.3f}""")
    }

    ingest(unord, ordered = false)
    ingest(ord, ordered = true)
    println(s"""{"rows_total":$total,"batches":$batches,"replicate":$replicate}""")
    probe(unord, "unordered")
    probe(ord, "ordered")
    VersionedTable.compact(spark, unord, "po-c", targetFiles = 32, statsCols = Seq("id"))
    VersionedTable.compact(spark, ord, "po-c", targetFiles = 32, statsCols = Seq("id"))
    probe(unord, "unordered+optimize")
    probe(ord, "ordered+optimize(sort)")
    spark.stop()
  }
}

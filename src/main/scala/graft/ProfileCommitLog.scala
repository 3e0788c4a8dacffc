package graft

import org.apache.spark.sql.SparkSession

import graft.io.VersionedTable

/** Measures the COMMIT-LOG DEPTH cost of the versioned-table driver paths
  * (SCALE.md §commit-log): a production table accumulates one commit per
  * ingest cycle for years, so every per-operation cost that grows with
  * #commits eventually dominates the verb itself. The round-13 checkpoint
  * work claims O(1) amortized manifest parses for the hot paths; this
  * profiles the WALL-TIME of those paths against log depth to verify the
  * asymptotics empirically, not just by parse counters:
  *
  *   resolve — latest-snapshot resolution (tail-manifest parse only)
  *   scan    — count() over the n one-file dirs the appends left behind:
  *             O(#files) by DATA LAYOUT, not log overhead — the column
  *             OPTIMIZE exists to flatten (see the post-OPTIMIZE column)
  *   commit  — one fresh tiny append (manifest publish + checkpoint amortized)
  *   retry   — idempotence probe of the OLDEST commitId (worst-case lookup)
  *   history — full-log parse (the DELIBERATELY O(#commits) contrast
  *             line; manifests are snapshot-complete, so this is O(n²)
  *             JSON mass on an append-only log)
  *   describe — [[VersionedTable.historyEntries]], the path DESCRIBE
  *             HISTORY actually serves from: checkpointed prefix + tail
  *             manifests — must stay flat-ish while `history` grows
  *
  * Usage: runMain graft.ProfileCommitLog [depths...]   (default 100 500 2000)
  */
object ProfileCommitLog {
  def main(args: Array[String]): Unit = {
    val depths = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(100, 500, 2000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timeMs[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e6)
    }
    println("| depth | resolve ms | scan ms | scan post-OPTIMIZE ms | commit ms | oldest-retry ms | history ms | describe ms |")
    println("|---|---|---|---|---|---|---|---|")
    depths.foreach { n =>
      val root = java.nio.file.Files.createTempDirectory(s"graft_logdepth_$n").toString
      (1 to n).foreach { i =>
        VersionedTable.commit(Seq((i.toLong, s"v$i")).toDF("k", "v"),
          root, "append", s"c$i", statsCols = Seq("k")): Unit
      }
      // warm once so classloading/codegen doesn't land on the first cell
      VersionedTable.read(spark, root).count()
      // resolve = manifest work only (tail parse); scan = the full read of
      // n one-file dirs — O(#files) by DATA LAYOUT, not log depth, which
      // is what OPTIMIZE exists for (the post-compact column proves it)
      val (rv0, resolveMs) = timeMs(VersionedTable.latestVersion(root).get)
      require(rv0 == n.toLong, s"latest must be v$n, got $rv0")
      val (_, scanMs) = timeMs(VersionedTable.read(spark, root).count())
      val (_, commitMs) = timeMs(VersionedTable.commit(
        Seq((0L, "x")).toDF("k", "v"), root, "append", "fresh", statsCols = Seq("k")))
      val (rv, retryMs) = timeMs(VersionedTable.commit(
        Seq((0L, "x")).toDF("k", "v"), root, "append", "c1"))
      require(rv == 1L, s"oldest retry must resolve to v1, got $rv")
      val (h, histMs) = timeMs(VersionedTable.history(root).size)
      require(h == n + 1, s"history must see ${n + 1} commits, got $h")
      val (he, descMs) = timeMs(VersionedTable.historyEntries(root).size)
      require(he == n + 1, s"historyEntries must see ${n + 1} commits, got $he")
      VersionedTable.compact(spark, root, "opt", targetFiles = 4,
        statsCols = Seq("k")): Unit
      val (_, scanOptMs) = timeMs(VersionedTable.read(spark, root).count())
      println(f"| $n | $resolveMs%.1f | $scanMs%.1f | $scanOptMs%.1f | $commitMs%.1f | $retryMs%.1f | $histMs%.1f | $descMs%.1f |")
    }
    spark.stop()
  }
}

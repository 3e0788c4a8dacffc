package graft

/** Physical-plan audits (SURVEY.md §4.2): the plans the optimizer should pick
  * at scale, asserted so a regression (lost pushdown, lost broadcast, lost
  * codegen) fails loudly instead of silently costing a shuffle at 100 TB.
  */
class PlanSpec extends SparkSpec {
  import TestSpark.sf

  private def plan(name: String): String =
    Queries.queries(name)(spark, sf).queryExecution.executedPlan.toString()

  test("j1_join_agg broadcasts the dimension side (no fact shuffle for the join)") {
    assert(plan("j1_join_agg").contains("BroadcastHashJoin"))
  }

  test("j2_semi_join plans a semi join, not an inner join + dedup") {
    assert(plan("j2_semi_join").contains("LeftSemi"))
  }

  test("p1_filter_in pushes the IN-list to the parquet scan") {
    val p = plan("p1_filter_in")
    assert(p.contains("PushedFilters: [In(o_orderpriority"))
  }

  test("p6_projection prunes the scan to the selected columns") {
    val p = plan("p6_projection")
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>"))
  }

  test("o2_topk collapses to TakeOrderedAndProject (per-partition heap, no global sort)") {
    assert(plan("o2_topk").contains("TakeOrderedAndProject"))
  }

  test("silver_to_gold plans partial+final hash aggregation (map-side combine)") {
    val p = plan("silver_to_gold")
    assert(p.contains("partial_min") && p.contains("partial_max"))
  }

  test("x2_embedding_cosine uses the native float_dot expression, not interpreted lambdas") {
    val p = Queries.queries("x2_embedding_cosine")(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(p.contains("float_dot"))
    // the composed HOF form would show zip_with/aggregate lambdas in the plan
    assert(!p.contains("zip_with") && !p.contains("lambdafunction"))
    // O(n^2) pair generation is a broadcast nested-loop join, no shuffle of the big side
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("x2_ann_lsh projects signatures through native float_dot, not interpreted lambdas") {
    val p = plan("x2_ann_lsh")
    assert(p.contains("float_dot"), s"expected native float_dot in plan:\n${p.take(2000)}")
    // the composed zip_with/aggregate form would evaluate its lambdas
    // interpreted per element on the full-corpus signature scan
    assert(!p.contains("zip_with") && !p.contains("lambdafunction"),
      s"interpreted lambda leaked into the signature projection:\n${p.take(2000)}")
  }

  test("x3_ngram_freq shingles through the native word_ngrams generator, lambda-free") {
    val p = plan("x3_ngram_freq")
    assert(p.contains("Generate word_ngrams"), s"expected native generator:\n${p.take(2000)}")
    assert(!p.contains("lambdafunction"), s"interpreted HOF leaked into the plan:\n${p.take(2000)}")
  }

  test("x1_decontaminate_ngram broadcasts benchmark grams (corpus side never shuffles for the join)") {
    val p = plan("x1_decontaminate_ngram")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the benchmark-gram join to broadcast:\n${p.take(2000)}")
  }

  test("x2_quantize_int8 broadcasts the per-dim stats back to the quantization scan") {
    val p = plan("x2_quantize_int8")
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast dim-stats (the corpus scan must never shuffle for them):\n${p.take(2000)}")
  }

  test("x1_decontaminate_neardup anti-joins a broadcast contaminated set") {
    val p = plan("x1_decontaminate_neardup")
    assert(p.contains("LeftAnti") && p.contains("Broadcast"),
      s"expected a broadcast anti-join against the contaminated ids:\n${p.take(2000)}")
  }

  test("x2_semantic_dedup broadcasts the centroid table for cell assignment") {
    val p = plan("x2_semantic_dedup")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast centroids (assignment must stay a linear scan):\n${p.take(2000)}")
  }

  test("j5_range_join broadcasts the band table (fact side never shuffles for the join)") {
    assert(plan("j5_range_join").contains("BroadcastNestedLoopJoin"))
  }

  test("w4_sessionize runs both windows and the aggregate off one user_id exchange") {
    val p = plan("w4_sessionize")
    val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 user_id exchange, plan had $exchanges:\n$p")
  }

  test("j8_bucketed_join: co-located buckets leave no exchange before the join or agg") {
    val df = Queries.queries("j8_bucketed_join")(spark, sf)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
    // bucketed reads satisfy both the join and the same-key aggregation;
    // the only exchange allowed is the final rangepartitioning output sort
    assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
  }

  test("partitioned write + partition-filtered read prunes at the source") {
    import org.apache.spark.sql.functions.lit
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_prune_test"
    val df = spark.range(0, 100).withColumn("part", (org.apache.spark.sql.functions.col("id") % 4).cast("int"))
    df.write.mode("overwrite").partitionBy("part").parquet(root)
    val scan = spark.read.parquet(root).filter(org.apache.spark.sql.functions.col("part") === lit(2))
    val p = scan.queryExecution.executedPlan.toString()
    assert(p.contains("PartitionFilters: [isnotnull(part"), s"expected partition pruning:\n$p")
    assert(scan.count() == 25)
  }

  test("x1_decontaminate plans a broadcast anti-join (corpus side never shuffles)") {
    val p = plan("x1_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"))
  }

  test("j2 semi-join pushes the quantity predicate to the lineitem scan") {
    val p = plan("j2_semi_join")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)") ||
      p.contains("GreaterThan(l_quantity,45.0)"))
  }

  test("x3_char_ngrams runs the native generator (no intermediate shingle arrays)") {
    val p = plan("x3_char_ngrams")
    assert(p.contains("Generate char_ngrams"), s"expected native generator:\n$p")
    assert(!p.contains("lambdafunction"), s"composed HOF form leaked into the plan:\n$p")
  }

  test("merge_upsert broadcasts the CDC batch (base side never shuffles for the anti-join)") {
    val p = plan("merge_upsert")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), s"plan:\n$p")
  }

  test("dynamic partition pruning: fact partitions pruned by the dim filter at runtime") {
    import org.apache.spark.sql.functions.{col, lit}
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_dpp_test"
    spark.range(0, 1000)
      .withColumn("part", (col("id") % 10).cast("int"))
      .withColumn("v", col("id") * 2)
      .write.mode("overwrite").partitionBy("part").parquet(root)
    val fact = spark.read.parquet(root)
    val dim = spark.range(0, 10).select(col("id").cast("int").as("d_part"),
      (col("id") % 5).as("d_cat"))
    // the partition filter is only knowable at runtime (it comes through the
    // join); DPP turns the dim filter into a subquery-driven PartitionFilter
    // on the fact scan instead of reading all 10 partitions
    val q = fact.join(dim, col("part") === col("d_part")).filter(col("d_cat") === lit(1))
    val p = q.queryExecution.executedPlan.toString()
    assert(p.contains("dynamicpruning"), s"expected dynamic partition pruning:\n$p")
  }

  test("x3_chunk_split is map-side only: chunking never shuffles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = graft.operators.ext.TextAnalysis.chunkSplit(docs, "doc_id", "text", 32, 24)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"expected a shuffle-free plan:\n$p")
  }

  test("w7_gap_fill runs the cumulative window and the fill window off key exchanges only") {
    // the only exchanges are hash-partitionings on the fill key (plus the
    // broadcast of the 2-value bounds row) — nothing repartitions by the
    // calendar, so keys fill independently at any scale
    val p = plan("w7_gap_fill")
    // match EVERY shuffle Exchange node and whitelist explicitly:
    // SinglePartition is the bounds min/max aggregate (2-value row,
    // legitimately global); any other partitioning must be on the fill key;
    // BroadcastExchange (the bounds row broadcast) is excluded by the
    // lookbehind. A narrower regex would let an unexpected repartition hide
    // by not matching at all.
    val shuffles = "(?<![A-Za-z])Exchange (\\w+)(?:\\(([^,)]+))?".r
      .findAllMatchIn(p).map(m => (m.group(1), Option(m.group(2)).getOrElse(""))).toSeq
    assert(shuffles.nonEmpty, s"expected at least one exchange in:\n$p")
    shuffles.foreach { case (kind, arg) =>
      assert(kind == "SinglePartition" ||
        (kind.endsWith("partitioning") && (arg.contains("key") || arg.contains("user_id"))),
        s"unexpected exchange '$kind($arg)' in:\n$p")
    }
  }

  test("x4_band_dedup self-joins checkpointed narrow hash rows — payload bytes never shuffle") {
    val p = plan("x4_band_dedup")
    // the band-hash frame is eagerly checkpointed before the self-join, so
    // the executed plan reads materialized (doc_id, band, bh) rows; the
    // payload/encode projection must not appear anywhere downstream
    assert(!p.contains("payload") && !p.contains("encode"),
      s"payload bytes leaked past the checkpoint into the join plan:\n${p.take(2000)}")
  }

  test("x4_real_decode is one map-side pass — payload bytes never reach an exchange") {
    val p = plan("x4_real_decode")
    // render → PNG-encode → decode → compare all happen inside mapPartitions
    // chains in a single stage; the only shuffle is the final scalar agg
    val shuffles = "Exchange (\\w+)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(shuffles.forall(_ == "SinglePartition"),
      s"payload stage must not shuffle (got exchanges $shuffles):\n${p.take(2000)}")
  }

  test("x4_audio_dedup joins checkpointed 8-byte fingerprints — payload bytes never shuffle") {
    val p = plan("x4_audio_dedup")
    // the fingerprint frame is eagerly checkpointed before the band
    // self-join (bandedHammingPairs), so the executed plan reads
    // materialized (doc_id, dhash) rows; the WAV payload/render projection
    // must not appear anywhere downstream of the checkpoint
    assert(!p.contains("payload") && !p.contains("mime"),
      s"payload bytes leaked past the checkpoint into the join plan:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banding must stay an equi-join, never all-pairs:\n${p.take(2000)}")
  }

  test("x4_joint_similarity joins on the perceptual bucket (equi-join, never all-pairs)") {
    val p = plan("x4_joint_similarity")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucket gating must stay an equi-join:\n${p.take(2000)}")
    assert(p.contains("float_dot") && !p.contains("lambdafunction"),
      s"expected native dot products:\n${p.take(2000)}")
  }

  test("x2_ann_lsh_multiprobe keeps the bucket equi-join (probe explode, no all-pairs)") {
    val p = plan("x2_ann_lsh_multiprobe")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"multi-probe must stay an equi-join on (sig ^ flip):\n${p.take(2000)}")
    assert(p.contains("Generate explode"),
      s"expected the probe-side flip explode:\n${p.take(2000)}")
  }

  test("x3_oov_rate: vocabulary top-k is a per-partition heap and broadcasts to the scan") {
    val p = plan("x3_oov_rate")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocabulary selection must not be a single-partition global sort:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"the vocabulary must broadcast (corpus never shuffles for it):\n${p.take(2000)}")
  }

  test("x2_minhash_lsh: corpus-sized build sides are shuffle-hash joins, never broadcasts") {
    val p = plan("x2_minhash_lsh")
    // three corpus-sized builds: the salted band self-join + both token-set
    // verify joins — each must be a ShuffledHashJoin (per-partition build
    // slice), because broadcasting any of them collects the corpus to the
    // driver at 100× scale
    val shj = "ShuffledHashJoin".r.findAllIn(p).length
    assert(shj >= 3,
      s"expected >=3 ShuffledHashJoin (band self-join + 2 verify joins), got $shj:\n${p.take(3000)}")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
      s"a corpus-sized table leaked into a broadcast join:\n${p.take(3000)}")
  }

  test("x1_incremental_neardup probes the bucketed band index with no index-side exchange") {
    val p = plan("x1_incremental_neardup")
    assert(p.contains("SortMergeJoin"), s"expected the hinted merge probe join:\n${p.take(2000)}")
    // the ONLY key exchange allowed is the probe side's (the index reads
    // pre-bucketed); a second one means the index got reshuffled at probe
    // time, defeating the pay-the-shuffle-at-write-time design
    val keyExchanges = "Exchange hashpartitioning\\(key".r.findAllIn(p).length
    assert(keyExchanges <= 1, s"index side reshuffled ($keyExchanges key exchanges):\n${p.take(3000)}")
  }

  test("x1_substring_dedup joins the shared set shuffle-hash, never broadcast or all-pairs") {
    val p = plan("x1_substring_dedup")
    assert(p.contains("ShuffledHashJoin"),
      s"expected the hinted shuffle-hash membership join:\n${p.take(2000)}")
    // the shared set is corpus-scale: a broadcast here is the minhashLshPairs
    // scale cliff all over again, and any nested-loop form is all-pairs
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin")
        && !p.contains("CartesianProduct"),
      s"corpus-scale shared set left the shuffle path:\n${p.take(3000)}")
  }

  test("x2_containment_join stays shuffle-hash end-to-end (prefix probe + verify)") {
    val p = plan("x2_containment_join")
    // the df join runs once behind the ranked-frame checkpoint; the final
    // plan shows the prefix-probe join + the two token-set verify joins
    val shj = "ShuffledHashJoin".r.findAllIn(p).length
    assert(shj >= 3,
      s"expected >=3 ShuffledHashJoin (prefix-probe + 2 verify), got $shj:\n${p.take(3000)}")
    // every joined frame here is corpus-scale (inverted index, token sets):
    // none may broadcast, and nothing may degenerate to all-pairs
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin")
        && !p.contains("CartesianProduct"),
      s"corpus-scale frame left the shuffle path:\n${p.take(3000)}")
  }

  test("x3_slice_drift merges the corpus-scale vocabulary join, broadcasts only totals") {
    val p = plan("x3_slice_drift")
    assert(p.contains("SortMergeJoin"),
      s"expected the merge-hinted slice-token x vocabulary join:\n${p.take(2000)}")
    // exactly the two genuinely tiny frames broadcast: per-slice totals and
    // the 1-row corpus total; the vocabulary itself must never broadcast
    val bc = "BroadcastExchange".r.findAllIn(p).length
    assert(bc <= 2, s"expected <=2 broadcasts (slice totals + corpus total), got $bc:\n${p.take(3000)}")
  }

  test("x2_ann_pq broadcasts only the bounded frames (codebook, query tables)") {
    val p = plan("x2_ann_pq")
    // legitimate broadcasts: train ids, codebook, query distance tables
    // (+ the quantizer's dim stats live behind the checkpoint); the corpus
    // code frame itself must reach the ADC join via shuffle or map-side,
    // never as a broadcast build of corpus-sized data — and nothing may
    // degenerate to nested-loop/cartesian
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"PQ path degenerated to all-pairs:\n${p.take(3000)}")
    // 5 = train ids + the codebook once per terms() reuse (assignment and
    // query-table sides) + the query distance tables — every one bounded by
    // ncodes×dim or queries×m×ncodes, none corpus-sized
    val bc = "BroadcastExchange".r.findAllIn(p).length
    assert(bc <= 5, s"expected <=5 bounded broadcasts, got $bc:\n${p.take(3000)}")
  }

  test("x2_ann_binary_rerank reranks via shuffle-hash vector joins (corpus never broadcasts)") {
    val p = plan("x2_ann_binary_rerank")
    // the Hamming stage's only non-equi join is bounded-queries x 16-byte
    // signatures (behind the signature checkpoint); the rerank stage's
    // corpus-sized vector table must arrive shuffle-hash by id, never as a
    // broadcast build
    assert(p.contains("ShuffledHashJoin"),
      s"expected hinted shuffle-hash vector joins:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"),
      s"rerank must stay keyed:\n${p.take(2000)}")
  }

  test("x3_lm_score joins the LM model shuffle-hash; only the vocab scalar broadcasts") {
    val p = plan("x3_lm_score")
    // bigram + unigram model joins: both corpus-sized at 100 TB (distinct
    // n-grams of the reference), so both must stay shuffle-hash
    val shj = "ShuffledHashJoin".r.findAllIn(p).length
    assert(shj >= 2,
      s"expected >=2 ShuffledHashJoin (bigram + unigram model joins), got $shj:\n${p.take(3000)}")
    // the one-row vocabulary count is the only frame allowed to broadcast
    val bcastLoops = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bcastLoops <= 1,
      s"only the single-row vocab frame may cross as a broadcast scalar:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), s"all-pairs form leaked in:\n${p.take(3000)}")
  }

  test("w11_interval_merge runs both windows off ONE entity exchange + sort") {
    // prefix-max and running-span-id share the (key, order) spec, so the
    // planner must fuse them into one sort — a second per-entity sort would
    // double the row's cost at any scale
    val p = plan("w11_interval_merge")
    val windowSorts = "Sort \\[user_id#\\d+L ASC NULLS FIRST, iv_start".r.findAllIn(p).length
    assert(windowSorts == 1,
      s"expected exactly one fused window sort, got $windowSorts:\n${p.take(3000)}")
    val hashParts = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(hashParts >= 1 && !p.contains("CartesianProduct"),
      s"expected the single entity hash exchange:\n${p.take(3000)}")
  }

  test("x6_dsir broadcasts only the bounded bucket model; selection is a top-k heap") {
    val p = plan("x6_dsir")
    // the 1024-row log-weight model is the legitimate broadcast; the corpus
    // token stream must never be build-side
    assert(p.contains("BroadcastHashJoin"),
      s"expected the bucket model broadcast:\n${p.take(3000)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"selection must be the top-k heap, not a global sort:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), s"all-pairs form leaked:\n${p.take(3000)}")
  }

  test("j11_interval_overlap meets through the cell equi-join, never a cartesian") {
    val p = plan("j11_interval_overlap")
    assert(p.contains("ShuffledHashJoin"),
      s"expected the shuffle-hash cell join:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"big-big interval join must never fall back to all-pairs:\n${p.take(2000)}")
  }

  test("a6_percentile avoids the percentile() map aggregate (sort-based window form)") {
    val p = plan("a6_percentile")
    assert(!p.toLowerCase.contains("percentile"),
      s"expected the sort-based form, not the percentile() aggregate:\n${p.take(2000)}")
    assert(p.contains("Window"), s"expected the rank window:\n${p.take(2000)}")
  }

  test("p10_skew_report is a top-k heap over one partial aggregate, never a global sort") {
    val p = plan("p10_skew_report")
    assert(p.contains("TakeOrderedAndProject"), s"expected the top-k heap:\n${p.take(2000)}")
    assert(p.contains("partial_count"), s"expected map-side combine:\n${p.take(2000)}")
  }

  test("p11_partition_checksum partial-aggregates map-side (commutative checksum, no sort)") {
    val p = plan("p11_partition_checksum")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"expected partial aggregation:\n${p.take(2000)}")
    assert(!p.contains("SortAggregate"), s"checksum must stay hash-aggregated:\n${p.take(2000)}")
  }

  test("a17_weighted_median runs both windows off ONE group exchange") {
    val p = plan("a17_weighted_median")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 exchanges (group agg + window), got $exchanges:\n${p.take(2000)}")
    assert(p.contains("Window"), p.take(1000))
  }

  test("merge_scd2 never shuffles the history slice (pass-through union, one join on the current slice)") {
    val p = plan("merge_scd2")
    // full-outer on the key is the ONLY join; history unions in flat
    assert(p.contains("FullOuter"), s"expected the full-outer current⋈batch join:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"scd2 must stay an equi-join:\n${p.take(2000)}")
  }
}

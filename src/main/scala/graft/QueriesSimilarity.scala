package graft

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType, TimestampNTZType, TimestampType}

import graft.operators.{Medallion, Relational}
import graft.operators.ext.{Dedup, Multimodal, Similarity, Sketches, TextAnalysis}
import graft.sources.{Ingest, StubTickerFetcher}

/** The declared query registry: one entry per SURVEY.md §2 operator row, each
  * with DuckDB-equivalent oracle SQL where SQL-expressible.
  *
  * Determinism rules (SURVEY.md §7.4) hold for every query: explicit as-of
  * date (never current_date), row_number over total orders (never
  * monotonically_increasing_id), a trailing total-order orderBy, decimals
  * fixed-point on both sides, token hashes md5-derived (portable), cosines
  * rounded to DECIMAL(10,6) before any comparison.
  */

import QuerySupport._

/** Registry family: similarity search and embeddings (X2/X4) - ANN families, quantization, semantic dedup, multimodal. See [[Queries]] for the assembled registry
  * and [[QuerySupport]] for the shared helpers/oracle fragments.
  */
private[graft] object QueriesSimilarity {
  val defs: Seq[Q] = Seq(

    // X2 — per-label embedding centroid accumulators (distributed mean shape:
    // exact decimal sums + counts; mean = csum/n at the caller, keeping float
    // summation order out of the engine).
    Q("x2_centroids",
      (s, dir) => Similarity.labelCentroidSums(rd(s, dir, "embeddings"), "label")
        .select(col("label"), col("pos"), col("csum").cast("string").as("csum"), col("n"))
        .orderBy("label", "pos"),
      Some("WITH x AS (SELECT label, unnest(range(1, len(embedding) + 1)) AS ord, " +
        "unnest(embedding) AS u FROM embeddings) " +
        "SELECT label, CAST(ord - 1 AS INTEGER) AS pos, " +
        "CAST(CAST(sum(CAST(CAST(u AS DOUBLE) AS DECIMAL(16,6))) AS DECIMAL(20,6)) AS VARCHAR) AS csum, " +
        "count(*) AS n FROM x GROUP BY 1, 2 ORDER BY 1, 2")),


    // X2 — fuzzy entity matching (Similarity.fuzzyLookup): dirty strings
    // resolved against a canonical catalog under edit distance <= 1 with the
    // PassJoin partition blocking (pigeonhole on 2 segments + shift windows
    // — an EQUI-join on near-unique segment keys, no all-pairs, no recall
    // loss) and thresholded-levenshtein verify. Probes are deterministic
    // single-char deletions of part names ANYWHERE in the string — the
    // oracle is the naive all-pairs formulation, so the blocking's
    // losslessness is machine-checked every run.
    Q("x2_fuzzy_join",
      (s, dir) => {
        val parts = rd(s, dir, "part").select("p_partkey", "p_name")
        val m = "cast(p_partkey % length(p_name) as int)"
        val probes = parts.select(col("p_partkey").as("pid"),
          expr(s"concat(substring(p_name, 1, $m), substring(p_name, $m + 2))").as("dirty"))
        Similarity.fuzzyLookup(probes, parts, "pid", "dirty", "p_partkey", "p_name",
            maxDist = 1)
          .orderBy("probe_id")
      },
      Some("""WITH pr AS (SELECT p_partkey AS pid,
        |  substr(p_name, 1, CAST(p_partkey % length(p_name) AS INTEGER)) ||
        |  substr(p_name, CAST(p_partkey % length(p_name) AS INTEGER) + 2) AS dirty
        |  FROM part),
        |j AS (SELECT pr.pid AS probe_id, pr.dirty AS probe, c.p_partkey AS match_id,
        |    c.p_name AS name, CAST(levenshtein(pr.dirty, c.p_name) AS INTEGER) AS dist
        |  FROM pr CROSS JOIN part c
        |  WHERE abs(length(pr.dirty) - length(c.p_name)) <= 1
        |    AND levenshtein(pr.dirty, c.p_name) <= 1),
        |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY dist, name, match_id) AS rk FROM j)
        |SELECT probe_id, probe, match_id, name, dist FROM r WHERE rk = 1
        |ORDER BY probe_id""".stripMargin)),


    // X2/X1 — fuzzy dedup pairs (Similarity.fuzzyDedupPairs): the self-join
    // form of the PassJoin matcher — every unordered pair of distinct strings
    // within edit distance 1 across a corpus of clean names + their typo'd
    // variants, min-id representatives. The typo channel token-set LSH cannot
    // see. Oracle = the naive all-pairs formulation over distinct strings, so
    // the self-join blocking is proven lossless every run.
    Q("x2_fuzzy_dedup",
      (s, dir) => {
        val parts = rd(s, dir, "part").select("p_partkey", "p_name")
        val m = "cast(p_partkey % length(p_name) as int)"
        val rows = parts.select(col("p_partkey").as("id"), col("p_name").as("s"))
          .unionByName(parts.select((col("p_partkey") + 1000000L).as("id"),
            expr(s"concat(substring(p_name, 1, $m), substring(p_name, $m + 2))").as("s")))
        Similarity.fuzzyDedupPairs(rows, "id", "s", maxDist = 1)
          .orderBy("s_a", "s_b")
      },
      Some("""WITH rows0 AS (SELECT p_partkey AS id, p_name AS s FROM part
        |  UNION ALL SELECT p_partkey + 1000000,
        |    substr(p_name, 1, CAST(p_partkey % length(p_name) AS INTEGER)) ||
        |    substr(p_name, CAST(p_partkey % length(p_name) AS INTEGER) + 2) FROM part),
        |names AS (SELECT s, min(id) AS id FROM rows0 GROUP BY 1)
        |SELECT a.id AS id_a, a.s AS s_a, b.id AS id_b, b.s AS s_b,
        |  CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        |FROM names a JOIN names b ON a.s < b.s AND abs(length(a.s) - length(b.s)) <= 1
        |WHERE levenshtein(a.s, b.s) <= 1
        |ORDER BY s_a, s_b""".stripMargin)),


    // X2 — exact token-set Jaccard join, integer-thresholded (jaccard>=0.95).
    // Bounded to doc_id<1000: this is the verification path; the scale path is
    // x2_minhash_lsh below (no bound).
    Q("x2_jaccard_dedup",
      (s, dir) => Dedup.jaccardPairs(rd(s, dir, "documents").filter(col("doc_id") < 1000),
        "doc_id", "text", 1, 19, 20).orderBy("id_a", "id_b"),
      Some("""WITH toks AS (SELECT DISTINCT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents WHERE doc_id < 1000),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS overlap
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b, p.overlap, sa.sz AS size_a, sb.sz AS size_b
        |FROM pairs p JOIN sizes sa ON sa.doc_id = p.id_a JOIN sizes sb ON sb.doc_id = p.id_b
        |WHERE 20 * p.overlap >= 19 * (sa.sz + sb.sz - p.overlap)
        |ORDER BY p.id_a, p.id_b""".stripMargin)),


    // X2 — word-bigram (n-gram) Jaccard join: order-sensitive shingles make
    // this far more discriminative than token sets (reordered near-dups drop
    // out). Bounded to doc_id < 1500 — the common-shingle self-join is
    // O(Σ df²), quadratic in shingle document frequency, so like
    // x2_jaccard_dedup it is the bounded verification path; the unbounded
    // scale path over the same bigram universe is x2_ngram_minhash below.
    Q("x2_ngram_jaccard",
      (s, dir) => Dedup.jaccardPairs(rd(s, dir, "documents").filter(col("doc_id") < 1500),
        "doc_id", "text", 2, 4, 5).orderBy("id_a", "id_b"),
      Some("""WITH ws AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents WHERE doc_id < 1500),
        |toks AS (SELECT DISTINCT doc_id, unnest(list_transform(range(len(ws) - 1), i -> ws[i+1] || ' ' || ws[i+2])) AS tok FROM ws),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS overlap
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b, p.overlap, sa.sz AS size_a, sb.sz AS size_b
        |FROM pairs p JOIN sizes sa ON sa.doc_id = p.id_a JOIN sizes sb ON sb.doc_id = p.id_b
        |WHERE 5 * p.overlap >= 4 * (sa.sz + sb.sz - p.overlap)
        |ORDER BY p.id_a, p.id_b""".stripMargin)),


    // X2 — exact containment join (overlap >= 0.9 * min size) over word
    // BIGRAMS: catches the embedded-duplicate case Jaccard misses (short doc
    // quoted inside a long one). Bigram shingles, not token sets — this
    // corpus' token vocabulary is tiny, so token-SET containment is
    // near-universal (degenerate); order-sensitive bigrams make containment
    // mean "the smaller doc's word sequences appear in the larger". The
    // Spark side candidate-generates through a lossless rarity-ranked
    // PREFIX filter probing the inverted index; the oracle is the
    // UNFILTERED all-pairs join — a gate match proves the prefix filter
    // drops nothing.
    Q("x2_containment_join",
      (s, dir) => Dedup.containmentPairs(rd(s, dir, "documents"),
          "doc_id", "text", 2, 9, 10)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH t0 AS ($duckBigramToks),
        |h AS (SELECT DISTINCT doc_id, ${duckHex("md5(tok)")} AS h FROM t0),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM h GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS overlap
        |  FROM h a JOIN h b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT CASE WHEN sa.sz <= sb.sz THEN p.x ELSE p.y END AS id_a,
        |  CASE WHEN sa.sz <= sb.sz THEN p.y ELSE p.x END AS id_b,
        |  p.overlap, least(sa.sz, sb.sz) AS size_a, greatest(sa.sz, sb.sz) AS size_b
        |FROM p JOIN sizes sa ON sa.doc_id = p.x JOIN sizes sb ON sb.doc_id = p.y
        |WHERE 10 * p.overlap >= 9 * least(sa.sz, sb.sz)
        |ORDER BY id_a, id_b""".stripMargin)),


    // X2 — bigram near-dup at scale: the same MinHash+LSH path as
    // x2_minhash_lsh but over the word-bigram universe (4 bands × 4 hashes —
    // narrower bands than the unigram query because the 0.8 threshold needs
    // bucket collisions at lower similarity). Unbounded: candidate generation
    // is the band equi-join, never the all-pairs shingle join.
    Q("x2_ngram_minhash",
      (s, dir) => Dedup.minhashLshPairs(rd(s, dir, "documents"), "doc_id", "text", 4, 4, 5, shingleN = 2)
        .orderBy("id_a", "id_b"),
      Some(duckMinhashSql(duckBigramToks, 4, 4, 5))),


    // X2 — MinHash+LSH near-dup join (the 100 TB path: signatures are linear,
    // candidates come from an equi-join on band keys, only candidates verified).
    Q("x2_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(rd(s, dir, "documents"), "doc_id", "text", 8, 19, 20)
        .orderBy("id_a", "id_b"),
      Some(duckMinhashSql(duckToks, 8, 19, 20))),


    // X2 — 32-bit SimHash signature per document (linear, join-free).
    Q("x2_simhash",
      (s, dir) => Dedup.simhash(rd(s, dir, "documents"), "doc_id", "text").orderBy("doc_id"),
      Some(s"WITH $duckSimhashSigsCte\nSELECT doc_id, simhash FROM sigs ORDER BY doc_id")),


    // X2 — SimHash near-dup pairs: 8-bit band join (pigeonhole-exact for
    // Hamming <= 3) + popcount verify on candidates only.
    Q("x2_simhash_pairs",
      (s, dir) => Dedup.simhashPairs(rd(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $duckSimhashSigsCte,
        |banded AS (SELECT doc_id, simhash, unnest(range(0, 4)) AS band FROM sigs),
        |b2 AS (SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS key FROM banded),
        |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b, x.simhash AS sa, y.simhash AS sb
        |  FROM b2 x JOIN b2 y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY id_a, id_b""".stripMargin)),


    // X2 — brute-force cosine pairs >= 0.4 (baseline embedding near-dup).
    // The vec_id < 2000 cap bounds this DECLARED O(n²) baseline at any scale
    // factor (>= every test SF's full range today, so results are unchanged);
    // the unbounded scale paths are x2_ann_lsh / x2_ann_ivf.
    Q("x2_embedding_cosine",
      (s, dir) => strCols(
        Similarity.cosinePairs(rd(s, dir, "embeddings").filter(col("vec_id") < 2000),
            new java.math.BigDecimal("0.400000"))
          .orderBy("id_a", "id_b"),
        Seq("cos")),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 2000),
        |s AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
        |SELECT id_a, id_b, CAST(cos AS VARCHAR) AS cos FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS DECIMAL(10,6)) AS cos
        |  FROM s a JOIN s b ON a.vec_id < b.vec_id)
        |WHERE cos >= CAST(0.4 AS DECIMAL(10,6)) ORDER BY id_a, id_b""".stripMargin)),


    // X2 — brute-force cosine top-3 neighbours for the first 50 vectors,
    // against the same bounded reference corpus (vec_id < 2000, see above).
    Q("x2_ann_topk",
      (s, dir) => strCols(
        Similarity.annTopK(rd(s, dir, "embeddings").filter(col("vec_id") < 2000), 3, 50)
          .orderBy("id_a", "rk"),
        Seq("cos")),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 2000),
        |s AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |scored AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS DECIMAL(10,6)) AS cos
        |  FROM s a JOIN s b ON a.vec_id <> b.vec_id WHERE a.vec_id < 50)
        |SELECT id_a, id_b, CAST(cos AS VARCHAR) AS cos, rk FROM (SELECT id_a, id_b, cos,
        |  CAST(row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS INTEGER) AS rk FROM scored)
        |WHERE rk <= 3 ORDER BY id_a, rk""".stripMargin)),


    // X2 — LSH-bucketed ANN (scale path). The signature construction is
    // deterministic (seeded ±1 planes, DECIMAL-rounded projection signs), so
    // the ENTIRE pipeline — bucketing, candidate join, re-score, rank — has
    // an exact DuckDB oracle; recall-vs-brute assertions live in ScalaTest.
    Q("x2_ann_lsh",
      (s, dir) => strCols(
        Similarity.lshTopK(rd(s, dir, "embeddings"), 3, 8, dim = 64).orderBy("id_a", "rk"),
        Seq("cos")),
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |sg AS (SELECT vec_id, v, nrm, ${duckLshSig(8, 64)} AS sig FROM s),
        |scored AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS DECIMAL(10,6)) AS cos
        |  FROM sg a JOIN sg b ON a.sig = b.sig AND a.vec_id <> b.vec_id)
        |SELECT id_a, id_b, CAST(cos AS VARCHAR) AS cos, rk FROM (SELECT id_a, id_b, cos,
        |  CAST(row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS INTEGER) AS rk FROM scored)
        |WHERE rk <= 3 ORDER BY id_a, rk""".stripMargin)),


    // X2 — MULTI-PROBE LSH ANN: each vector probes its own signature bucket
    // plus the 8 signatures at Hamming distance 1 (the published multi-probe
    // idea — recall of a larger plane budget at (numPlanes+1)× probe rows,
    // not exponentially more buckets). The engine keeps the bucket EQUI-join
    // (probe side explodes sig ^ single-bit flips; each qualifying pair
    // matches exactly one flip); the oracle states the same semantics
    // declaratively as a Hamming ≤ 1 join, affordable at verify scale.
    Q("x2_ann_lsh_multiprobe",
      (s, dir) => strCols(
        Similarity.lshTopK(rd(s, dir, "embeddings"), 3, 8, dim = 64, probeHamming1 = true)
          .orderBy("id_a", "rk"),
        Seq("cos")),
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |sg AS (SELECT vec_id, v, nrm, ${duckLshSig(8, 64)} AS sig FROM s),
        |scored AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS DECIMAL(10,6)) AS cos
        |  FROM sg a JOIN sg b ON bit_count(xor(a.sig, b.sig)) <= 1 AND a.vec_id <> b.vec_id)
        |SELECT id_a, id_b, CAST(cos AS VARCHAR) AS cos, rk FROM (SELECT id_a, id_b, cos,
        |  CAST(row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS INTEGER) AS rk FROM scored)
        |WHERE rk <= 3 ORDER BY id_a, rk""".stripMargin)),


    // X2 — IVF-bucketed ANN (scale path: broadcast centroid table, cell
    // equi-join probe). Declared with the deterministic stand-in quantizer
    // (first nlist vectors as centroids, trainIters=0) — pure rounded-decimal
    // arithmetic end-to-end, so assignment, probing, and re-scoring all have
    // an exact DuckDB oracle. The seeded-KMeans-trained quantizer is the same
    // pipeline with trained centroids; its recall is asserted in ScalaTest
    // (DedupSimilaritySpec).
    Q("x2_ann_ivf",
      (s, dir) => strCols(
        Similarity.ivfTopK(rd(s, dir, "embeddings"), 3, 32, 4, trainIters = 0)
          .orderBy("id_a", "rk"),
        Seq("cos")),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cnrm FROM s WHERE vec_id < 32),
        |sim AS (SELECT s.vec_id, c.cell,
        |  CAST(list_dot_product(s.v, c.cv) / (s.nrm * c.cnrm) AS DECIMAL(10,6)) AS csim
        |  FROM s CROSS JOIN c),
        |ranked AS (SELECT vec_id, cell,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS crk FROM sim),
        |assigned AS (SELECT vec_id, cell FROM ranked WHERE crk = 1),
        |probes AS (SELECT vec_id AS q_id, cell AS probe_cell FROM ranked WHERE crk <= 4),
        |scored AS (SELECT DISTINCT p.q_id AS id_a, a.vec_id AS id_b,
        |  CAST(list_dot_product(qs.v, ns.v) / (qs.nrm * ns.nrm) AS DECIMAL(10,6)) AS cos
        |  FROM probes p JOIN assigned a ON p.probe_cell = a.cell AND p.q_id <> a.vec_id
        |  JOIN s qs ON qs.vec_id = p.q_id JOIN s ns ON ns.vec_id = a.vec_id)
        |SELECT id_a, id_b, CAST(cos AS VARCHAR) AS cos, rk FROM (SELECT id_a, id_b, cos,
        |  CAST(row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS INTEGER) AS rk FROM scored)
        |WHERE rk <= 3 ORDER BY id_a, rk""".stripMargin)),


    // X2 — per-dimension int8 quantization of the embedding column (the
    // standard 4× compression before a large-scale vector index). Affine
    // scale rounded to DECIMAL(10,6) before the floor, so both engines
    // bucket identically; per-dim stats shuffle at most (dim) rows.
    Q("x2_quantize_int8",
      (s, dir) => Similarity.quantizeInt8(rd(s, dir, "embeddings"))
        .orderBy("vec_id", "pos"),
      Some(s"""WITH $duckQuantCtes
        |SELECT vec_id, pos, qq AS q FROM q ORDER BY vec_id, pos""".stripMargin)),


    // X2 — embedding-space drift per label slice: integer-scaled L1 distance
    // between each slice's quantized centroid and the corpus centroid
    // (Similarity.embeddingDrift — the embedding counterpart of
    // x3_slice_drift; exact through int8 quantization, no float sums).
    Q("x2_embedding_drift",
      (s, dir) => Similarity.embeddingDrift(rd(s, dir, "embeddings"), "label")
        .withColumn("l1_scaled", col("l1_scaled").cast("string"))
        .orderBy("slice"),
      Some(s"""WITH $duckQuantCtes,
        |sd AS (SELECT e.label AS slice, q.pos, sum(qq) AS s_d
        |  FROM q JOIN (SELECT vec_id, label FROM embeddings) e USING (vec_id) GROUP BY 1, 2),
        |td AS (SELECT pos, sum(s_d) AS t_d FROM sd GROUP BY 1),
        |ns AS (SELECT label AS slice, count(*) AS n_s FROM embeddings GROUP BY 1),
        |nt AS (SELECT count(*) AS n FROM embeddings)
        |SELECT slice, CAST(n_s AS BIGINT) AS n_vecs,
        |  CAST(CAST(sum(abs(s_d * n - t_d * n_s)) AS DECIMAL(38,0)) AS VARCHAR) AS l1_scaled
        |FROM sd JOIN td USING (pos) JOIN ns USING (slice) CROSS JOIN nt
        |GROUP BY slice, n_s ORDER BY slice""".stripMargin)),


    // X2 — product-quantization ANN (ADC search): vectors stored as 8
    // one-byte codes, query-vector distance approximated from per-subspace
    // distance tables — the IFV-PQ search core over the int8-quantized
    // components, so every distance is an exact integer and the whole path
    // (codebook, assignment argmins, ADC sums, top-k) replays in DuckDB.
    Q("x2_ann_pq",
      (s, dir) => Similarity.pqTopK(rd(s, dir, "embeddings"),
          dim = 64, m = 8, ncodes = 16, k = 3, queryLimit = 150)
        .orderBy("id_a", "rk"),
      Some(s"""WITH $duckQuantCtes,
        |$duckPqCtes
        |SELECT qid AS id_a, vec_id AS id_b, adist, rk FROM
        |  (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS INTEGER) AS rk FROM pqad)
        |WHERE rk <= 3 ORDER BY id_a, rk""".stripMargin)),


    // X2 — IVF-PQ: the production ANN composition — coarse cell gate
    // (nprobe=4 of nlist=32 cells per query) over PQ asymmetric-distance
    // ranking,
    // both stages in the exact-integer quantized space so the full composed
    // path replays in DuckDB. x2_ann_pq is the ungated recall baseline.
    Q("x2_ann_ivfpq",
      (s, dir) => Similarity.ivfPqTopK(rd(s, dir, "embeddings"),
          dim = 64, m = 8, ncodes = 16, nlist = 32, nprobe = 4, k = 3,
          queryLimit = 150)
        .orderBy("id_a", "rk"),
      Some(s"""WITH $duckQuantCtes,
        |$duckPqCtes,
        |$duckIvfCtes
        |SELECT qid AS id_a, vec_id AS id_b, adist, rk FROM
        |  (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS INTEGER) AS rk FROM ivfad)
        |WHERE rk <= 3 ORDER BY id_a, rk""".stripMargin)),


    // X2 — top-3 neighbours by integer dot product over the int8-quantized
    // vectors (the search side of the quantized index path; exact integer
    // scores, so the whole path hash-checks with no rounding discipline).
    // Queries bounded at vec_id < 50 like the other declared baselines.
    Q("x2_ann_quantized",
      (s, dir) => Similarity.quantizedTopK(rd(s, dir, "embeddings"), 3, 50)
        .orderBy("id_a", "rk"),
      Some(s"""WITH $duckQuantCtes,
        |v AS (SELECT vec_id, list(CAST(qq AS DOUBLE) ORDER BY pos) AS qv FROM q GROUP BY vec_id),
        |scored AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot
        |  FROM v a JOIN v b ON a.vec_id <> b.vec_id WHERE a.vec_id < 50)
        |SELECT id_a, id_b, dot, rk FROM (SELECT id_a, id_b, dot,
        |  CAST(row_number() OVER (PARTITION BY id_a ORDER BY dot DESC, id_b) AS INTEGER) AS rk FROM scored)
        |WHERE rk <= 3 ORDER BY id_a, rk""".stripMargin)),


    // X2 — hard-negative mining (Similarity.hardNegatives): per query, the
    // top-3 most similar vectors with a DIFFERENT label out of an exact
    // quantized shortlist of 12 — the contrastive-training example miner.
    // Shortlist-bounded by design (the production two-stage contract); the
    // oracle replays shortlist, label filter, and re-rank exactly.
    Q("x2_hard_negatives",
      (s, dir) => Similarity.hardNegatives(rd(s, dir, "embeddings"), "label",
          k = 3, shortlist = 12, queryLimit = 60)
        .orderBy("id_a", "neg_rk"),
      Some(s"""WITH $duckQuantCtes,
        |v AS (SELECT vec_id, list(CAST(qq AS DOUBLE) ORDER BY pos) AS qv FROM q GROUP BY vec_id),
        |scored AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot
        |  FROM v a JOIN v b ON a.vec_id <> b.vec_id WHERE a.vec_id < 60),
        |sl AS (SELECT id_a, id_b, dot FROM (SELECT *,
        |  row_number() OVER (PARTITION BY id_a ORDER BY dot DESC, id_b) AS rk FROM scored) WHERE rk <= 12),
        |neg AS (SELECT sl.id_a, sl.id_b, sl.dot FROM sl
        |  JOIN embeddings la ON la.vec_id = sl.id_a
        |  JOIN embeddings lb ON lb.vec_id = sl.id_b
        |  WHERE la.label <> lb.label)
        |SELECT id_a, id_b, dot, neg_rk FROM (SELECT *,
        |  CAST(row_number() OVER (PARTITION BY id_a ORDER BY dot DESC, id_b) AS INTEGER) AS neg_rk FROM neg)
        |WHERE neg_rk <= 3 ORDER BY id_a, neg_rk""".stripMargin)),


    // X2 — HYBRID retrieval with reciprocal-rank fusion: dense leg = exact
    // integer quantized-L2 top-20 over embeddings; lexical leg = BM25
    // top-20 over documents (same query ids 0-4, self excluded on both
    // legs); fused by micro-scaled integer RRF (1000000 div (60 + rank),
    // Cormack & Clarke's k = 60). This is the production retrieval shape —
    // two incommensurably-scored shortlists merged without score
    // calibration — and every step is integer-exact, so the FUSED ranking
    // (score, consensus count, and order) replays bit-identically in
    // DuckDB. doc_id and vec_id share the fixture's id domain, which is
    // what makes cross-modal fusion well-defined here.
    Q("x2_hybrid_rrf",
      (s, dir) => {
        val docs = rd(s, dir, "documents")
        val queries = docs.filter(col("doc_id") < 5)
          .select(col("doc_id").as("query_id"),
            expr("array_join(slice(filter(split(text, ' '), x -> x != ''), 1, 8), ' ')").as("qtext"))
        val lex = TextAnalysis
          .bm25TopK(docs, queries, "doc_id", "text", "query_id", "qtext", 20, excludeSelf = true)
          .select(col("query_id"), col("doc_id").as("cand_id"), col("rk"))
        val dense = Similarity.quantizedL2TopK(rd(s, dir, "embeddings"), 20, 5)
          .select(col("id_a").as("query_id"), col("id_b").as("cand_id"), col("rk"))
        Similarity.rrfFuse(Seq(dense, lex), "query_id", "cand_id", "rk", 10)
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH $duckQuantCtes,
        |v AS (SELECT vec_id, list(CAST(qq AS DOUBLE) ORDER BY pos) AS qv FROM q GROUP BY vec_id),
        |dsc AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |  CAST(list_dot_product(a.qv, a.qv) + list_dot_product(b.qv, b.qv) - 2 * list_dot_product(a.qv, b.qv) AS BIGINT) AS d
        |  FROM v a JOIN v b ON a.vec_id <> b.vec_id WHERE a.vec_id < 5),
        |dense AS (SELECT query_id, cand_id, rk FROM (SELECT query_id, cand_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY d, cand_id) AS rk FROM dsc) WHERE rk <= 20),
        |dl AS (SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS dl FROM documents),
        |tot AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl),
        |qd AS (SELECT doc_id AS query_id, array_to_string((list_filter(string_split(text, ' '), x -> x <> ''))[1:8], ' ') AS qtext
        |  FROM documents WHERE doc_id < 5),
        |qt AS (SELECT DISTINCT query_id, unnest(list_filter(string_split(qtext, ' '), x -> x <> '')) AS term FROM qd),
        |post AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM post
        |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT q.query_id, f.doc_id,
        |  CAST(CAST(22000 AS HUGEINT) * (length(printf('%b', n // df)) - 1) * f.tf * t
        |    // (CAST(10 AS HUGEINT) * f.tf * t + CAST(3 AS HUGEINT) * t + CAST(9 AS HUGEINT) * dl.dl * n) AS BIGINT) AS s
        |  FROM tf f JOIN dfreq USING (term) JOIN qt q USING (term)
        |  JOIN dl ON f.doc_id = dl.doc_id CROSS JOIN tot
        |  WHERE f.doc_id <> q.query_id),
        |lagg AS (SELECT query_id, doc_id AS cand_id, CAST(sum(s) AS BIGINT) AS score FROM sc GROUP BY 1, 2),
        |lex AS (SELECT query_id, cand_id, rk FROM (SELECT query_id, cand_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, cand_id) AS rk FROM lagg) WHERE rk <= 20),
        |u AS (SELECT query_id, cand_id, 1000000 // (60 + rk) AS c FROM dense
        |  UNION ALL SELECT query_id, cand_id, 1000000 // (60 + rk) FROM lex),
        |fused AS (SELECT query_id, cand_id, CAST(sum(c) AS BIGINT) AS rrf_score, count(*) AS n_legs
        |  FROM u GROUP BY 1, 2),
        |r AS (SELECT query_id, cand_id, rrf_score, n_legs,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, cand_id) AS INTEGER) AS rk FROM fused)
        |SELECT query_id, cand_id, rrf_score, n_legs, rk FROM r WHERE rk <= 10
        |ORDER BY query_id, rk""".stripMargin)),


    // X2 — BINARY quantization ANN: 1-bit-per-dimension signatures (8 bytes
    // per 64-dim vector, 32x under float32) via the exact integer mean test
    // q*n >= sum(q), Hamming top-k = two XORs + two popcounts per candidate.
    // Every step is integer-exact, so the full path — quantize, sign bits,
    // word packing, Hamming ranks — replays in DuckDB.
    Q("x2_ann_binary",
      (s, dir) => Similarity.binaryHammingTopK(rd(s, dir, "embeddings"), 3, 150)
        .orderBy("id_a", "rk"),
      Some(s"""WITH $duckQuantCtes,
        |$duckBinaryCtes
        |SELECT id_a, id_b, hd, rk FROM (SELECT *,
        |  CAST(row_number() OVER (PARTITION BY id_a ORDER BY hd, id_b) AS INTEGER) AS rk FROM bham)
        |WHERE rk <= 3 ORDER BY id_a, rk""".stripMargin)),


    // X2 — binary prefilter + EXACT rerank (the production two-stage shape):
    // Hamming shortlist of 32 per query over the 8-byte signatures, exact
    // integer L2 on the shortlist only. Composed path fully replayable —
    // a float rerank could not be.
    Q("x2_ann_binary_rerank",
      (s, dir) => Similarity.binaryRerankTopK(rd(s, dir, "embeddings"),
          k = 3, shortlist = 32, queryLimit = 150)
        .orderBy("id_a", "rk"),
      Some(s"""WITH $duckQuantCtes,
        |$duckBinaryCtes,
        |bshort AS (SELECT id_a, id_b FROM (SELECT *,
        |  row_number() OVER (PARTITION BY id_a ORDER BY hd, id_b) AS srk FROM bham) WHERE srk <= 32),
        |v AS (SELECT vec_id, list(CAST(qq AS DOUBLE) ORDER BY pos) AS qv FROM q GROUP BY vec_id),
        |rr AS (SELECT s.id_a, s.id_b,
        |  CAST(list_dot_product(a.qv, a.qv) + list_dot_product(b.qv, b.qv) - 2 * list_dot_product(a.qv, b.qv) AS BIGINT) AS d
        |  FROM bshort s JOIN v a ON a.vec_id = s.id_a JOIN v b ON b.vec_id = s.id_b)
        |SELECT id_a, id_b, d, rk FROM (SELECT *,
        |  CAST(row_number() OVER (PARTITION BY id_a ORDER BY d, id_b) AS INTEGER) AS rk FROM rr)
        |WHERE rk <= 3 ORDER BY id_a, rk""".stripMargin)),


    // X2 — INCREMENTAL ANN: the corpus-growth loop closed for the
    // compressed family (the x1_incremental_neardup pattern applied to PQ):
    // the quantizer ranges AND the codebook are FROZEN on the standing
    // corpus (vec_id < 400), its codes are persisted bucketed-by-vec_id,
    // two later batches append their frozen-coded rows idempotently (the
    // third append REPLAYS batch one — the anti-join must insert nothing or
    // the hash breaks), and queries probe the grown table via broadcast ADC
    // tables without ever re-coding a stored vector. Oracle = the frozen-
    // quantizer PQ replay chain over the full 500-vector corpus.
    Q("x2_ann_pq_incremental",
      (s, dir) => {
        val emb = rd(s, dir, "embeddings").filter(col("vec_id") < 500)
        val base = emb.filter(col("vec_id") < 400)
        // fixture = the converged standing code table (frozen-quantizer
        // seed + both batch appends); LIVE each pass = one idempotent
        // replay append (the production re-drive cost — its anti-join must
        // insert nothing) and the broadcast-ADC probe, this row's claim
        val idx = Fixtures.once(s, dir, "pq_code_index") {
          val name = s"graft_pq_code_idx_${dirTag(dir)}"
          val root = freshDir(s, s"graft_pq_code_idx_${dirTag(dir)}")
          s.sql(s"DROP TABLE IF EXISTS $name")
          Similarity.pqCodesFrozen(base, base, dim = 64, m = 8, ncodes = 16)
            .write.bucketBy(8, "vec_id").sortBy("vec_id")
            .option("path", s"$root/idx").saveAsTable(name)
          Similarity.appendPqIndex(name,
            emb.filter(col("vec_id") >= 400 && col("vec_id") < 450), base, 64, 8, 16, 8)
          Similarity.appendPqIndex(name,
            emb.filter(col("vec_id") >= 450), base, 64, 8, 16, 8)
          name
        }
        Similarity.appendPqIndex(idx,
          emb.filter(col("vec_id") >= 400 && col("vec_id") < 450), base, 64, 8, 16, 8) // replay: no-op
        Similarity.pqIndexTopK(s, idx,
            emb.filter(col("vec_id") < 50), base, 64, 8, 16, k = 3)
          .orderBy("id_a", "rk")
      },
      Some(s"""WITH ${duckFrozenPqCtes(400, 500, 50)}
        |SELECT qid AS id_a, vec_id AS id_b, adist, rk FROM
        |  (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS INTEGER) AS rk FROM fad)
        |WHERE rk <= 3 ORDER BY id_a, rk""".stripMargin)),


    // X2 — ANN QUALITY as a driver-visible signal: recall@3 of the IVF path
    // (stand-in quantizer, nprobe=4) against the brute-force ground truth on
    // the same bounded corpus (vec_id < 1000, 50 queries — bounded, so the
    // row costs the same at any scale factor). Both pipelines are
    // deterministic and individually oracle'd, so the intersection count is
    // exact cross-engine; the threshold bakes the quality bar into the
    // result row — if a code change degrades IVF recall below 100/150, the
    // boolean flips and the driver's hash gate fails. (The seeded-KMeans
    // quantizer's recall is additionally asserted in ScalaTest.)
    Q("x2_ann_recall",
      (s, dir) => {
        val emb = rd(s, dir, "embeddings").filter(col("vec_id") < 1000)
        val ivf = Similarity.ivfTopK(emb, 3, 32, 4, trainIters = 0)
          .filter(col("id_a") < 50).select("id_a", "id_b")
        val brute = Similarity.annTopK(emb, 3, 50).select("id_a", "id_b")
        ivf.join(brute, Seq("id_a", "id_b"))
          .agg(count(lit(1)).as("hits"), (count(lit(1)) >= 100).as("recall_ok"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 1000),
        |s AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cnrm FROM s WHERE vec_id < 32),
        |sim AS (SELECT s.vec_id, c.cell,
        |  CAST(list_dot_product(s.v, c.cv) / (s.nrm * c.cnrm) AS DECIMAL(10,6)) AS csim
        |  FROM s CROSS JOIN c),
        |ranked AS (SELECT vec_id, cell,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS crk FROM sim),
        |assigned AS (SELECT vec_id, cell FROM ranked WHERE crk = 1),
        |probes AS (SELECT vec_id AS q_id, cell AS probe_cell FROM ranked WHERE crk <= 4 AND vec_id < 50),
        |iscored AS (SELECT DISTINCT p.q_id AS id_a, a.vec_id AS id_b,
        |  CAST(list_dot_product(qs.v, ns.v) / (qs.nrm * ns.nrm) AS DECIMAL(10,6)) AS cos
        |  FROM probes p JOIN assigned a ON p.probe_cell = a.cell AND p.q_id <> a.vec_id
        |  JOIN s qs ON qs.vec_id = p.q_id JOIN s ns ON ns.vec_id = a.vec_id),
        |ivf AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
        |  row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rk FROM iscored) WHERE rk <= 3),
        |bscored AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS DECIMAL(10,6)) AS cos
        |  FROM s a JOIN s b ON a.vec_id <> b.vec_id WHERE a.vec_id < 50),
        |brute AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
        |  row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rk FROM bscored) WHERE rk <= 3)
        |SELECT count(*) AS hits, count(*) >= 100 AS recall_ok
        |FROM ivf JOIN brute USING (id_a, id_b)""".stripMargin)),


    // X2 — PQ-path QUALITY as a driver-visible signal (the x2_ann_recall
    // pattern extended to the compressed family): recall@3 of the ungated
    // PQ/ADC scan AND the IVF-PQ composition against the exact quantized-L2
    // ground truth (same space, no code approximation, no cell gate) on the
    // same bounded query set. Every pipeline is deterministic and
    // replayable, so hits are exact cross-engine; the thresholds bake the
    // quality bar into the row — a quantization-quality regression (broken
    // code assignment, wrong ADC table, over-aggressive gate) flips a
    // boolean and fails the driver's hash gate.
    Q("x2_ann_pq_recall",
      (s, dir) => {
        val emb = rd(s, dir, "embeddings")
        // r10 diet (this was the heaviest non-e2e registry row): 50-query
        // gate (r9 ran 150) through the FUSED Similarity.pqRecallHits —
        // quantization, codebook, code assignment, and ADC tables computed
        // once and shared across the truth/PQ/IVF-PQ legs instead of once
        // per leg. The standalone rows (x2_ann_pq / x2_ann_ivfpq) keep the
        // 150-query bound — replay breadth lives there, the quality GATE
        // lives here. Search semantics are unchanged (same codebooks, same
        // tie order), so the oracle is still the full DuckDB replay.
        val hits = Similarity.pqRecallHits(emb, dim = 64, m = 8, ncodes = 16,
          nlist = 32, nprobe = 4, k = 3, queryLimit = 50)
        // measured: pq 17 / ivfpq 22 of 150 slots at sf0.01, 10 / 16 at
        // sf0.1 — a 16-entry codebook per 8-dim subspace on near-uniform
        // synthetic vectors is PQ's worst case, yet ~70x above the
        // ~0.1-hit random-chance floor. Bars at ~60% of the weaker (sf0.1)
        // measurement: a collapse-to-random regression fails loudly at
        // either sf, honest fixture noise does not.
        hits.select(
          col("pq_hits"), (col("pq_hits") >= 6).as("pq_recall_ok"),
          col("ivfpq_hits"), (col("ivfpq_hits") >= 9).as("ivfpq_recall_ok"))
      },
      Some(s"""WITH $duckQuantCtes,
        |$duckPqCtes,
        |$duckIvfCtes,
        |v AS (SELECT vec_id, list(CAST(qq AS DOUBLE) ORDER BY pos) AS qv FROM q GROUP BY vec_id),
        |tsc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(list_dot_product(a.qv, a.qv) + list_dot_product(b.qv, b.qv) - 2 * list_dot_product(a.qv, b.qv) AS BIGINT) AS d
        |  FROM v a JOIN v b ON a.vec_id <> b.vec_id WHERE a.vec_id < 50),
        |truth AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
        |  row_number() OVER (PARTITION BY id_a ORDER BY d, id_b) AS rk FROM tsc) WHERE rk <= 3),
        |pqtop AS (SELECT qid AS id_a, vec_id AS id_b FROM (SELECT *,
        |  row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rk FROM pqad WHERE qid < 50) WHERE rk <= 3),
        |ivftop AS (SELECT qid AS id_a, vec_id AS id_b FROM (SELECT *,
        |  row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rk FROM ivfad WHERE qid < 50) WHERE rk <= 3)
        |SELECT (SELECT count(*) FROM pqtop JOIN truth USING (id_a, id_b)) AS pq_hits,
        |  (SELECT count(*) FROM pqtop JOIN truth USING (id_a, id_b)) >= 6 AS pq_recall_ok,
        |  (SELECT count(*) FROM ivftop JOIN truth USING (id_a, id_b)) AS ivfpq_hits,
        |  (SELECT count(*) FROM ivftop JOIN truth USING (id_a, id_b)) >= 9 AS ivfpq_recall_ok""".stripMargin)),


    // X2 — TRAINED-quantizer ANN as a declared row: ivfTopK over seeded
    // KMeans centroids (the production-shaped path; the stand-in-quantizer
    // rows prove replay exactness, this row proves trained QUALITY). KMeans
    // cannot replay in DuckDB — float centroid arithmetic is not
    // engine-portable — so the gate is quality-based, not replay-based: the
    // row carries only the recall@3-clears-threshold verdict against the
    // exact brute ground truth (itself fully oracle'd via x2_ann_topk), and
    // the oracle pins the expected verdict. A regression in the trained
    // path (centroid training, assignment, probe gating) drops recall below
    // the bar and flips the boolean. Measured: trained recall is 72/150
    // (sf0.01) and 81/150 (sf0.1) vs the stand-in's 109/114 — balanced
    // KMeans cells do NOT beat arbitrary-vector centroids on this
    // near-uniform synthetic (ANN-hostile data; cell populations even out
    // but neighbours still straddle cells). Bar at 60/150 (40%): margin
    // under partitioning-order float drift in training, ~30x above the
    // random-chance floor, fails loudly on real regressions.
    Q("x2_ann_trained_recall",
      (s, dir) => {
        val emb = rd(s, dir, "embeddings").filter(col("vec_id") < 1000)
        val ivf = Similarity.ivfTopK(emb, 3, nlist = 32, nprobe = 4, trainIters = 5)
          .filter(col("id_a") < 50).select("id_a", "id_b")
        val brute = Similarity.annTopK(emb, 3, 50).select("id_a", "id_b")
        ivf.join(brute, Seq("id_a", "id_b"))
          .agg(count(lit(1)).as("__hits"))
          .select(lit(50).as("n_queries"), lit(3).as("k"),
            (col("__hits") >= 60).as("recall_ok"))
      },
      Some("SELECT 50 AS n_queries, 3 AS k, true AS recall_ok")),


    // X2 — SemDeDup-shaped semantic dedup: coarse-quantize embeddings into
    // cells, drop every vector with a lower-id near-duplicate cell-mate
    // (greedy min-id keep). Deterministic stand-in quantizer → the full
    // assign + within-cell pair + keep-rule pipeline is oracle-checked.
    Q("x2_semantic_dedup",
      (s, dir) => Similarity.semanticDedup(rd(s, dir, "embeddings"), 32,
          new java.math.BigDecimal("0.400000"))
        .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cnrm FROM s WHERE vec_id < 32),
        |sim AS (SELECT s.vec_id, c.cell,
        |  CAST(list_dot_product(s.v, c.cv) / (s.nrm * c.cnrm) AS DECIMAL(10,6)) AS csim
        |  FROM s CROSS JOIN c),
        |ranked AS (SELECT vec_id, cell,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS crk FROM sim),
        |assigned AS (SELECT r.vec_id, r.cell, s.v, s.nrm FROM ranked r
        |  JOIN s ON s.vec_id = r.vec_id WHERE r.crk = 1),
        |dropped AS (SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b
        |  ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE CAST(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS DECIMAL(10,6))
        |    >= CAST(0.4 AS DECIMAL(10,6)))
        |SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS keep
        |FROM assigned a LEFT JOIN dropped d ON d.vec_id = a.vec_id
        |ORDER BY a.vec_id""".stripMargin)),


    // X2/X1 composition — semantic dedup with the TRANSITIVE-CLOSURE survivor
    // rule: within-cell cosine pairs feed the connected-component labeling
    // and ONE representative (min id) survives per semantic component —
    // the embedding-space analog of the text pipeline's pairs → clusters →
    // min-id keep. Complements x2_semantic_dedup's documented single-pass
    // rule; the oracle replays assignment, pairs, AND the component fixpoint
    // (recursive CTE).
    Q("x2_semantic_dedup_cc",
      (s, dir) => Similarity.semanticDedupComponents(rd(s, dir, "embeddings"), 32,
          new java.math.BigDecimal("0.400000"))
        .orderBy("vec_id"),
      Some("""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cnrm FROM s WHERE vec_id < 32),
        |sim AS (SELECT s.vec_id, c.cell,
        |  CAST(list_dot_product(s.v, c.cv) / (s.nrm * c.cnrm) AS DECIMAL(10,6)) AS csim
        |  FROM s CROSS JOIN c),
        |ranked AS (SELECT vec_id, cell,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS crk FROM sim),
        |assigned AS (SELECT r.vec_id, r.cell, s.v, s.nrm FROM ranked r
        |  JOIN s ON s.vec_id = r.vec_id WHERE r.crk = 1),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM assigned a JOIN assigned b
        |  ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE CAST(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS DECIMAL(10,6))
        |    >= CAST(0.4 AS DECIMAL(10,6))),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |r(vec_id, lab) AS (SELECT vec_id, vec_id FROM assigned
        |  UNION SELECT e.dst, r.lab FROM r JOIN edges e ON r.vec_id = e.src),
        |cl AS (SELECT vec_id, min(lab) AS cluster FROM r GROUP BY vec_id)
        |SELECT a.vec_id, a.cell, (cl.cluster = a.vec_id) AS keep
        |FROM assigned a JOIN cl ON cl.vec_id = a.vec_id
        |ORDER BY a.vec_id""".stripMargin)),


    // X2 — SemDeDup with the paper's SEQUENTIAL-GREEDY keep rule (third
    // keep-rule variant): members of each cell are visited in vec_id order
    // and kept iff no PREVIOUSLY-KEPT near-dup neighbour. The oracle
    // replays the sequential walk as a recursive CTE that steps through
    // each cell's members in rank order carrying the kept-id list.
    Q("x2_semantic_dedup_greedy",
      (s, dir) => Similarity.semanticDedupGreedy(rd(s, dir, "embeddings"), 32,
          new java.math.BigDecimal("0.400000"))
        .orderBy("vec_id"),
      Some("""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cnrm FROM s WHERE vec_id < 32),
        |sim AS (SELECT s.vec_id, c.cell,
        |  CAST(list_dot_product(s.v, c.cv) / (s.nrm * c.cnrm) AS DECIMAL(10,6)) AS csim
        |  FROM s CROSS JOIN c),
        |ranked AS (SELECT vec_id, cell,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS crk FROM sim),
        |assigned AS (SELECT r.vec_id, r.cell, s.v, s.nrm FROM ranked r
        |  JOIN s ON s.vec_id = r.vec_id WHERE r.crk = 1),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM assigned a JOIN assigned b
        |  ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE CAST(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS DECIMAL(10,6))
        |    >= CAST(0.4 AS DECIMAL(10,6))),
        |mem AS (SELECT cell, vec_id,
        |  row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS ord FROM assigned),
        |nb AS (SELECT id_b AS vec_id, list(id_a) AS lower_ids FROM pairs GROUP BY id_b),
        |g(cell, ord, kept) AS (
        |  SELECT cell, CAST(0 AS BIGINT), CAST([] AS BIGINT[]) FROM (SELECT DISTINCT cell FROM mem)
        |  UNION ALL
        |  SELECT g.cell, g.ord + 1,
        |    CASE WHEN len(list_intersect(coalesce(nb.lower_ids, []), g.kept)) > 0 THEN g.kept
        |         ELSE list_append(g.kept, m.vec_id) END
        |  FROM g JOIN mem m ON m.cell = g.cell AND m.ord = g.ord + 1
        |  LEFT JOIN nb ON nb.vec_id = m.vec_id),
        |fin AS (SELECT cell, kept FROM (SELECT cell, kept,
        |  row_number() OVER (PARTITION BY cell ORDER BY ord DESC) AS rr FROM g) WHERE rr = 1)
        |SELECT m.vec_id, m.cell, list_contains(f.kept, m.vec_id) AS keep
        |FROM mem m JOIN fin f USING (cell)
        |ORDER BY m.vec_id""".stripMargin)),


    // X4 — multimodal payload column: binary payload + typed metadata.
    Q("x4_multimodal_meta",
      (s, dir) => Multimodal.attachPayload(rd(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("mime"), length(col("payload")).as("n_bytes"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, 'text/plain' AS mime, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes " +
        "FROM documents ORDER BY doc_id")),


    // X4 — frame-sampling plumbing for video-like payloads: every 4th
    // 64-byte chunk becomes a frame row. The oracle re-derives the sampling
    // arithmetic (chunk indices, per-frame byte counts) from the payload
    // length — checking the explode shape without relying on engine blob
    // slicing functions.
    Q("x4_frame_sample",
      (s, dir) => Multimodal.sampleFrames(
          Multimodal.attachPayload(rd(s, dir, "documents"), "doc_id", "text"),
          chunkBytes = 64, everyK = 4)
        .select(col("doc_id"), col("frame_no"), length(col("frame")).as("frame_bytes"))
        .orderBy("doc_id", "frame_no"),
      Some("WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents), " +
        "f AS (SELECT doc_id, unnest(list_filter(range(0, n // 64 + 1), i -> i % 4 = 0)) AS i, n FROM m) " +
        "SELECT doc_id, CAST(i // 4 AS INTEGER) AS frame_no, " +
        "CAST(least(64, n - i * 64) AS INTEGER) AS frame_bytes " +
        "FROM f ORDER BY doc_id, frame_no")),


    // X4 — decode/feature-extract plumbing over binary payloads. The codec is
    // a STUB (no media libs offline) but a deterministic one: its pseudo-
    // dimensions are md5-derived integers of the payload bytes, so the oracle
    // re-derives them from the same bytes — verifying the payload flowed
    // through the mapPartitions batch path unchanged, not just the row count.
    Q("x4_decode_features",
      (s, dir) => Multimodal.decodeFeatures(
        Multimodal.attachPayload(rd(s, dir, "documents"), "doc_id", "text"))
        .toDF().select("doc_id", "mime", "n_bytes", "width", "height")
        .orderBy("doc_id"),
      Some("SELECT doc_id, 'text/plain' AS mime, " +
        "CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes, " +
        s"CAST(${duckHex("md5(text)")} % 640 AS INTEGER) AS width, " +
        s"CAST(${duckHex("md5(text)")} % 480 AS INTEGER) AS height " +
        "FROM documents ORDER BY doc_id")),


    // X4 — PERCEPTUAL image near-dup (Multimodal.imageDHashPairs): 64-bit
    // dHash (decode → integer luminance → hand-rolled 9×8 block-mean →
    // gradient sign bits) + 4×16-bit banding (pigeonhole-exact for
    // Hamming ≤ 3) + popcount verify — the operator that catches
    // re-encoded/edited duplicate images where byte hashing sees nothing.
    // The fixture PLANTS the truth: ids 2k and 2k+1 render the same base
    // image with a one-pixel perturbation on the odd id (bytes differ,
    // perception doesn't), distinct groups are perceptually far — so the
    // exact output is the planted pair list {(2k, 2k+1)}, an
    // SQL-expressible oracle even though pixels aren't SQL-reachable. Any
    // hash/banding/decode regression either drops a planted pair or
    // admits a cross-group one; both break the hash.
    Q("x4_image_dedup",
      (s, dir) => {
        val docs = rd(s, dir, "documents").filter(col("doc_id") < 200)
        Multimodal.imageDHashPairs(
            Multimodal.renderNearDupPngs(docs, "doc_id"), maxHamming = 3)
          .select("id_a", "id_b")
          .orderBy("id_a", "id_b")
      },
      Some("SELECT 2 * i AS id_a, 2 * i + 1 AS id_b FROM range(0, 100) t(i) ORDER BY 1, 2")),

    // X4 — PERCEPTUAL audio near-dup (Multimodal.audioFingerprintPairs):
    // the audio twin of x4_image_dedup, closing the image/audio asymmetry
    // (audio previously had only exact byte banding). A chromaprint-style
    // 64-bit fingerprint — WAV decode → 8×9 grid of integer block energies
    // → sign-of-difference bits (chromaprint's sign-of-band-energy-
    // difference structure with time-domain energies, so no FFT lib and no
    // float rounding) — then the same 4×16-bit pigeonhole band join +
    // popcount verify. The fixture PLANTS truth: ids 2k/2k+1 share PCM
    // with the odd id LSB-flipped every 101st sample (every byte-hash
    // window changes; block energies move < 1 unit), distinct groups are
    // pseudo-random-far — so the exact output is {(2k, 2k+1)} and any
    // decode/energy/banding regression breaks the hash.
    Q("x4_audio_dedup",
      (s, dir) => {
        val docs = rd(s, dir, "documents").filter(col("doc_id") < 200)
        Multimodal.audioFingerprintPairs(
            Multimodal.renderNearDupWavs(docs, "doc_id"), maxHamming = 3)
          .select("id_a", "id_b")
          .orderBy("id_a", "id_b")
      },
      Some("SELECT 2 * i AS id_a, 2 * i + 1 AS id_b FROM range(0, 100) t(i) ORDER BY 1, 2")),

    // X4 — REAL pixel decode through the JDK codec (javax.imageio): per doc,
    // a deterministic RGB image is rendered and encoded to REAL PNG bytes on
    // the executors, then decoded back by ImageIoDecoder and compared —
    // dimensions and the integer-luma histogram must match the source pixels
    // exactly (PNG is lossless; all feature arithmetic is integer until one
    // final division, so equality is exact). Pixel decoding has no DuckDB
    // replay, so the gate is quality-style like x2_ann_trained_recall: the
    // oracle pins the row (200 docs, all roundtrips ok) and any codec
    // breakage — wrong dimensions, channel order, color management mangling
    // pixels, dropped rows — flips the booleans or the count. The whole
    // render→encode→decode→compare chain is ONE map-side pass: payload
    // bytes never reach an exchange (plan-asserted in PlanSpec); the only
    // shuffle is the final scalar aggregate.
    Q("x4_real_decode",
      (s, dir) => {
        val docs = rd(s, dir, "documents").filter(col("doc_id") < 200)
        val media = Multimodal.renderPngs(docs, "doc_id")
        Multimodal.decodeVerify(media, Multimodal.ImageIoDecoder)
          .agg(count(lit(1)).as("n_docs"), expr("bool_and(ok)").as("all_ok"),
            sum(col("width").cast("long")).as("sum_width"))
          .select(col("n_docs"), col("all_ok"),
            (col("sum_width") === lit(2393L)).as("dims_ok"))
      },
      // sum of (8 + id % 9) over ids 0..199 = 2393 — pins the real decoded
      // dimensions, not just the per-row self-consistency booleans
      Some("SELECT 200 AS n_docs, true AS all_ok, true AS dims_ok")),


    // X4 — REAL audio decode (Multimodal.WavDecoder over javax.sound): the
    // audio twin of x4_real_decode. Executor-synthesized 16-bit mono PCM WAVs
    // roundtrip through an actual RIFF/PCM parse; PCM is lossless, so decoded
    // sample counts and absolute-amplitude sums match the rendered integers
    // exactly. sum of (256 + id % 128) over ids 0..199 = 61884 pins the real
    // decoded lengths; payload bytes never reach an exchange (one map-side
    // pass, only the final scalar aggregate shuffles).
    Q("x4_real_audio",
      (s, dir) => {
        val docs = rd(s, dir, "documents").filter(col("doc_id") < 200)
        val media = Multimodal.renderWavs(docs, "doc_id")
        Multimodal.decodeVerifyWav(media, Multimodal.WavDecoder)
          .agg(count(lit(1)).as("n_docs"), expr("bool_and(ok)").as("all_ok"),
            sum(col("n_samples").cast("long")).as("sum_samples"))
          .select(col("n_docs"), col("all_ok"),
            (col("sum_samples") === lit(61884L)).as("len_ok"))
      },
      Some("SELECT 200 AS n_docs, true AS all_ok, true AS len_ok")),


    // X4 — REAL multi-frame decode (Multimodal.GifFrameDecoder over the
    // JDK's animated-GIF reader): the video twin of x4_real_decode —
    // executor-rendered animated GIFs (2 + id%4 grayscale frames each)
    // roundtrip through a real frame-sequence parse; grayscale survives the
    // GIF palette losslessly, so every frame's dimensions and integer
    // luminance histogram must match the pre-encode pixels exactly. sum of
    // (2 + id % 4) over ids 0..199 = 700 pins the real decoded frame
    // counts; payload bytes never reach an exchange (spec-asserted).
    Q("x4_real_frames",
      (s, dir) => {
        val docs = rd(s, dir, "documents").filter(col("doc_id") < 200)
        val media = Multimodal.renderGifs(docs, "doc_id")
        Multimodal.decodeVerifyFrames(media, Multimodal.GifFrameDecoder)
          .agg(count(lit(1)).as("n_docs"), expr("bool_and(ok)").as("all_ok"),
            sum(col("n_frames").cast("long")).as("sum_frames"))
          .select(col("n_docs"), col("all_ok"),
            (col("sum_frames") === lit(700L)).as("frames_ok"))
      },
      Some("SELECT 200 AS n_docs, true AS all_ok, true AS frames_ok")),


    // X4 — resize plumbing for image-like payloads: deterministic byte-stride
    // downsample (STUB for a real resample — no image libs offline), then the
    // resized artifact is RE-DECODED through the same codec path, so the
    // oracle verifies the full bytes→resize→decode chain: it rebuilds the
    // downsampled bytes from the text and recomputes the md5-derived
    // pseudo-dimensions of the RESIZED payload.
    Q("x4_resize",
      (s, dir) => {
        val media = Multimodal.attachPayload(rd(s, dir, "documents"), "doc_id", "text")
        val resized = Multimodal.resizePayload(media, stride = 4)
        Multimodal.decodeFeatures(
            resized.select(col("doc_id"), col("mime"), col("resized").as("payload")))
          .toDF().select("doc_id", "n_bytes", "width", "height")
          .orderBy("doc_id")
      },
      Some {
        val ds = "array_to_string(list_transform(range(0, (length(text) + 3) // 4), " +
          "i -> substr(text, CAST(i * 4 + 1 AS INTEGER), 1)), '')"
        s"""WITH r AS (SELECT doc_id, $ds AS ds FROM documents)
          |SELECT doc_id, CAST(length(ds) AS INTEGER) AS n_bytes,
          |  CAST(${duckHex("md5(ds)")} % 640 AS INTEGER) AS width,
          |  CAST(${duckHex("md5(ds)")} % 480 AS INTEGER) AS height
          |FROM r ORDER BY doc_id""".stripMargin
      }),


    // X4 — perceptual-hash-style near-dup over payload BYTES: md5 band
    // hashes over fixed 64-byte windows, pairs = documents sharing at least
    // one aligned window (the image-dedup analog of SimHash banding; exact
    // recall for aligned-window sharing). Payload bytes never shuffle — only
    // (doc_id, band, hash) rows move. Oracle re-derives the same windows
    // from the text (payloads are its UTF-8 bytes; the corpus is ASCII so
    // byte and char offsets agree, which the oracle exploits — the ENGINE
    // side hashes real binary).
    Q("x4_band_dedup",
      (s, dir) => Multimodal.bandHashPairs(
          Multimodal.attachPayload(rd(s, dir, "documents"), "doc_id", "text"),
          windowBytes = 64, minMatch = 1)
        .orderBy("id_a", "id_b"),
      Some("""WITH f AS (SELECT doc_id, text, unnest(range(0, length(text) // 64)) AS band
        |  FROM documents WHERE length(text) >= 64),
        |w AS (SELECT doc_id, band, md5(substr(text, CAST(band * 64 + 1 AS INTEGER), 64)) AS bh FROM f),
        |p AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_match
        |  FROM w x JOIN w y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, n_match FROM p WHERE n_match >= 1 ORDER BY id_a, id_b""".stripMargin)),


    // X4/X2 — image-text JOINT row: payload-derived perceptual features
    // (the decoder's md5-derived width) bucket the corpus, a keyed join
    // attaches each document's caption embedding, and X2 similarity runs
    // within perceptual buckets only — cross-modal gating, the bucketed
    // equi-join shape (never all-pairs). Exercises decode → join → X2
    // composition over both modalities.
    Q("x4_joint_similarity",
      (s, dir) => {
        val docs = rd(s, dir, "documents")
        // Bucket-count rule (see Similarity.bucketedTopK): buckets scale
        // with the corpus — n/32 (floor 16), targeting ~32 docs per bucket,
        // so the within-bucket pair term stays LINEAR in corpus size, never
        // n²/constant. The docs.count() is the documented O(#partitions)
        // scalar probe. The bucket key folds the decoder's full md5-derived
        // (width, height) pair; the 479 multiplier (not 480) keeps width
        // live under small moduli (480 ≡ 0 mod 16 would erase it).
        val nBuckets = math.max(16L, docs.count() / 32)
        val media = Multimodal.decodeFeatures(
            Multimodal.attachPayload(docs, "doc_id", "text"))
          .toDF().select(col("doc_id"),
            pmod(col("width") * 479 + col("height"), lit(nBuckets)).cast("int").as("pbucket"))
        val joint = rd(s, dir, "embeddings")
          .join(media, col("vec_id") === col("doc_id"))
          .select(col("vec_id"), col("embedding"), col("pbucket"))
        strCols(Similarity.bucketedTopK(joint, "pbucket", 3).orderBy("id_a", "rk"), Seq("cos"))
      },
      Some(s"""WITH nb AS (SELECT greatest(16, count(*) // 32) AS n FROM documents),
        |m AS (SELECT doc_id, CAST(((${duckHex("md5(text)")} % 640) * 479 + (${duckHex("md5(text)")} % 480)) % (SELECT n FROM nb) AS INTEGER) AS pbucket FROM documents),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, m.pbucket
        |  FROM e JOIN m ON m.doc_id = e.vec_id),
        |scored AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS DECIMAL(10,6)) AS cos
        |  FROM s a JOIN s b ON a.pbucket = b.pbucket AND a.vec_id <> b.vec_id)
        |SELECT id_a, id_b, CAST(cos AS VARCHAR) AS cos, rk FROM (SELECT id_a, id_b, cos,
        |  CAST(row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS INTEGER) AS rk FROM scored)
        |WHERE rk <= 3 ORDER BY id_a, rk""".stripMargin)),
  )
}

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

/** Registry family: the integer-exact graph family (G1-G5) - ranks, propagation, triangles, components. See [[Queries]] for the assembled registry
  * and [[QuerySupport]] for the shared helpers/oracle fragments.
  */
private[graft] object QueriesGraph {
  val defs: Seq[Q] = Seq(

    // X8 — z-order (Morton) clustering value: interleave 16 bits of customer
    // key with 16 bits of a price bucket (totalprice/8 — a power-of-two
    // scale, so the double divide and floor are IEEE-exact in both engines).
    // Sorting/range-partitioning on zval is the multi-dimensional layout
    // optimization that lets file min/max statistics prune on EITHER
    // dimension of a 100 TB table. Pure integer bit arithmetic.
    // G1 — integer-exact PageRank (3 damped iterations) over the
    // bidirectional customer↔supplier transaction graph: the web-graph
    // quality signal (page importance) a curation pipeline joins against
    // documents before sampling. Ranks are 10^-12-scale integers and every
    // division floors, so the fixed-point prefix — including the
    // deterministic floor-shaved mass — replays bit-for-bit in DuckDB
    // (float PageRank cannot: summation order moves the ranking). The
    // oracle unrolls the same three iterations as CTEs.
    Q("g1_pagerank",
      (s, dir) => {
        val pairs = rd(s, dir, "orders").select("o_orderkey", "o_custkey")
          .join(rd(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("cust"), (col("l_suppkey") + 1000000L).as("supp"))
        val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
          .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
        graft.operators.ext.Graph.pageRank(edges, "src", "dst", 3)
          .orderBy(col("rank").desc, col("node")).limit(100)
      },
      Some {
        val base = s"(150 * (${graft.operators.ext.Graph.Scale} // n)) // 1000"
        def iter(i: Int): String =
          s"""c$i AS (SELECT e.dst AS node, sum(r${i - 1}.rank // od.outdeg) AS inmass
            |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node JOIN od ON e.src = od.node GROUP BY 1),
            |r$i AS (SELECT nodes.node, $base + (850 * coalesce(inmass, 0)) // 1000 AS rank
            |  FROM nodes CROSS JOIN nn LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin
        s"""WITH p AS (SELECT o_custkey AS cust, l_suppkey + 1000000 AS supp
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |e AS (SELECT cust AS src, supp AS dst FROM p UNION ALL SELECT supp, cust FROM p),
          |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |nn AS (SELECT count(*) AS n FROM nodes),
          |od AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY 1),
          |r0 AS (SELECT node, ${graft.operators.ext.Graph.Scale} // n AS rank FROM nodes CROSS JOIN nn),
          |${iter(1)},
          |${iter(2)},
          |${iter(3)}
          |SELECT node, CAST(rank AS BIGINT) AS rank FROM r3
          |ORDER BY rank DESC, node LIMIT 100""".stripMargin
      }),


    // G2 — TrustRank (seeded PageRank): all restart mass starts on a small
    // trusted seed set (suppliers 1-10) and the damped walk spreads trust
    // along transaction links — the anti-spam corpus-quality signal
    // (Gyöngyi et al., VLDB'04): nodes reachable only far from seeds stay
    // near zero however densely they interlink. Same floor-division
    // integer discipline as g1_pagerank; the oracle unrolls the seeded
    // iterations.
    Q("g2_trustrank",
      (s, dir) => {
        val pairs = rd(s, dir, "orders").select("o_orderkey", "o_custkey")
          .join(rd(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("cust"), (col("l_suppkey") + 1000000L).as("supp"))
        val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
          .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
        val seeds = rd(s, dir, "supplier").filter(col("s_suppkey") <= 10)
          .select((col("s_suppkey") + 1000000L).as("node"))
        graft.operators.ext.Graph.trustRank(edges, "src", "dst", seeds, "node", 3)
          .orderBy(col("rank").desc, col("node")).limit(100)
      },
      Some {
        val sc = graft.operators.ext.Graph.Scale
        def iter(i: Int): String =
          s"""c$i AS (SELECT e.dst AS node, sum(r${i - 1}.rank // od.outdeg) AS inmass
            |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node JOIN od ON e.src = od.node GROUP BY 1),
            |r$i AS (SELECT b.node, b.b + (850 * coalesce(inmass, 0)) // 1000 AS rank
            |  FROM b LEFT JOIN c$i ON b.node = c$i.node)""".stripMargin
        s"""WITH p AS (SELECT o_custkey AS cust, l_suppkey + 1000000 AS supp
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |e AS (SELECT cust AS src, supp AS dst FROM p UNION ALL SELECT supp, cust FROM p),
          |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |seeds AS (SELECT s_suppkey + 1000000 AS node FROM supplier WHERE s_suppkey <= 10),
          |ss AS (SELECT count(*) AS s FROM seeds),
          |od AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY 1),
          |r0 AS (SELECT nodes.node, CASE WHEN seeds.node IS NOT NULL THEN $sc // s ELSE 0 END AS rank
          |  FROM nodes CROSS JOIN ss LEFT JOIN seeds ON nodes.node = seeds.node),
          |b AS (SELECT nodes.node, CASE WHEN seeds.node IS NOT NULL THEN (150 * ($sc // s)) // 1000 ELSE 0 END AS b
          |  FROM nodes CROSS JOIN ss LEFT JOIN seeds ON nodes.node = seeds.node),
          |${iter(1)},
          |${iter(2)},
          |${iter(3)}
          |SELECT node, CAST(rank AS BIGINT) AS rank FROM r3
          |ORDER BY rank DESC, node LIMIT 100""".stripMargin
      }),


    // G4 — exact triangle counting over the part co-purchase graph (parts
    // sharing an order connect; orders bound the per-order pair fan-out):
    // canonicalized undirected edges, ordered-wedge enumeration x<y<z
    // closed by a left-semi probe — every triangle exactly once, no
    // post-dedup. The co-occurrence-graph construction is itself the
    // market-basket pattern. Corpus bounded to l_orderkey < 2000 so the
    // row costs the same at every scale factor.
    Q("g4_triangles",
      (s, dir) => {
        val li = rd(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
          .select("l_orderkey", "l_partkey")
        val edges = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
        graft.operators.ext.Graph.triangleCount(edges, "src", "dst")
      },
      Some("""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey < 2000),
        |raw AS (SELECT x.l_partkey AS src, y.l_partkey AS dst FROM li x JOIN li y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM raw WHERE src <> dst),
        |w AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 JOIN e e2 ON e1.b = e2.a),
        |t AS (SELECT * FROM w WHERE EXISTS (SELECT 1 FROM e WHERE e.a = w.x AND e.b = w.z))
        |SELECT (SELECT count(*) FROM e) AS n_edges,
        |  (SELECT count(*) FROM w) AS n_wedges,
        |  (SELECT count(*) FROM t) AS n_triangles""".stripMargin)),


    // G4b — DEGREE-ORIENTED triangle counting (Graph.triangleCountDegree)
    // over the same co-purchase graph: edges orient low-(degree, id) →
    // high, wedges enumerate as ordered out-neighbor pairs, capping every
    // node's out-degree at O(sqrt|E|) — the Σdeg² hub-term cut production
    // power-law graphs need. Triangle count must equal g4_triangles
    // bit-for-bit (the orientation changes WORK, never the answer);
    // n_wedges is the oriented wedge mass, the quantity the refinement
    // shrinks (ProfileGraph --triangles measures the cut on a hub graph).
    Q("g4_triangles_degree",
      (s, dir) => {
        val li = rd(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
          .select("l_orderkey", "l_partkey")
        val edges = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
        graft.operators.ext.Graph.triangleCountDegree(edges, "src", "dst")
      },
      Some("""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey < 2000),
        |raw AS (SELECT x.l_partkey AS src, y.l_partkey AS dst FROM li x JOIN li y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM raw WHERE src <> dst),
        |deg AS (SELECT node, count(*) AS deg FROM
        |  (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |o AS (SELECT CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.a ELSE e.b END AS src,
        |  CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.b ELSE e.a END AS dst,
        |  CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN db.deg ELSE da.deg END AS kdeg
        |  FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b),
        |w AS (SELECT o1.dst AS x, o2.dst AS z FROM o o1 JOIN o o2
        |  ON o1.src = o2.src AND (o1.kdeg, o1.dst) < (o2.kdeg, o2.dst)),
        |t AS (SELECT * FROM w WHERE EXISTS (SELECT 1 FROM o WHERE o.src = w.x AND o.dst = w.z))
        |SELECT (SELECT count(*) FROM e) AS n_edges,
        |  (SELECT count(*) FROM w) AS n_wedges,
        |  (SELECT count(*) FROM t) AS n_triangles""".stripMargin)),


    // G5 — connected components over the part co-purchase graph: the X1
    // cluster machinery (union-find contraction → finish | quotient
    // recursion) reused as the graph family's component labeler — same
    // code path, different graph, proving the operator is general. Node
    // universe = parts appearing in the bounded order slice; label = min
    // node id per component; the oracle replays the fixpoint recursively.
    Q("g5_components",
      (s, dir) => {
        val li = rd(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
          .select("l_orderkey", "l_partkey")
        val edges = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("id_a"), col("y.l_partkey").as("id_b"))
        val nodes = li.select(col("l_partkey").as("node")).distinct()
        graft.operators.ext.Dedup.dedupClusters(nodes, "node", edges)
          .select(col("doc_id").as("node"), col("cluster").as("component"))
          .orderBy("node")
      },
      Some("""WITH RECURSIVE li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey < 2000),
        |raw AS (SELECT x.l_partkey AS src, y.l_partkey AS dst FROM li x JOIN li y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |e AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
        |nodes AS (SELECT DISTINCT l_partkey AS node FROM li),
        |r(node, lab) AS (SELECT node, node FROM nodes
        |  UNION SELECT e.dst, r.lab FROM r JOIN e ON r.node = e.src)
        |SELECT node, min(lab) AS component FROM r GROUP BY node ORDER BY node""".stripMargin)),


    // G3 — deterministic label propagation: suppliers 1-10 carry their
    // nation as a hand-reviewed label; three majority-vote iterations
    // spread labels across the transaction graph (ties -> smallest label,
    // seeds clamped). The (count DESC, label ASC) argmax is a total order,
    // so the converged assignment — including which nodes stay unlabeled —
    // replays exactly; the oracle unrolls the same three votes.
    Q("g3_label_prop",
      (s, dir) => {
        val pairs = rd(s, dir, "orders").select("o_orderkey", "o_custkey")
          .join(rd(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("cust"), (col("l_suppkey") + 1000000L).as("supp"))
        val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
          .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
        val seeds = rd(s, dir, "supplier").filter(col("s_suppkey") <= 10)
          .select((col("s_suppkey") + 1000000L).as("node"),
            col("s_nationkey").cast("long").as("lab"))
        graft.operators.ext.Graph
          .labelPropagate(edges, "src", "dst", seeds, "node", "lab", 3)
          .orderBy("node")
      },
      Some {
        def iter(i: Int): String =
          s"""v$i AS (SELECT e.dst AS node, l${i - 1}.label, count(*) AS n
            |  FROM e JOIN l${i - 1} ON e.src = l${i - 1}.node WHERE l${i - 1}.label IS NOT NULL GROUP BY 1, 2),
            |m$i AS (SELECT node, label AS maj FROM
            |  (SELECT *, row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rk FROM v$i) WHERE rk = 1),
            |l$i AS (SELECT l${i - 1}.node, coalesce(sd.lab, m$i.maj, l${i - 1}.label) AS label
            |  FROM l${i - 1} LEFT JOIN m$i ON l${i - 1}.node = m$i.node LEFT JOIN sd ON l${i - 1}.node = sd.node)""".stripMargin
        s"""WITH p AS (SELECT o_custkey AS cust, l_suppkey + 1000000 AS supp
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |e AS (SELECT cust AS src, supp AS dst FROM p UNION ALL SELECT supp, cust FROM p),
          |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |sd AS (SELECT s_suppkey + 1000000 AS node, CAST(s_nationkey AS BIGINT) AS lab
          |  FROM supplier WHERE s_suppkey <= 10),
          |l0 AS (SELECT nodes.node, sd.lab AS label FROM nodes LEFT JOIN sd ON nodes.node = sd.node),
          |${iter(1)},
          |${iter(2)},
          |${iter(3)}
          |SELECT node, label FROM l3 ORDER BY node""".stripMargin
      }),
  )
}

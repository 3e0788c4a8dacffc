package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import QuerySupport.Q

/** The declared query registry: one entry per SURVEY.md operator row, each
  * with DuckDB-equivalent oracle SQL where SQL-expressible, split by family
  * (Queries*.scala) behind this single facade. Determinism rules
  * (SURVEY.md 7.4) hold for every query: explicit as-of date, row_number
  * over total orders, a trailing total-order orderBy, decimals fixed-point
  * on both sides, token hashes md5-derived.
  */
object Queries {

  val defs: Seq[Q] = QueriesMedallionIo.defs ++
    QueriesRelational.defs ++
    QueriesStreaming.defs ++
    QueriesText.defs ++
    QueriesDedup.defs ++
    QueriesSimilarity.defs ++
    QueriesCuration.defs ++
    QueriesCapstones.defs ++
    QueriesGraph.defs

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  val oracles: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

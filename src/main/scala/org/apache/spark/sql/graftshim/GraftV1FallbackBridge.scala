package org.apache.spark.sql.graftshim

import org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** Public re-export of Spark's `private[sql]` [[V2TableWithV1Fallback]] —
  * the trait the analyzer checks to give a DSv2 catalog table a V1
  * STREAMING fallback (`spark.readStream.table(...)` resolves onto the
  * table's declared v1 provider). Delta's DeltaTableV2 extends the trait
  * directly by living under `org.apache.spark.sql.delta`; this one-line
  * bridge is the same access pattern without squatting a Spark-looking
  * package for the actual table class.
  */
trait GraftV1FallbackBridge extends V2TableWithV1Fallback

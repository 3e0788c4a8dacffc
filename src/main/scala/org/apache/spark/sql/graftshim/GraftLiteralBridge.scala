package org.apache.spark.sql.graftshim

import org.apache.spark.sql.connector.expressions.{Literal, LiteralValue}
import org.apache.spark.sql.types.DataType

/** Public re-export of Spark's `private[sql]` [[LiteralValue]] factory —
  * the DSv2 `ColumnDefaultValue` constructor needs a connector `Literal`
  * carrying an explicit data type, and the only public factory
  * (`Expressions.literal`) infers the type from the JVM value, which is
  * wrong for internal-form values (UTF8String, epoch days). Same access
  * pattern as [[GraftV1FallbackBridge]].
  */
object GraftLiteralBridge {
  def literal(value: Any, dataType: DataType): Literal[_] =
    LiteralValue(value, dataType)
}

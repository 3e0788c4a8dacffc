package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.ext.Sketches

/** Native single-pass HyperLogLog aggregate (SURVEY.md §2.10: the custom
  * UDAF/Aggregator surface, expressed as a real Catalyst
  * TypedImperativeAggregate rather than a Scala UDAF).
  *
  * Computes the identical estimate to the two-level composed form in
  * [[graft.operators.ext.Sketches]] (same md5-derived 32-bit hash, same
  * bucket/rank integer math, same power-of-two harmonic sum — exact in IEEE
  * double at any merge order), so it shares the same DuckDB oracle SQL.
  *
  * 100 TB design: where the composed form shuffles one row per observed
  * bucket (after map-side combine), this aggregate's entire state is a
  * 2^p-byte rank array that partial-aggregates on the map side and merges
  * elementwise — the canonical mergeable-sketch shape. One pass, one tiny
  * state per partition, no row-level data movement at all.
  */
case class PortableHllAgg(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  private val m = 1 << p
  private val w = 32 - p

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_hll expects a string argument (cast first), got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "portable_hll"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val hex = PortableHllAgg.md5Hex(bytes)
      // integer value of the first 8 md5 hex digits — the same 32-bit hash
      // as conv(substring(md5(x),1,8),16,10) in Sketches.hllBuckets
      val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val bucket = (h % m).toInt
      val rest = h / m
      val rank = if (rest == 0L) w + 1
                 else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var nb = 0
    var sObs = 0.0
    var i = 0
    while (i < m) {
      if (buf(i) != 0) { nb += 1; sObs += math.pow(2.0, -buf(i)) }
      i += 1
    }
    math.floor(Sketches.alphaTimesM2(p) / (sObs + (m - nb)) * 10000).toLong
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): PortableHllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PortableHllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PortableHllAgg =
    copy(child = newChild)
}

object PortableHllAgg {
  private val digest = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex md5, identical to Spark's md5() / DuckDB's md5(). */
  def md5Hex(bytes: Array[Byte]): String = {
    val d = digest.get()
    d.reset()
    val out = d.digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < out.length) {
      sb.append(hexChars((out(i) >> 4) & 0xf)).append(hexChars(out(i) & 0xf))
      i += 1
    }
    sb.toString
  }
}

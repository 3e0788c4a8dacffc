package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Hilbert-curve distance of a k-dimensional cell — the locality curve
  * behind Databricks liquid clustering and the classic alternative to the
  * Morton/z-order interleave. Unlike Morton, consecutive Hilbert indices
  * are always GRID NEIGHBORS (one step in exactly one dimension — no seam
  * jumps at power-of-two boundaries), so a range-partitioned rewrite by
  * Hilbert distance gives each output file a tighter bounding box per
  * dimension, hence better per-file min/max pruning on every axis.
  *
  * Encoding is John Skilling's public-domain transpose algorithm
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004):
  * inverse-undo the excess-work bits, Gray-encode across dimensions, then
  * read the distance off the transposed coordinates MSB-first. Pure
  * integer bit logic — deterministic cross-engine, no floating point.
  */
object HilbertCurve {
  /** Hilbert distance of cell `x0` (each coordinate in [0, 2^bits)),
    * first dimension most significant. `x0` is not mutated; the result
    * fits in dims*bits bits (≤ 60 for the clustering use: ≤ 6 dims × 10
    * bits).
    */
  def compute(x0: Array[Long], bits: Int): Long = {
    val n = x0.length
    val x = java.util.Arrays.copyOf(x0, n)
    // inverse undo of the excess work (Skilling, from the top bit down)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose -> distance: bit j of every coordinate interleaves,
    // MSB-first, first dimension most significant within each group
    var h = 0L
    var j = bits - 1
    while (j >= 0) {
      var d = 0
      while (d < n) { h = (h << 1) | ((x(d) >> j) & 1L); d += 1 }
      j -= 1
    }
    h
  }
}

/** `hilbert_index(array(c1, ..., ck))`: the Hilbert distance of 2..6
  * bucketized long coordinates, each pre-scaled by the caller into
  * [0, 1024) — the same 10-bit rank scaling the Morton path uses.
  * Codegen'd via the reference-object pattern (one static-shaped call per
  * row, zero reflection). A NULL coordinate clusters as bucket 0 — the
  * Hilbert analogue of NULLS FIRST under a range partition.
  */
case class HilbertIndex(child: Expression) extends UnaryExpression {
  private val bits = 10

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects array<bigint>, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    require(n >= 2 && n <= 6, s"hilbert_index takes 2..6 coordinates, got $n")
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) {
      arr(i) = if (a.isNullAt(i)) 0L else a.getLong(i)
      i += 1
    }
    HilbertCurve.compute(arr, bits)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hilbertIndex", this, classOf[HilbertIndex].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

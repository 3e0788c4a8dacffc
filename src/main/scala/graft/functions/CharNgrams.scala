package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native generator (UDTF surface, SURVEY.md §2.10): sliding character
  * n-grams of a string column as (pos, ngram) rows — the shingling primitive
  * behind fingerprinting and character-level near-dup.
  *
  * The composed built-in form materializes an intermediate array per row
  * (`explode(transform(sequence(1, length-n+1), i -> substring(s, i, n)))`)
  * — for a 10 kB document that is one ~10k-element array of small strings
  * allocated and serialized per row before the explode even starts. A native
  * Generator emits rows lazily straight out of the UTF8String buffer: no
  * intermediate array, no per-element lambda dispatch, and the downstream
  * pipeline (usually an aggregate) consumes each row as it is produced.
  *
  * `pos` is 1-based (SQL substring convention). Rows whose string is null or
  * shorter than `n` generate nothing. `n` must be a foldable positive
  * integer — it shapes every output row, so a per-row n would make the
  * operator's output schema data-dependent.
  */
case class CharNgrams(child: Expression, nExpr: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)
  override def prettyName: String = "char_ngrams"

  private lazy val n: Int = nExpr.eval(InternalRow.empty) match {
    case i: java.lang.Integer => i.intValue()
    case other => throw new IllegalArgumentException(
      s"char_ngrams: n must evaluate to an integer, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"char_ngrams expects a string column, got ${child.dataType}")
    else if (nExpr.dataType != IntegerType || !nExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"char_ngrams expects a foldable integer n, got ${nExpr.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null || n <= 0) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String]
      val len = s.numChars()
      if (len < n) Iterator.empty
      // substringSQL is 1-based and codepoint-aware, matching SQL substr on
      // both engines; the iterator is lazy — GenerateExec pulls one row at a
      // time, so no per-document materialization ever happens.
      else (1 to len - n + 1).iterator.map { p =>
        InternalRow(p, s.substringSQL(p, n))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), nExpr = newChildren(1))
}

package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Generator (UDTF extension point): emit each DISTINCT word-level
  * n-gram shingle of a token array as one output row.
  *
  * Functionally identical to `explode(array_distinct(transform(...)))`
  * (`Dedup.shingles`) but one pass over the tokens with an O(1) per-shingle
  * hash-set dedup — no intermediate shingle array, no O(k²) array_distinct,
  * and one expression node instead of an interpreted higher-order-function
  * tree. Also immune by construction to the InferFiltersFromGenerate
  * pushdown trap the HOF formulation has to dodge (the rule only infers
  * size>0 filters for the built-in explode family).
  *
  * Completes the engine's Catalyst extension-point tour: scalar Expression
  * with codegen (FloatDotProduct), typed Aggregator (TopK), whole-operator
  * plan (AsOfJoin), optimizer Rule, SparkSessionExtensions, DataSource V2
  * (ChangelogSource) — and now a Generator.
  */
case class ShingleExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_explode requires array<string>, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) return Iterator.empty
    val len = arr.numElements()
    val sep = ShingleExplode.separator
    val seen = new java.util.HashSet[UTF8String]()
    val rows = new ArrayBuffer[InternalRow](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        // null tokens are skipped by concatWs — same as concat_ws in the
        // HOF formulation
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(sep, parts: _*)
      if (seen.add(s)) rows += InternalRow(s)
      i += 1
    }
    rows
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleExplode =
    copy(child = newChild)
}

object ShingleExplode {
  /** Shared immutable separator — allocated once, not per input row. */
  val separator: UTF8String = UTF8String.fromString(" ")
}

object ShingleFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: one output row per distinct n-gram shingle of `toks`.
    * Unlike the HOF formulation, an inline `split(...)` argument is fine
    * here: the generator evaluates its child exactly once per row. */
  def shingle_explode(toks: Column, n: Int): Column =
    ColumnBridge.column(ShingleExplode(ColumnBridge.expression(toks), n))
}

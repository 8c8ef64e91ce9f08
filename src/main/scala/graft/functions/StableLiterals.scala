package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** A long constant rendered through the codegen REFERENCE array instead of
  * an inlined Java source literal.
  *
  * Why it exists (guide §1.2 "per-task work", VERDICT r20 next #2): Spark
  * inlines primitive literals into generated sources (`Literal.doGenCode`
  * emits `42L` for a `LongType`), and the whole-stage/projection compile
  * cache is keyed on the SOURCE TEXT — so a per-epoch `lit(batchId)` seq
  * stamp makes every epoch's otherwise-identical delta plan a brand-new
  * Janino compilation. Every multi-batch maintained pass (truncate,
  * stateful, update_by_query, txn/apply streams, the bidi join MV) paid a
  * full recompile of every delta stage per epoch. Routing the constant
  * through `references` (the path Spark itself uses for strings, decimals
  * and intervals) makes the generated source EPOCH-STABLE: the first epoch
  * compiles, later epochs hit the cache and only swap the reference value.
  *
  * `foldable = false` is the load-bearing bit: a foldable wrapper would be
  * constant-folded straight back into an inlined `Literal` by the
  * optimizer. The expression stays deterministic (safe under retries and
  * reorderings) and fully codegen'd (no interpreted fallback in the hot
  * path). Trade-off, disclosed: a non-foldable seq stamp cannot
  * constant-fold or push into scans — irrelevant at its call sites, which
  * only PROJECT the stamp onto derived-event frames (never filter on it).
  */
case class StableLongLiteral(value: Long) extends LeafExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stableLong", java.lang.Long.valueOf(value),
      "java.lang.Long")
    ExprCode.forNonNullValue(JavaCode.expression(s"$ref.longValue()", LongType))
  }
  override def prettyName: String = "stable_long"
}

object StableLiterals {
  /** The epoch-stable rendering of `lit(v: Long)` for per-batch seq stamps. */
  def stableLit(v: Long): Column = ColumnBridge.column(StableLongLiteral(v))
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN — the temporal operator Spark lacks (SURVEY.md §7.4 path (c):
  * custom `LogicalPlan` + `Strategy` + `SparkPlan`). For every left row, the
  * single right row with the same key and the greatest ordinal ≤ the left
  * ordinal — "the state that was current when this event happened", the
  * natural lookup against a CDC version history (reference semantics: each
  * event applies to the version of the document current at its WAL position).
  *
  * Physical execution is a co-partitioned streaming merge: both sides hash
  * to the key (`requiredChildDistribution`) and sort by (key, ord)
  * (`requiredChildOrdering` — Spark inserts the exchanges/sorts), then one
  * forward pass per partition with O(1) state (the last matching right
  * row). No buffering of either side, no pair blow-up: at 100 TB this costs
  * exactly one shuffle per side — the same as any equi-join — regardless of
  * how many versions precede each event.
  *
  * v1 restriction: key and ordinal expressions must be LongType (the CDC
  * id/seq shape); both inputs must be distinct plans (no self-join aliasing).
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftOrd: Expression, rightOrd: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftOrd: Expression, rightOrd: Expression,
    override val output: Seq[Attribute]) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftOrd, Ascending)) ::
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightOrd, Ascending)) :: Nil

  override def outputPartitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val nRight = right.output.size
    val leftOut = left.output
    val rightOut = right.output
    val lk = BindReferences.bindReference(leftKey, leftOut)
    val lo = BindReferences.bindReference(leftOrd, leftOut)
    val rk = BindReferences.bindReference(rightKey, rightOut)
    val ro = BindReferences.bindReference(rightOrd, rightOut)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIt.buffered
      var lastKey = 0L
      var hasLast = false
      var lastMatch: InternalRow = null

      lIt.map { l =>
        // SQL join semantics: NULL keys/ordinals match nothing (a bare
        // asInstanceOf would silently unbox null to 0L and match key 0)
        val curKeyRaw = lk.eval(l)
        val curOrdRaw = lo.eval(l)
        if (curKeyRaw == null || curOrdRaw == null) {
          proj(joined(l, nullRight))
        } else {
          val curKey = curKeyRaw.asInstanceOf[Long]
          val curOrd = curOrdRaw.asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val hkRaw = rk.eval(head)
            val hoRaw = ro.eval(head)
            if (hkRaw == null || hoRaw == null) {
              rBuf.next() // null-keyed versions can never match (nulls sort first)
            } else {
              val hk = hkRaw.asInstanceOf[Long]
              val ho = hoRaw.asInstanceOf[Long]
              if (hk < curKey || (hk == curKey && ho <= curOrd)) {
                val r = rBuf.next()
                lastKey = hk
                lastMatch = r.copy() // unsafe rows are reused by the child
                hasLast = true
              } else advance = false
            }
          }
          val rSide = if (hasLast && lastKey == curKey) lastMatch else nullRight
          proj(joined(l, rSide))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lo, ro) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lo, ro, plan.output) :: Nil
    case _ => Nil
  }
}

/** Catalyst stops predicate pushdown at nodes it doesn't know, so a filter
  * written above an as-of join would otherwise run after the shuffle. This
  * rule pushes left-side-only conjuncts into the left child (pushing right-
  * side predicates would be wrong: dropping old versions can change which
  * version is "latest ≤ ord" — they stay put), after which the planner's
  * normal scan pushdown carries them into the parquet reader. */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinNode) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOf {
  /** left AS-OF join right on key, right.ord ≤ left.ord, latest right wins;
    * unmatched left rows keep nulls on the right side. Key/ord must be
    * LongType columns of the respective inputs. */
  def join(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftOrd: Column, rightOrd: Column): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin)) {
      spark.experimental.extraOptimizations =
        PushFilterThroughAsOfJoin +: spark.experimental.extraOptimizations
    }
    def check(c: Column, df: DataFrame, what: String): Expression = {
      val e = ColumnBridge.expression(c)
      require(e.resolved, s"$what must be a resolved column of its input")
      require(e.dataType == LongType, s"$what must be LongType, got ${e.dataType}")
      e
    }
    val node = AsOfJoinNode(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      check(leftKey, left, "leftKey"), check(rightKey, right, "rightKey"),
      check(leftOrd, left, "leftOrd"), check(rightOrd, right, "rightOrd"))
    ColumnBridge.ofRows(spark, node)
  }
}

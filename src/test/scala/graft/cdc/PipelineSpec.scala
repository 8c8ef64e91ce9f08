package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The composed pipeline: ONE DSv2 source→sink pass maintains state + MV +
  * join-MV + secondary index together; each output must equal its
  * independently-computed batch counterpart. */
class PipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def assertSame(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    assert(a.count() === b.count())
  }

  test("one composed pass maintains state, both MVs, and the index correctly") {
    val cl = Changelog.fromOrders(spark, sfDir)
    val state = Apply.latestState(cl, Changelog.payloadCols)

    // keyed state of the composed pass = the batch apply
    assertSame(Pipeline.qState(spark, sfDir), state.orderBy($"o_orderkey"))

    // per-status MV = re-aggregation of the applied state
    assertSame(Pipeline.qMv(spark, sfDir),
      state.groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice".cast("decimal(18,4)")), 2)
            .cast("double").as("sum_value")))

    // join-MV = applied state ⋈ customer, re-aggregated
    val dim = graft.model.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment")
    assertSame(Pipeline.qMvJoin(spark, sfDir),
      state.join(dim, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice".cast("decimal(18,4)")), 2)
            .cast("double").as("sum_value")))

    // secondary index = the live state's (status, key) pairs
    assertSame(Pipeline.qIndex(spark, sfDir),
      state.select($"o_orderstatus", $"o_orderkey"))

    // customer view of the SAME multi-table pass = the seg-move changelog
    // applied (the reference's per-table dispatch as a filter)
    val cstate = Apply.latestState(Changelog.fromCustomerSegMove(spark, sfDir),
      Changelog.customerPayloadCols)
    assertSame(Pipeline.qCustomerState(spark, sfDir),
      cstate.orderBy($"c_custkey"))

    // bidirectional join-MV of the same pass = BOTH applied states joined
    // and re-aggregated (segment moves re-attributed, deletes retracted)
    assertSame(Pipeline.qMvJoinBidi(spark, sfDir),
      state.join(cstate, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice".cast("decimal(18,4)")), 2)
            .cast("double").as("sum_value")))

    // and the pass really was shared: a second view does not re-stream
    // (memoized run handed back the same directories)
    val d1 = Pipeline.runFull(spark, sfDir)
    val d2 = Pipeline.runFull(spark, sfDir)
    assert(d1 eq d2)
  }

  test("TRUNCATE through the composed pass keeps the MV and index coherent") {
    val truncState = Apply.truncateApply(
      Changelog.fromOrdersTruncate(spark, sfDir), Changelog.payloadCols)
    // the coherence gate passes (and therefore equals the truncated state):
    // a stale index entry would inject a null-padded row, a missing one
    // would drop a state row
    assertSame(Pipeline.qTruncateCoherent(spark, sfDir),
      truncState.orderBy($"o_orderkey"))
    // the maintained MV debited every truncated contribution
    assertSame(Pipeline.qTruncateMv(spark, sfDir),
      truncState.groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice".cast("decimal(18,4)")), 2)
            .cast("double").as("sum_value")))
  }
}

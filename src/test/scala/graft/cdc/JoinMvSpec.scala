package graft.cdc

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Bidirectional join-MV: per-key replace must handle order churn, segment
  * moves, customer deletes, and orders arriving before their customer. */
class JoinMvSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("segment moves re-attribute, deletes retract, early orders park") {
    val work = Files.createTempDirectory("graft-joinmv-").toString
    val (st, agg, seg, mv) =
      (s"$work/state", s"$work/agg", s"$work/seg", s"$work/mv")
    def mk(rows: (Long, Long, String, String, Option[Long], Option[Double], Option[String])*) =
      rows.toDF("id", "seq", "op", "table", "o_custkey", "o_totalprice", "c_mktsegment")
    def readMv() = Materialize.readMv(spark, mv)
      .select($"c_mktsegment", $"n", $"s".cast("double"))
      .orderBy($"c_mktsegment")
      .as[(String, Long, Double)].collect().toSeq

    // b0: two orders for customer 7 BEFORE it exists; customer 8 + an order
    JoinMv.maintainBatch(mk(
      (101L, 1L, "INSERT", "orders", Some(7L), Some(100.0), None),
      (102L, 2L, "INSERT", "orders", Some(7L), Some(50.0), None),
      (8L, 3L, "INSERT", "customer", None, None, Some("A")),
      (103L, 4L, "INSERT", "orders", Some(8L), Some(10.0), None)),
      0L, st, agg, seg, mv)
    assert(readMv() === Seq(("A", 1L, 10.0))) // cust 7's orders park in A(7)

    // b1: customer 7 arrives in segment B → its parked orders attribute
    JoinMv.maintainBatch(mk(
      (7L, 5L, "INSERT", "customer", None, None, Some("B"))),
      1L, st, agg, seg, mv)
    assert(readMv() === Seq(("A", 1L, 10.0), ("B", 2L, 150.0)))

    // b2: customer 7 MOVES to segment A → whole history re-attributes
    JoinMv.maintainBatch(mk(
      (7L, 6L, "UPDATE", "customer", None, None, Some("A"))),
      2L, st, agg, seg, mv)
    assert(readMv() === Seq(("A", 3L, 160.0)))

    // b3: one of customer 7's orders is deleted
    JoinMv.maintainBatch(mk(
      (102L, 7L, "DELETE", "orders", Some(7L), Some(50.0), None)),
      3L, st, agg, seg, mv)
    assert(readMv() === Seq(("A", 2L, 110.0)))

    // b4: customer 8 is deleted → its revenue retracts
    JoinMv.maintainBatch(mk(
      (8L, 8L, "DELETE", "customer", None, None, Some("A"))),
      4L, st, agg, seg, mv)
    assert(readMv() === Seq(("A", 1L, 100.0)))

    // replaying the last batch changes nothing (MV fence + agg fence +
    // idempotent merges)
    JoinMv.maintainBatch(mk(
      (8L, 8L, "DELETE", "customer", None, None, Some("A"))),
      4L, st, agg, seg, mv)
    assert(readMv() === Seq(("A", 1L, 100.0)))

    // end-to-end at fixture scale: streamed MV equals the two applied
    // states joined and re-aggregated
    val streamed = JoinMv.qMvJoinBidi(spark, sfDir)
    val ostate = Apply.latestState(Changelog.fromOrders(spark, sfDir),
      Changelog.payloadCols)
    val cstate = Apply.latestState(Changelog.fromCustomerSegMove(spark, sfDir),
      Changelog.customerPayloadCols)
    val expected = ostate.join(cstate, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast("decimal(18,4)")), 2)
          .cast("double").as("sum_value"))
    assert(streamed.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(streamed).count() === 0)
  }
}

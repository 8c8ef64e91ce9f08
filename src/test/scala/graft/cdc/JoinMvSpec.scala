package graft.cdc

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Bidirectional join-MV: per-key replace must handle order churn, segment
  * moves, customer deletes, and orders arriving before their customer. */
class JoinMvSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mk(rows: (Long, Long, String, String, Option[Long], Option[Double], Option[String])*) =
    rows.toDF("id", "seq", "op", "table", "o_custkey", "o_totalprice", "c_mktsegment")

  private def readMvAt(mv: String) = Materialize.readMv(spark, mv)
    .select($"c_mktsegment", $"n", $"s".cast("double"))
    .orderBy($"c_mktsegment")
    .as[(String, Long, Double)].collect().toSeq

  test("segment moves re-attribute, deletes retract, early orders park") {
    val work = Files.createTempDirectory("graft-joinmv-").toString
    val (st, agg, seg, mv) =
      (s"$work/state", s"$work/agg", s"$work/seg", s"$work/mv")
    def readMv() = readMvAt(mv)

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

  test("a customer TRUNCATE retracts every segment cell; re-inserts re-credit") {
    // the untested-combination class: the dimension side of the
    // bidirectional MV is ERASED by a truncate fence (rows vanish from the
    // state without ever being a touched-bucket delta) in the same batch
    // that carries order churn — the maintainer must retract every cell,
    // park the orders, and re-credit parked history when customers return
    val work = Files.createTempDirectory("graft-joinmv-trunc-").toString
    val (st, agg, seg, mv) =
      (s"$work/state", s"$work/agg", s"$work/seg", s"$work/mv")

    // b0: two customers, three orders
    JoinMv.maintainBatch(mk(
      (1L, 1L, "INSERT", "customer", None, None, Some("A")),
      (2L, 2L, "INSERT", "customer", None, None, Some("B")),
      (101L, 3L, "INSERT", "orders", Some(1L), Some(100.0), None),
      (102L, 4L, "INSERT", "orders", Some(1L), Some(50.0), None),
      (201L, 5L, "INSERT", "orders", Some(2L), Some(30.0), None)),
      0L, st, agg, seg, mv)
    assert(readMvAt(mv) === Seq(("A", 2L, 150.0), ("B", 1L, 30.0)))

    // b1: TRUNCATE customer + one more order for customer 2 in ONE batch —
    // every cell retracts (the dim is gone), all orders park in A(k)
    JoinMv.maintainBatch(mk(
      (0L, 10L, "TRUNCATE", "customer", None, None, None),
      (202L, 11L, "INSERT", "orders", Some(2L), Some(20.0), None)),
      1L, st, agg, seg, mv)
    assert(readMvAt(mv) === Seq.empty, "truncated dim must empty the MV")

    // b2: customer 2 returns in a NEW segment — its parked history (pre-
    // truncate orders + the in-flight one) credits the new cell; customer
    // 1 stays parked
    JoinMv.maintainBatch(mk(
      (2L, 12L, "INSERT", "customer", None, None, Some("C"))),
      2L, st, agg, seg, mv)
    assert(readMvAt(mv) === Seq(("C", 2L, 50.0)))

    // replaying the truncate batch after completion changes nothing
    JoinMv.maintainBatch(mk(
      (0L, 10L, "TRUNCATE", "customer", None, None, None),
      (202L, 11L, "INSERT", "orders", Some(2L), Some(20.0), None)),
      1L, st, agg, seg, mv)
    assert(readMvAt(mv) === Seq(("C", 2L, 50.0)))

    // the segment dim state holds exactly the live (re-inserted) customer
    val liveSeg = ChangelogStream.readState(spark, seg, Seq("id", "c_mktsegment"))
      .as[(Long, String)].collect().toSeq
    assert(liveSeg === Seq((2L, "C")))
  }

  test("a crash between the A-state advance and the agg fence replays clean") {
    val work = Files.createTempDirectory("graft-joinmv-crash-").toString
    val (st, agg, seg, mv) =
      (s"$work/state", s"$work/agg", s"$work/seg", s"$work/mv")
    // b0: customer 1 in segment A with one 100.0 order
    JoinMv.maintainBatch(mk(
      (1L, 1L, "INSERT", "customer", None, None, Some("A")),
      (201L, 2L, "INSERT", "orders", Some(1L), Some(100.0), None)),
      0L, st, agg, seg, mv)
    assert(readMvAt(mv) === Seq(("A", 1L, 100.0)))
    // b1 crashes at the advisor's exact hole: pending pinned, MV committed,
    // A advanced — but the fence never written
    val b1 = mk((202L, 11L, "INSERT", "orders", Some(1L), Some(10.0), None))
    intercept[RuntimeException] {
      ChangelogStream.upsertBatch(b1, st, keyCols = Seq("table", "id"),
        beforeCommit = (prev, merged) => {
          val k = JoinMv.ensurePendingK(prev, merged, 1L, agg, seg)
          JoinMv.commitMvFromK(spark, k, 1L, mv)
          ChangelogStream.upsertBatch(JoinMv.newARows(k, 1L), agg)
          throw new RuntimeException("simulated crash before the agg fence")
        })
    }
    // full replay of b1: the pinned per-key frame supplies PRE-batch A
    // values, so the advanced A is not read back and re-credited
    JoinMv.maintainBatch(b1, 1L, st, agg, seg, mv)
    assert(readMvAt(mv) === Seq(("A", 2L, 110.0)))
    // the state A(1) itself must hold the single-application totals —
    // a double-apply would surface at the NEXT per-key replace
    JoinMv.maintainBatch(mk(
      (1L, 12L, "UPDATE", "customer", None, None, Some("B"))),
      2L, st, agg, seg, mv)
    assert(readMvAt(mv) === Seq(("B", 2L, 110.0)))
  }

  test("per-batch A/segment reads open ONLY the touched keys' buckets") {
    val work = Files.createTempDirectory("graft-joinmv-prune-").toString
    val dir = s"$work/agg"
    val rows = (1L to 64L).map(i => (i, 1L, "INSERT", i, BigDecimal(i)))
      .toDF("id", "seq", "op", "n", "s")
      .select($"id", $"seq", $"op", $"n",
        $"s".cast(org.apache.spark.sql.types.DecimalType(28, 4)).as("s"))
    ChangelogStream.upsertBatch(rows, dir)
    val layout = Buckets.read(spark, dir).get
    val keys = Seq(5L).toDF("custkey")
    val pruned = JoinMv.readTouchedBuckets(spark, dir, keys, Seq("id", "n", "s"))
    val b = Buckets.bucketOfValues(layout, Seq(5L))
    val files = pruned.inputFiles
    assert(files.nonEmpty, "pruned read resolved no files")
    assert(files.forall(_.contains(s"bucket=$b/")),
      s"read escaped the touched bucket: ${files.toSeq.filterNot(_.contains(s"bucket=$b/"))}")
    assert(pruned.filter($"id" === 5L).count() === 1)
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.streaming.Stateful.{KeyedEvent, KeyState}

class StatefulSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState CDC state machine matches batch LWW across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val q = Stateful.cdcStateMachine(mem.toDS())
      .toDF("id", "state")
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("cdc_state")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // batch 1: inserts; batch 2: update id 1, delete id 2; batch 3: late event
    mem.addData(KeyedEvent(1, 1, "INSERT", 10.0), KeyedEvent(2, 2, "INSERT", 20.0))
    q.processAllAvailable()
    mem.addData(KeyedEvent(1, 3, "UPDATE", 11.0), KeyedEvent(2, 4, "DELETE", 20.0))
    q.processAllAvailable()
    mem.addData(KeyedEvent(2, 1, "INSERT", 99.0)) // stale: must not resurrect
    q.processAllAvailable()

    // latest update per key = materialized state
    val rows = spark.table("cdc_state")
      .select($"id", $"state.seq", $"state.op", $"state.price").collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.maxBy(_.getLong(1)) }
    assert(rows(1L).getString(2) === "UPDATE" && rows(1L).getDouble(3) === 11.0)
    assert(rows(2L).getString(2) === "DELETE") // tombstone retained
    q.stop()
  }

  test("txn gate holds a transaction until its COMMIT, even 2 batches late") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Stateful.TxnEvent
    def ev(id: Long, seq: Long, op: String, txn: Long, price: Option[Double] = None) =
      TxnEvent(id, seq, op, txn, Some(id), None, None, price, None, None)
    val mem = MemoryStream[TxnEvent]
    val q = Stateful.txnGate(mem.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("txn_gate")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def released = spark.table("txn_gate").select($"id", $"seq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch 1: txn 10 opens (2 events), txn 20 opens — nothing committed
    mem.addData(ev(1, 1, "INSERT", 10, Some(5.0)), ev(2, 2, "INSERT", 10), ev(9, 3, "INSERT", 20))
    q.processAllAvailable()
    assert(released.isEmpty, "events released before COMMIT")
    // batch 2: txn 10 keeps writing — still no commit
    mem.addData(ev(1, 4, "UPDATE", 10, Some(6.0)))
    q.processAllAvailable()
    assert(released.isEmpty, "events released before COMMIT")
    // batch 3: txn 10's COMMIT (2 batches after it opened) releases ALL its
    // buffered events exactly once; txn 20 stays held
    mem.addData(ev(-1, 100, "COMMIT", 10))
    q.processAllAvailable()
    assert(released === Set((1L, 1L), (2L, 2L), (1L, 4L)), s"wrong release: $released")
    // batch 4: post-commit events of txn 10 pass straight through
    mem.addData(ev(3, 5, "INSERT", 10))
    q.processAllAvailable()
    assert(released.contains((3L, 5L)))
    // txn 20 never committed, never released
    assert(!released.exists(_._1 == 9L))
    q.stop()
  }

  test("txn stream at 1 file/trigger: cross-batch COMMIT release equals the batch txn apply") {
    // fixture-scale twin of the MemoryStream gate drill: COMMITs arrive in
    // the LAST of 3 epochs, so every transaction's events buffer across
    // batches before release — the semantics the declared query's
    // one-epoch drain (round-12 coarsening) no longer exercises
    import org.apache.spark.sql.functions.col
    val streamed = Stateful.qApplyTxnStream(spark, sfDir, maxFilesPerTrigger = 1)
    val batch = graft.cdc.Apply.txnApply(
      graft.cdc.Changelog.fromOrdersTxn(spark, sfDir),
      graft.cdc.Changelog.payloadCols)
      .select(graft.cdc.Changelog.payloadCols.map(col): _*)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("SCD2 stream at 1 file/trigger: cross-batch interval close equals the batch scd2") {
    // the cross-batch semantics the declared query's one-epoch drain no
    // longer exercises (round-12 coarsening): an OPEN interval emitted in
    // one epoch must be OVERWRITTEN by its closed form when a later
    // epoch's event closes it — driven here at maxFilesPerTrigger=1
    // (3 epochs: inserts | updates | deletes) against the batch oracle
    import org.apache.spark.sql.functions.col
    val streamed = Stateful.qScd2Stream(spark, sfDir, maxFilesPerTrigger = 1)
    val batch = graft.cdc.Apply.scd2(
      graft.cdc.Changelog.fromOrders(spark, sfDir),
      graft.cdc.Changelog.payloadCols)
      .select((graft.cdc.Changelog.payloadCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"))): _*)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("mapGroupsWithState running agg converges to batch totals") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = Stateful.userRunningAgg(mem.toDS())
      .toDF("user", "agg")
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("user_agg")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    mem.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
    q.processAllAvailable()
    mem.addData((1L, 3.0))
    q.processAllAvailable()
    val last = spark.table("user_agg")
      .select($"user", $"agg.n", $"agg.sum").collect()
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.maxBy(_.getLong(1)) }
    assert(last(1L).getLong(1) === 3 && last(1L).getDouble(2) === 6.0)
    assert(last(2L).getLong(1) === 1 && last(2L).getDouble(2) === 5.0)
    q.stop()
  }
}

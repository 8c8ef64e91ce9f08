package graft.cdc

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Ingest pipelines (r19): processor order, the on_failure routing
  * contract (fail / drop / dead-letter), stop-on-first-failure, DELETE
  * exemption, and replay fencing through the keyed merge. */
class IngestSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import Ingest._

  private def mk(rows: (Long, Long, String, String)*) =
    rows.toDF("id", "seq", "op", "raw")

  test("processors run in declaration order: each sees its predecessors' " +
    "outputs, and a reordered chain is a different pipeline") {
    val ev = mk((1L, 1L, "INSERT", "a-1"))
    // order matters for same-target sets...
    val fwd = applyChain(ev, Seq(
      SetP("x", lit("first")), SetP("x", lit("second"))), FailHard)
    assert(fwd.head().getAs[String]("x") === "second")
    val rev = applyChain(ev, Seq(
      SetP("x", lit("second")), SetP("x", lit("first"))), FailHard)
    assert(rev.head().getAs[String]("x") === "first")
    // ...and a consumer before its producer is not a quiet no-op: the
    // split reads the RENAMED field, so splitting first cannot resolve
    intercept[Exception] {
      applyChain(ev, Seq(
        SplitP("renamed", "-", "parts"),
        RenameP("raw", "renamed")), FailHard).head()
    }
    // the fixture chain's own order dependency: convert reads the split's
    // part through the set's copy
    val chained = applyChain(mk((1L, 1L, "INSERT", "7-HIGH"))
        .withColumnRenamed("raw", "f"),
      Seq(SplitP("f", "-", "ps"),
        SetP("c", element_at(col("ps"), 1)),
        ConvertP("c", "bigint", "n")), FailHard)
    assert(chained.head().getAs[Long]("n") === 7L)
  }

  test("on_failure routing: no handler raises in-plan naming the " +
    "processor; drop removes the event; dead-letter stores it aside " +
    "with the failing tag") {
    val ev = mk((1L, 1L, "INSERT", "7"), (2L, 2L, "INSERT", "BAD"))
    val chain = Seq(ConvertP("raw", "bigint", "n"))
    // FailHard: the merge scan raises on the bad row
    val ex = intercept[Exception] {
      applyChain(ev, chain, FailHard).collect()
    }
    assert(ex.getMessage.contains("ingest pipeline failed") ||
      Option(ex.getCause).exists(_.getMessage.contains("ingest pipeline failed")))
    // DropEvent: the bad row vanishes, the good one is processed
    val dropped = applyChain(ev, chain, DropEvent).collect()
    assert(dropped.map(_.getAs[Long]("id")).toSeq === Seq(1L))
    assert(dropped.head.getAs[Long]("n") === 7L)
    // DeadLetter: the ORIGINAL bad event lands aside with the tag;
    // survivors continue
    val dl = Files.createTempDirectory("graft-ingest-dl-").toString
    val ok = applyChain(ev, chain, DeadLetter(dl), batchId = 3L).collect()
    assert(ok.map(_.getAs[Long]("id")).toSeq === Seq(1L))
    val dead = spark.read.parquet(s"$dl/batch=3").collect()
    assert(dead.length === 1 && dead.head.getAs[Long]("id") === 2L)
    assert(dead.head.getAs[String]("error") === "convert:raw")
    assert(dead.head.getAs[String]("raw") === "BAD",
      "dead letter must carry the ORIGINAL payload")
    // a replayed batch overwrites its own dead letters, not duplicates
    applyChain(ev, chain, DeadLetter(dl), batchId = 3L).collect()
    assert(spark.read.parquet(s"$dl/batch=3").count() === 1L)
  }

  test("a failed document stops the pipeline: the FIRST failing " +
    "processor is reported, and DELETE events are exempt") {
    // 'BAD' fails the convert AND would fail the date — convert reports
    val ev = mk((1L, 1L, "INSERT", "BAD"))
    val chain = Seq(
      ConvertP("raw", "bigint", "n"),
      DateP("raw", "yyyy-MM-dd", "d"))
    val dl = Files.createTempDirectory("graft-ingest-first-").toString
    applyChain(ev, chain, DeadLetter(dl)).collect()
    assert(spark.read.parquet(s"$dl/batch=0").head()
      .getAs[String]("error") === "convert:raw")
    // DELETE: same corrupt payload passes through untouched (a delete
    // carries no document to transform)
    val del = applyChain(mk((2L, 2L, "DELETE", "BAD")), chain, FailHard)
      .collect()
    assert(del.length === 1 && del.head.getAs[Long]("id") === 2L)
  }

  test("replay fencing: re-applying the tail batch through the chain and " +
    "the merge leaves the ingest state byte-equal") {
    val stateDir = Ingest.ingestPipelineRun(spark, sfDir)
    val before = Ingest.qCdcIngestPipeline(spark, sfDir).collect().toSeq
    // replay the tail (seq > 1e6) verbatim — the keyed LWW merge absorbs
    val tail = Changelog.fromOrdersDirty(spark, sfDir)
      .filter(col("seq") > 1000000L)
    val processed = applyChain(tail, fixtureChain, DropEvent, batchId = 1L)
    ChangelogStream.upsertBatch(
      processed.select(Seq("id", "seq", "op").map(col) ++
        Ingest.processedCols.map(col): _*),
      stateDir, initialBuckets = 4)
    val after = Ingest.qCdcIngestPipeline(spark, sfDir).collect().toSeq
    assert(after === before, "replayed tail changed the ingest state")
  }

  test("the dropped dirty updates leave their keys at the PRE-update " +
    "values (the on_failure contract is per EVENT, not per key)") {
    val out = Ingest.qCdcIngestPipeline(spark, sfDir).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("o_totalprice")).toMap
    val base = graft.model.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // dirty ids: % 15 == 0 (their UPDATE dropped), minus deleted (% 7)
    val dirtyLive = base.keys.filter(k => k % 15 == 0 && k % 7 != 0)
    assert(dirtyLive.nonEmpty, "fixture degenerate: no dirty live keys")
    dirtyLive.foreach(k => assert(out(k) === base(k),
      s"key $k: dropped update leaked its price bump"))
    // clean updated keys (% 5, not % 15, not deleted) carry the bump
    val cleanUpd = base.keys.filter(k => k % 5 == 0 && k % 15 != 0 && k % 7 != 0)
    cleanUpd.foreach(k => assert(out(k) === base(k) + 1d,
      s"key $k: clean update missing"))
  }
}

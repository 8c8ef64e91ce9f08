package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Dynamic table onboarding: the RELATION-announced, schema-on-write
  * pipeline ([[DynamicPipeline]]) — no compile-time table set. */
class DynamicPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def assertSame(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    assert(a.count() === b.count())
  }

  test("a table first seen mid-stream materializes correctly, and so do the tables before it") {
    // nation (announced + first rows at micro-batch 3) equals its batch apply
    assertSame(
      DynamicPipeline.qNationState(spark, sfDir),
      Apply.latestState(Changelog.fromNation(spark, sfDir),
        Changelog.nationPayloadCols).orderBy($"n_nationkey"))
    // ...and the orders state of the SAME pass equals the standard apply —
    // onboarding a new table disturbed nothing
    assertSame(
      DynamicPipeline.tableView(spark, sfDir, "orders").orderBy($"o_orderkey"),
      Apply.latestState(Changelog.fromOrders(spark, sfDir),
        Changelog.payloadCols).orderBy($"o_orderkey"))
    // the run is memoized (one shared pass per fixture)
    assert(DynamicPipeline.run(spark, sfDir) eq DynamicPipeline.run(spark, sfDir))
  }

  test("a runtime-onboarded table's MV is maintained incrementally and equals re-aggregation") {
    // the IVM guarantee, for a table the pass had never heard of at plan
    // time: nation's per-region MV — folded forward epoch by epoch from
    // the batch its first row arrived in — equals the aggregate over the
    // fully-applied nation state
    val expect = Apply.latestState(Changelog.fromNation(spark, sfDir),
        Changelog.nationPayloadCols)
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n"),
        round(sum($"n_nationkey".cast(
            org.apache.spark.sql.types.DecimalType(18, 4))), 2)
          .cast("double").as("sum_value"))
      .orderBy($"n_regionkey")
    assertSame(DynamicPipeline.qNationMv(spark, sfDir), expect)
  }

  test("an event for an unannounced table fails loudly (producer.go:126-127 semantics)") {
    val root = java.nio.file.Files.createTempDirectory("graft-dyn-fatal-").toString
    val batch = Seq((1L, 1L, "INSERT", "ghost", """{"x":1}"""))
      .toDF("id", "seq", "op", "table", "payload")
    val e = intercept[Exception] {
      DynamicPipeline.applyBatch(batch, root)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("unannounced"))))
  }

  test("a RELATION re-announcement evolves a table's schema mid-stream") {
    // the pgoutput path for ALTER TABLE: the relation is re-announced with
    // the new column set; history null-pads through the state merge's
    // union-by-name evolution — no rewrite of earlier buckets
    val root = java.nio.file.Files.createTempDirectory("graft-dyn-evolve-").toString
    def b(rows: Seq[(Long, Long, String, String, String)]) =
      rows.toDF("id", "seq", "op", "table", "payload")
    DynamicPipeline.applyBatch(b(Seq(
      (-1L, 0L, "RELATION", "t", "a BIGINT"),
      (1L, 1L, "INSERT", "t", """{"a":10}"""))), root)
    DynamicPipeline.applyBatch(b(Seq(
      (-1L, 2L, "RELATION", "t", "a BIGINT, b STRING"),
      (2L, 3L, "INSERT", "t", """{"a":20,"b":"x"}"""))), root)
    val st = ChangelogStream.readState(spark, s"$root/state/t", Seq("a", "b"))
      .orderBy($"a").collect().map(_.toSeq).toSeq
    assert(st === Seq(Seq(10L, null), Seq(20L, "x")))
  }

  test("killing the dynamic pass mid-drain and resuming converges — registry survives the restart") {
    // the onboarding-specific crash case: if the stop lands AFTER the
    // RELATION batch committed but BEFORE (or DURING) the announced
    // table's data batches, the resumed query must decode them from the
    // DURABLE registry — the reference loses exactly this (temporary
    // slot, SURVEY §4.3). Stop point is arbitrary (any committed prefix
    // is a valid crash point, including zero batches).
    val clDir = Changelog.stageEnvelopeJsonDynamic(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("graft-dyn-kill-").toString
    def start() = {
      val stream = spark.readStream.format("changelog")
        .option("maxFilesPerTrigger", 1).load(clDir)
      stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epochId: Long) =>
          // MV + index specs ride the kill too: the replayed epoch must
          // skip its already-committed MV delta (epoch fence) while the
          // state re-merges and the index re-absorbs an identical delta
          DynamicPipeline.applyBatch(batch, root, epochId,
            DynamicPipeline.DefaultMvSpecs, DynamicPipeline.DefaultIndexSpecs)
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    val q1 = start()
    q1.awaitTermination(2500) // kill mid-drain (3 files, 1 per epoch)
    q1.stop()
    val q2 = start()
    q2.awaitTermination()
    assertSame(
      ChangelogStream.readState(spark, s"$root/state/nation",
          Changelog.nationPayloadCols),
      Apply.latestState(Changelog.fromNation(spark, sfDir),
        Changelog.nationPayloadCols))
    assertSame(
      ChangelogStream.readState(spark, s"$root/state/orders",
          Changelog.payloadCols),
      Apply.latestState(Changelog.fromOrders(spark, sfDir),
        Changelog.payloadCols))
    // the MV converged too — no double-applied delta from the replayed epoch
    assertSame(
      Materialize.readMv(spark, s"$root/mv/nation")
        .select($"n_regionkey", $"n",
          round($"s", 2).cast("double").as("sum_value")),
      Apply.latestState(Changelog.fromNation(spark, sfDir),
          Changelog.nationPayloadCols)
        .groupBy($"n_regionkey")
        .agg(count(lit(1)).as("n"),
          round(sum($"n_nationkey".cast(
              org.apache.spark.sql.types.DecimalType(18, 4))), 2)
            .cast("double").as("sum_value")))
    // ...and the index: the replayed batch's delta re-emerged with the
    // same seq and was absorbed by the index's own max_by merge
    assertSame(
      ChangelogStream.readState(spark, s"$root/idx/nation", Seq("v", "id"))
        .select($"v".as("n_name"), $"id".as("n_nationkey")),
      Apply.latestState(Changelog.fromNation(spark, sfDir),
          Changelog.nationPayloadCols)
        .select($"n_name", $"n_nationkey"))
  }

  test("the schema registry is durable: a fresh reader decodes from disk, not driver memory") {
    val root = DynamicPipeline.run(spark, sfDir)
    // read the registry file directly — the RelationMessage cache survives
    // the stream (a checkpoint-resumed query would decode from this)
    val s = DynamicPipeline.getSchema(spark, root, "nation")
    assert(s.isDefined)
    assert(s.get.fieldNames.toSeq === Changelog.nationPayloadCols)
    // a RELATION re-announcement overwrites (schema evolution path)
    DynamicPipeline.putSchema(spark, root, "ghost2", "a BIGINT")
    DynamicPipeline.putSchema(spark, root, "ghost2", "a BIGINT, b STRING")
    assert(DynamicPipeline.getSchema(spark, root, "ghost2").get.fieldNames.length === 2)
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.cdc.{Apply, Changelog, ChangelogStream}

/** DSv2 WRITE path: the `changelog-state` sink (consumer half of the
  * pipeline, `es.go:13-144`) — end-to-end streaming parity with the batch
  * apply, epoch-fence replay semantics, and staging hygiene. */
class ChangelogStateSinkSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mkCommitter(stateDir: String, queryId: String) = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, seq BIGINT, op STRING, v STRING")
    val confMap = {
      val it = spark.sessionState.newHadoopConf().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    (new ChangelogStateCommitter(stateDir, schema, Seq("id"), confMap, queryId), schema, confMap)
  }

  /** Stage one task file for `epochId` holding `rows`, return its commit
    * message — the executor half of the protocol, run inline. */
  private def stageTask(stateDir: String, queryId: String, epochId: Long,
                        partitionId: Int, rows: Seq[(Long, Long, String, String)],
                        confMap: Map[String, String],
                        schema: org.apache.spark.sql.types.StructType): WriterCommitMessage = {
    val factory = new ChangelogStateWriterFactory(
      s"$stateDir/_staging/$queryId", schema, confMap)
    val w = factory.createWriter(partitionId, partitionId.toLong, epochId)
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(schema)
    val toRow = enc.createSerializer()
    rows.foreach { case (id, seq, op, v) =>
      w.write(toRow(org.apache.spark.sql.Row(id, seq, op, v)))
    }
    w.commit()
  }

  private def state(stateDir: String): Seq[(Long, String)] =
    ChangelogStream.readState(spark, stateDir, Seq("id", "v"))
      .orderBy("id").as[(Long, String)].collect().toSeq

  test("writeStream.format(changelog-state) equals the batch apply") {
    val clDir = Changelog.stageEnvelopeJson(spark, sfDir)
    val work = Files.createTempDirectory("graft-sinkspec-").toString
    val got = ChangelogStream.applyStreamingSinkDsv2(
      spark, clDir, work, Changelog.payloadSchema(spark, sfDir))
    val want = Apply.latestState(Changelog.fromOrders(spark, sfDir), Changelog.payloadCols)
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }

  test("the sink's maxBucketBytes option rescales the state mid-stream") {
    val clDir = Changelog.stageEnvelopeJson(spark, sfDir)
    val work = Files.createTempDirectory("graft-sinkrescale-").toString
    val stateDir = s"$work/state"
    val pSchema = Changelog.payloadSchema(spark, sfDir)
    import org.apache.spark.sql.functions.{col, from_json}
    val decoded = spark.readStream.format("changelog")
      .option("maxFilesPerTrigger", 2).load(clDir)
      .filter(col("table") === "orders")
      .select(Seq(col("id"), col("seq"), col("op")) :+
        from_json(col("payload"), pSchema).as("p"): _*)
      .select(Seq(col("id"), col("seq"), col("op")) ++
        Changelog.payloadCols.map(c => col(s"p.$c").as(c)): _*)
    val q = decoded.writeStream.format("changelog-state")
      .option("path", stateDir)
      .option("schema", decoded.schema.toDDL)
      .option("keyCols", "id")
      .option("maxBucketBytes", "4096") // tiny target: every bucket splits
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val layout = graft.cdc.Buckets.read(spark, stateDir).get
    assert(layout.entries.values.exists(_._1 > 4),
      "the tiny target should have split buckets past the initial depth")
    // the deepened layout still answers exactly like the batch apply
    val got = ChangelogStream.readState(spark, stateDir, Changelog.payloadCols)
    val want = Apply.latestState(Changelog.fromOrders(spark, sfDir), Changelog.payloadCols)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    val k = want.select("o_orderkey").as[Long].head
    assert(ChangelogStream.readKey(spark, stateDir, k).isDefined)
  }

  test("a replayed epoch is fenced: commit(epoch<=latest) merges nothing") {
    val work = Files.createTempDirectory("graft-fence-").toString
    val stateDir = s"$work/state"
    val (committer, schema, confMap) = mkCommitter(stateDir, "q1")
    val m0 = stageTask(stateDir, "q1", 0L, 0, Seq((1L, 1L, "INSERT", "a")), confMap, schema)
    committer.commit(0L, Array(m0))
    assert(state(stateDir) === Seq((1L, "a")))
    // replay of epoch 0 with DIFFERENT staged data (a real replay re-stages
    // the same rows; conflicting rows prove the fence skipped the merge
    // rather than relying on merge idempotence)
    val m0r = stageTask(stateDir, "q1", 0L, 0, Seq((1L, 2L, "UPDATE", "hacked")), confMap, schema)
    committer.commit(0L, Array(m0r))
    assert(state(stateDir) === Seq((1L, "a")), "fenced replay must not merge")
    // the replayed epoch's staging dir is still swept
    assert(!new java.io.File(s"$stateDir/_staging/q1/epoch=0").exists())
    // epoch 1 proceeds normally past the fence
    val m1 = stageTask(stateDir, "q1", 1L, 0, Seq((1L, 3L, "UPDATE", "b")), confMap, schema)
    committer.commit(1L, Array(m1))
    assert(state(stateDir) === Seq((1L, "b")))
  }

  test("abort sweeps the epoch staging dir; empty writers stage no file") {
    val work = Files.createTempDirectory("graft-abort-").toString
    val stateDir = s"$work/state"
    val (committer, schema, confMap) = mkCommitter(stateDir, "q2")
    val m = stageTask(stateDir, "q2", 5L, 0, Seq((9L, 1L, "INSERT", "x")), confMap, schema)
    assert(new java.io.File(s"$stateDir/_staging/q2/epoch=5").exists())
    committer.abort(5L, Array(m))
    assert(!new java.io.File(s"$stateDir/_staging/q2/epoch=5").exists())
    val buckets = Option(new java.io.File(stateDir).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("bucket="))
    assert(buckets.isEmpty, "aborted epoch must leave no state")
    // an empty partition opens no file and names none in its message
    val factory = new ChangelogStateWriterFactory(s"$stateDir/_staging/q2", schema, confMap)
    val empty = factory.createWriter(3, 3L, 6L).commit()
    assert(empty.asInstanceOf[ChangelogStateCommitMessage].files.isEmpty)
  }

  test("batch df.write.format(changelog-state) merges like upsertBatch") {
    val work = Files.createTempDirectory("graft-batchwrite-").toString
    val stateDir = s"$work/state"
    val df = Seq((1L, 1L, "INSERT", "a"), (2L, 2L, "INSERT", "b"),
        (1L, 3L, "UPDATE", "a2"), (2L, 4L, "DELETE", "b"))
      .toDF("id", "seq", "op", "v")
    df.write.format("changelog-state")
      .option("path", stateDir)
      .option("schema", df.schema.toDDL)
      .option("keyCols", "id")
      .mode("append")
      .save()
    assert(state(stateDir) === Seq((1L, "a2")))
    assert(!new java.io.File(s"$stateDir/_staging").exists() ||
      new java.io.File(s"$stateDir/_staging").listFiles().forall(
        _.listFiles().isEmpty), "batch staging must be swept after commit")
  }

  test("batch write REJECTS a maintainer (no epoch id to fence deltas on)") {
    // the batch path commits at the -1 sentinel; a registered maintainer's
    // batchId fence would pin there and silently skip all later deltas
    // while the state kept merging — fail loudly instead
    val work = Files.createTempDirectory("graft-batchmaint-").toString
    ChangelogStateSink.maintainers.put("batch-reject-test", (_, _, _) => ())
    try {
      val df = Seq((1L, 1L, "INSERT", "a")).toDF("id", "seq", "op", "v")
      val e = intercept[Exception] {
        df.write.format("changelog-state")
          .option("path", s"$work/state")
          .option("schema", df.schema.toDDL)
          .option("keyCols", "id")
          .option("maintainer", "batch-reject-test")
          .mode("append")
          .save()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(_.getMessage != null) &&
        causes(e).exists(c => Option(c.getMessage).exists(_.contains("streaming write path"))),
        s"unexpected error: $e")
    } finally ChangelogStateSink.maintainers.remove("batch-reject-test")
  }
}

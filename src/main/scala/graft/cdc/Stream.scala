package graft.cdc

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming rendering of the reference pipeline (SURVEY.md §3):
  * changelog source → decode/dispatch → idempotent keyed upsert sink.
  *
  * The reference tails pgoutput and applies one synchronous ES call per
  * event (producer `producer.go:70-173`, consumer `utils.go:92-117`). Here
  * the source is a file-based changelog stream carrying the same
  * `DatabaseEvent` envelope (op, table, id, payload; `utils.go:22-26`) —
  * swap `readStream.parquet` for `readStream.format("kafka")` + Debezium in
  * deployment, the transform/sink are unchanged. Delivery semantics are a
  * strict upgrade over the reference (SURVEY.md §4.3): checkpointed offsets
  * (vs. lossy temporary slot), idempotent keyed upsert (vs. ES auto-ID
  * duplicate inserts), retained tombstones (so out-of-order replay cannot
  * resurrect deleted keys).
  *
  * State layout: versioned parquet snapshots `state/v=N` — each micro-batch
  * merges the previous snapshot with the batch's per-key latest and writes
  * version N+1 (never overwriting what it reads). At 100 TB the snapshot
  * would be bucketed by id so the merge join is shuffle-free on the state
  * side; the per-batch work is then proportional to the batch, not the
  * state.
  */
object ChangelogStream {

  /** Committed (`_SUCCESS`-marked) version directories under `stateDir`,
    * via the Hadoop FileSystem API so the versioned-state mechanism works on
    * HDFS/S3A paths, not just the local filesystem. */
  private def committedVersions(spark: SparkSession, stateDir: String): Seq[Long] = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v=") &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** Only a snapshot whose write job committed (Spark's _SUCCESS marker)
    * counts — a crash mid-write must leave the previous version as latest,
    * not a partial directory that would poison every restart. */
  private def latestVersion(spark: SparkSession, stateDir: String): Option[Long] =
    committedVersions(spark, stateDir).lastOption

  /** Merge one micro-batch into the keyed state (exactly the reference's
    * consumer dispatch `utils.go:103-113`, as one set-oriented merge).
    * Tombstones (op=DELETE) are kept in state; readers filter them. */
  def upsertBatch(batch: DataFrame, stateDir: String,
                  keyCols: Seq[String] = Seq("id")): Unit = {
    val spark = batch.sparkSession
    // one listing per batch: on S3A/HDFS each committedVersions call is a
    // LIST plus per-version HEADs, so derive prev/next/deletions from it
    val versions = committedVersions(spark, stateDir)
    val prev = versions.lastOption match {
      case Some(v) => spark.read.parquet(s"$stateDir/v=$v")
      case None    => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
    }
    val next = versions.lastOption.getOrElse(-1L) + 1
    // max_by hash aggregation (map-side combined) — see Apply.latestState
    val others = batch.columns.toSeq.filterNot(keyCols.contains)
    prev.unionByName(batch)
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), col("seq")).as("last"))
      .select(keyCols.map(col) ++ others.map(c => col(s"last.$c").as(c)): _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/v=$next")
    // retention: keep the new snapshot + one predecessor (for readers that
    // resolved the previous version before this write); older versions are
    // dead weight — without this the state store grows with every batch
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versions
      .filter(_ < next - 1)
      .foreach(v => fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true))
  }

  /** Read the materialized table: latest snapshot minus tombstones. */
  def readState(spark: SparkSession, stateDir: String, payloadCols: Seq[String]): DataFrame =
    latestVersion(spark, stateDir) match {
      case Some(v) => spark.read.parquet(s"$stateDir/v=$v")
        .filter(col("op") =!= "DELETE")
        .select(payloadCols.map(col): _*)
      case None => throw new IllegalStateException(s"no state at $stateDir")
    }

  /** End-to-end: synthesize the changelog, stream it through in bounded
    * micro-batches (AvailableNow + maxFilesPerTrigger so multiple batches
    * actually exercise the cross-batch merge), return the materialized
    * orders table. Result is identical to the batch [[Apply.latestState]] —
    * the stream/batch equivalence the engine guarantees. */
  def applyStreaming(spark: SparkSession, sfDir: String, workDir: String,
                     stagedClDir: Option[String] = None): DataFrame = {
    // changelog files can be pre-staged (shared across runs); state and
    // checkpoint must stay per-run — an AvailableNow restart against an old
    // checkpoint sees no new files and would materialize nothing
    val clDir = stagedClDir.getOrElse {
      val d = s"$workDir/changelog"
      Changelog.fromOrders(spark, sfDir)
        .repartition(4).write.mode(SaveMode.Overwrite).parquet(d)
      d
    }
    val stateDir = s"$workDir/state"

    val stream = spark.readStream
      .schema(spark.read.parquet(clDir).schema)
      .option("maxFilesPerTrigger", 3)
      .parquet(clDir)

    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => upsertBatch(batch, stateDir) }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    readState(spark, stateDir, Changelog.payloadCols)
  }

  /** Multi-table variant: one stream carries every table's events (the
    * reference's single CDC topic, `utils.go:31`), state is keyed by
    * (table, id), and each table's view is a filter over the shared state —
    * the per-table fan-out the consumer does with per-index writes
    * (`utils.go:105-112`). Differing table schemas union by name with
    * null padding (the superset-envelope encoding). */
  def applyStreamingMultiTable(spark: SparkSession, sfDir: String,
                               workDir: String): Map[String, DataFrame] = {
    // staged once per fixture dir, like the single-table path
    val clDir = Changelog.stageParquetMultiTable(spark, sfDir)
    val stateDir = s"$workDir/state"

    val stream = spark.readStream.schema(spark.read.parquet(clDir).schema)
      .option("maxFilesPerTrigger", 3).parquet(clDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch, stateDir, keyCols = Seq("table", "id"))
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    Map(
      "orders" -> readState(spark, stateDir, "table" +: Changelog.payloadCols)
        .filter(col("table") === "orders").select(Changelog.payloadCols.map(col): _*),
      "customer" -> readState(spark, stateDir, "table" +: Changelog.customerPayloadCols)
        .filter(col("table") === "customer").select(Changelog.customerPayloadCols.map(col): _*))
  }

  /** Query-shaped wrapper: staged changelog shared across runs, fresh temp
    * workdir (state + checkpoint) per run. */
  def qApplyStreaming(spark: SparkSession, sfDir: String): DataFrame = {
    val work = Files.createTempDirectory(Paths.get("/tmp"), "graft-stream-").toString
    applyStreaming(spark, sfDir, work,
      stagedClDir = Some(Changelog.stageParquet(spark, sfDir)))
      .orderBy(col("o_orderkey"))
  }

  /** Streaming apply fed by the engine's OWN DSv2 connector
    * ([[graft.sources.ChangelogMicroBatchStream]]): JSON-line DatabaseEvent
    * envelopes tailed as a MicroBatchStream (file-offset resume, bounded
    * micro-batches via maxFilesPerTrigger admission control), payload
    * schema-applied with from_json (O4/O9), then the same idempotent keyed
    * upsert sink. This is BASELINE's "Structured Streaming with CDC source
    * connector" literally — the reference's ordered resumable tail
    * (`producer.go:18-174`) as a first-class Spark source. Result is
    * identical to the batch [[Apply.latestState]]; shares cdc_apply's
    * oracle. */
  def applyStreamingDsv2(spark: SparkSession, clDir: String, workDir: String,
                         pSchema: org.apache.spark.sql.types.StructType,
                         maxFilesPerTrigger: Int = 1): DataFrame = {
    val stateDir = s"$workDir/state"
    val decoded = spark.readStream.format("changelog")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(clDir)
      .filter(col("table") === "orders")
      .select(Seq(col("id"), col("seq"), col("op")) :+
        from_json(col("payload"), pSchema).as("p"): _*)
      .select(Seq(col("id"), col("seq"), col("op")) ++
        Changelog.payloadCols.map(c => col(s"p.$c").as(c)): _*)
    val q = decoded.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => upsertBatch(batch, stateDir) }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    readState(spark, stateDir, Changelog.payloadCols)
  }

  /** Query-shaped wrapper for [[applyStreamingDsv2]]: staged envelope files
    * shared across runs (4 text files → 4 micro-batches at
    * maxFilesPerTrigger=1, so cross-batch merge + offset advance are truly
    * exercised), fresh state/checkpoint per run. */
  def qApplyStreamingDsv2(spark: SparkSession, sfDir: String): DataFrame = {
    val clDir = Changelog.stageEnvelopeJson(spark, sfDir)
    val work = Files.createTempDirectory(Paths.get("/tmp"), "graft-stream-dsv2-").toString
    applyStreamingDsv2(spark, clDir, work, Changelog.payloadSchema(spark, sfDir))
      .orderBy(col("o_orderkey"))
  }
}

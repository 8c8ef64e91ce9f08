package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** Oracle-checkable Structured Streaming queries: the same results as their
  * batch twins (shared DuckDB oracles), produced through real streaming
  * plans — file stream source, stateful aggregation / dedup state store,
  * AvailableNow bounded execution. Batch/stream result equivalence is the
  * engine's core guarantee (SURVEY.md §7.3 item 4).
  */
object StreamQueries {

  /** Stage a fixture table into a private dir and open it as a file stream
    * (the fixture dirs are read-only and must not receive checkpoints). */
  private def stagedStream(spark: SparkSession, dir: String, table: String): (DataFrame, String) = {
    val work = Files.createTempDirectory(Paths.get("/tmp"), s"graft-sq-$table-").toString
    Files.copy(Paths.get(s"$dir/$table.parquet"), Paths.get(s"$work/$table.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(work).schema
    (spark.readStream.schema(schema).parquet(work), work)
  }

  private def uniq(prefix: String) =
    prefix + java.util.UUID.randomUUID().toString.replace("-", "")

  /** Streaming tumbling-window aggregation over events — same result (and
    * oracle) as the batch q_tumbling_window; complete output mode because
    * the bounded run must emit every window, finalized or not. */
  def qStreamingTumbling(spark: SparkSession, dir: String): DataFrame = {
    val (raw, _) = stagedStream(spark, dir, "events")
    val name = uniq("st_tumbling_")
    val ev = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = ev.groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double").as("sum_value"))
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))
  }

  /** Stream-stream interval join: purchases joined to the same user's
    * signups within the following day — both sides are real streams with
    * event-time watermarks, so Spark plans a StreamingSymmetricHashJoin and
    * the time-range condition bounds each side's state retention (a purchase
    * can stop waiting for signups older than a day; that state-cleanup bound
    * is what makes the join runnable forever at 100 TB/day). Inner-join
    * output is a set, so the result is deterministic and shares a plain-SQL
    * oracle. */
  def qStreamingIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val (raw, _) = stagedStream(spark, dir, "events")
    val name = uniq("st_ivjoin_")
    // a stream-stream join allocates one state store per shuffle partition
    // PER SIDE, and the store count is frozen into the checkpoint — sizing
    // it to the stream's key cardinality (not the batch default) is the
    // standard deployment knob; 8 stores ≫ suffices for this key space
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
    val ev = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("signup_event"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    val q = p.join(s,
        col("user_id") === col("s_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") < col("s_ts") + expr("INTERVAL 1 DAY"))
      .select(col("user_id"), col("purchase_event"), col("signup_event"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .orderBy(col("user_id"), col("purchase_event"), col("signup_event"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Streaming exact dedup: fingerprint documents, drop duplicates in the
    * streaming state store, append the survivors to a parquet sink, then
    * summarize — the streaming rendering of doc_dedup_stats' n_distinct. */
  def qStreamingDedup(spark: SparkSession, dir: String): DataFrame = {
    val (raw, work) = stagedStream(spark, dir, "documents")
    val outDir = s"$work/deduped"
    val q = raw
      .select(col("source"), md5(lower(col("text"))).as("fp"))
      .dropDuplicates("source", "fp")
      .writeStream.outputMode("append")
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_distinct"))
      .orderBy(col("source"))
  }
}

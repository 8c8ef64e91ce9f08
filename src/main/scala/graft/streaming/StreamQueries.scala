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

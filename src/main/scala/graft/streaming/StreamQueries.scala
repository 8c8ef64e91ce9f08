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
    val work = graft.model.TempDirs.deleteOnExit(
      Files.createTempDirectory(Paths.get("/tmp"), s"graft-sq-$table-").toString)
    Files.copy(Paths.get(s"$dir/$table.parquet"), Paths.get(s"$work/$table.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(work).schema
    (spark.readStream.schema(schema).parquet(work), work)
  }

  private def uniq(prefix: String) =
    prefix + java.util.UUID.randomUUID().toString.replace("-", "")

  /** Run `body` with a state-store count sized to the stream's key
    * cardinality instead of the batch shuffle default: a stateful operator
    * allocates (and commits, per micro-batch) one state store per shuffle
    * partition, so an aggregation over a handful of keys paying 32 store
    * commits per batch is pure overhead — late_data pays it ×4 batches.
    * The store count freezes into the checkpoint at first use, which is
    * why the override must be in force before the query starts. The body
    * runs on a QUERY-LOCAL sibling session (own SQLConf, shared
    * SparkContext) so concurrent queries on the caller's session never
    * observe the override. */
  private def withStateStores[A](spark: SparkSession, n: Int)(body: SparkSession => A): A =
    body(graft.cdc.Materialize.sessionWithParts(spark, n))

  /** Stage the event corpus for APPEND-MODE window streams (shared across
    * runs/JVMs like the other stagings): f1 = the whole corpus, f2 = one
    * far-future sentinel event. Replayed at maxFilesPerTrigger=1 under a
    * small watermark delay, the sentinel batch advances the watermark past
    * every real window, so append mode finalizes and emits them all — the
    * same flush mechanism stream_late_data's phase-4 sentinel pins. The
    * sentinel's own windows end after the final watermark and never emit,
    * so no output filtering is needed. */
  private def stageSentinelFiles(spark: SparkSession, dir: String): String = {
    val work = s"/tmp/graft-stage-sentinel-${dir.replaceAll("[^a-zA-Z0-9]", "_")}-" +
      graft.model.Staging.fingerprint(dir, Seq("events.parquet"))
    graft.model.Staging.ensure(work) { tmp =>
      new java.io.File(tmp).mkdirs()
      val ev = graft.model.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      val mx = ev.agg(max(col("ts"))).head.getTimestamp(0)
      val sentinel = ev.limit(1).select(
        lit(-1L).as("event_id"), lit(-1L).as("user_id"),
        lit("sentinel").as("event_type"),
        lit(new java.sql.Timestamp(mx.getTime + 10L * 3600 * 1000)).as("ts"),
        lit(0.0d).as("value"))
      graft.model.Staging.stageOrderedFile(ev, tmp, "f1", 1000000L)
      graft.model.Staging.stageOrderedFile(sentinel, tmp, "f2", 2000000L)
    }
  }

  /** Shared skeleton of the bounded APPEND-MODE window streams: sentinel
    * staging → watermark → caller-shaped count/decimal-sum window
    * aggregation → parquet file sink, read back after drain. Windows emit
    * exactly once, when the watermark finalizes them — output flows through
    * an executor-written file sink, never a driver-accumulated table, so
    * the shape survives windows-cardinality at any scale (the round-8
    * complete-mode memory sink did not). Each query differs only in its
    * window flavor, so the sink plumbing and exact-sum arithmetic live
    * once. */
  private def appendWindowAgg(spark: SparkSession, dir: String, prefix: String)
                             (shape: DataFrame => org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
    withStateStores(spark, 8) { spark =>
      val work = stageSentinelFiles(spark, dir)
      val out = graft.model.TempDirs.deleteOnExit(
        Files.createTempDirectory(Paths.get("/tmp"), prefix).toString)
      val schema = spark.read.parquet(s"$work/f1.parquet").schema
      val ev = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(work)
        .withWatermark("ts", "1 second")
      val q = shape(ev)
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double").as("sum_value"))
        .writeStream.outputMode("append")
        .format("parquet").option("path", s"$out/windows")
        .option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(s"$out/windows")
    }

  /** Streaming tumbling-window aggregation over events — same result (and
    * oracle) as the batch q_tumbling_window: the sentinel advances the
    * watermark past every real window, so the append-mode run emits each
    * exactly once into the file sink. */
  def qStreamingTumbling(spark: SparkSession, dir: String): DataFrame =
    appendWindowAgg(spark, dir, "st_tumbling_")(
      _.groupBy(window(col("ts"), "10 minutes"), col("event_type")))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  /** Streaming sliding-window aggregation (10-minute windows every 5
    * minutes) — same result (and oracle) as the batch q_sliding_window,
    * through the same sentinel-flushed append path as its tumbling twin.
    * Each event lands in window/slide = 2 windows, so the state store holds
    * 2× the window count — still ∝ distinct windows, not events. */
  def qStreamingSliding(spark: SparkSession, dir: String): DataFrame =
    appendWindowAgg(spark, dir, "st_sliding_")(
      _.groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type")))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  /** Stream-stream interval join: purchases joined to the same user's
    * signups within the following day — both sides are real streams with
    * event-time watermarks, so Spark plans a StreamingSymmetricHashJoin and
    * the time-range condition bounds each side's state retention (a purchase
    * can stop waiting for signups older than a day; that state-cleanup bound
    * is what makes the join runnable forever at 100 TB/day). Inner-join
    * output is a set, so the result is deterministic and shares a plain-SQL
    * oracle.
    *
    * Oracle-parity precondition: [[stagedStream]] stages ONE parquet file
    * and sets no maxFilesPerTrigger, so the whole input lands in a single
    * micro-batch and the 1-hour watermarks never gate anything — the batch
    * oracle needs every pair. Multi-file replay would process files in
    * mtime order (not event-time order) and nondeterministically drop
    * event-time-late rows; to go multi-batch, stage event-time-ordered
    * files or widen the watermarks to the fixture's full time range (the
    * late-data CONTRACT itself is oracle-checked by stream_late_data). */
  def qStreamingIntervalJoin(spark: SparkSession, dir: String): DataFrame = withStateStores(spark, 8) { spark =>
    val (raw, _) = stagedStream(spark, dir, "events")
    val name = uniq("st_ivjoin_")
    // a stream-stream join allocates one state store per shuffle partition
    // PER SIDE — 8 stores ≫ suffices for this key space
    val ev = graft.model.Tables.normalizeTs(raw)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("signup_event"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    val out = graft.model.TempDirs.deleteOnExit(
      Files.createTempDirectory(Paths.get("/tmp"), name).toString)
    val q = p.join(s,
        col("user_id") === col("s_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") < col("s_ts") + expr("INTERVAL 1 DAY"))
      .select(col("user_id"), col("purchase_event"), col("signup_event"))
      .writeStream.outputMode("append")
      .format("parquet").option("path", s"$out/pairs")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // joined pairs land in an executor-written file sink (output ∝ matches,
    // a driver-OOM class in a memory sink at scale) and are read back only
    // for the bounded result
    spark.read.parquet(s"$out/pairs")
      .orderBy(col("user_id"), col("purchase_event"), col("signup_event"))
  }

  /** Streaming session windows per user (30-minute gap) — same result (and
    * oracle) as the batch q_session_window, through the sentinel-flushed
    * append path: sessions merge in the state store while open and append
    * to the file sink exactly once, when the watermark closes them — the
    * only rendering where a later event can never contradict an emitted
    * row (complete mode would re-emit merged sessions; update mode cannot
    * retract the partial sessions a merge absorbed). */
  def qStreamingSessionWindow(spark: SparkSession, dir: String): DataFrame =
    appendWindowAgg(spark, dir, "st_session_")(
      _.groupBy(session_window(col("ts"), "30 minutes"), col("user_id")))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n").as("n_events"))
      .orderBy(col("user_id"), col("s_start"))

  /** Watermark late-data semantics, oracle-checked: events whose event time
    * has fallen behind the watermark are DROPPED from the aggregation.
    *
    * Deterministic staging (file mtimes force micro-batch order at
    * maxFilesPerTrigger=1):
    *   batch 1 — the on-time corpus (every event_id % 10 != 0) advances the
    *             watermark to max(on-time ts) - delay;
    *   batch 2 — an EMPTY heartbeat file: since Spark 3.4 late events are
    *             filtered against the PREVIOUS batch's watermark (eviction
    *             uses the current one), so the advance must commit one
    *             batch before the late data arrives to deterministically
    *             gate it;
    *   batch 3 — the "delayed in transit" rows (event_id % 10 == 0): only
    *             those whose 10-minute window still ends after the watermark
    *             are admitted;
    *   batch 4 — a far-future sentinel advances the watermark past every
    *             real window so append mode emits them all (the sentinel's
    *             own window stays unfinalized and never appears).
    * The oracle states the same cutoff in SQL: keep late rows only where
    * window_end > max(on-time ts) - delay. */
  def qStreamingLateData(spark: SparkSession, dir: String): DataFrame = withStateStores(spark, 8) { spark =>
    val work = stageLateFiles(spark, dir)
    val out = graft.model.TempDirs.deleteOnExit(
      Files.createTempDirectory(Paths.get("/tmp"), "st_late_").toString)
    val schema = spark.read.parquet(s"$work/f1.parquet").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(work)
      .withWatermark("ts", "3570 seconds")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double").as("sum_value"))
      .writeStream.outputMode("append")
      .format("parquet").option("path", s"$out/windows")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$out/windows")
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))
  }

  /** Stage the late-data replay files once per fixture content (shared
    * across runs and JVMs via [[graft.model.Staging]]): one parquet file
    * per phase with forced mtimes — the file source orders by
    * (modification time, path), so replay order is deterministic; the
    * staging rename preserves the forced mtimes. State/checkpoint/sink
    * stay per-run. */
  private def stageLateFiles(spark: SparkSession, dir: String): String = {
    val work = s"/tmp/graft-stage-late-${dir.replaceAll("[^a-zA-Z0-9]", "_")}-" +
      graft.model.Staging.fingerprint(dir, Seq("events.parquet"))
    graft.model.Staging.ensure(work) { tmp =>
      new java.io.File(tmp).mkdirs()
      val ev = graft.model.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      val onTime = ev.filter(col("event_id") % 10 =!= 0)
      val late = ev.filter(col("event_id") % 10 === 0)
      val mx = ev.agg(max(col("ts"))).head.getTimestamp(0)
      val sentinel = ev.limit(1).select(
        lit(-1L).as("event_id"), lit(-1L).as("user_id"),
        lit("sentinel").as("event_type"),
        lit(new java.sql.Timestamp(mx.getTime + 10L * 3600 * 1000)).as("ts"),
        lit(0.0d).as("value"))
      def stageFile(df: DataFrame, n: String, mtime: Long): Unit =
        graft.model.Staging.stageOrderedFile(df, tmp, n, mtime)
      stageFile(onTime, "f1", 1000000L)
      stageFile(onTime.limit(0), "f2", 2000000L)
      stageFile(late, "f3", 3000000L)
      stageFile(sentinel, "f4", 4000000L)
    }
  }

  /** Streaming dedup with BOUNDED state: `dropDuplicatesWithinWatermark`
    * keeps a key in the dedup store only until the watermark passes its
    * event time plus the delay — the knob that makes streaming dedup
    * runnable forever (the plain `dropDuplicates` store in [[qStreamingDedup]]
    * grows with every key ever seen; at 100 TB/day that is the difference
    * between state ∝ retention window and state ∝ stream history).
    *
    * Replay staging: the full event corpus twice (identical files, forced
    * mtimes) at maxFilesPerTrigger=1 — batch 2 replays every event of
    * batch 1 across a real micro-batch boundary. The delay exceeds the
    * fixture's whole time span, so no key is evicted inside the bounded
    * run and every replay is deduplicated — the result is exactly DISTINCT
    * events (the shared oracle). Eviction itself (state rows dropping once
    * the watermark passes) is pinned by StreamSpec via the state-operator
    * metrics. */
  def qStreamingDedupWatermark(spark: SparkSession, dir: String): DataFrame = withStateStores(spark, 8) { spark =>
    val work = s"/tmp/graft-stage-dedupwm-${dir.replaceAll("[^a-zA-Z0-9]", "_")}-" +
      graft.model.Staging.fingerprint(dir, Seq("events.parquet"))
    graft.model.Staging.ensure(work) { tmp =>
      new java.io.File(tmp).mkdirs()
      val ev = graft.model.Tables.events(spark, dir)
        .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      graft.model.Staging.stageOrderedFile(ev, tmp, "f1", 1000000L)
      graft.model.Staging.stageOrderedFile(ev, tmp, "f2", 2000000L)
    }
    val out = graft.model.TempDirs.deleteOnExit(
      Files.createTempDirectory(Paths.get("/tmp"), "st_dedupwm_").toString)
    val schema = spark.read.parquet(s"$work/f1.parquet").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(work)
      .withWatermark("ts", "3650 days")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append")
      .format("parquet").option("path", s"$out/deduped")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // survivors append to an executor-written file sink (output ∝ deduped
    // events — the qStreamingDedup pattern), never a driver memory table
    spark.read.parquet(s"$out/deduped")
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** Stream-static join: the event stream enriched by a broadcast static
    * dimension (customer segment), then aggregated — the bread-and-butter
    * enrichment pattern. The static side is a plain batch plan re-resolved
    * per micro-batch; no join state store exists at all (only the
    * aggregation keeps state), which is why stream-static enrichment
    * scales to any stream volume: the join is map-side against a
    * broadcast, exactly like q5's star join.
    *
    * An UNWINDOWED aggregation has no watermark to finalize against, so
    * append mode can never emit it; the scale shape is UPDATE mode into a
    * keyed upsert sink — each batch emits only the changed groups, and the
    * engine's own `changelog-state` DSv2 sink merges them per key (the
    * compacted-topic pattern). The merge orders on `seq` = the group's
    * count, which strictly increases whenever the group changes, so the
    * latest emission always wins. Shares the plain-SQL join+group
    * oracle. */
  def qStreamStaticJoin(spark: SparkSession, dir: String): DataFrame = withStateStores(spark, 8) { spark =>
    val dim = graft.model.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val (raw, work) = stagedStream(spark, dir, "events")
    val ev = graft.model.Tables.normalizeTs(raw)
    val updates = ev
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double").as("sum_value"))
      .select(col("c_mktsegment"), col("event_type"), col("n"), col("sum_value"),
        col("n").as("seq"), lit("INSERT").as("op"))
    val stateDir = s"$work/state"
    val q = updates.writeStream.outputMode("update")
      .format("changelog-state")
      .option("path", stateDir)
      .option("schema", updates.schema.toDDL)
      .option("keyCols", "c_mktsegment,event_type")
      // the state is groups-sized (segments × event types ≈ 25 keys):
      // 4 buckets, not the 16-dir default — the numBuckets sizing knob
      .option("numBuckets", "4")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.cdc.ChangelogStream.readState(spark, stateDir,
        Seq("c_mktsegment", "event_type", "n", "sum_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))
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

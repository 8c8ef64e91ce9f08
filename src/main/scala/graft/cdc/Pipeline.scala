package graft.cdc

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.ChangelogStateSink

/** The COMPOSED pipeline: one pass over the changelog maintains the keyed
  * state AND every derived table — exactly the reference consumer's loop,
  * which keeps the document store and its search index current together
  * (`consumer.go:15-55`, `es.go:88-144`), generalized to N derived tables.
  *
  * Topology: the engine's DSv2 SOURCE tails the envelope files, the engine's
  * DSv2 SINK merges the keyed state, and a `maintainer` hook registered with
  * the sink ([[graft.sources.ChangelogStateSink.maintainers]]) chains the
  * derived-table deltas at the merge's beforeCommit fence point:
  *
  *   - per-status MV ([[Materialize.commitDelta]] with [[Materialize
  *     .aggContrib]]) — fenced on epoch id (deltas are not idempotent);
  *   - revenue-per-segment MV over orders⋈customer ([[Materialize
  *     .joinAggContrib]]) — delta-JOIN maintenance: each epoch joins only
  *     the TOUCHED-BUCKET rows to the broadcast dimension, never the full
  *     state;
  *   - secondary index on status ([[Index.commitIndexDelta]]) — unfenced
  *     (its own max_by merge absorbs replays).
  *
  * Every maintainer consumes the (prev, merged) frames the state merge
  * ALREADY computed, so the changelog is read once and the state merged
  * once per epoch no matter how many derived tables ride along — versus one
  * full re-stream per table when each runs standalone (the round-7 shape:
  * three streams × ~8 s collapse into one). Crash protocol is unchanged
  * from the standalone operators: MV deltas fence first, index and state
  * replay idempotently, so every crash point recovers.
  *
  * The run is memoized per (JVM, fixture): the declared queries
  * cdc_pipeline_full / cdc_apply_sink_dsv2 / cdc_mv_agg / cdc_mv_join /
  * cdc_secondary_index are VIEWS over one shared pass, each hash-checked
  * against its own independent oracle.
  */
object Pipeline {

  /** Output directories of one composed run. */
  case class Dirs(state: String, mv: String, mvJoin: String, idx: String)

  private val runs = new java.util.concurrent.ConcurrentHashMap[String, Dirs]()

  /** Run (or reuse) the composed pass for a fixture dir. */
  def runFull(spark: SparkSession, sfDir: String): Dirs =
    runs.computeIfAbsent(sfDir, _ => {
      val clDir = Changelog.stageEnvelopeJson(spark, sfDir)
      val work = Files.createTempDirectory(Paths.get("/tmp"), "graft-pipeline-").toString
      val dirs = Dirs(s"$work/state", s"$work/mv", s"$work/mv_join", s"$work/idx")
      val dim = graft.model.Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment"))
      val hookKey = s"pipeline-${java.util.UUID.randomUUID()}"
      ChangelogStateSink.maintainers.put(hookKey,
        (prev: DataFrame, merged: DataFrame, epochId: Long) => {
          // MV deltas first (fenced, non-idempotent), index second
          // (idempotent), then the caller promotes the state buckets
          Materialize.commitDelta(prev.sparkSession, dirs.mv, epochId,
            prev, merged, Seq("o_orderstatus"),
            Materialize.aggContrib("o_orderstatus", "o_totalprice"))
          Materialize.commitDelta(prev.sparkSession, dirs.mvJoin, epochId,
            prev, merged, Seq("c_mktsegment"),
            Materialize.joinAggContrib(dim, "o_custkey", "c_custkey",
              "c_mktsegment", "o_totalprice"))
          Index.commitIndexDelta(prev, merged, epochId, dirs.idx, "o_orderstatus")
        })
      // per-epoch merges + deltas run over touched-bucket-sized data; 8
      // shuffle partitions fit that (restored after — same sizing note as
      // the standalone MV stream)
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val pSchema = Changelog.payloadSchema(spark, sfDir)
        val decoded = spark.readStream.format("changelog")
          .option("maxFilesPerTrigger", 2)
          .load(clDir)
          .filter(col("table") === "orders")
          .select(Seq(col("id"), col("seq"), col("op")) :+
            from_json(col("payload"), pSchema).as("p"): _*)
          .select(Seq(col("id"), col("seq"), col("op")) ++
            Changelog.payloadCols.map(c => col(s"p.$c").as(c)): _*)
        val q = decoded.writeStream.format("changelog-state")
          .option("path", dirs.state)
          .option("schema", decoded.schema.toDDL)
          .option("keyCols", "id")
          .option("maintainer", hookKey)
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        ChangelogStateSink.maintainers.remove(hookKey)
      }
      dirs
    })

  /** The materialized state of the composed pass — identical to every other
    * cdc_apply rendering (shares their oracle). */
  def qState(spark: SparkSession, sfDir: String): DataFrame =
    ChangelogStream.readState(spark, runFull(spark, sfDir).state, Changelog.payloadCols)
      .orderBy(col("o_orderkey"))

  /** The composed pass's cross-output COHERENCE gate, BIDIRECTIONAL: the
    * state semi-joined to the secondary index on (status, key) — dropping
    * any state row the index missed — UNIONED with every index entry that
    * points at no live state row (null-padded to the payload shape). The
    * two tables are maintained by independent mechanisms off the one
    * merge; a missing index entry drops a row here, a STALE one (e.g. an
    * entry a TRUNCATE should have retracted) injects an alien row — either
    * way the hash check fails. When coherent the result IS the state, so
    * the query shares the state oracle: equality is the assertion. */
  private def stateIndexCoherent(spark: SparkSession, stateDir: String,
                                 idxDir: String): DataFrame = {
    val state = ChangelogStream.readState(spark, stateDir, Changelog.payloadCols)
    val idx = ChangelogStream.readState(spark, idxDir, Seq("v", "id"))
      .select(col("v").as("o_orderstatus"), col("id").as("o_orderkey"))
    val present = state.join(idx, Seq("o_orderstatus", "o_orderkey"), "left_semi")
      .select(Changelog.payloadCols.map(col): _*)
    val stale = idx.join(state, Seq("o_orderstatus", "o_orderkey"), "left_anti")
      .select(Changelog.payloadCols.map(c =>
        if (c == "o_orderstatus" || c == "o_orderkey") col(c)
        else lit(null).cast(state.schema(c).dataType).as(c)): _*)
    present.unionByName(stale).orderBy(col("o_orderkey"))
  }

  def qStateIndexCoherent(spark: SparkSession, sfDir: String): DataFrame = {
    val dirs = runFull(spark, sfDir)
    stateIndexCoherent(spark, dirs.state, dirs.idx)
  }

  /** The per-status MV of the composed pass (shares cdc_mv_agg's oracle). */
  def qMv(spark: SparkSession, sfDir: String): DataFrame =
    Materialize.readMv(spark, runFull(spark, sfDir).mv)
      .select(col("o_orderstatus"), col("n"),
        round(col("s"), 2).cast("double").as("sum_value"))
      .orderBy(col("o_orderstatus"))

  /** The join-MV of the composed pass: revenue per market segment over
    * orders⋈customer, maintained incrementally (ΔO⋈C per epoch); equals
    * the re-aggregation of the fully-applied state joined to customer. */
  def qMvJoin(spark: SparkSession, sfDir: String): DataFrame =
    Materialize.readMv(spark, runFull(spark, sfDir).mvJoin)
      .select(col("c_mktsegment"), col("n"),
        round(col("s"), 2).cast("double").as("sum_value"))
      .orderBy(col("c_mktsegment"))

  /** The secondary index of the composed pass (shares cdc_secondary_index's
    * oracle): the (status → key) table of the live state. */
  def qIndex(spark: SparkSession, sfDir: String): DataFrame =
    ChangelogStream.readState(spark, runFull(spark, sfDir).idx, Seq("v", "id"))
      .select(col("v").as("o_orderstatus"), col("id").as("o_orderkey"))
      .orderBy(col("o_orderstatus"), col("o_orderkey"))

  // ── TRUNCATE through the composed pipeline ────────────────────────────

  private val truncRuns = new java.util.concurrent.ConcurrentHashMap[String, Dirs]()

  /** The composed pass over a TRUNCATE-bearing changelog: the fence-only
    * micro-batch flows through the same maintainer hook — the state merge
    * surfaces the fence-killed rows as the hook's `prev` frame
    * ([[ChangelogStream.upsertBatch]]), so the per-status MV debits every
    * truncated row's contribution and the secondary index retracts its
    * entries in the SAME batch that commits the O(1) fence. Round-8's gap:
    * the fence erased state in untouched buckets without the maintainers
    * ever seeing a delta, leaving stale MV cells and index entries. */
  def runTruncate(spark: SparkSession, sfDir: String): Dirs =
    truncRuns.computeIfAbsent(sfDir, _ => {
      val clDir = Changelog.stageEnvelopeJsonTruncatePhased(spark, sfDir)
      val work = Files.createTempDirectory(Paths.get("/tmp"), "graft-pipeline-trunc-").toString
      val dirs = Dirs(s"$work/state", s"$work/mv", s"$work/mv_join", s"$work/idx")
      val hookKey = s"pipeline-trunc-${java.util.UUID.randomUUID()}"
      ChangelogStateSink.maintainers.put(hookKey,
        (prev: DataFrame, merged: DataFrame, epochId: Long) => {
          Materialize.commitDelta(prev.sparkSession, dirs.mv, epochId,
            prev, merged, Seq("o_orderstatus"),
            Materialize.aggContrib("o_orderstatus", "o_totalprice"))
          Index.commitIndexDelta(prev, merged, epochId, dirs.idx, "o_orderstatus")
        })
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val pSchema = Changelog.payloadSchema(spark, sfDir)
        val decoded = spark.readStream.format("changelog")
          .option("maxFilesPerTrigger", 1) // p0 / p1 (fence alone) / p2
          .load(clDir)
          .select(Seq(col("id"), col("seq"), col("op")) :+
            from_json(col("payload"), pSchema).as("p"): _*)
          .select(Seq(col("id"), col("seq"), col("op")) ++
            Changelog.payloadCols.map(c => col(s"p.$c").as(c)): _*)
        val q = decoded.writeStream.format("changelog-state")
          .option("path", dirs.state)
          .option("schema", decoded.schema.toDDL)
          .option("keyCols", "id")
          .option("maintainer", hookKey)
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        ChangelogStateSink.maintainers.remove(hookKey)
      }
      dirs
    })

  /** Post-truncate state behind the bidirectional state/index coherence
    * gate — a stale (unretracted) index entry or a missing one breaks the
    * hash. Shares cdc_apply_truncate's oracle. */
  def qTruncateCoherent(spark: SparkSession, sfDir: String): DataFrame = {
    val dirs = runTruncate(spark, sfDir)
    stateIndexCoherent(spark, dirs.state, dirs.idx)
  }

  /** The per-status MV after the truncate-bearing run: every truncated
    * row's contribution debited, equal to the aggregate over the
    * post-truncate state. */
  def qTruncateMv(spark: SparkSession, sfDir: String): DataFrame =
    Materialize.readMv(spark, runTruncate(spark, sfDir).mv)
      .select(col("o_orderstatus"), col("n"),
        round(col("s"), 2).cast("double").as("sum_value"))
      .orderBy(col("o_orderstatus"))
}

package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog-apply: the reference pipeline's composite semantics (SURVEY.md
  * §2.1, operators O8–O14). Given an ordered changelog keyed by `id`, the
  * materialized state of a table is: for each id, the latest row by `seq`,
  * unless that latest row is a DELETE (tombstone).
  *
  * The reference applies this one synchronous Elasticsearch HTTP call per
  * event (reference `es.go:77,100,135`, single thread `producer.go:70-173`).
  * Spark-first rendering: one hash-partitioned window over (id) — every key
  * is resolved independently, so the operator scales linearly with
  * executors; no driver-side state, no per-event round-trips.
  *
  * UPDATE merge semantics: the reference's update is painless `putAll`
  * (reference `es.go:55-61`) — a per-field merge. pgoutput update events
  * carry the complete new tuple (reference `producer.go:143-145`), so
  * full-row last-writer-wins is exactly `putAll` merge; for partial updates
  * [[mergeApply]] below does per-field latest-non-null.
  *
  * Scale note: `row_number` over partitionBy(id) is a single shuffle on the
  * key — the minimum any keyed materialization needs. AQE handles skewed
  * keys; at 100 TB you'd additionally bucket the state table by id so that
  * incremental re-apply (state ⟗ new-batch) is shuffle-free on the state
  * side — that is what [[ChangelogStream]]'s foreachBatch sink does per
  * micro-batch.
  */
object Apply {

  /** Latest-row-wins apply. `payloadCols` are the row columns to emit.
    *
    * Implemented as `max_by(struct(row), seq)` hash aggregation rather than
    * the equivalent `row_number` window: the aggregate gets map-side partial
    * combine, so only one candidate row per (input partition, key) ever
    * reaches the shuffle — on a 100 TB changelog with hot keys that is the
    * difference between shuffling every event and shuffling ~one row per
    * key per partition. (The window form shuffles and sorts everything; it
    * remains in [[windowedLatestState]] as the reference formulation.) */
  /** The op kinds the pipeline applies; anything else (the reference drops
    * Truncate/Begin/Commit/Type/Origin messages, `producer.go:161-166`) is
    * filtered out before the merge. UPSERT is the engine's own kind: it is
    * what [[compact]] emits for a live key (a compacted event has no
    * insert-vs-update history left to preserve), and the merge treats it
    * exactly like the other non-delete ops. */
  val handledOps: Seq[String] = Seq("INSERT", "UPDATE", "DELETE", "UPSERT")

  def latestState(changelog: DataFrame, payloadCols: Seq[String]): DataFrame = {
    val rowStruct = struct(col("op") +: payloadCols.map(col): _*)
    changelog
      .filter(col("op").isin(handledOps: _*))
      .groupBy(col("id"))
      .agg(max_by(rowStruct, col("seq")).as("last"))
      .filter(col("last.op") =!= "DELETE")
      .select(payloadCols.map(c => col(s"last.$c").as(c)): _*)
  }

  /** The `row_number` window formulation of [[latestState]] — identical
    * result; kept as the window-function rendering of the same semantics. */
  def windowedLatestState(changelog: DataFrame, payloadCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("seq").desc)
    changelog
      .filter(col("op").isin(handledOps: _*))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "DELETE")
      .select(payloadCols.map(col): _*)
  }

  /** Per-field merge apply (painless putAll semantics for *partial* updates):
    * for each id, for each field, the latest non-null value among events
    * AFTER the last DELETE (a delete clears the document — reference
    * `es.go:112-144` — so pre-delete field values must not survive a
    * re-insert), and the key exists only if any event follows the last
    * DELETE. One aggregation, a single shuffle on id: each field carries
    * both its latest value (max_by over seq) and that value's seq, and a
    * projection fences both on the delete seq.
    *
    * `keyField` names the payload column that is the natural key (the column
    * `id` was derived from). Without it, a post-delete partial event carrying
    * null for that column would emit a row whose key field is null even
    * though the grouping id is known; naming it coalesces the field with the
    * grouping id so the emitted key is never lost.
    */
  def mergeApply(changelog: DataFrame, payloadCols: Seq[String],
                 keyField: Option[String] = None): DataFrame = {
    val handled = changelog.filter(col("op").isin(handledOps: _*))
    def liveSeq(c: String): Column =
      when(col("op") =!= "DELETE" && col(c).isNotNull, col("seq"))
    val agg: Seq[Column] =
      max(when(col("op") === "DELETE", col("seq"))).as("last_delete_seq") +:
      max(col("seq")).as("last_seq") +:
      payloadCols.flatMap { c => Seq(
        max_by(col(c), liveSeq(c)).as(s"val_$c"),
        max(liveSeq(c)).as(s"seq_$c"))
      }
    val fence = coalesce(col("last_delete_seq"), lit(Long.MinValue))
    handled.groupBy(col("id"))
      .agg(agg.head, agg.tail: _*)
      .filter(col("last_delete_seq").isNull || col("last_delete_seq") < col("last_seq"))
      .select(payloadCols.map { c =>
        val v = when(col(s"seq_$c") > fence, col(s"val_$c"))
        val out =
          if (keyField.contains(c))
            coalesce(v, col("id").cast(changelog.schema(c).dataType))
          else v
        out.as(c)
      }: _*)
  }

  /** Changelog COMPACTION (Kafka compacted-topic semantics): collapse a
    * changelog to ONE event per key — the latest payload as an UPSERT, or
    * a TOMBSTONE (op = DELETE, carrying the deleted row's before-image the
    * way a Debezium delete event does) when the key's last event is a
    * DELETE. The reference produces to topic "CDC" with no retention
    * story at all (`utils.go:79-89`) and its consumer always re-reads from
    * `OffsetOldest` (`utils.go:49`) — so the topic, and every restart's
    * replay, grow with HISTORY. Compaction bounds both with STATE: unlike
    * [[latestState]] the tombstones survive, so a downstream consumer that
    * already holds pre-compaction state still learns about deletions —
    * apply(compact(log)) == apply(log) for a fresh consumer (the two
    * declared queries share one oracle) and merging a compacted tail into
    * existing keyed state stays correct for a resuming one.
    *
    * Same one-shuffle map-side-combined `max_by` merge as the apply (one
    * aggregation carries both the winning row and its seq). At 100 TB this
    * is how log retention is bounded: compact closed segments periodically
    * — output ∝ live keys + tombstones, not events — and bootstrap new
    * consumers from the compacted prefix plus the live tail
    * ([[bootstrap]]). `payloadCols` must not shadow the envelope columns
    * (`id`/`seq`/`op`) — the output carries both. */
  def compact(changelog: DataFrame, payloadCols: Seq[String]): DataFrame = {
    val rowStruct = struct(col("op") +: payloadCols.map(col): _*)
    changelog
      .filter(col("op").isin(handledOps: _*))
      .groupBy(col("id"))
      .agg(max(col("seq")).as("seq"), max_by(rowStruct, col("seq")).as("last"))
      .select(Seq(col("id"), col("seq"),
        when(col("last.op") === "DELETE", lit("DELETE"))
          .otherwise(lit("UPSERT")).as("op")) ++
        payloadCols.map(c => col(s"last.$c").as(c)): _*)
  }

  /** Snapshot + tail BOOTSTRAP (initial load): the reference creates a
    * TEMPORARY replication slot at the server's current LSN
    * (`producer.go:55-60`) — a consumer that starts late, or loses its
    * slot, silently misses every earlier row and there is no way to
    * recover them from the stream. The standard fix: seed from a
    * consistent table snapshot and apply only the changelog TAIL past the
    * snapshot's LSN. Snapshot rows become synthetic INSERTs at
    * `snapshotSeq` (strictly below every tail seq), and the ordinary
    * latest-state merge resolves the rest — updates/deletes in the tail
    * supersede their snapshot row by seq.
    *
    * At 100 TB the snapshot is ONE table scan (bucketed, no shuffle when
    * the snapshot layout matches the state's) and the tail is bounded by
    * retention — no replay of unbounded history; the merge is the apply's
    * single key-shuffle. */
  def bootstrap(snapshot: DataFrame, keyCol: String, tail: DataFrame,
                payloadCols: Seq[String], snapshotSeq: Long = 0L): DataFrame = {
    val snapEvents = snapshot.select(
      Seq(col(keyCol).cast("long").as("id"),
        lit(snapshotSeq).as("seq"), lit("INSERT").as("op")) ++
        payloadCols.map(col): _*)
    latestState(
      snapEvents.unionByName(tail.select(snapEvents.columns.map(col): _*)),
      payloadCols)
  }

  /** TRUNCATE as an APPLIED operation — the second documented upgrade over
    * the reference, which drops Truncate messages with Begin/Commit
    * (`producer.go:161-166`) and so leaves a truncated table fully
    * populated downstream. Semantics: a TRUNCATE at seq T erases every
    * event of its table with seq <= T; later events (re-inserts, full-row
    * updates) rebuild the table from empty. Rendered as one broadcast join
    * of the (tables × truncates → max seq) fence — rows-per-table, tiny by
    * construction — then the normal latest-state merge; no per-key
    * bookkeeping, and at 100 TB the fence is the only extra state. The
    * streaming rendering keeps the same fence as O(1) versioned metadata in
    * the bucketed state sink ([[ChangelogStream.upsertBatch]]) rather than
    * rewriting every bucket. */
  def truncateApply(changelog: DataFrame, payloadCols: Seq[String]): DataFrame = {
    val fences = changelog.filter(col("op") === "TRUNCATE")
      .groupBy(col("table")).agg(max(col("seq")).as("__trunc_seq"))
    latestState(
      changelog.join(broadcast(fences), Seq("table"), "left_outer")
        .filter(col("__trunc_seq").isNull || col("seq") > col("__trunc_seq"))
        .drop("__trunc_seq"),
      payloadCols)
  }

  /** Transaction-atomic apply — a documented IMPROVEMENT over the
    * reference, which drops Begin/Commit messages outright
    * (`producer.go:163-166`, SURVEY §4.3 item 5) and can therefore
    * materialize half a transaction if the stream stops mid-txn. Here
    * events carry a `txn` id and a transaction becomes visible only when
    * its COMMIT marker has arrived: one semi-join of the (tiny, broadcast)
    * committed-txn set gates the whole batch, then the normal latest-state
    * merge runs — all-or-nothing per transaction, no per-event
    * bookkeeping. At 100 TB the marker set is the only extra state and it
    * is proportional to open transactions, not events. */
  def txnApply(changelog: DataFrame, payloadCols: Seq[String]): DataFrame = {
    val committed = changelog.filter(col("op") === "COMMIT")
      .select(col("txn")).distinct()
    latestState(
      changelog.join(broadcast(committed), Seq("txn"), "left_semi"), payloadCols)
  }

  /** Time-travel state diff: the net change set between two as-of-seq
    * snapshots of the materialized state — per key, ADDED (alive only in
    * the newer snapshot), REMOVED (alive only in the older), or UPDATED
    * (alive in both with any payload field changed; unchanged keys are
    * omitted). The version axis is the changelog's `seq`, the same axis
    * cdc_time_travel snapshots on — this is the audit/debug companion:
    * "what changed between LSN A and LSN B".
    *
    * Rendered as two as-of applies + one full-outer join ON THE GROUPING
    * ID — not the payload key column: the apply's aggregation already
    * hash-partitions each side on `id`, and joining on that same attribute
    * lets Catalyst reuse the partitioning, so the join adds ZERO exchanges
    * (one shuffle per side total; joining on a renamed payload column
    * would re-shuffle both sides — plan-audited). Over the bucketed state
    * sink ([[ChangelogStream]]) you would instead diff two committed
    * bucket VERSIONS directly — co-partitioned by construction, no shuffle
    * at all — this is the changelog-axis rendering of that operation. */
  def stateDiff(changelog: DataFrame, payloadCols: Seq[String], key: String,
                asOfOld: Long, asOfNew: Long,
                diffCols: Seq[String]): DataFrame = {
    val rowStruct = struct(col("op") +: payloadCols.map(col): _*)
    def snap(asOf: Long, alias: String) = changelog
      .filter(col("seq") <= asOf && col("op").isin(handledOps: _*))
      .groupBy(col("id"))
      .agg(max_by(rowStruct, col("seq")).as("last"))
      .filter(col("last.op") =!= "DELETE")
      .select(col("id"),
        struct(payloadCols.map(c => col(s"last.$c").as(c)): _*).as(alias))
    classifyDiff(snap(asOfOld, "o"), snap(asOfNew, "n"),
      key, changelog.schema(key).dataType, diffCols)
  }

  /** Version-addressed diff: the same ADDED/REMOVED/UPDATED classification
    * over two MATERIALIZED state frames — e.g. a [[Buckets.savepoint]]'s
    * pinned snapshot vs the live state ([[ChangelogStream.readStateAt]] /
    * `readState`). No changelog re-apply: each side is a direct read of
    * committed bucket versions (co-bucketed by construction, so at scale
    * the join reuses the layout instead of re-shuffling history). */
  def stateDiffVersions(oldState: DataFrame, newState: DataFrame,
                        payloadCols: Seq[String], key: String,
                        diffCols: Seq[String]): DataFrame = {
    def side(df: DataFrame, alias: String) = df
      .select(col("id"), struct(payloadCols.map(col): _*).as(alias))
    classifyDiff(side(oldState, "o"), side(newState, "n"),
      key, oldState.schema(key).dataType, diffCols)
  }

  private def classifyDiff(o: DataFrame, n: DataFrame, key: String,
                           keyType: org.apache.spark.sql.types.DataType,
                           diffCols: Seq[String]): DataFrame =
    o.join(n, Seq("id"), "full_outer")
      .withColumn("change",
        when(col("o").isNull, "ADDED")
          .when(col("n").isNull, "REMOVED")
          .when(!(col("o") <=> col("n")), "UPDATED"))
      .filter(col("change").isNotNull)
      .select(Seq(col("id").cast(keyType).as(key),
        col("change")) ++
        diffCols.flatMap(c => Seq(
          col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c"))): _*)

  /** SCD TYPE-2 history from the changelog: where the reference's store
    * (and [[latestState]]) keeps only the current row per key (SCD-1
    * overwrite), this derives the full slowly-changing-dimension table —
    * one row per (key, version) with its validity interval on the seq/LSN
    * axis. Each INSERT/UPDATE opens an interval at its seq; the next event
    * on the key (including a DELETE) closes it; the live version carries a
    * null `valid_to`. One `lead` window over (id) — a single shuffle on
    * the key, the same minimum as the apply; a DELETE closes the prior
    * interval but opens none. Snapshot-as-of-S is then a filter
    * (`valid_from <= S < coalesce(valid_to, ∞)`) instead of a re-apply —
    * the warehouse-side complement of [[stateDiff]]/cdc_time_travel. */
  def scd2(changelog: DataFrame, payloadCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("seq"))
    changelog
      .filter(col("op").isin(handledOps: _*))
      .withColumn("valid_to", lead(col("seq"), 1).over(w))
      .filter(col("op") =!= "DELETE")
      .select(payloadCols.map(col) :+
        col("seq").as("valid_from") :+ col("valid_to"): _*)
  }

  /** Op-type dispatch (reference consumer switch, `utils.go:103-113`):
    * event counts per operation — the consumer-side "routing table". */
  def opCounts(changelog: DataFrame): DataFrame =
    changelog.groupBy(col("table"), col("op")).count()
      .orderBy(col("table"), col("op"))

  /** Idempotent insert (the reference's replay-duplication fix, SURVEY §4.3
    * item 3): key-addressed dedup of an insert stream — first writer wins by
    * seq (`min_by` keeps the choice deterministic, unlike `dropDuplicates`
    * which is arrival-order dependent; same map-side-combine shape as
    * [[latestState]]). */
  def insertDedup(inserts: DataFrame, payloadCols: Seq[String]): DataFrame =
    inserts.groupBy(col("id"))
      .agg(min_by(struct(payloadCols.map(col): _*), col("seq")).as("first"))
      .select(payloadCols.map(c => col(s"first.$c").as(c)): _*)

  /** Keyed delete as an anti-join (reference O14 `delete_by_query`,
    * `es.go:112-144`): state minus delete keys. Broadcast the delete-key
    * side when small — deletes are usually a sliver of state. */
  def applyDeletes(state: DataFrame, deleteKeys: DataFrame, key: String): DataFrame =
    state.join(deleteKeys.select(col(key)).distinct(), Seq(key), "left_anti")
}

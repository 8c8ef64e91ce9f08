package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** ILM rollover ([[Rollover]]): the max_docs condition rolls the write
  * alias, the registry records per-generation ts spans, and a time-range
  * read opens ONLY overlapping generations. */
class RolloverSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def work() = graft.model.TempDirs.deleteOnExit(
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/tmp"), "graft-rolltest-").toString)

  private def batch(ids: Range, dayOfJan: Int) =
    ids.map(i => (i.toLong, f"2024-01-$dayOfJan%02d 12:00:00", i.toLong % 3))
      .toDF("event_id", "s", "user_id")
      .select($"event_id", $"s".cast("timestamp").as("ts"), $"user_id",
        concat(lit("t"), $"user_id").as("event_type"), lit(1.0).as("value"))

  test("max_docs below the batch size rolls per batch; above it, batches " +
    "share a generation — and the registry records true spans") {
    // threshold the batches never reach: everything lands in gen 1
    val calm = work()
    Rollover.write(spark, calm, batch(0 until 10, 3), maxDocs = 100L)
    Rollover.write(spark, calm, batch(10 until 20, 9), maxDocs = 100L)
    val calmGens = Rollover.readRegistry(spark, calm)
    assert(calmGens.size === 1 && calmGens.head.docs === 20L)
    // threshold each batch crosses: one generation per batch + the fresh
    // write target the last roll created
    val busy = work()
    Rollover.write(spark, busy, batch(0 until 10, 3), maxDocs = 5L)
    Rollover.write(spark, busy, batch(10 until 20, 9), maxDocs = 5L)
    val busyGens = Rollover.readRegistry(spark, busy)
    assert(busyGens.count(_.docs > 0) === 2 && busyGens.size === 3)
    val Seq(g1, g2) = busyGens.filter(_.docs > 0)
    assert(g1.docs === 10L && g2.docs === 10L)
    // spans: each generation covers exactly its batch's day
    def day(micros: Long) =
      java.time.Instant.ofEpochMilli(micros / 1000L).toString.take(10)
    assert(day(g1.minTs) === "2024-01-03" && day(g1.maxTs) === "2024-01-03")
    assert(day(g2.minTs) === "2024-01-09" && day(g2.maxTs) === "2024-01-09")
  }

  test("the read alias prunes to overlapping generations and the union " +
    "answers exactly like the flat table") {
    val fam = work()
    Rollover.write(spark, fam, batch(0 until 8, 3), maxDocs = 1L)
    Rollover.write(spark, fam, batch(8 until 16, 9), maxDocs = 1L)
    Rollover.write(spark, fam, batch(16 until 24, 17), maxDocs = 1L)
    def micros(day: String) =
      java.time.Instant.parse(s"${day}T00:00:00Z").toEpochMilli * 1000L
    // a range covering only days 9 and 17: generation 1 must never open
    val (df, hit) = Rollover.readOverlapping(spark, fam,
      micros("2024-01-05"), micros("2024-01-20"), Seq("event_id", "ts"))
    assert(hit.size === 2 && !hit.exists(_.dir.endsWith("gen-000001")))
    assert(df.count() === 16L)
    // ...and the union's rows are exactly the flat in-range rows
    val ids = df.collect().map(_.getLong(0)).toSet
    assert(ids === (8 until 24).map(_.toLong).toSet)
    // a range beyond every span opens nothing
    val (none, miss) = Rollover.readOverlapping(spark, fam,
      micros("2024-02-01"), micros("2024-03-01"), Seq("event_id"))
    assert(miss.isEmpty && none.count() === 0L)
  }

  test("a replayed batch whose registry write committed neither " +
    "re-counts nor re-spans — the seq fence (VERDICT r16 wrong #4)") {
    val fam = work()
    Rollover.write(spark, fam, batch(0 until 10, 3), maxDocs = 100L)
    val once = Rollover.readRegistry(spark, fam)
    assert(once.head.docs === 10L)
    // the crash point the fence exists for: checkpoint lost AFTER the
    // registry flip — the stream re-delivers the committed batch verbatim
    Rollover.write(spark, fam, batch(0 until 10, 3), maxDocs = 100L)
    assert(Rollover.readRegistry(spark, fam) === once,
      "a committed batch's replay must be a registry no-op")
    // ...and a GENUINE next batch still lands normally after the fence
    Rollover.write(spark, fam, batch(10 until 20, 9), maxDocs = 100L)
    assert(Rollover.readRegistry(spark, fam).head.docs === 20L)
    // the boundary case: a roll-crossing batch's replay must not touch
    // the freshly-created write target either (the fence is family-level,
    // not per-generation — an empty gen has no seqs to compare)
    val busy = work()
    Rollover.write(spark, busy, batch(0 until 10, 3), maxDocs = 5L)
    val rolled = Rollover.readRegistry(spark, busy)
    assert(rolled.size === 2 && rolled.last.docs === 0L)
    Rollover.write(spark, busy, batch(0 until 10, 3), maxDocs = 5L)
    assert(Rollover.readRegistry(spark, busy) === rolled)
  }

  test("a fence-straddling batch fails loudly instead of half-replaying " +
    "(ADVICE r17); a one-line pre-fence registry reads as unfenced") {
    val fam = work()
    Rollover.write(spark, fam, batch(0 until 10, 3), maxDocs = 100L)
    // a re-chunked batch mixing committed seqs (0-9) with new ones (10-14)
    // violates the monotone-seq contract — silent skip would LOSE 10-14,
    // silent run would double-count 0-9; the guard refuses it
    val e = intercept[IllegalArgumentException] {
      Rollover.write(spark, fam, batch(5 until 15, 9), maxDocs = 100L)
    }
    assert(e.getMessage.contains("straddles the family fence"))
    assert(Rollover.readRegistry(spark, fam).head.docs === 10L,
      "the refused batch must leave the registry untouched")
    // format tolerance: a pre-r17 single-line registry (no fence header)
    // reads as (unfenced, gens) instead of throwing a MatchError
    val old = work()
    val p = new org.apache.hadoop.fs.Path(s"$old/registry")
    MetaFile.write(p.getFileSystem(spark.sparkContext.hadoopConfiguration),
      p, s"$old/gen-000001|100|200|5")
    val (fence, gens) = Rollover.readRegistryFenced(spark, old)
    assert(fence === Long.MinValue && gens.size === 1 && gens.head.docs === 5L)
    // ...and garbage fails with the explicit format message
    MetaFile.write(p.getFileSystem(spark.sparkContext.hadoopConfiguration),
      p, "1\n2\n3")
    val e2 = intercept[IllegalStateException] {
      Rollover.readRegistryFenced(spark, old)
    }
    assert(e2.getMessage.contains("unrecognized rollover registry format"))
  }

  test("expire on the keyed events family: old generations retire, a " +
    "savepoint-pinned one survives, the write tail is untouchable (r18)") {
    val fam = work()
    Rollover.write(spark, fam, batch(0 until 8, 3), maxDocs = 1L)
    Rollover.write(spark, fam, batch(8 until 16, 9), maxDocs = 1L)
    Rollover.write(spark, fam, batch(16 until 24, 17), maxDocs = 1L)
    val gens = Rollover.readRegistry(spark, fam)
    assert(gens.count(_.docs > 0) === 3)
    // pin generation 2 (a keyed-state family: the gen dir IS the state)
    Buckets.savepoint(spark, gens(1).dir, "hold")
    def micros(day: String) =
      java.time.Instant.parse(s"${day}T00:00:00Z").toEpochMilli * 1000L
    // cutoff past generations 1-2: gen 1 deletes, gen 2 survives its pin
    val (expired, pinned) = Rollover.expire(spark, fam,
      minKeepTs = micros("2024-01-15"), keepLast = 1,
      isPinned = g => Buckets.savepointNames(spark, g.dir).nonEmpty)
    assert(expired.map(_.dir) === Seq(gens.head.dir))
    assert(pinned.map(_.dir) === Seq(gens(1).dir))
    val after = Rollover.readRegistry(spark, fam)
    assert(!after.exists(_.dir == gens.head.dir))
    assert(after.exists(_.dir == gens(1).dir))
    assert(!new java.io.File(gens.head.dir).exists())
    // the read alias serves the retained rows only
    val (df, _) = Rollover.readOverlapping(spark, fam,
      micros("2024-01-01"), micros("2024-02-01"), Seq("event_id"))
    assert(df.collect().map(_.getLong(0)).toSet ===
      (8 until 24).map(_.toLong).toSet)
    // an aggressive cutoff can never take the write tail: gen 3 is the
    // last POPULATED entry but the empty write target is the tail — gen 3
    // expires only if unpinned and aged out; the TAIL entry never does
    val (exp2, _) = Rollover.expire(spark, fam,
      minKeepTs = Long.MaxValue, keepLast = 1,
      isPinned = g => Buckets.savepointNames(spark, g.dir).nonEmpty)
    assert(exp2.map(_.dir) === Seq(gens(2).dir),
      "only the aged unpinned generation goes; the tail survives")
    assert(Rollover.readRegistry(spark, fam).last.docs === 0L)
  }

  test("a crash between the expire registry flip and the dir deletes " +
    "converges on the next expire — even a no-op one (the orphan sweep)") {
    val fam = work()
    Rollover.write(spark, fam, batch(0 until 8, 3), maxDocs = 1L)
    Rollover.write(spark, fam, batch(8 until 16, 9), maxDocs = 1L)
    val (fence, gens) = Rollover.readRegistryFenced(spark, fam)
    // simulate the crash point: the registry committed the retirement of
    // generation 1 but the process died before its dir was deleted
    Rollover.writeRegistry(spark, fam, fence, gens.tail)
    assert(new java.io.File(gens.head.dir).exists(), "orphan precondition")
    // the replayed expire finds NOTHING eligible (cutoff below every
    // span) — yet the sweep still collects the unreferenced dir
    val (expired, pinned) = Rollover.expire(spark, fam,
      minKeepTs = Long.MinValue, keepLast = 1, isPinned = _ => false)
    assert(expired.isEmpty && pinned.isEmpty)
    assert(!new java.io.File(gens.head.dir).exists(),
      "the orphaned generation dir must be swept")
    assert(Rollover.readRegistryFenced(spark, fam) === (fence, gens.tail))
  }

  test("the declared query's default range prunes 2 of the fixture's 4 " +
    "generations; an all-covering range is served, not refused") {
    def micros(day: String) =
      java.time.Instant.parse(s"${day}T00:00:00Z").toEpochMilli * 1000L
    val fam = Rollover.rolloverRun(spark, sfDir)
    val gens = Rollover.readRegistry(spark, fam)
    assert(gens.count(_.docs > 0) === 4)
    val (_, hit) = Rollover.readOverlapping(spark, fam,
      micros("2024-01-10"), micros("2024-01-20"), Seq("event_id"))
    assert(hit.size === 2, s"default range must open weeks 2-3, got $hit")
    // full-month range: overlaps everything — a legitimate query that
    // must answer (the count equals the whole fixture), never refuse
    val full = Rollover.qCdcRollover(spark, sfDir,
      "2024-01-01", "2024-02-01")
    assert(full.agg(org.apache.spark.sql.functions.sum("doc_count"))
      .head().getLong(0) ===
      graft.model.Tables.events(spark, sfDir).count())
  }
}

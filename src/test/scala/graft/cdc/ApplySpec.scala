package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Changelog-apply semantics (SURVEY.md §5 item 2): last-writer-wins,
  * tombstones, order-independence, per-field merge. */
class ApplySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val cols = Seq("id", "v")
  private def cl(rows: (Long, Long, String, String, String)*) =
    rows.toDF("id", "seq", "op", "table", "v")

  test("an uncommitted transaction is applied all-or-nothing (nothing)") {
    def txCl(rows: (Long, Long, String, Long, String)*) =
      rows.toDF("id", "seq", "op", "txn", "v")
    val out = Apply.txnApply(txCl(
      // txn 10 committed: both events visible
      (1L, 1L, "INSERT", 10L, "a"),
      (2L, 2L, "INSERT", 10L, "b"),
      (0L, 9L, "COMMIT", 10L, null),
      // txn 20 never commits: NEITHER event may surface, even the update
      // that supersedes a committed row's seq
      (3L, 3L, "INSERT", 20L, "c"),
      (1L, 8L, "UPDATE", 20L, "a2")), Seq("id", "v"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "a"), (2L, "b")))
  }

  test("state diff classifies ADDED/REMOVED/UPDATED and omits unchanged keys") {
    val changes = Seq(
      (1L, 1L, "INSERT", 1L, 10.0), (1L, 11L, "UPDATE", 1L, 11.0), // UPDATED
      (2L, 2L, "INSERT", 2L, 20.0), (2L, 12L, "DELETE", 2L, 20.0), // REMOVED
      (3L, 10L, "INSERT", 3L, 30.0),                               // ADDED (after asOfOld=5)
      (4L, 4L, "INSERT", 4L, 40.0))                                // unchanged → omitted
      .toDF("id", "seq", "op", "k", "v")
    val out = Apply.stateDiff(changes, Seq("k", "v"), "k",
        asOfOld = 5L, asOfNew = Long.MaxValue, diffCols = Seq("v"))
      .orderBy("k").as[(Long, String, Option[Double], Option[Double])].collect()
    assert(out.toSeq === Seq(
      (1L, "UPDATED", Some(10.0), Some(11.0)),
      (2L, "REMOVED", Some(20.0), None),
      (3L, "ADDED", None, Some(30.0))))
  }

  test("insert then delete of same id yields no row") {
    val out = Apply.latestState(cl(
      (1L, 1L, "INSERT", "t", "a"),
      (1L, 2L, "DELETE", "t", "a")), Seq("id", "v"))
    assert(out.count() === 0)
  }

  test("last writer wins per key") {
    val out = Apply.latestState(cl(
      (1L, 1L, "INSERT", "t", "a"),
      (1L, 3L, "UPDATE", "t", "c"),
      (1L, 2L, "UPDATE", "t", "b"),
      (2L, 1L, "INSERT", "t", "x")), Seq("id", "v"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "c"), (2L, "x")))
  }

  test("delete then re-insert resurrects the key") {
    val out = Apply.latestState(cl(
      (1L, 1L, "INSERT", "t", "a"),
      (1L, 2L, "DELETE", "t", "a"),
      (1L, 3L, "INSERT", "t", "b")), Seq("id", "v"))
      .as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "b")))
  }

  test("compact collapses each key to one event and keeps tombstones") {
    val out = Apply.compact(cl(
      (1L, 1L, "INSERT", "t", "a"),
      (1L, 3L, "UPDATE", "t", "c"),   // live key: latest payload, UPSERT
      (1L, 2L, "UPDATE", "t", "b"),
      (2L, 1L, "INSERT", "t", "x"),
      (2L, 2L, "DELETE", "t", "x")),  // deleted key: before-image tombstone
      Seq("v"))
      .orderBy("id")
      .as[(Long, Long, String, Option[String])].collect()
    assert(out.toSeq === Seq(
      (1L, 3L, "UPSERT", Some("c")),
      (2L, 2L, "DELETE", Some("x"))))
  }

  test("a compacted tail still deletes from a resuming consumer's state") {
    // consumer already applied seq <= 1; the tail (seq > 1) compacts to a
    // tombstone for key 1 — merging it must drop the key, which is exactly
    // why compact keeps tombstones where latestState drops them
    val stateEvents = cl((1L, 1L, "INSERT", "t", "a"), (2L, 1L, "INSERT", "t", "x"))
    val tail = cl((1L, 2L, "UPDATE", "t", "b"), (1L, 3L, "DELETE", "t", "b"))
    val compactedTail = Apply.compact(tail, Seq("v"))
      .withColumn("table", lit("t"))
    val out = Apply.latestState(
      stateEvents.select(compactedTail.columns.map(col): _*)
        .unionByName(compactedTail), Seq("id", "v"))
      .as[(Long, String)].collect()
    assert(out.toSeq === Seq((2L, "x")))
  }

  test("apply(compact(log)) equals apply(log) on the orders fixture") {
    val base = Changelog.fromOrders(spark, sfDir)
    val a = Apply.latestState(base, Changelog.payloadCols)
    val b = Apply.latestState(
      Apply.compact(base, Changelog.payloadCols), Changelog.payloadCols)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("snapshot + tail bootstrap equals replaying the full changelog") {
    val base = Changelog.fromOrders(spark, sfDir)
    val full = Apply.latestState(base, Changelog.payloadCols)
    val boot = Apply.bootstrap(
      graft.model.Tables.orders(spark, sfDir), "o_orderkey",
      base.filter(col("seq") > 1000000L), Changelog.payloadCols)
    assert(full.exceptAll(boot).count() === 0 && boot.exceptAll(full).count() === 0)
  }

  test("max_by apply equals the window formulation") {
    val base = Changelog.fromOrders(spark, sfDir)
    val a = Apply.latestState(base, Changelog.payloadCols)
    val b = Apply.windowedLatestState(base, Changelog.payloadCols)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("apply is order-independent (shuffled changelog = sorted changelog)") {
    val base = Changelog.fromOrders(spark, sfDir)
    val shuffled = base.orderBy(rand(seed = 7)).repartition(13)
    val a = Apply.latestState(base, Changelog.payloadCols)
    val b = Apply.latestState(shuffled, Changelog.payloadCols)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("mergeApply does per-field latest-non-null (partial updates)") {
    // payload columns a, b; update at seq 2 only sets b (a is null)
    val events = Seq(
      (1L, 1L, "INSERT", Some("a1"), Some("b1")),
      (1L, 2L, "UPDATE", None, Some("b2")),
      (2L, 1L, "INSERT", Some("x"), Some("y")),
      (2L, 2L, "DELETE", None: Option[String], None: Option[String])
    ).toDF("id", "seq", "op", "a", "b")
    val out = Apply.mergeApply(events, Seq("a", "b")).orderBy("a")
      .as[(Option[String], Option[String])].collect()
    assert(out.toSeq === Seq((Some("a1"), Some("b2"))))
  }

  test("mergeApply: delete clears pre-delete fields (no resurrection on re-insert)") {
    // id 1: insert(a,b) → delete → partial re-insert (only a). The old b
    // must NOT leak through the merge (reference delete removes the doc).
    val events = Seq(
      (1L, 1L, "INSERT", Some("a1"), Some("b1")),
      (1L, 2L, "DELETE", None: Option[String], None: Option[String]),
      (1L, 3L, "INSERT", Some("a2"), None: Option[String])
    ).toDF("id", "seq", "op", "a", "b")
    val out = Apply.mergeApply(events, Seq("a", "b"))
      .as[(Option[String], Option[String])].collect()
    assert(out.toSeq === Seq((Some("a2"), None)))
  }

  test("mergeApply equals latestState for full-row updates") {
    val base = Changelog.fromOrders(spark, sfDir)
    val a = Apply.latestState(base, Changelog.payloadCols)
    val b = Apply.mergeApply(base, Changelog.payloadCols)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("insertDedup keeps exactly one row per key (first by seq)") {
    val ins = cl(
      (1L, 5L, "INSERT", "t", "late"),
      (1L, 1L, "INSERT", "t", "first"),
      (2L, 2L, "INSERT", "t", "only"))
    val out = Apply.insertDedup(ins, Seq("id", "v")).orderBy("id")
      .as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "first"), (2L, "only")))
  }

  test("applyDeletes removes exactly the delete keys") {
    val state = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val dels = Seq(2L, 9L).toDF("id")
    val out = Apply.applyDeletes(state, dels, "id").orderBy("id")
      .as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "a"), (3L, "c")))
  }

  test("mergeApply keyField: post-delete partial with null key keeps the grouping id") {
    // id 1: insert → delete → partial re-insert that does NOT carry the key
    // column ("id_f" null, only b set). Without keyField the emitted key
    // field is null; with keyField it is recovered from the grouping id.
    val events = Seq(
      (1L, 1L, "INSERT", Some(1L), Some("b1")),
      (1L, 2L, "DELETE", None: Option[Long], None: Option[String]),
      (1L, 3L, "UPDATE", None: Option[Long], Some("b2"))
    ).toDF("id", "seq", "op", "id_f", "b")
    val bare = Apply.mergeApply(events, Seq("id_f", "b"))
      .as[(Option[Long], Option[String])].collect()
    assert(bare.toSeq === Seq((None, Some("b2"))))
    val keyed = Apply.mergeApply(events, Seq("id_f", "b"), keyField = Some("id_f"))
      .as[(Option[Long], Option[String])].collect()
    assert(keyed.toSeq === Seq((Some(1L), Some("b2"))))
  }

  test("mergeApply ignores unknown op kinds (no null-row resurrection after delete)") {
    // a TRUNCATE after the DELETE must not make the key reappear as nulls
    val events = Seq(
      (1L, 1L, "INSERT", Some("a1"), Some("b1")),
      (1L, 2L, "DELETE", None: Option[String], None: Option[String]),
      (1L, 3L, "TRUNCATE", None: Option[String], None: Option[String])
    ).toDF("id", "seq", "op", "a", "b")
    assert(Apply.mergeApply(events, Seq("a", "b")).count() === 0)
  }

  test("schema evolution: a column added mid-stream flows through the apply") {
    // v1 files lack column "b"; v2 files carry it (the reference's
    // RelationMessage re-announcement, O3). mergeSchema unifies the read;
    // old events surface b as null and last-writer-wins still holds.
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/tmp"), "graft-evo-").toString
    try {
      Seq((1L, 1L, "INSERT", "a1"), (2L, 1L, "INSERT", "a2"))
        .toDF("id", "seq", "op", "a").write.parquet(s"$dir/files1")
      Seq((1L, 2L, "UPDATE", "a1b", "b1"))
        .toDF("id", "seq", "op", "a", "b").write.parquet(s"$dir/files2")
      val cl = spark.read.option("mergeSchema", "true")
        .parquet(s"$dir/files1", s"$dir/files2")
      val out = Apply.latestState(cl, Seq("a", "b")).orderBy("id")
        .as[(String, Option[String])].collect()
      assert(out.toSeq === Seq(("a1b", Some("b1")), ("a2", None)))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("unhandled op kinds are dropped like the reference's message filter") {
    // TRUNCATE at the highest seq must neither win LWW nor delete the key
    val out = Apply.latestState(cl(
      (1L, 1L, "INSERT", "t", "a"),
      (1L, 2L, "UPDATE", "t", "b"),
      (1L, 3L, "TRUNCATE", "t", "zzz")), Seq("id", "v"))
      .as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "b")))
  }

  test("truncateApply erases a table up to its fence; later events rebuild it") {
    val events = Seq(
      (1L, 1L, "INSERT", "t", "a"),     // erased by the truncate
      (2L, 2L, "INSERT", "t", "b"),     // erased
      (-1L, 5L, "TRUNCATE", "t", null), // fence at seq 5
      (2L, 6L, "UPDATE", "t", "b2"),    // rebuilds key 2 after the truncate
      (3L, 7L, "INSERT", "t", "c"),     // re-insert after the truncate
      (3L, 8L, "DELETE", "t", null),    // normal delete still applies
      (9L, 9L, "INSERT", "u", "x"))     // OTHER table: untouched by t's fence
      .toDF("id", "seq", "op", "table", "v")
    val out = Apply.truncateApply(events, Seq("id", "v"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq === Seq((2L, "b2"), (9L, "x")))
    // the LAST truncate wins when several arrive
    val twice = events.unionByName(
      Seq((-1L, 10L, "TRUNCATE", "t", null)).toDF("id", "seq", "op", "table", "v"))
    assert(Apply.truncateApply(twice, Seq("id", "v"))
      .orderBy("id").as[(Long, String)].collect().toSeq === Seq((9L, "x")))
  }

  test("scd2 derives validity intervals; a delete closes without opening") {
    val events = cl(
      (1L, 1L, "INSERT", "t", "a"), (1L, 3L, "UPDATE", "t", "b"),
      (1L, 5L, "DELETE", "t", "b"),
      (2L, 2L, "INSERT", "t", "x"),
      (3L, 4L, "INSERT", "t", "c"), (3L, 6L, "DELETE", "t", "c"),
      (3L, 7L, "INSERT", "t", "c2"))
    val out = Apply.scd2(events, Seq("id", "v"))
      .orderBy("id", "valid_from")
      .as[(Long, String, Long, Option[Long])].collect()
    assert(out.toSeq === Seq(
      (1L, "a", 1L, Some(3L)), (1L, "b", 3L, Some(5L)),
      (2L, "x", 2L, None),
      (3L, "c", 4L, Some(6L)), (3L, "c2", 7L, None)))
    // snapshot-as-of is a FILTER over the history, equal to the re-apply
    val asOf = 4L
    val viaScd2 = Apply.scd2(events, Seq("id", "v"))
      .filter($"valid_from" <= asOf &&
        ($"valid_to".isNull || $"valid_to" > asOf))
      .select("id", "v")
    val viaApply = Apply.latestState(events.filter($"seq" <= asOf), Seq("id", "v"))
    assert(viaScd2.exceptAll(viaApply).count() === 0)
    assert(viaApply.exceptAll(viaScd2).count() === 0)
  }

  test("corrupt envelope JSON decodes to null and is skipped (O9 semantics)") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k INT")
    val df = Seq("""{"k": 5}""", "not json at all", """{"k": "oops"}""").toDF("props")
    val ks = df.select(from_json($"props", schema).getField("k").as("k"))
      .collect().map(r => Option(r.get(0)))
    assert(ks.toSeq === Seq(Some(5), None, None))
    // the reference skips such events (utils.go:98-102): filter keeps 1 row
    assert(df.select(from_json($"props", schema).as("e"))
      .filter($"e.k".isNotNull).count() === 1)
  }

  test("changelog synthesis counts match the %5 / %7 rules") {
    val n = graft.model.Tables.orders(spark, sfDir).count()
    val byOp = Apply.opCounts(Changelog.fromOrders(spark, sfDir))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(byOp("INSERT") === n)
    assert(byOp("UPDATE") === (n + 4) / 5) // keys 0,5,10,... within 0..n-1
    assert(byOp("DELETE") === (n + 6) / 7)
  }
}

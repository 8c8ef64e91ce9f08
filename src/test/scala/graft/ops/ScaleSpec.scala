package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.model.Tables

/** Scale-technique evidence: salting, bucketed (shuffle-free) joins,
  * envelope round-trips, resize plumbing. */
class ScaleSpec extends AnyFunSuite with SparkSpec {

  test("salted aggregation equals plain aggregation") {
    val e = Tables.events(spark, sfDir)
    val salted = Skew.saltedCountSum(e, col("user_id"), col("value"))
      .orderBy(col("key")).collect()
    val plain = e.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double").as("sum_value"))
      .orderBy(col("key")).collect()
    assert(salted.map(_.toSeq).sameElements(plain.map(_.toSeq)))
  }

  test("salted join equals the plain join on skewed data, and salts the shuffle key") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // 70% of rows on one hot key; k15..k19 have no dim row (outer case)
    val large = (1 to 2000).map { i =>
      val k = if (rnd.nextDouble() < 0.7) "hot" else s"k${rnd.nextInt(20)}"
      (k, i.toDouble)
    }.toDF("key", "v")
    val small = ("hot" +: (0 until 15).map(i => s"k$i"))
      .map(k => (k, k.length.toLong)).toDF("key", "w")
    for (jt <- Seq("inner", "left_outer", "left_semi")) {
      val salted = Skew.saltedJoin(large, small.hint("merge"), Seq("key"), buckets = 8, joinType = jt)
      val plain = large.join(small, Seq("key"), jt)
      assert(salted.exceptAll(plain).count() === 0 && plain.exceptAll(salted).count() === 0,
        s"salted $jt join diverged from plain")
    }
    // the join condition really carries the salt (the skew-spreading key)
    val plan = Skew.saltedJoin(large, small.hint("merge"), Seq("key"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"salt not in join plan:\n$plan")
    // semantics-breaking join types are refused, not silently wrong
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(large, small, Seq("key"), 8, joinType = "full_outer")
    }
  }

  test("bucketed co-partitioned join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_b_orders")
    spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    // the catalog is in-memory per JVM but the warehouse dirs persist —
    // stale locations from a previous test run must go first
    for (t <- Seq("graft_b_orders", "graft_b_lineitem")) {
      val d = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (d.exists()) {
        d.listFiles().foreach(_.delete())
        d.delete()
      }
    }
    Tables.orders(spark, sfDir).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_b_orders")
    Tables.lineitem(spark, sfDir).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_b_lineitem")
        .join(spark.table("graft_b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_totalprice"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(j.count() === Tables.lineitem(spark, sfDir).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("DatabaseEvent envelope round-trips through to_json/from_json") {
    import graft.cdc.Changelog
    val cl = Changelog.fromOrders(spark, sfDir)
    val payloadStruct = struct(Changelog.payloadCols.map(col): _*)
    // O6: serialize the reference envelope (utils.go:22-26)
    val wire = cl.select(to_json(struct(
      col("op").as("operationType"),
      col("table").as("tableName"),
      col("id"), col("seq"),
      payloadStruct.as("payload"))).as("value"))
    // O9: deserialize with the declared schema
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "operationType STRING, tableName STRING, id BIGINT, seq BIGINT, " +
        "payload STRUCT<o_orderkey: BIGINT, o_custkey: BIGINT, o_orderstatus: STRING, " +
        "o_totalprice: DOUBLE, o_orderdate: TIMESTAMP, o_orderpriority: STRING>")
    val back = wire.select(from_json(col("value"), schema).as("e"))
      .select(col("e.operationType").as("op"), col("e.tableName").as("table"),
        col("e.id"), col("e.seq"), col("e.payload.*"))
    assert(back.count() === cl.count())
    assert(back.exceptAll(cl.select(back.columns.map(col): _*)).count() === 0)
  }

  test("resize fits the bounding box preserving aspect") {
    val out = Multimodal.resize(Multimodal.mediaFromDocuments(spark, sfDir), maxDim = 32)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, nw, nh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(nw <= 32 && nh <= 32 && nw >= 1 && nh >= 1)
      // aspect preserved within integer truncation
      assert(math.abs(nw.toDouble / nh - w.toDouble / h) < 0.2)
    }
  }
}

class PruneSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("bloom semi-join equals the plain semi-join") {
    val urgent = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
    val li = Tables.lineitem(spark, sfDir)
    val got = Prune.bloomSemiJoin(li, "l_orderkey", urgent, "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
    val exact = li.join(urgent.select(col("o_orderkey")).distinct(),
        li("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(got.exceptAll(exact).count() === 0 && exact.exceptAll(got).count() === 0)
  }

  test("bloom pre-filter prunes most non-matching rows before the join") {
    val urgent = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
    val li = Tables.lineitem(spark, sfDir)
    val total = li.count()
    val matching = li.join(urgent.select(col("o_orderkey")).distinct(),
      li("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val pruned = li.filter(
      Prune.bloomMightContain(li, "l_orderkey", urgent, "o_orderkey", 100000L)).count()
    // no false negatives, and the false-positive overhead stays small
    assert(pruned >= matching)
    assert(pruned <= matching + (total - matching) / 10,
      s"bloom kept $pruned of $total (true matches: $matching)")
  }
}

class LayoutSpec extends AnyFunSuite with SparkSpec {

  test("partitioned+sorted write prunes directories and sorts within files") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/tmp"), "graft-layout-").toString
    try {
      val events = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      Layout.writePartitionedSorted(events, dir,
        partCols = Seq("event_type"), sortCols = Seq("ts"))

      // directory layout: one dir per event_type, no file-per-task explosion
      val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
      assert(dirs.forall(_.startsWith("event_type=")) && dirs.length >= 3)

      // partition pruning: the VALUE must appear inside the scan's
      // PartitionFilters clause (the clause itself prints even when empty)
      val pruned = Layout.readPartition(spark, dir, "event_type", "purchase")
      val scan = pruned.queryExecution.executedPlan.toString
      val pf = scan.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
      assert(pf.contains("purchase"), s"partition predicate not pruned:\n$scan")
      assert(pruned.count() ===
        events.filter(col("event_type") === "purchase").count())

      // within-file sort at MICROsecond precision (ts is µs-granular;
      // a millisecond compare would hide sub-ms inversions)
      val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty)
      files.take(3).foreach { f =>
        val ts = spark.read.parquet(f.getPath)
          .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
        assert(ts.sameElements(ts.sorted), s"file ${f.getName} not ts-sorted")
      }

      // round-trip completeness
      val back = spark.read.parquet(dir)
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      assert(back.exceptAll(events).count() === 0 && events.exceptAll(back).count() === 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}

class CompactSpec extends AnyFunSuite with SparkSpec {

  test("compaction collapses a many-files table without changing its rows") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/tmp"), "graft-compact-").toString + "/t"
    try {
      val events = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"), col("value"))
      events.repartition(23).write.parquet(dir)
      def nFiles = new java.io.File(dir).listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(nFiles === 23)
      Layout.compact(spark, dir, targetFileBytes = 1L << 30)
      assert(nFiles === 1, s"expected 1 file after compaction, got $nFiles")
      val back = spark.read.parquet(dir)
        .select(col("event_id"), col("event_type"), col("value"))
      assert(back.exceptAll(events).count() === 0 && events.exceptAll(back).count() === 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir).getParentFile)
    }
  }

  /** The crashed-swap leftover's path: hidden sibling `.name.compact-old`
    * (compaction scratch dirs are dot-prefixed so partition discovery on a
    * partitioned root can never see them as data). */
  private def crashedOld(dir: String): java.io.File = {
    val f = new java.io.File(dir)
    new java.io.File(f.getParentFile, s".${f.getName}.compact-old")
  }

  test("a crash between the compact renames is recovered, losing nothing") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/tmp"), "graft-crash-").toString + "/t"
    val events = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    events.repartition(3).write.parquet(dir)
    // simulate the crash window: data only under .t.compact-old, nothing at dir
    assert(new java.io.File(dir).renameTo(crashedOld(dir)))
    Layout.recoverCompact(spark, dir)
    val back = spark.read.parquet(dir).select(col("event_id"), col("value"))
    assert(back.exceptAll(events).count() === 0 && events.exceptAll(back).count() === 0)
    // and compact() itself self-recovers before rewriting
    assert(new java.io.File(dir).renameTo(crashedOld(dir)))
    Layout.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(spark.read.parquet(dir).count() === events.count())
  }

  test("compactPartitioned collapses every leaf, preserving layout, pruning, and crashed leaves") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/tmp"), "graft-partleaf-").toString + "/t"
    try {
      val events = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"), col("value"))
      // the accretion scenario compaction exists for: many writers → many
      // files per leaf (writePartitionedSorted would coalesce per leaf)
      events.repartition(7).write.partitionBy("event_type").parquet(dir)
      val leaves = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
      assert(leaves.length >= 3 &&
        leaves.forall(_.listFiles().count(_.getName.endsWith(".parquet")) > 1))
      // one leaf crashed mid-swap in a "previous run": data only under the
      // hidden .<leaf>.compact-old — the walk must recover it, not skip it;
      // readers of the root meanwhile see neither the leftover nor a
      // phantom partition (the leftover is dot-prefixed)
      val crashed = leaves.head
      assert(crashed.renameTo(crashedOld(crashed.getPath)))

      Layout.compactPartitioned(spark, dir, targetFileBytes = 1L << 30)

      val after = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
      assert(after.map(_.getName).sorted.sameElements(leaves.map(_.getName).sorted),
        "partition directory layout changed")
      after.foreach { leaf =>
        assert(leaf.listFiles().count(_.getName.endsWith(".parquet")) === 1,
          s"leaf ${leaf.getName} not compacted")
      }
      // rows survive (including the crashed leaf) and pruning still works
      val back = spark.read.parquet(dir)
        .select(col("event_id"), col("event_type"), col("value"))
      assert(back.exceptAll(events).count() === 0 && events.exceptAll(back).count() === 0)
      val scan = Layout.readPartition(spark, dir, "event_type", "purchase")
        .queryExecution.executedPlan.toString
      val pf = scan.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
      assert(pf.contains("purchase"), s"partition predicate not pruned:\n$scan")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir).getParentFile)
    }
  }

  test("compactPartitioned walks multi-level layouts to their leaves") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/tmp"), "graft-twolevel-").toString + "/t"
    try {
      val events = Tables.events(spark, sfDir)
        .withColumn("half", (col("event_id") % 2).cast("int"))
        .select(col("event_id"), col("event_type"), col("half"), col("value"))
      events.repartition(5).write.partitionBy("event_type", "half").parquet(dir)
      Layout.compactPartitioned(spark, dir, targetFileBytes = 1L << 30)
      // every LEAF (type/half) dir holds one file; intermediate dirs hold none
      val typeDirs = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
      assert(typeDirs.nonEmpty)
      typeDirs.foreach { td =>
        assert(td.listFiles().count(_.getName.endsWith(".parquet")) === 0,
          s"files compacted into intermediate dir ${td.getName}")
        val halves = td.listFiles().filter(f => f.isDirectory && f.getName.startsWith("half="))
        assert(halves.nonEmpty)
        halves.foreach { leaf =>
          assert(leaf.listFiles().count(_.getName.endsWith(".parquet")) === 1,
            s"leaf ${td.getName}/${leaf.getName} not compacted")
        }
      }
      val back = spark.read.parquet(dir)
        .select(col("event_id"), col("event_type"), col("half"), col("value"))
      assert(back.exceptAll(events).count() === 0 && events.exceptAll(back).count() === 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir).getParentFile)
    }
  }

  test("compacting a partitioned layout is rejected, not flattened") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/tmp"), "graft-partcompact-").toString + "/t"
    Layout.writePartitionedSorted(
      Tables.events(spark, sfDir).select(col("event_id"), col("event_type"), col("value")),
      dir, partCols = Seq("event_type"), sortCols = Seq("event_id"))
    val e = intercept[IllegalArgumentException] {
      Layout.compact(spark, dir)
    }
    assert(e.getMessage.contains("partitioned"))
    // the layout is untouched and leaf-dir compaction still works
    val leaf = new java.io.File(dir).listFiles().find(_.getName.startsWith("event_type=")).get
    Layout.compact(spark, leaf.getPath, targetFileBytes = 1L << 30)
    assert(spark.read.parquet(dir).count() ===
      Tables.events(spark, sfDir).count())
  }
}

class PlanShapeSpec extends AnyFunSuite with SparkSpec {

  test("bloom prune runs as a scan-stage filter (before any exchange)") {
    val plan = graft.SparkEntry.queries("q_bloom_semijoin")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom filter missing:\n$plan")
    // the might_contain Filter must sit below the semi join, not above it
    val filterIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("LeftSemi")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"bloom filter should be under the semi join:\n$plan")
  }

  test("range join plans as an equi-join on the bin key, not a nested loop") {
    val plan = graft.SparkEntry.queries("q_range_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }

  test("q1 scan hygiene: shipdate filter pushed, unused columns pruned") {
    val plan = graft.SparkEntry.queries("q1_pricing")(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"shipdate predicate not pushed to the scan:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("l_quantity") && !readSchema.contains("l_comment") &&
      !readSchema.contains("l_orderkey"),
      s"scan should read only the referenced columns:\n$readSchema")
  }

  test("q5 star join broadcasts every dimension; the fact table never shuffles for a join") {
    val plan = graft.SparkEntry.queries("q5_nation_revenue")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 4, s"expected 4 broadcast joins, saw $broadcasts:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a dimension join fell back to sort-merge (fact-table shuffle):\n$plan")
  }

  test("q_bucketed_join reads co-bucketed tables with no exchange on either input") {
    val df = Layout.qBucketedJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join inputs must not shuffle:\n$plan")
    // result parity with the plain (unbucketed) join
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice").cast(DecimalType(18, 4))), 2)
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
    assert(df.collect().map(_.toSeq).toSeq === plain.collect().map(_.toSeq).toSeq)
  }

  test("doc_surprisal never FORCES a vocabulary broadcast — the LM join adapts to size") {
    // at fixture scale Catalyst rightly size-estimates the LM under the
    // broadcast threshold; what matters for 100 TB (vocabulary 10⁷–10⁸
    // terms) is that the query carries no broadcast HINT on the tok join,
    // so the planner degrades it to a shuffle join when the LM outgrows
    // the threshold. Disabling auto-broadcast simulates exactly that — a
    // forced broadcast(freqs) (the round-9 rendering) would override the
    // threshold and still build the driver-side hash map.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = graft.SparkEntry.queries("doc_surprisal")(s2, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"the tok-keyed LM join is force-broadcast (scale-killer):\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle join on tok with broadcast disabled:\n$plan")
    assert(df.limit(1).count() === 1)
  }

  test("emb_pq_topk shortlist is a bounded partial aggregate, not a per-query corpus rank") {
    val df = graft.SparkEntry.queries("emb_pq_topk")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the typed bounded-heap aggregator plans as an ObjectHashAggregate
    // with a partial pass (the map-side per-query cut)
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the TopKAggregator's object hash aggregate:\n$plan")
    // exactly one rank window survives: the topK rerank over the
    // shortlist·queries frame; the ADC shortlist itself must not add one
    val windows = "\\bWindow\\b".r.findAllIn(plan).length
    assert(windows <= 1,
      s"ADC shortlist reintroduced a per-query corpus rank window ($windows):\n$plan")
  }

  test("pack-chunks windows run partitioned, never through a single reducer") {
    val df = Curate.qPackChunks(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a window plan:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"global cumulative sum collapsed to one reducer:\n$plan")
    // offsets equal the single-window definition: each doc's offset is the
    // total words of all earlier docs (spot-checked via a self-aggregate)
    val rows = df.collect()
    var acc = 0L
    rows.sortBy(_.getLong(0)).foreach { r =>
      assert(r.getLong(2) === acc, s"offset mismatch at doc ${r.getLong(0)}")
      acc += r.getLong(1)
    }
  }
}

class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("binned point-in-interval equals the naive theta join (edges + multi-bin)") {
    // empty interval (7,7); single-point (5,6); bin-spanning (95,205) at width 100
    val intervals = Seq((1L, 0L, 10L), (2L, 5L, 6L), (3L, 7L, 7L), (4L, 95L, 205L))
      .toDF("iv_id", "s", "en")
    val points = Seq(10L -> 0L, 11L -> 5L, 12L -> 9L, 13L -> 10L,
        14L -> 100L, 15L -> 204L, 16L -> 205L)
      .toDF("p_id", "p")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "en", 100L)
      .select(col("p_id"), col("iv_id"))
    val naive = points.join(intervals, col("p") >= col("s") && col("p") < col("en"))
      .select(col("p_id"), col("iv_id"))
    assert(got.exceptAll(naive).count() === 0 && naive.exceptAll(got).count() === 0)
    // each matching pair exactly once
    assert(got.count() === got.distinct().count())
  }

  test("range-join query windows partition the matched events") {
    val out = RangeJoin.qRangeJoin(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) > 0))
  }

  test("binned join equals the naive join on seeded random data (incl. negatives)") {
    val rnd = new scala.util.Random(42)
    for (width <- Seq(1L, 7L, 100L)) {
      val intervals = (1 to 40).map { i =>
        val s = rnd.between(-500L, 500L)
        (i.toLong, s, s + rnd.between(0L, 300L))
      }.toDF("iv_id", "s", "en")
      val points = (1 to 200).map(i => (i.toLong, rnd.between(-600L, 600L)))
        .toDF("p_id", "p")
      val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "en", width)
        .select(col("p_id"), col("iv_id"))
      val naive = points.join(intervals, col("p") >= col("s") && col("p") < col("en"))
        .select(col("p_id"), col("iv_id"))
      assert(got.exceptAll(naive).count() === 0 && naive.exceptAll(got).count() === 0,
        s"mismatch at binWidth=$width")
    }
  }
}

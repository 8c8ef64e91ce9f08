package graft.cdc

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Deterministic synthesized changelog (FIXTURES.md "Synthesized changelog").
  *
  * The reference's unit of data is a `DatabaseEvent{operationType, tableName,
  * payload}` (reference `utils.go:22-26`) where UPDATE carries the full new
  * row and DELETE the old row (reference `producer.go:143-145,154-157`),
  * keyed by the payload's `id` column (reference `es.go:50-54,115-119`), in
  * WAL order (reference `producer.go:65,171` — `seq` is the LSN analog).
  *
  * No changelog fixture exists on disk, so we derive one (seed-free, so the
  * DuckDB oracle can re-derive it with plain SQL) from `orders`:
  *   - every row        → INSERT at seq = o_orderkey
  *   - o_orderkey%5 == 0 → UPDATE at seq = o_orderkey + 1_000_000 with
  *                         o_totalprice + 1 (full new row, pgoutput-style)
  *   - o_orderkey%7 == 0 → DELETE at seq = o_orderkey + 2_000_000
  *
  * Layout is flat (id, seq, op, table, o_* payload columns) rather than a
  * nested payload struct: identical semantics, and flat columns keep both
  * Catalyst column pruning and the oracle SQL simple.
  *
  * Scale note: three narrow projections of one scan, union-ed — Spark plans
  * this as one pass over orders per branch with pushed filters; at 100 TB the
  * real source is a Kafka/Debezium topic (see [[ChangelogStream]]), this
  * shape is only the batch/test rendering.
  */
object Changelog {
  val payloadCols: Seq[String] = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  /** (id, seq, op, table, o_*) — op in {INSERT, UPDATE, DELETE}. */
  def fromOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val inserts = o.select(Seq(
      col("o_orderkey").as("id"),
      col("o_orderkey").as("seq"),
      lit("INSERT").as("op"),
      lit("orders").as("table")) ++ payloadCols.map(col): _*)
    val updates = o.filter(col("o_orderkey") % 5 === 0).select(
      col("o_orderkey").as("id"),
      (col("o_orderkey") + 1000000L).as("seq"),
      lit("UPDATE").as("op"),
      lit("orders").as("table"),
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      (col("o_totalprice") + 1d).as("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority"))
    val deletes = o.filter(col("o_orderkey") % 7 === 0).select(Seq(
      col("o_orderkey").as("id"),
      (col("o_orderkey") + 2000000L).as("seq"),
      lit("DELETE").as("op"),
      lit("orders").as("table")) ++ payloadCols.map(col): _*)
    inserts.unionByName(updates).unionByName(deletes)
  }

  /** Partial-update changelog: UPDATE events carry ONLY the changed field
    * (o_totalprice) — every other payload column is null. This is the shape
    * where the reference's painless `putAll` merge (`es.go:55-61`) actually
    * differs from whole-row last-writer-wins, so it exercises
    * [[Apply.mergeApply]]'s per-field latest-non-null semantics. The final
    * state is identical to [[fromOrders]]'s (same fields survive), which
    * keeps the DuckDB oracle shared. */
  def fromOrdersPartial(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val inserts = o.select(Seq(
      col("o_orderkey").as("id"),
      col("o_orderkey").as("seq"),
      lit("INSERT").as("op"),
      lit("orders").as("table")) ++ payloadCols.map(col): _*)
    val updates = o.filter(col("o_orderkey") % 5 === 0).select(
      col("o_orderkey").as("id"),
      (col("o_orderkey") + 1000000L).as("seq"),
      lit("UPDATE").as("op"),
      lit("orders").as("table"),
      lit(null).cast("bigint").as("o_orderkey"),
      lit(null).cast("bigint").as("o_custkey"),
      lit(null).cast("string").as("o_orderstatus"),
      (col("o_totalprice") + 1d).as("o_totalprice"),
      lit(null).cast("timestamp").as("o_orderdate"),
      lit(null).cast("string").as("o_orderpriority"))
    val deletes = o.filter(col("o_orderkey") % 7 === 0).select(Seq(
      col("o_orderkey").as("id"),
      (col("o_orderkey") + 2000000L).as("seq"),
      lit("DELETE").as("op"),
      lit("orders").as("table")) ++ payloadCols.map(col): _*)
    inserts.unionByName(updates).unionByName(deletes)
  }

  /** [[fromOrders]] with a DIRTY twist for the ingest pipeline: UPDATE
    * events whose id % 15 == 0 (a deterministic subset of the % 5 == 0
    * updates) carry `o_orderpriority = 'CORRUPT'` — a value the chain's
    * `convert` processor cannot parse, so those events exercise the
    * `on_failure` routing (dropped events leave their keys at the
    * pre-update values, which the oracle pins). Everything else is
    * byte-identical to [[fromOrders]]. */
  def fromOrdersDirty(spark: SparkSession, sfDir: String): DataFrame =
    fromOrders(spark, sfDir).withColumn("o_orderpriority",
      when(col("op") === "UPDATE" && col("id") % 15 === 0, lit("CORRUPT"))
        .otherwise(col("o_orderpriority")))

  /** The oracle-side rendering of [[fromOrdersDirty]] (composes after
    * [[oracleCte]]'s `changelog`). Lazy: `oracleCte` is declared further
    * down the object body and would read null at strict-init time. */
  lazy val dirtyOracleCte: String =
    s"""$oracleCte,
       |dirty AS (
       |  SELECT id, seq, op, "table", o_orderkey, o_custkey, o_orderstatus,
       |         o_totalprice, o_orderdate,
       |         CASE WHEN op = 'UPDATE' AND id % 15 = 0 THEN 'CORRUPT'
       |              ELSE o_orderpriority END AS o_orderpriority
       |  FROM changelog
       |)""".stripMargin

  /** The orders changelog with transaction envelopes: every event carries
    * `txn = id % 50`, and each transaction that committed (txn % 7 != 3 —
    * the rest are "in flight" when the stream stops) contributes one
    * COMMIT marker row (op=COMMIT, no payload, seq past all events).
    * Consumed by [[Apply.txnApply]]; the oracle mirrors the arithmetic
    * directly because txn is a pure function of the key. */
  def fromOrdersTxn(spark: SparkSession, sfDir: String): DataFrame = {
    val base = fromOrders(spark, sfDir).withColumn("txn", col("id") % 50)
    val commits = base.select(col("txn")).distinct()
      .filter(col("txn") % 7 =!= 3)
      .select(
        lit(-1L).as("id"),
        (col("txn") + 3000000L).as("seq"),
        lit("COMMIT").as("op"),
        lit("orders").as("table"),
        col("txn"))
    base.unionByName(commits, allowMissingColumns = true)
  }

  /** [[fromOrders]] plus a table-wide TRUNCATE marker at seq = 1,000,000 —
    * ordered after every INSERT (keys stay below 1e6 at the test SFs) and
    * before every UPDATE/DELETE. The reference drops Truncate messages
    * outright (`producer.go:161-166`) and can leave a truncated table fully
    * populated downstream; applying them is the same class of documented
    * upgrade as the txn gate (SURVEY §4.3). Consumed by
    * [[Apply.truncateApply]] (batch) and the keyed-state sink's fence
    * (streaming). */
  def fromOrdersTruncate(spark: SparkSession, sfDir: String): DataFrame = {
    val base = fromOrders(spark, sfDir)
    // null payload typed off the changelog itself: a mismatched null type
    // (e.g. TIMESTAMP where orders carries TIMESTAMP_NTZ) would silently
    // coerce the whole union's column and break JSON round-trips
    val marker = spark.range(1).select(
      Seq(lit(-1L).as("id"), lit(1000000L).as("seq"),
        lit("TRUNCATE").as("op"), lit("orders").as("table")) ++
      payloadCols.map(c => lit(null).cast(base.schema(c).dataType).as(c)): _*)
    base.unionByName(marker)
  }

  /** The truncate changelog ([[fromOrdersTruncate]]) staged as three
    * mtime-ordered files — all INSERTs, then the TRUNCATE marker ALONE,
    * then the UPDATEs+DELETEs — so a streaming consumer sees the truncate
    * arrive mid-stream as a fence-only micro-batch with live state on both
    * sides of it. */
  def stageParquetTruncatePhased(spark: SparkSession, sfDir: String): String =
    stage(fromOrdersTruncate(spark, sfDir), sfDir, "parquet-trunc", Seq("orders.parquet")) { (cl, dir) =>
      new java.io.File(dir).mkdirs()
      graft.model.Staging.stageOrderedFile(
        cl.filter(col("op") === "INSERT"), dir, "f1", 1000000L)
      graft.model.Staging.stageOrderedFile(
        cl.filter(col("op") === "TRUNCATE"), dir, "f2", 2000000L)
      graft.model.Staging.stageOrderedFile(
        cl.filter(col("op").isin("UPDATE", "DELETE")), dir, "f3", 3000000L)
    }

  /** The orders changelog staged as two mtime-ordered files split on the
    * seq axis — everything at-or-before `splitSeq`, then the rest — so a
    * streaming consumer's FIRST micro-batch materializes exactly the as-of
    * snapshot (the batch boundary a [[Buckets.savepoint]] pins for
    * version-addressed diffs). */
  def stageParquetSeqPhased(spark: SparkSession, sfDir: String,
                            splitSeq: Long): String =
    stageParquetSeqRanges(spark, sfDir, Seq(splitSeq))

  /** The orders changelog staged as mtime-ordered files cut at the given
    * seq split points — a SEQ-ORDERED replay across micro-batches. This is
    * the transport contract a real CDC tail provides (the WAL is LSN-
    * ordered; Kafka delivers per-key in order): order-SENSITIVE streaming
    * consumers (the SCD2 interval machine) consume this staging, while the
    * order-free LWW applies deliberately consume the shuffled one. */
  def stageParquetSeqRanges(spark: SparkSession, sfDir: String,
                            splits: Seq[Long]): String =
    stage(fromOrders(spark, sfDir), sfDir,
        s"parquet-seq${splits.mkString("_")}", Seq("orders.parquet")) { (cl, dir) =>
      new java.io.File(dir).mkdirs()
      val bounds = (Long.MinValue +: splits) :+ Long.MaxValue
      bounds.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
        graft.model.Staging.stageOrderedFile(
          cl.filter(col("seq") > lo && col("seq") <= hi),
          dir, s"f$i", 1000000L * (i + 1))
      }
    }

  /** Second table for multi-table fan-out (the reference handles all tables
    * of the publication through one stream, dispatching per `tableName` —
    * `producer.go:42` FOR ALL TABLES, `utils.go:105-112`): customer
    * changelog with rules INSERT all at seq=c_custkey; %3==0 → UPDATE
    * (c_acctbal+1); %11==0 → DELETE. */
  val customerPayloadCols: Seq[String] = Seq(
    "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  def fromCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val inserts = c.select(Seq(
      col("c_custkey").as("id"),
      col("c_custkey").as("seq"),
      lit("INSERT").as("op"),
      lit("customer").as("table")) ++ customerPayloadCols.map(col): _*)
    val updates = c.filter(col("c_custkey") % 3 === 0).select(
      col("c_custkey").as("id"),
      (col("c_custkey") + 1000000L).as("seq"),
      lit("UPDATE").as("op"),
      lit("customer").as("table"),
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      (col("c_acctbal") + 1d).as("c_acctbal"), col("c_mktsegment"))
    val deletes = c.filter(col("c_custkey") % 11 === 0).select(Seq(
      col("c_custkey").as("id"),
      (col("c_custkey") + 2000000L).as("seq"),
      lit("DELETE").as("op"),
      lit("customer").as("table")) ++ customerPayloadCols.map(col): _*)
    inserts.unionByName(updates).unionByName(deletes)
  }

  /** Deterministic staging dir per (fixture content, variant): staged once
    * and reused across invocations — repeated Verify/Bench runs neither
    * leak a fresh /tmp dir per call nor charge the rewrite to every query
    * timing. Fingerprinting, atomic commit, and concurrent-JVM safety are
    * [[graft.model.Staging]]'s protocol. */
  private def stage(cl: DataFrame, sfDir: String, variant: String,
                    sources: Seq[String])
                   (write: (DataFrame, String) => Unit): String = {
    val dir = s"/tmp/graft-stage-$variant-${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}-" +
      graft.model.Staging.fingerprint(sfDir, sources)
    graft.model.Staging.ensure(dir)(tmp => write(cl, tmp))
  }

  /** Orders ∪ SEGMENT-MOVING customer events as JSON-line DatabaseEvent
    * envelopes (superset payload; `to_json` omits null fields) — the
    * composed pipeline's multi-table wire fixture: one topic carrying every
    * table, with dimension churn that exercises the bidirectional join-MV
    * (`utils.go:31` — the reference's single CDC topic). */
  def stageEnvelopeJsonMultiTableSegMove(spark: SparkSession, sfDir: String): String =
    stage(
      fromOrders(spark, sfDir)
        .unionByName(fromCustomerSegMove(spark, sfDir), allowMissingColumns = true),
      sfDir, "envjson-multi-segmove", Seq("orders.parquet", "customer.parquet")) { (cl, dir) =>
      val payload = (payloadCols ++ customerPayloadCols).map(col)
      cl.select(to_json(struct(col("id"), col("seq"), col("op"), col("table"),
          struct(payload: _*).as("payload"))).as("value"))
        .repartition(4).write.mode(SaveMode.Overwrite).text(dir)
    }

  /** The orders changelog as JSON-line DatabaseEvent envelopes (the wire
    * format [[graft.sources.ChangelogSource]] reads). */
  def stageEnvelopeJson(spark: SparkSession, sfDir: String): String =
    stage(fromOrders(spark, sfDir), sfDir, "envjson", Seq("orders.parquet")) { (cl, dir) =>
      cl.select(to_json(struct(col("id"), col("seq"), col("op"), col("table"),
          struct(payloadCols.map(col): _*).as("payload"))).as("value"))
        .repartition(4).write.mode(SaveMode.Overwrite).text(dir)
    }

  /** The multi-table changelog (orders ∪ customer superset envelope) as
    * JSON-line DatabaseEvents — the reference's single CDC topic carrying
    * every table (`utils.go:31`). `to_json` omits null fields, so each
    * row's payload holds exactly its own table's columns. */
  def stageEnvelopeJsonMultiTable(spark: SparkSession, sfDir: String): String =
    stage(
      fromOrders(spark, sfDir)
        .unionByName(fromCustomer(spark, sfDir), allowMissingColumns = true),
      sfDir, "envjson-multi", Seq("orders.parquet", "customer.parquet")) { (cl, dir) =>
      val payload = (payloadCols ++ customerPayloadCols).map(col)
      cl.select(to_json(struct(col("id"), col("seq"), col("op"), col("table"),
          struct(payload: _*).as("payload"))).as("value"))
        .repartition(4).write.mode(SaveMode.Overwrite).text(dir)
    }

  /** The truncate changelog ([[fromOrdersTruncate]]) as THREE name-ordered
    * JSON-envelope files — INSERTs, the TRUNCATE marker alone, then
    * UPDATEs+DELETEs — so the engine's DSv2 source (which admits files in
    * path order) delivers the truncate as a fence-only micro-batch with
    * live state on both sides, the composed-pipeline truncate fixture. */
  def stageEnvelopeJsonTruncatePhased(spark: SparkSession, sfDir: String): String =
    stage(fromOrdersTruncate(spark, sfDir), sfDir, "envjson-trunc",
        Seq("orders.parquet")) { (cl, dir) =>
      new java.io.File(dir).mkdirs()
      def env(df: DataFrame) = df.select(to_json(struct(
        col("id"), col("seq"), col("op"), col("table"),
        struct(payloadCols.map(col): _*).as("payload"))).as("value"))
      graft.model.Staging.stageNamedTextFile(
        env(cl.filter(col("op") === "INSERT")), dir, "p0")
      graft.model.Staging.stageNamedTextFile(
        env(cl.filter(col("op") === "TRUNCATE")), dir, "p1")
      graft.model.Staging.stageNamedTextFile(
        env(cl.filter(col("op").isin("UPDATE", "DELETE"))), dir, "p2")
    }

  /** NATION changelog — the THIRD table of the dynamic-onboarding fixture
    * ([[stageEnvelopeJsonDynamic]]): nation's own (id, seq, op, payload)
    * events under the same deterministic-rules family as [[fromOrders]]
    * (%3 → UPDATE renaming the nation, %5==4 → DELETE; seq = key / +1e6 /
    * +2e6). Integer fixture columns cast to long up front so the JSON
    * envelope round-trip re-decodes identically in both engines. */
  val nationPayloadCols: Seq[String] = Seq("n_nationkey", "n_name", "n_regionkey")

  def fromNation(spark: SparkSession, sfDir: String): DataFrame = {
    val nt = Tables.nation(spark, sfDir).select(
      col("n_nationkey").cast("long").as("n_nationkey"),
      col("n_name"),
      col("n_regionkey").cast("long").as("n_regionkey"))
    val inserts = nt.select(Seq(
      col("n_nationkey").as("id"),
      col("n_nationkey").as("seq"),
      lit("INSERT").as("op"),
      lit("nation").as("table")) ++ nationPayloadCols.map(col): _*)
    val updates = nt.filter(col("n_nationkey") % 3 === 0).select(
      col("n_nationkey").as("id"),
      (col("n_nationkey") + 1000000L).as("seq"),
      lit("UPDATE").as("op"),
      lit("nation").as("table"),
      col("n_nationkey"),
      concat(col("n_name"), lit(" [r2]")).as("n_name"),
      col("n_regionkey"))
    val deletes = nt.filter(col("n_nationkey") % 5 === 4).select(Seq(
      col("n_nationkey").as("id"),
      (col("n_nationkey") + 2000000L).as("seq"),
      lit("DELETE").as("op"),
      lit("nation").as("table")) ++ nationPayloadCols.map(col): _*)
    inserts.unionByName(updates).unionByName(deletes)
  }

  /** DOCUMENTS changelog — text-bearing events for the CDC-MAINTAINED text
    * index ([[graft.ops.Search.qCdcTextIndex]]): the same deterministic
    * rules family as [[fromOrders]]/[[fromNation]] (%3 → UPDATE, %5==4 →
    * DELETE; seq = key / +1e6 / +2e6). The UPDATE APPENDS " merge window
    * r2" to the text — a change that must MOVE postings (new terms appear,
    * every tf row rewrites, and two of the appended tokens are the
    * standard search query's terms, so maintained-index search results
    * genuinely shift vs the insert-only corpus). */
  val documentsPayloadCols: Seq[String] = Seq("doc_id", "text", "source")

  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val dt = Tables.documents(spark, sfDir).select(
      col("doc_id").cast("long").as("doc_id"), col("text"), col("source"))
    val inserts = dt.select(Seq(
      col("doc_id").as("id"),
      col("doc_id").as("seq"),
      lit("INSERT").as("op"),
      lit("documents").as("table")) ++ documentsPayloadCols.map(col): _*)
    val updates = dt.filter(col("doc_id") % 3 === 0).select(
      col("doc_id").as("id"),
      (col("doc_id") + 1000000L).as("seq"),
      lit("UPDATE").as("op"),
      lit("documents").as("table"),
      col("doc_id"),
      concat(col("text"), lit(" merge window r2")).as("text"),
      col("source"))
    val deletes = dt.filter(col("doc_id") % 5 === 4).select(Seq(
      col("doc_id").as("id"),
      (col("doc_id") + 2000000L).as("seq"),
      lit("DELETE").as("op"),
      lit("documents").as("table")) ++ documentsPayloadCols.map(col): _*)
    inserts.unionByName(updates).unionByName(deletes)
  }

  /** The documents changelog staged as multi-file parquet (streaming
    * input; shared across runs like [[stageParquet]]). */
  def stageParquetDocuments(spark: SparkSession, sfDir: String): String =
    stage(fromDocuments(spark, sfDir), sfDir, "docs-parquet",
        Seq("documents.parquet")) { (cl, dir) =>
      cl.repartition(4).write.mode(SaveMode.Overwrite).parquet(dir)
    }

  /** EMBEDDINGS changelog — vector-bearing events for the CDC-maintained
    * VECTOR index ([[graft.ops.Similarity.qCdcVectorIndex]]): the same
    * deterministic rules family. The UPDATE REVERSES the embedding
    * (`reverse` here, `list_reverse` in the oracle) — a value change that
    * moves the vector in space, so its coarse-cell assignment can move and
    * the index maintenance must re-quantize, not just overwrite. */
  val embeddingsPayloadCols: Seq[String] = Seq("vec_id", "embedding")

  def fromEmbeddings(spark: SparkSession, sfDir: String): DataFrame = {
    val et = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val inserts = et.select(Seq(
      col("vec_id").as("id"),
      col("vec_id").as("seq"),
      lit("INSERT").as("op"),
      lit("embeddings").as("table")) ++ embeddingsPayloadCols.map(col): _*)
    val updates = et.filter(col("vec_id") % 3 === 0).select(
      col("vec_id").as("id"),
      (col("vec_id") + 1000000L).as("seq"),
      lit("UPDATE").as("op"),
      lit("embeddings").as("table"),
      col("vec_id"),
      reverse(col("embedding")).as("embedding"))
    val deletes = et.filter(col("vec_id") % 5 === 4).select(Seq(
      col("vec_id").as("id"),
      (col("vec_id") + 2000000L).as("seq"),
      lit("DELETE").as("op"),
      lit("embeddings").as("table")) ++ embeddingsPayloadCols.map(col): _*)
    inserts.unionByName(updates).unionByName(deletes)
  }

  /** The embeddings changelog staged as multi-file parquet. */
  def stageParquetEmbeddings(spark: SparkSession, sfDir: String): String =
    stage(fromEmbeddings(spark, sfDir), sfDir, "emb-parquet",
        Seq("embeddings.parquet")) { (cl, dir) =>
      cl.repartition(4).write.mode(SaveMode.Overwrite).parquet(dir)
    }

  /** The DYNAMIC-ONBOARDING wire fixture: three name-ordered JSON-envelope
    * files where a table's first appearance is announced by an in-stream
    * RELATION event carrying its schema DDL as the payload — the pgoutput
    * RelationMessage (`producer.go:121-122`) on the engine's wire. The
    * nation table enters at file d2, AFTER the orders pipeline has been
    * draining for two micro-batches; nothing about the table set is
    * declared at plan time ([[DynamicPipeline]] decodes per table from the
    * registry these RELATION events populate). */
  def stageEnvelopeJsonDynamic(spark: SparkSession, sfDir: String): String =
    // variant suffix v2: the staged LAYOUT changed (3 files, nation's whole
    // changelog in d2) and the fingerprint only covers source fixtures
    stage(fromOrders(spark, sfDir), sfDir, "envjson-dynamic-v2",
        Seq("orders.parquet", "nation.parquet")) { (ordersCl, dir) =>
      new java.io.File(dir).mkdirs()
      def env(df: DataFrame, cols: Seq[String]) = df.select(to_json(struct(
        col("id"), col("seq"), col("op"), col("table"),
        struct(cols.map(col): _*).as("payload"))).as("value"))
      // RELATION announcement: payload = the table's schema DDL (a scalar
      // string payload; the DSv2 source passes it through verbatim)
      def relation(table: String, ddl: String) =
        spark.range(1).select(to_json(struct(
          lit(-1L).as("id"), lit(0L).as("seq"), lit("RELATION").as("op"),
          lit(table).as("table"), lit(ddl).as("payload"))).as("value"))
      val oDdl = ordersCl.select(payloadCols.map(col): _*).schema.toDDL
      val nationCl = fromNation(spark, sfDir)
      val nDdl = nationCl.select(nationPayloadCols.map(col): _*).schema.toDDL
      graft.model.Staging.stageNamedTextFile(
        relation("orders", oDdl)
          .unionByName(env(ordersCl.filter(col("op") === "INSERT"), payloadCols)),
        dir, "d0")
      graft.model.Staging.stageNamedTextFile(
        env(ordersCl.filter(col("op") =!= "INSERT"), payloadCols), dir, "d1")
      // d2 carries the announcement AND nation's whole changelog: the
      // fixture's contract is that nation arrives ≥ micro-batch 3 (after
      // the orders pipeline has drained two batches) — coarser batches
      // AFTER onboarding are free, and each file is a whole epoch's fixed
      // probe/dispatch/merge cost. Multi-epoch maintenance of an onboarded
      // table (MV fold across batches, replayed-epoch fences) is pinned by
      // DynamicPipelineSpec's kill-resume drill over this same fixture.
      graft.model.Staging.stageNamedTextFile(
        relation("nation", nDdl)
          .unionByName(env(nationCl, nationPayloadCols)),
        dir, "d2")
    }

  /** The orders changelog as parquet files (multi-file, for bounded
    * micro-batch streaming sources). */
  def stageParquet(spark: SparkSession, sfDir: String): String =
    stage(fromOrders(spark, sfDir), sfDir, "parquet", Seq("orders.parquet")) { (cl, dir) =>
      cl.repartition(4).write.mode(SaveMode.Overwrite).parquet(dir)
    }

  /** The txn changelog ([[fromOrdersTxn]]) staged as mtime-ordered parquet
    * files: data events split across the first two files, EVERY COMMIT
    * marker in the last — replayed at maxFilesPerTrigger=1 the commits
    * reach the stream two micro-batches after the earliest events of their
    * transactions, so a streaming consumer must genuinely buffer
    * uncommitted txns across batches (the [[graft.streaming.Stateful]] txn
    * gate's contract). */
  def stageParquetTxnPhased(spark: SparkSession, sfDir: String): String =
    stage(fromOrdersTxn(spark, sfDir), sfDir, "parquet-txn", Seq("orders.parquet")) { (cl, dir) =>
      new java.io.File(dir).mkdirs()
      graft.model.Staging.stageOrderedFile(
        cl.filter(col("op") =!= "COMMIT" && col("id") % 2 === 0), dir, "f1", 1000000L)
      graft.model.Staging.stageOrderedFile(
        cl.filter(col("op") =!= "COMMIT" && col("id") % 2 =!= 0), dir, "f2", 2000000L)
      graft.model.Staging.stageOrderedFile(
        cl.filter(col("op") === "COMMIT"), dir, "f3", 3000000L)
    }

  /** The multi-table (orders ∪ customer, null-padded superset envelope)
    * changelog as parquet files. */
  def stageParquetMultiTable(spark: SparkSession, sfDir: String): String =
    stage(
      fromOrders(spark, sfDir)
        .unionByName(fromCustomer(spark, sfDir), allowMissingColumns = true),
      sfDir, "parquet-multi", Seq("orders.parquet", "customer.parquet")) { (cl, dir) =>
      cl.repartition(8).write.mode(SaveMode.Overwrite).parquet(dir)
    }

  /** Customer changelog whose UPDATEs MOVE the customer's market segment
    * (to the fixed 'MOVED' segment) as well as bumping c_acctbal — the
    * dimension-churn fixture for bidirectional join-MV maintenance
    * ([[JoinMv]]): a segment move must re-attribute ALL the customer's
    * order revenue, and a customer DELETE must retract it. Same %3/%11
    * update/delete rules as [[fromCustomer]]. */
  def fromCustomerSegMove(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val inserts = c.select(Seq(
      col("c_custkey").as("id"),
      col("c_custkey").as("seq"),
      lit("INSERT").as("op"),
      lit("customer").as("table")) ++ customerPayloadCols.map(col): _*)
    val updates = c.filter(col("c_custkey") % 3 === 0).select(
      col("c_custkey").as("id"),
      (col("c_custkey") + 1000000L).as("seq"),
      lit("UPDATE").as("op"),
      lit("customer").as("table"),
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      (col("c_acctbal") + 1d).as("c_acctbal"),
      lit("MOVED").as("c_mktsegment"))
    val deletes = c.filter(col("c_custkey") % 11 === 0).select(Seq(
      col("c_custkey").as("id"),
      (col("c_custkey") + 2000000L).as("seq"),
      lit("DELETE").as("op"),
      lit("customer").as("table")) ++ customerPayloadCols.map(col): _*)
    inserts.unionByName(updates).unionByName(deletes)
  }

  /** Orders ∪ segment-moving customer events, one interleaved multi-table
    * parquet changelog (superset envelope). */
  def stageParquetMultiTableSegMove(spark: SparkSession, sfDir: String): String =
    stage(
      fromOrders(spark, sfDir)
        .unionByName(fromCustomerSegMove(spark, sfDir), allowMissingColumns = true),
      sfDir, "parquet-multi-segmove", Seq("orders.parquet", "customer.parquet")) { (cl, dir) =>
      cl.repartition(8).write.mode(SaveMode.Overwrite).parquet(dir)
    }

  /** DuckDB CTE of [[fromCustomerSegMove]] (CTE name `c_changelog` so it
    * composes with [[oracleCte]]'s `changelog`); full payload columns so
    * both the bidi join-MV oracle and the composed pass's customer-state
    * oracle derive from the ONE rendering. */
  val customerSegMoveOracleCte: String =
    """c_changelog AS (
      |  SELECT c_custkey AS id, c_custkey AS seq, 'INSERT' AS op,
      |         c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_custkey + 1000000, 'UPDATE',
      |         c_custkey, c_name, c_nationkey, c_acctbal + 1, 'MOVED'
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_custkey + 2000000, 'DELETE',
      |         c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 11 = 0
      |)""".stripMargin

  /** The typed payload schema, derived from the changelog itself — the one
    * place the column set is defined. */
  def payloadSchema(spark: SparkSession, sfDir: String): org.apache.spark.sql.types.StructType =
    fromOrders(spark, sfDir).select(payloadCols.map(col): _*).schema

  val customerOracleCte: String =
    """changelog AS (
      |  SELECT c_custkey AS id, c_custkey AS seq, 'INSERT' AS op,
      |         c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_custkey + 1000000, 'UPDATE',
      |         c_custkey, c_name, c_nationkey, c_acctbal + 1, c_mktsegment
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_custkey + 2000000, 'DELETE',
      |         c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 11 = 0
      |)""".stripMargin

  /** The oracle-side rendering of [[fromOrders]] as a DuckDB CTE body. */
  val oracleCte: String =
    """changelog AS (
      |  SELECT o_orderkey AS id, o_orderkey AS seq, 'INSERT' AS op, 'orders' AS "table",
      |         o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, o_orderkey + 1000000, 'UPDATE', 'orders',
      |         o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 5 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_orderkey + 2000000, 'DELETE', 'orders',
      |         o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 7 = 0
      |)""".stripMargin
}

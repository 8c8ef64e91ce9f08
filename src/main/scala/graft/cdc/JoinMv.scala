package graft.cdc

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** BIDIRECTIONAL join-MV maintenance: revenue per market segment over
  * orders⋈customer where BOTH sides change — order events move per-customer
  * totals, customer events move/retract segments — kept current per batch
  * with work ∝ changed keys, never re-joining or re-aggregating history.
  *
  * The static-dimension ΔO⋈C form ([[Pipeline]]'s join-MV) breaks the
  * moment a customer changes segment or is deleted: every order the
  * customer ever placed must re-attribute. The standard decomposition is
  * group-by pushdown through the join — maintain the per-customer orders
  * aggregate A(k) = (n, Σprice) as its own keyed STATE (bucketed, dim-
  * sized), and hold the segment view M(seg) = Σ_{k: seg(k)=seg} A(k)
  * current by PER-KEY REPLACE: for every customer k whose A or segment
  * changed this batch, debit (seg_before(k), A_before(k)) and credit
  * (seg_after(k), A_after(k)). The algebra handles every case uniformly —
  * pure order churn (seg unchanged, A moves), pure segment moves (A
  * unchanged, both known), customer deletes (seg_after null → retraction),
  * and even orders arriving BEFORE their customer's insert (they park in
  * A(k) with no segment; the later insert credits A(k) into its cell).
  *
  * Per-batch cost: the one shared multi-table state merge, a changed-keys-
  * sized join against A's touched rows, a dim-state segment read, and a
  * groups-sized MV write. At 100 TB: A is customer-cardinality (a keyed
  * state like any other — bucketed, incrementally merged); the segment
  * read is the dim side (broadcastable); nothing scans the orders fact.
  *
  * Crash protocol (ordering is load-bearing):
  *   1. MV delta commits FIRST, fenced on batchId ([[Materialize
  *      .commitDeltaRows]]) — it reads A_before, so it must run while A is
  *      still pre-batch;
  *   2. A's and the segment dim state's upserts run second, behind ONE
  *      batchId high-water fence;
  *   3. the primary state merge promotes last (idempotent).
  * A replay after (1) skips the MV (fenced) and still sees clean
  * pre-batch A and segments — both only advance after (1) commits. A
  * replay after (2) skips both. Every window recomputes from identical
  * (prev, merged).
  */
object JoinMv {

  /** Merge one multi-table micro-batch into the shared keyed state AND
    * maintain (a) the per-customer orders aggregate state at `aggDir`,
    * (b) the customer→segment dimension state at `segDir` (so the segment
    * view is a DIM-SIZED read each batch, never a scan of the shared
    * multi-table state), and (c) the per-segment join-MV at `mvDir`. */
  def maintainBatch(batch: DataFrame, batchId: Long, stateDir: String,
                    aggDir: String, segDir: String, mvDir: String): Unit = {
    val spark = batch.sparkSession
    ChangelogStream.upsertBatch(batch, stateDir, keyCols = Seq("table", "id"),
      beforeCommit = (prev, merged) => {
        // ΔO: per-customer signed orders contributions from the one merge's
        // touched rows (untouched keys cancel exactly)
        def ordersLive(df: DataFrame, sign: Int) = df
          .filter(col("table") === "orders" && col("op") =!= "DELETE")
          .select(col("o_custkey").as("custkey"), lit(sign.toLong).as("dn"),
            (col("o_totalprice").cast(DecimalType(18, 4)) * sign)
              .cast(Materialize.SType).as("ds"))
        val dO = ordersLive(merged, 1).unionByName(ordersLive(prev, -1))
          .groupBy(col("custkey"))
          .agg(sum(col("dn")).as("dn"), sum(col("ds")).cast(Materialize.SType).as("ds"))
          .filter(col("dn") =!= 0 || col("ds") =!= lit(0).cast(Materialize.SType))
        // ΔC: customers whose live row changed (segment move, insert,
        // delete) — prev/merged cover exactly their touched buckets
        def custLive(df: DataFrame, as: String) = df
          .filter(col("table") === "customer" && col("op") =!= "DELETE")
          .select(col("id").as("custkey"), col("c_mktsegment").as(as))
        val dC = custLive(prev, "pseg").join(custLive(merged, "mseg"),
            Seq("custkey"), "full_outer")
          .filter(!(col("pseg") <=> col("mseg")))
          .select(col("custkey"))
        // every customer key whose contribution to M must be replaced
        val keys = dO.select(col("custkey")).unionByName(dC).distinct()
        // segment views: before = the maintained dim state (pre-batch by
        // the ordering contract — it only advances after the MV commit);
        // after = merged live rows ∪ before outside the touched customers
        val segBefore = readStateOrEmpty(spark, segDir,
            Seq("id", "c_mktsegment"))
          .select(col("id").as("custkey"), col("c_mktsegment").as("seg_b"))
        val touchedCust = prev.unionByName(merged)
          .filter(col("table") === "customer")
          .select(col("id").as("custkey")).distinct()
        val segAfter = custLive(merged, "seg_a")
          .unionByName(segBefore.withColumnRenamed("seg_b", "seg_a")
            .join(touchedCust, Seq("custkey"), "left_anti"))
        // A_before: the per-customer aggregate state, pre-batch by the
        // ordering contract above
        val aBefore = readStateOrEmpty(spark, aggDir, Seq("id", "n", "s"))
          .select(col("id").as("custkey"), col("n").as("n_b"), col("s").as("s_b"))
        val zero = lit(0L)
        val zeroS = lit(0).cast(Materialize.SType)
        val k = keys
          .join(dO, Seq("custkey"), "left_outer")
          .join(aBefore, Seq("custkey"), "left_outer")
          .join(segBefore, Seq("custkey"), "left_outer")
          .join(segAfter, Seq("custkey"), "left_outer")
          .select(col("custkey"),
            coalesce(col("n_b"), zero).as("n_b"),
            coalesce(col("s_b"), zeroS).as("s_b"),
            (coalesce(col("n_b"), zero) + coalesce(col("dn"), zero)).as("n_a"),
            (coalesce(col("s_b"), zeroS) + coalesce(col("ds"), zeroS))
              .cast(Materialize.SType).as("s_a"),
            col("seg_b"), col("seg_a"),
            col("dn").isNotNull.as("in_do"))
        k.persist()
        try {
          // 1. MV: per-key replace — debit the before cell, credit the after
          val debits = k.filter(col("seg_b").isNotNull && col("n_b") =!= 0)
            .select(col("seg_b").as("c_mktsegment"),
              (-col("n_b")).as("n"), (-col("s_b")).cast(Materialize.SType).as("s"))
          val credits = k.filter(col("seg_a").isNotNull && col("n_a") =!= 0)
            .select(col("seg_a").as("c_mktsegment"),
              col("n_a").as("n"), col("s_a").as("s"))
          Materialize.commitDeltaRows(spark, mvDir, batchId,
            credits.unionByName(debits), Seq("c_mktsegment"))
          // 2. behind ONE high-water fence (they advance together): A's
          // absolute new per-customer totals, and the dim state's customer
          // events — both strictly AFTER the MV commit, so any replay that
          // recomputes the MV delta still reads pre-batch A and segments
          if (committedAggBatch(spark, aggDir) < batchId) {
            val newA = k.filter(col("in_do"))
              .select(col("custkey").as("id"), lit(batchId).as("seq"),
                lit("INSERT").as("op"), col("n_a").as("n"), col("s_a").as("s"))
            ChangelogStream.upsertBatch(newA, aggDir)
            val custEvents = batch
              .filter(col("table") === "customer")
              .select(col("id"), col("seq"), col("op"), col("c_mktsegment"))
            ChangelogStream.upsertBatch(custEvents, segDir)
            writeAggFence(spark, aggDir, batchId)
          }
        } finally k.unpersist()
      })
  }

  /** readState, but an unwritten state reads as empty (first batch). */
  private def readStateOrEmpty(spark: SparkSession, stateDir: String,
                               cols: Seq[String]): DataFrame =
    try ChangelogStream.readState(spark, stateDir, cols)
    catch { case e: IllegalStateException if e.getMessage.startsWith("no state") =>
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(cols.map(c =>
          org.apache.spark.sql.types.StructField(c, schemaOf(c)))))
    }

  private def schemaOf(c: String): org.apache.spark.sql.types.DataType = c match {
    case "id" => org.apache.spark.sql.types.LongType
    case "n" => org.apache.spark.sql.types.LongType
    case "s" => Materialize.SType
    case "seq" => org.apache.spark.sql.types.LongType
    case _ => org.apache.spark.sql.types.StringType
  }

  private def fencePath(aggDir: String) =
    new org.apache.hadoop.fs.Path(s"$aggDir/_agg_fence/latest")

  /** High-water batch id whose A-write committed (same single-file fence
    * protocol as the DSv2 sink's epoch log). */
  private def committedAggBatch(spark: SparkSession, aggDir: String): Long = {
    val p = fencePath(aggDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Long.MinValue
    else {
      val in = fs.open(p)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  private def writeAggFence(spark: SparkSession, aggDir: String, batchId: Long): Unit = {
    val p = fencePath(aggDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, s".latest.tmp-$batchId")
    val out = fs.create(tmp, true)
    out.write(batchId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new IllegalStateException(s"agg fence write failed: $tmp -> $p")
  }

  /** Oracle-checked query: the interleaved orders + segment-moving customer
    * changelog streamed in micro-batches; the final MV equals revenue per
    * segment re-aggregated over BOTH fully-applied states joined — the
    * bidirectional IVM guarantee (segment moves re-attribute, customer
    * deletes retract, order churn lands in the right cell). */
  def qMvJoinBidi(spark: SparkSession, sfDir: String): DataFrame = {
    val clDir = Changelog.stageParquetMultiTableSegMove(spark, sfDir)
    val work = Files.createTempDirectory(Paths.get("/tmp"), "graft-bidi-").toString
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val stream = spark.readStream
        .schema(spark.read.parquet(clDir).schema)
        .option("maxFilesPerTrigger", 3)
        .parquet(clDir)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          maintainBatch(batch, batchId, s"$work/state",
            s"$work/agg", s"$work/seg", s"$work/mv")
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    Materialize.readMv(spark, s"$work/mv")
      .select(col("c_mktsegment"), col("n"),
        round(col("s"), 2).cast("double").as("sum_value"))
      .orderBy(col("c_mktsegment"))
  }
}

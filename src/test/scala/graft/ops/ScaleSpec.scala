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

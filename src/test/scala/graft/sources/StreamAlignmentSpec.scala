package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the streaming-scan contract the connector's reader relies on:
  * filters and projection stay ABOVE the streaming relation (no pushdown
  * on streaming scans in Spark 4.1), and the rows stay column-aligned
  * end to end. If a future Spark starts pruning streaming scans, the
  * reader honors the builder's required/filters and this still passes. */
class StreamAlignmentSpec extends AnyFunSuite with SparkSpec {
  test("streaming read with filter + projection stays aligned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spd-")
    val lines = Seq(
      """{"id":1,"seq":1,"op":"INSERT","table":"orders","payload":{"k":1}}""",
      """{"id":2,"seq":2,"op":"INSERT","table":"customer","payload":{"k":2}}""",
      """{"id":3,"seq":3,"op":"DELETE","table":"orders","payload":{"k":3}}""")
    java.nio.file.Files.write(dir.resolve("a.json"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    val name = "spd_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format("changelog").load(dir.toString)
      .filter(col("table") === "orders")
      .select(col("id"), col("op"))
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table(name).orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "INSERT"), (3L, "DELETE")))
  }

  test("standalone customer DSv2 tail (dispatch filter + foreachBatch upsert) " +
    "matches the batch apply") {
    // the declared query cdc_apply_customer_dsv2 serves as a view over the
    // composed pass since round 13; the STANDALONE single-table re-drain —
    // DSv2 source tailing the multi-table envelope stream, per-table
    // dispatch as a filter above the source, foreachBatch bucketed upsert —
    // is pinned here end-to-end
    val streamed = graft.cdc.ChangelogStream
      .qApplyStreamingCustomerDsv2(spark, sfDir)
    val batch = graft.cdc.Apply.latestState(
        graft.cdc.Changelog.fromCustomer(spark, sfDir),
        graft.cdc.Changelog.customerPayloadCols)
      .orderBy(col("c_custkey"))
    assert(streamed.collect().toSeq === batch.collect().toSeq)
  }
}

package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.cdc.Changelog

class ChangelogSourceSpec extends AnyFunSuite with SparkSpec {

  private def stage(): String = Changelog.stageEnvelopeJson(spark, sfDir)

  test("envelope round-trip preserves every event") {
    val work = stage()
    val cl = Changelog.fromOrders(spark, sfDir)
    val back = spark.read.format("changelog").load(work)
    assert(back.count() === cl.count())
    val a = cl.select(col("id"), col("seq"), col("op"), col("table"))
    val b = back.select(col("id"), col("seq"), col("op"), col("table"))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("op equality is pushed into the reader and rows are filtered") {
    val work = stage()
    val deletes = spark.read.format("changelog").load(work)
      .filter(col("op") === "DELETE")
    val plan = deletes.queryExecution.executedPlan.toString
    assert(plan.contains("ChangelogScan"), s"DSv2 scan missing:\n$plan")
    assert(plan.contains("EqualTo(op,DELETE)"), s"pushdown missing:\n$plan")
    val expected = Changelog.fromOrders(spark, sfDir).filter(col("op") === "DELETE").count()
    assert(deletes.count() === expected)
  }

  test("column pruning narrows the scan output") {
    val work = stage()
    val ops = spark.read.format("changelog").load(work).select("op")
    val scanLine = ops.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("[op") && !scanLine.contains("payload"),
      s"scan should read only op:\n$scanLine")
    assert(ops.distinct().count() === 3)
  }

  test("payload JSON decodes back to the original typed row") {
    val work = stage()
    val pSchema = Changelog.payloadSchema(spark, sfDir)
    val decoded = spark.read.format("changelog").load(work)
      .select(col("id"), from_json(col("payload"), pSchema).as("p"))
      .select(Seq(col("id")) ++ Changelog.payloadCols.map(c => col(s"p.$c").as(c)): _*)
    val orig = Changelog.fromOrders(spark, sfDir)
      .select(Seq(col("id")) ++ Changelog.payloadCols.map(col): _*)
    assert(decoded.exceptAll(orig).count() === 0 && orig.exceptAll(decoded).count() === 0)
  }
}

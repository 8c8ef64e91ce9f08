package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.model.Tables

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("as-of picks the latest right version at or before the left ordinal") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 7L, "d"))
      .toDF("k", "o", "lv")
    val r = Seq((1L, 5L, "v1"), (1L, 15L, "v2"), (1L, 25L, "v3"), (2L, 9L, "x"))
      .toDF("k2", "o2", "rv")
    val out = AsOf.join(l, r, l("k"), r("k2"), l("o"), r("o2"))
      .select($"k", $"o", $"rv").orderBy($"k", $"o")
      .as[(Long, Long, Option[String])].collect()
    assert(out.toSeq === Seq(
      (1L, 10L, Some("v1")),   // v2@15 is later than 10
      (1L, 20L, Some("v2")),   // v3@25 is later than 20
      (2L, 5L, None),          // only version is at 9 > 5
      (3L, 7L, None)))         // key has no versions at all
  }

  test("null keys match nothing (SQL join semantics, not key 0)") {
    val l = Seq((Some(0L), 10L, "real-zero"), (None, 20L, "null-key"))
      .toDF("k", "o", "lv")
    val r = Seq((Some(0L), 5L, "v-zero"), (None, 1L, "v-null"))
      .toDF("k2", "o2", "rv")
    val out = AsOf.join(l, r, l("k"), r("k2"), l("o"), r("o2"))
      .select($"lv", $"rv").collect()
      .map(row => row.getString(0) -> Option(row.getString(1))).toMap
    assert(out("real-zero") === Some("v-zero")) // genuine key 0 still matches
    assert(out("null-key") === None)            // null key must not bind to 0
  }

  test("as-of join edge cases: empty sides, dense single-key history") {
    val emptyR = Seq.empty[(Long, Long, String)].toDF("k2", "o2", "rv")
    val l = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "o", "lv")
    val out1 = AsOf.join(l, emptyR, l("k"), emptyR("k2"), l("o"), emptyR("o2"))
      .select($"k", $"rv").orderBy($"k").as[(Long, Option[String])].collect()
    assert(out1.toSeq === Seq((1L, None), (2L, None)))

    val emptyL = Seq.empty[(Long, Long, String)].toDF("k", "o", "lv")
    val r = Seq((1L, 5L, "v")).toDF("k2", "o2", "rv")
    assert(AsOf.join(emptyL, r, emptyL("k"), r("k2"), emptyL("o"), r("o2")).count() === 0)

    // one key, 100 versions at ord 0,2,4,... and 100 probes at 1,3,5,...
    // — probe at 2i+1 must see version 2i; forces sustained merge advance
    val versions = (0 until 100).map(i => (7L, i * 2L, i.toLong)).toDF("k2", "o2", "v")
    val probes = (0 until 100).map(i => (7L, i * 2L + 1)).toDF("k", "o")
    val out3 = AsOf.join(probes, versions, probes("k"), versions("k2"), probes("o"), versions("o2"))
      .select($"o", $"v").orderBy($"o").as[(Long, Long)].collect()
    assert(out3.toSeq === (0 until 100).map(i => (i * 2L + 1, i.toLong)))
  }

  test("left-side filters push through the as-of join into the scan") {
    val ord = (unix_micros(col("ts")) - lit(1704067200000000L)) * 100000L + col("event_id")
    val ev = Tables.events(spark, sfDir)
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), ord.as("lo"))
    val r = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("r_user"), col("event_id").as("signup_event"), ord.as("ro"))
    val j = AsOf.join(l, r, l("user_id"), r("r_user"), l("lo"), r("ro"))
      .filter(col("event_id") < 100) // references the LEFT side only
    val optimized = j.queryExecution.optimizedPlan
    // the filter must sit BELOW the AsOfJoinNode after optimization
    val node = optimized.collectFirst { case n: AsOfJoinNode => n }.get
    assert(node.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("event_id") && f.condition.toString.contains("100") => f
    }.nonEmpty, s"filter not pushed:\n$optimized")
    // and results equal joining the pre-filtered left input directly
    val l2 = l.filter(col("event_id") < 100)
    val want = AsOf.join(l2, r, l2("user_id"), r("r_user"), l2("lo"), r("ro"))
    assert(j.exceptAll(want).count() === 0 && want.exceptAll(j).count() === 0)
  }

  test("matches the window-join reference formulation on events") {
    val ord = (unix_micros(col("ts")) - lit(1704067200000000L)) * 100000L + col("event_id")
    val ev = Tables.events(spark, sfDir)
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), ord.as("lo"))
    val r = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("r_user"), col("event_id").as("signup_event"), ord.as("ro"))
    val got = AsOf.join(l, r, l("user_id"), r("r_user"), l("lo"), r("ro"))
      .select(col("user_id"), col("event_id"), col("signup_event"))

    // reference: pair join + keep latest right per left row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_id")).orderBy(col("ro").desc)
    val want = l.join(r, col("user_id") === col("r_user") && col("ro") <= col("lo"), "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("signup_event"))

    assert(got.count() === l.count())
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }
}

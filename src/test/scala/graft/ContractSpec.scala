package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself — cheap failures here beat silent
  * zeroes in the driver's correctness round. */
class ContractSpec extends AnyFunSuite with SparkSpec {

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("queries without an oracle are the documented rows-only set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("q_approx_distinct"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("entry (driver smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no query plans a cartesian product") {
    // the streaming queries execute a stream when built, so they are
    // exercised in StreamSpec/verify instead of planned here
    val skip = Set("cdc_apply_stream", "stream_tumbling_window", "stream_dedup")
    SparkEntry.queries.filterNot(q => skip(q._1)).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("oracle SQL contains no tab/CR control chars that bend JSON escaping") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.exists(c => c < ' ' && c != '\n'), s"$k has control chars")
    }
  }
}

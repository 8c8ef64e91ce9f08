package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.model.Tables

/** Point-in-interval (range) join via bin replication.
  *
  * Spark has no native range join: `points JOIN intervals ON p >= s AND
  * p < e` plans as a BroadcastNestedLoopJoin (O(|points|·|intervals|) —
  * unusable once either side is large). The standard scale rendering bins
  * the domain: each interval is replicated to every bin it covers, each
  * point maps to exactly one bin, and the join becomes a plain equi-join on
  * the bin key with the range predicate as a residual filter. Cost is
  * O(|points| + |intervals|·len/binWidth) shuffled rows — linear, AQE
  * handles hot bins, and the bin key doubles as a partition key at 100 TB.
  *
  * Each matching (point, interval) pair is emitted exactly once: a point
  * joins only replicas in its own bin, and an interval has exactly one
  * replica per covered bin.
  */
object RangeJoin {

  /** Long-domain form (callers convert timestamps with unix_micros).
    * Intervals are half-open [startCol, endCol); empty/negative intervals
    * produce no replicas. Output: points.* ++ intervals.*. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // exact integer `div` (a double floor() would lose precision above 2^53
    // — epoch micros are within a factor of 8). `div` truncates toward zero
    // rather than flooring, which is still correct: truncating division is
    // monotone in the dividend, so any p in [s, e) has its bin inside
    // [s div w, (e-1) div w] — the replicated range (seeded random spec
    // covers negative domains)
    val binned = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bin", explode(sequence(
        expr(s"$startCol div $binWidth"), expr(s"($endCol - 1) div $binWidth"))))
    val p = points.withColumn("_bin", expr(s"$pointCol div $binWidth"))
    p.join(binned, Seq("_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bin")
  }

  /** Query: events falling in the first 7 days of each calendar month
    * present in the data — count and exact value sum per window. The
    * interval table is derived (distinct month starts), the join runs
    * through [[pointInInterval]] with day-wide bins. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val micros = 1000000L
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("value"), unix_micros(col("ts")).as("p"))
    val iv = Tables.events(spark, dir)
      .select(date_trunc("month", col("ts")).as("w_start")).distinct()
      .select(col("w_start"),
        unix_micros(col("w_start")).as("s"),
        unix_micros(col("w_start") + expr("INTERVAL 7 DAYS")).as("en"))
    pointInInterval(e, "p", iv, "s", "en", binWidth = 86400L * micros)
      .groupBy(col("w_start"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double").as("sum_value"))
      .orderBy(col("w_start"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew mitigation: two-phase salted aggregation. A single hot key (one
  * user producing 10% of 100 TB of events) funnels its entire group through
  * one reducer in a plain groupBy; salting splits each key into `buckets`
  * sub-groups for the wide partial phase, then re-aggregates the (tiny)
  * per-salt partials. AQE's skew handling covers joins; this is the
  * aggregation-side analog, usable wherever the aggregate decomposes
  * (count/sum/min/max — anything with an associative merge).
  */
object Skew {

  /** Salted skew JOIN: the join-side analog of [[saltedCountSum]], for the
    * sort-merge case AQE can't always save (e.g. a broadcast-ineligible
    * build side, or a streaming micro-batch where AQE is off). The large
    * (skewed) side gets a row-local salt 0..buckets-1; the small side is
    * replicated once per salt value; the join runs on (key, salt), so a hot
    * key's rows spread over `buckets` reducers instead of one. The result
    * set is exactly the unsalted join — salting only re-shapes the shuffle.
    *
    * Cost model: replication multiplies the SMALL side's shuffle volume by
    * `buckets` — correct when small ≪ large (the skew scenario); if the
    * small side fits a broadcast, broadcast instead and no salt is needed.
    * `joinType` may be any type whose semantics survive key-partitioned
    * splitting of the LARGE side (inner / left_outer / left_semi: each
    * large-side row still meets every matching small-side row in its salt
    * slice; right/full outer would duplicate small-side unmatched rows). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer", "left", "left_semi", "left_anti").contains(joinType),
      s"saltedJoin does not preserve $joinType semantics")
    val l = large.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    l.join(s, keys :+ "_salt", joinType).drop("_salt")
  }

  /** count + exact decimal sum of `value` per `key`, salted into `buckets`
    * partial groups. Result is identical to the unsalted aggregation (sums
    * are decimal — order-free). */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
                     buckets: Int = 16): DataFrame = {
    // salt must be row-local, not value- or partition-derived: a hot key with
    // constant values (or concentrated in one input partition) would otherwise
    // land in ONE salt bucket and stay skewed. monotonically_increasing_id
    // increments per row within a partition, so pmod cycles 0..buckets-1
    // row by row regardless of input layout.
    val salted = df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    salted
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(value.cast(DecimalType(18, 4))).as("_s"))
      .groupBy(col("key"))
      .agg(sum(col("_n")).as("n"),
           round(sum(col("_s")), 2).cast("double").as("sum_value"))
  }
}

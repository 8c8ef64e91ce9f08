package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DecimalType
import graft.model.Tables

/** Bloom-filter semi-join pruning — the scan-side pre-filter that makes
  * selective joins cheap at 100 TB.
  *
  * A plain `big SEMI JOIN keys` shuffles every `big` row to the join, even
  * though most rows match nothing when `keys` is selective. Spark's adaptive
  * runtime filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
  * injects exactly this rewrite for qualifying plans; this operator exposes
  * the same construction — `BloomFilterMightContain(ScalarSubquery(
  * bloom_filter_agg(...)))` — as an explicit, always-on operator, so the
  * pruning applies regardless of the optimizer's size heuristics (and
  * documents the mechanism).
  *
  * Shape: one small aggregation job over `keys` builds a bloom sketch
  * (map-side combined, merged to one ~numBits/8-byte buffer); the sketch is
  * evaluated as an uncorrelated scalar subquery, so every `big`-side task
  * tests membership BEFORE the exchange — the shuffle carries only probable
  * matches (plus the fpp fraction of false positives). The exact semi-join
  * afterwards removes false positives; results are identical to the plain
  * semi-join by construction.
  */
object Prune {

  /** `might_contain(<bloom of keys.keyCol>, xxhash64(big.bigKey))` as a
    * Column usable in `big.filter(...)`. Both sides hash with xxhash64, the
    * same convention Spark's InjectRuntimeFilter uses. */
  def bloomMightContain(big: DataFrame, bigKey: String, keys: DataFrame,
                        keyCol: String, expectedItems: Long): org.apache.spark.sql.Column = {
    val bloomPlan = keys
      .select(ColumnBridge.column(new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col(keyCol))), expectedItems)
        .toAggregateExpression()).as("bf"))
      .queryExecution.analyzed
    ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      ColumnBridge.expression(xxhash64(big(bigKey)))))
  }

  /** Exact semi-join with a bloom pre-filter on the big side. */
  def bloomSemiJoin(big: DataFrame, bigKey: String, keys: DataFrame,
                    keyCol: String, expectedItems: Long = 1000000L): DataFrame = {
    val pruned = big.filter(bloomMightContain(big, bigKey, keys, keyCol, expectedItems))
    // anchor the key column to its side — an unanchored col(keyCol) is
    // ambiguous whenever both sides use the same key name
    val k = keys.select(col(keyCol)).distinct()
    pruned.join(k, pruned(bigKey) === k(keyCol), "left_semi")
  }

  /** Query: lineitems of urgent orders, summarized per return flag. The
    * urgent-order key set is ~20% of orders; the bloom prunes the lineitem
    * side before its shuffle. Result is identical to the plain semi-join
    * (`IN` subquery oracle). */
  def qBloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    bloomSemiJoin(Tables.lineitem(spark, dir), "l_orderkey", urgent, "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast(DecimalType(18, 4))), 2).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }
}

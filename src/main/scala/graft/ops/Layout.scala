package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout sink: the write side of partition pruning.
  *
  * At 100 TB a table's directory layout IS the primary index:
  * `partitionBy` columns become `col=value` directories the reader prunes
  * without opening a file, and sorting within files gives parquet
  * min/max row-group statistics their selectivity. This operator writes a
  * DataFrame in that shape:
  *
  *  - `repartition(partCols)` first, so each partition directory is
  *    written by the tasks that own its rows (without it, every task
  *    writes a sliver of every partition — the classic small-files
  *    explosion: tasks × partitions files);
  *  - `sortWithinPartitions(sortCols)` so each written file is sorted and
  *    its row-group min/max actually bound the sort key;
  *  - `partitionBy(partCols)` for the directory layout.
  *
  * (`bucketBy` — the hash-bucketed, shuffle-free-join layout — needs the
  * table catalog; ScaleSpec's bucketed-join test covers that path.)
  */
object Layout {

  def writePartitionedSorted(df: DataFrame, dir: String,
                             partCols: Seq[String], sortCols: Seq[String]): Unit =
    // sort by partCols FIRST: the V1 write path requires ordering by the
    // partition columns and inserts its own Sort when the child's ordering
    // doesn't satisfy it — a bare sortWithinPartitions(sortCols) would then
    // survive only through in-memory TimSort stability and be lost the
    // moment the write-side sort spills. The partCols-prefixed sort
    // satisfies the requirement (prefix match), guarantees the in-file
    // order, and avoids the redundant second sort.
    df.repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(dir)

  /** Read back with a partition predicate — the reader must prune to the
    * matching directories (assert via `PartitionFilters` in the scan). */
  def readPartition(spark: SparkSession, dir: String,
                    partCol: String, value: String): DataFrame =
    spark.read.parquet(dir).filter(col(partCol) === value)
}

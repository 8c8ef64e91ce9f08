package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated fixture tables (see TESTDATA.md /
  * FIXTURES.md). One parquet file per table under the scale-factor dir.
  *
  * Scale note: `spark.read.parquet` gives the vectorized reader with
  * predicate pushdown and column pruning for free — at 100 TB these tables
  * would be directory-partitioned (e.g. orders by o_orderdate month) and the
  * same call picks up partition pruning; nothing here hard-codes a layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * builds and TIMESTAMP(MICROS) in others, so the loader normalizes BY
    * INFERRED TYPE rather than assuming either:
    *   - NANOS: Spark 4's vectorized reader rejects it outright
    *     ([PARQUET_TYPE_ILLEGAL]); read as raw nanos (legacy nanosAsLong)
    *     and convert with integer `div` (a double division would lose
    *     precision above 2^53 ns; `div` truncates toward zero exactly like
    *     DuckDB's ns→µs read, so the engines agree even on sub-µs data);
    *   - MICROS (isAdjustedToUTC=false → TIMESTAMP_NTZ): reinterpret the
    *     wall-clock value as a UTC instant — the whole engine and the
    *     oracle both run pinned to UTC, so the value is identical to what
    *     the NANOS path produces for the same data.
    * Either way callers see one shape: `ts` as a µs-precision
    * TimestampType column. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4's vectorized
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as raw
    * nanos (legacy nanosAsLong) and convert to a microsecond timestamp with
    * integer `div` (a double division would lose precision above 2^53 ns).
    * The fixture data is µs-exact (verified: zero rows with sub-µs nanos at
    * any SF), so this is lossless — and even if sub-µs data ever appeared,
    * integer `div` truncates toward zero exactly like DuckDB's ns→µs read,
    * so the two engines would still agree. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

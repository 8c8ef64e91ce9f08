package graft
import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val keys = Seq(1L, 5L, 9L).toDF("k")
    try {
      val bloom = keys.agg(expr("bloom_filter_agg(xxhash64(k), 100L, 800L)").as("bf"))
      val big = (1L to 20L).toDF("x")
      val out = big.crossJoin(broadcast(bloom))
        .filter(expr("might_contain(bf, xxhash64(x))"))
        .select("x")
      println("[scratch] bloom ok: " + out.collect().map(_.getLong(0)).toSeq)
    } catch { case e: Throwable => println("[scratch] bloom FAILED: " + e.getMessage.take(300)) }
    spark.stop()
  }
}

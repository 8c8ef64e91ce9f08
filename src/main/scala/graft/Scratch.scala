package graft
import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.model.Tables
    Tables.documents(spark, sfDir).count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    for (i <- 1 to 3)
      time(s"doc_ngram_jaccard #$i")(graft.ops.Dedup.ngramJaccardPairs(spark, sfDir).count())
    for (i <- 1 to 2)
      time(s"doc_dup_clusters #$i")(graft.ops.Dedup.duplicateClusters(spark, sfDir).count())
    time("doc_minhash_lsh")(graft.ops.Dedup.minhashPairs(spark, sfDir).count())
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q1_pricing", "q5_nation_revenue", "emb_cosine_topk", "cdc_apply",
        "q_tumbling_window", "cdc_asof_join", "doc_ngram_jaccard", "q_topk_agg",
        "q_bloom_semijoin", "q_range_join", "cdc_apply_dsv2", "emb_ann_centroid",
        "q_bucketed_join", "doc_pack_chunks", "cdc_apply_txn", "emb_kmeans",
        "q_skew_join", "cdc_state_diff", "emb_ann_kmeans",
        "doc_surprisal", "emb_pq_topk", "emb_ann_ivfpq", "doc_repetition",
        "doc_budget_sample", "doc_bm25_search", "doc_phrase_search")) {
      println(s"##### $q")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

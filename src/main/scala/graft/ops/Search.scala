package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** FULL-TEXT RETRIEVAL over the `documents` table — the reference's whole
  * consumer side exists to serve Elasticsearch SEARCH (`es.go:13-152`: one
  * index per table, documents upserted so queries stay current). The
  * engine's keyed state + secondary index ([[graft.cdc.Index]]) cover the
  * value-addressed half of that surface; this module covers the TEXT half:
  * a staged term-partitioned INVERTED INDEX (the Lucene postings layout
  * rendered as parquet), BM25-ranked retrieval over it, and positional
  * phrase matching.
  *
  * Index layout (staged once per fixture content, [[graft.model.Staging]]):
  * postings rows `(tok, doc_id, tf, dl)` written `partitionBy(pb)` where
  * `pb = crc32(tok) % 64` — the term-bucket inverted-list layout, the same
  * staging discipline as the IVF-PQ cell index. The document length `dl`
  * is DENORMALIZED INTO the postings (Lucene's norms): query-time scoring
  * needs no corpus-wide doc-length join. A query computes its terms'
  * buckets driver-side (a handful of literals) and PARTITION-PRUNES the
  * scan — at 100 TB a query's IO is its terms' posting lists, not the
  * corpus, exactly the ES/Lucene deployment. The index build itself is one
  * explode + one (tok, doc_id) aggregation pass; under a CDC stream it
  * would maintain like [[graft.cdc.Index]] (per-batch deltas into the
  * keyed layout).
  *
  * Determinism (cross-engine, hash-checked): BM25's idf is kept RATIONAL —
  * `(N − df + 0.5) / (df + 0.5)`, no logarithm (ln differs in ulps across
  * libm builds; the rational weight is bit-identical and ranks the same,
  * the [[Text.qTfIdf]] discipline). All inputs are integers, every
  * double-op sequence is written with the same association as the oracle
  * SQL (IEEE 754 ops on identical inputs are engine-independent),
  * per-term scores round to 6 places before the order-free DECIMAL
  * per-doc sum, and ranking rounds again with ties on doc_id.
  */
object Search {

  val TermBuckets = 64

  /** Spark-side term bucket: crc32 over the token's UTF-8 bytes, mod 64. */
  def termBucket(tok: Column): Column = crc32(tok) % TermBuckets

  /** Driver-side twin of [[termBucket]] for pruning literals — same CRC32
    * polynomial ([[java.util.zip.CRC32]]) over the same UTF-8 bytes. */
  def bucketOf(term: String): Long = {
    val c = new java.util.zip.CRC32
    c.update(term.getBytes("UTF-8"))
    c.getValue % TermBuckets
  }

  /** The staged inverted index: term-bucket-partitioned postings (with
    * denormalized doc lengths) + one-row corpus stats. */
  private[graft] def invertedIndex(spark: SparkSession, dir: String): String = {
    val fp = graft.model.Staging.fingerprint(dir, Seq("documents.parquet"))
    graft.model.Staging.ensure(s"/tmp/graft-fts/$fp-b$TermBuckets") { tmp =>
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("ws"))
        .select(col("doc_id"), col("ws"), size(col("ws")).cast("long").as("dl"))
      docs.select(col("doc_id"), col("dl"), explode(col("ws")).as("tok"))
        .groupBy(col("tok"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("pb", termBucket(col("tok")))
        .write.partitionBy("pb").parquet(s"$tmp/postings")
      docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
        .write.parquet(s"$tmp/stats")
    }
  }

  /** BM25 top-k retrieval from the staged index. The scan reads ONLY the
    * query terms' partitions (`pb` literals pruned at the parquet source,
    * then the exact-term filter pushed inside them); `df` per term comes
    * from the same pruned postings. Defaults k1=1.2, b=0.75 (the Lucene
    * defaults). Output: per rank, the doc, its matched-term count and
    * rounded score. */
  def qBm25(spark: SparkSession, dir: String,
            query: Seq[String] = Seq("stream", "merge", "window"),
            k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val root = invertedIndex(spark, dir)
    val buckets = query.map(bucketOf).distinct.sorted
    // explicit schema: partition-column inference would type pb INT
    val postings = spark.read
      .schema("tok STRING, doc_id BIGINT, dl BIGINT, tf BIGINT, pb BIGINT")
      .parquet(s"$root/postings")
      .filter(col("pb").isin(buckets: _*) && col("tok").isin(query: _*))
    val stats = spark.read.parquet(s"$root/stats") // one row
    val df = postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // per-(doc, term) BM25 contribution — association mirrors the oracle
    // SQL text exactly; see the object doc-comment's determinism note
    val idf = ((col("n_docs") - col("df")).cast("double") + 0.5) /
      (col("df").cast("double") + 0.5)
    val tfs = (col("tf").cast("double") * (k1 + 1)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1 - b) + lit(b) * (col("dl").cast("double") * col("n_docs") / col("sum_dl"))))
    val perTerm = postings.join(broadcast(df), Seq("tok"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(idf * tfs, 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 8)).as("ts"))
    // distributed top-k (TakeOrdered via sort+limit — per-partition heaps,
    // never a global sort of every matched doc); the rank window then runs
    // over k rows only, so no single reducer ever sees the full match set
    val topk = perTerm.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_t"),
        round(sum(col("ts")).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    topk.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("rk"), col("doc_id"), col("n_t"), col("score"))
      .orderBy(col("rk"))
  }

  /** Positional phrase match: documents containing the exact word sequence,
    * with occurrence counts. Rendered as a word-boundary regexp count over
    * the raw text — ONE corpus scan, no explode, no shuffle beyond the
    * final sort; embarrassingly parallel at 100 TB (a Lucene engine would
    * intersect positional postings instead — cheaper per query, but the
    * scan is the honest one-pass Spark rendering and the filter pushes to
    * the parquet reader's row groups). The fixture text is single-space
    * word soup, so `\b` word boundaries equal token boundaries. */
  def qPhraseSearch(spark: SparkSession, dir: String,
                    phrase: String = "merge window"): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_count(col("text"), lit("\\b" + phrase + "\\b"))
          .cast("long").as("hits"))
      .filter(col("hits") > 0)
      .orderBy(col("doc_id"))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Text-analysis + exact-dedup operators over `documents` — the
  * training-data-pipeline extensions (BASELINE.json north star). All are
  * pure column expressions (whole-stage codegen, no UDFs), so they scan
  * 100 TB of text at parquet-reader speed and the only shuffles are the
  * final aggregations.
  */
object Text {

  /** Whitespace tokens of `text`. The fixture text is single-space word
    * soup, so split-on-space == whitespace tokenization. */
  def tokens(c: Column): Column = split(c, " ")

  /** Per-language corpus stats: doc count, exact char stats, word counts. */
  def qTextStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("n_chars"),
        length(col("text")).cast("long").as("text_len"),
        size(tokens(col("text"))).cast("long").as("n_words"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("text_len")).as("min_len"),
        max(col("text_len")).as("max_len"),
        sum(col("n_words")).as("sum_words"))
      .orderBy(col("lang"))

  /** Token counting two ways: whitespace tokens and a BPE-ish regex token
    * count (letter runs / digit runs / single other chars) — the standard
    * pre-tokenizer shape. */
  def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")).cast("long").as("bpe_tokens"))
      .orderBy(col("doc_id"))

  /** The single source of truth for the per-language stopword lists — the
    * lang-id, quality, and curation queries AND their DuckDB oracles
    * (SparkEntry.hitsSql) all derive from this map; editing it anywhere
    * else silently breaks Spark↔oracle parity. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** One alternation regex per word list (word-boundary matches cannot
    * overlap, so one pass counts exactly what per-word passes would). */
  def hits(c: Column, words: Seq[String]): Column =
    regexp_count(c, lit(s"\\b(${words.mkString("|")})\\b"))

  /** N-gram/stopword-heuristic language ID: count stopword hits per
    * candidate language, argmax wins ('und' = undetermined when all zero);
    * reports the confusion against the labeled lang. */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val scored = d.select(Seq(col("doc_id"), col("lang")) ++
      stopwords.toSeq.sortBy(_._1).map { case (l, ws) => hits(col("text"), ws).as(s"hit_$l") }: _*)
    // argmax with deterministic tie-break = language name order
    val langs = stopwords.keys.toSeq.sorted
    val best = langs.map(l => struct(col(s"hit_$l").as("h"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("h") > a.getField("h"), b).otherwise(a))
    scored
      .withColumn("pred", when(greatest(langs.map(l => col(s"hit_$l")): _*) === 0, lit("und"))
        .otherwise(best.getField("l")))
      .groupBy(col("lang"), col("pred")).count()
      .orderBy(col("lang"), col("pred"))
  }

  /** Quality scoring: length, mean word length, alpha ratio, stopword
    * ratio — combined into a bounded [0,1] score. All exact-integer inputs;
    * the one division is done once at the end and rounded. */
  def qQualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("n_words", size(tokens(col("text"))))
      .withColumn("text_len", length(col("text")))
      .withColumn("alpha_chars", length(regexp_replace(col("text"), "[^a-zA-Z]", "")))
      .withColumn("stop_hits", hits(col("text"), stopwords("en")))
    // ratios as IEEE double division of exact integers — bit-identical in
    // any engine, unlike decimal division (dialect-specific result scales)
    d.select(
        col("doc_id"),
        col("n_words").cast("long").as("n_words"),
        (round(col("alpha_chars").cast("double") / col("text_len") * 1e4) / 1e4).as("alpha_ratio"),
        (round(col("stop_hits").cast("double") / col("n_words") * 1e4) / 1e4).as("stop_ratio"),
        round(
          least(col("n_words").cast("double") / 100d, lit(1d)) * 5 +
          least(col("stop_hits").cast("double") / 10d, lit(1d)) * 5, 2).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint = md5 of normalized text (cross-engine-stable),
    * and exact dedup over it: one representative (min doc_id) per distinct
    * normalized text + the duplicate count. Hash-groupBy — the exact-dedup
    * baseline; at 100 TB this is one shuffle on a 128-bit key, and the
    * fingerprint column doubles as a bucketing key for incremental dedup. */
  def qExactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(lower(col("text"))).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("fp"))

  /** Dedup summary per source: total docs, distinct fingerprints, dup rows
    * to drop — the "how much of my corpus is redundant" report. */
  def qDedupStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), md5(lower(col("text"))).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("fp")).as("n_distinct"),
           (count(lit(1)) - countDistinct(col("fp"))).as("n_dup_rows"))
      .orderBy(col("source"))

  /** Token frequency analysis: corpus-wide top-30 tokens (the word-count
    * that underlies vocabulary pruning / stop-list induction), deterministic
    * tie-break on the token itself. */
  def qTokenFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok"))
      .limit(30)

  /** TF-IDF top terms: term frequency per doc × inverse document frequency,
    * for the first 20 docs, top 3 terms each. The idf is kept rational
    * (N/df, no logarithm — ln differs in ulps across libm builds, a
    * rational weight is bit-identical cross-engine and ranks the same).
    * df is corpus-wide (one distinct+count aggregation); tf is restricted
    * to the reported docs before the join, so the expensive side stays
    * small. Scores are rounded before ranking, ties broken on the token. */
  def qTfIdf(spark: SparkSession, dir: String, nDocs: Int = 20, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tf = toks.filter(col("doc_id") < nDocs)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = toks.select(col("doc_id"), col("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_corpus"))
    val scored = tf.join(df, Seq("tok")).crossJoin(broadcast(n))
      .withColumn("score",
        (round(col("tf").cast("double") * col("n_corpus") / col("df") * 1e6) / 1e6))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("tok"),
        col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Gopher-style REPETITION signals — the duplicate-n-gram family of
    * quality filters (top-word fraction, duplicate 2-gram / 3-gram
    * fractions) used by production pre-training pipelines to drop
    * boilerplate and degenerate pages. Distinct from [[qQualityScore]]
    * (length/alpha/stopword shape): a page can look "high quality" by
    * those and still be one sentence repeated 40×.
    *
    * Shape: every metric is a per-row array expression over the token
    * array — the top-word fraction folds a sorted copy with
    * `aggregate` (longest equal-adjacent run = mode count), the dup
    * fractions compare `array_distinct` size to gram count — so the
    * query is a pure scan: NO shuffle, no explode, work ∝ corpus bytes,
    * embarrassingly parallel at 100 TB. The threshold flag compares the
    * ROUNDED fractions (6 dp, same rounding as the oracle) so the
    * boundary can never drift between engines. */
  def qRepetition(spark: SparkSession, dir: String): DataFrame = {
    val ws = tokens(col("text"))
    // longest run of equal adjacent elements in the sorted token array =
    // the most frequent word's count, in one O(n log n) fold
    val topCount = aggregate(
      array_sort(ws),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") <=> x, acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    // the n-grams of the token array as one transform over positions;
    // shorter-than-n docs contribute an empty gram list
    def grams(n: Int): Column =
      when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    def dupFrac(g: Column): Column =
      when(size(g) > 0,
        (round((lit(1.0) - size(array_distinct(g)).cast("double") / size(g)) * 1e6) / 1e6))
        .otherwise(lit(0.0))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(ws).cast("long").as("n_words"),
        (round(topCount.cast("double") / size(ws) * 1e6) / 1e6).as("top_word_frac"),
        dupFrac(grams(2)).as("dup_2gram_frac"),
        dupFrac(grams(3)).as("dup_3gram_frac"))
      .withColumn("repetitive",
        (col("top_word_frac") > 0.12 || col("dup_2gram_frac") > 0.05)
          .cast("long"))
      .orderBy(col("doc_id"))
  }

  /** Unigram SURPRISAL gate — the perplexity-filter stage of a curation
    * pipeline (CCNet-style: score each document against a corpus language
    * model, drop the tail) rendered log-free so it is bit-identical
    * cross-engine: instead of mean −log p(tok) we score the mean INVERSE
    * unigram probability, mean(T / freq(tok)) — the same rational-weight
    * discipline as [[qTfIdf]]'s N/df idf (ln differs in ulps across libm
    * builds; a ratio of counts does not). Monotone in token rarity, so it
    * ranks documents exactly like the unigram perplexity it stands in for.
    *
    * Determinism: each token's weight is rounded to 6 dp THEN cast to
    * decimal, so the per-doc sum is exact in any engine regardless of
    * addition order; the mean is the exact-decimal sum cast to double and
    * divided by the count — one IEEE operation, bit-identical everywhere
    * (a final round(x, 6) is NOT applied: rounding a raw double half-way
    * case is engine-dependent and flipped a value in testing). The kept
    * flag's threshold 31.0 sits in an empty band of the fixture
    * distribution — no boundary drift.
    *
    * Scale: at 100 TB the vocabulary is 10⁷–10⁸ terms — far too large to
    * broadcast (a driver-built vocabulary-sized hash map is the
    * scale-killer), so the LM join is a plain SHUFFLE join on `tok`. Both
    * sides are first collapsed to distinct (doc, tok) / (tok) keys by
    * map-side-combinable aggregations, so the join and every shuffle carry
    * per-doc DISTINCT tokens (Zipf-bounded), not token instances; the only
    * instance-sized pass is the initial per-(doc, tok) count — word-count
    * shape, linear in corpus bytes. The grand total stays a broadcast
    * scalar. (The alternative faithful-CCNet rendering — top-K vocab
    * broadcast + a default tail weight — changes scores; this one is
    * value-identical to the full LM at any scale.) */
  def qSurprisal(spark: SparkSession, dir: String, threshold: Double = 31.0): DataFrame = {
    val docTok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val freqs = docTok.groupBy(col("tok")).agg(sum(col("c")).as("freq"))
    val total = freqs.agg(sum(col("freq")).as("t_total"))
    // per-(doc, tok) weight = c · round6(T/freq) as exact decimals: the
    // integer-scaled product keeps the per-doc sum order-free and equal to
    // the per-instance sum the oracle computes
    docTok.join(freqs, Seq("tok")).crossJoin(broadcast(total))
      .select(col("doc_id"), col("c"),
        // round(q*1e6)/1e6, not round(q, 6): T/freq TERMINATES at 7+
        // decimals when freq is 2-5-smooth (freq=4096 -> 24.4140625),
        // exactly the half-way case where the engines' round() impls
        // disagree -- the Similarity.qCentroids mean-rounding discipline
        ((round(col("t_total").cast("double") / col("freq") * 1e6) / 1e6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 8)) *
          col("c").cast(org.apache.spark.sql.types.DecimalType(10, 0))).as("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_toks"),
           (sum(col("w")).cast("double") / sum(col("c"))).as("surprisal"))
      .withColumn("kept", (col("surprisal") <= threshold).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** Rolling (polynomial) hash fingerprint over the token stream — a
    * content-defined fingerprint that, unlike md5-of-whole-text, is
    * incrementally computable over chunks. Pure integer arithmetic so it is
    * reproducible in ANSI SQL: fp = Σ token_ord_hash(i) * 31^(i mod 8) mod p.
    * Implemented with posexplode + aggregation (distributed; no UDF). */
  def qRollingFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val p = 1000000007L
    // 31^(pos%5) as exact literals — keeps every product < 2^54 (no Long
    // overflow, and DuckDB's HUGEINT sum agrees after the final mod+cast)
    val weights = array(Seq(1L, 31L, 961L, 29791L, 923521L).map(lit): _*)
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      // per-token stable hash: first 6 hex chars of md5 (24 bits), as a long
      .withColumn("th", conv(substring(md5(col("tok")), 1, 6), 16, 10).cast("long"))
      .withColumn("weight", element_at(weights, (col("pos") % 5 + 1).cast("int")))
    d.groupBy(col("doc_id"))
      .agg((sum(col("th") * col("weight")) % p).cast("long").as("fingerprint"),
           count(lit(1)).as("n_tokens"))
      .orderBy(col("doc_id"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Dataset-curation operators — the selection/splitting stages of a
  * training-data pipeline. Everything is driven by a deterministic content
  * hash, NOT rand(): reproducible across runs/engines (each step is DuckDB-
  * oracle-checked), stable under repartitioning, and membership of a row in
  * a sample/split never changes when the corpus around it grows — the
  * property that keeps train/test assignment consistent across dataset
  * versions at 100 TB.
  *
  * All are single-pass column expressions + one aggregation at most; the
  * scan stays pruned to the referenced columns.
  */
object Curate {

  /** Deterministic bucket in [0, m): first 24 bits of md5 of the key's
    * string form. Cross-engine: DuckDB spells it
    * `CAST('0x'||substr(md5(CAST(k AS VARCHAR)),1,6) AS BIGINT) % m`. */
  def hashBucket(key: Column, m: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 6), 16, 10).cast("long") % m

  /** Oracle-checked query: PII SCRUBBING (r19) — the redaction pass every
    * production training-data pipeline (C4, Dolma, FineWeb) runs before
    * anything else: pattern-matched spans (emails, numeric reference
    * codes) replace with typed placeholders, and the pipeline reports
    * per-document redaction counts for auditing. The fixture corpus
    * carries no PII, so a deterministic derived layer injects it (the
    * geo-points discipline): docs with doc_id % 3 == 0 gain an email,
    * % 4 == 0 a numeric ref code — so the counts genuinely vary 0/1 and
    * the scrubbed output differs per class. Patterns stay in the
    * Java-regex/RE2 intersection (the regexp_query scoping) so both
    * engines match identical spans; DuckDB's regexp_replace needs the
    * explicit 'g' flag to match Spark's replace-all default. Zero
    * shuffles: per-row expressions over the pruned (doc_id, text) scan;
    * the audit hash is md5 of the scrubbed text. */
  def qPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val withPii = Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 4 === 0,
            concat(lit(" ref "),
              pmod(col("doc_id") * 7919, lit(100000)).cast("string")))
            .otherwise(lit(""))).as("text"))
    val emailRe = "user[0-9]+@example[.]com"
    val codeRe = "ref [0-9]+"
    withPii.select(
        col("doc_id"),
        regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(codeRe)).cast("long").as("n_codes"),
        regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
          codeRe, "ref <ID>").as("clean"))
      .select(col("doc_id"), col("n_emails"), col("n_codes"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(col("clean")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** 10% deterministic sample of documents (bucket < 10 of 100). */
  def qSampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", hashBucket(col("doc_id"), 100))
      .filter(col("bucket") < 10)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))

  /** Hash-split into train/val/test (80/10/10) — per (lang, split) counts.
    * The split column is derived, never stored: any engine recomputes the
    * same assignment. */
  def qTrainTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("b", hashBucket(col("doc_id"), 100))
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("split"))

  /** Quality-gate filter chain: keep docs with >= 30 words, >= 2 English
    * stopword hits, and a text length consistent with its recorded n_chars.
    * The composed predicate collapses into ONE scan-side filter (conjunctive
    * predicates push down together); survivors are listed with the gate
    * inputs. */
  def qQualityFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_words", size(split(col("text"), " ")).cast("long"))
      .withColumn("stop_hits", Text.hits(col("text"), Text.stopwords("en")).cast("long"))
      .filter(col("n_words") >= 30 && col("stop_hits") >= 2 &&
        length(col("text")) === col("n_chars"))
      .select(col("doc_id"), col("lang"), col("n_words"), col("stop_hits"))
      .orderBy(col("doc_id"))

  /** Train/test contamination check: SimHash near-dup buckets whose
    * documents land in MORE than one hash-split — the leakage report a
    * training pipeline runs before shipping a split (a near-duplicate of a
    * test document inside the train set inflates eval scores). Composes the
    * dedup signature with the split assignment: one join-free pass over
    * (simhash, split) then a bucket-level aggregation. */
  def qSplitLeakage(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(spark, dir)
      .withColumn("b", hashBucket(col("doc_id"), 100))
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "val").otherwise("test"))
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("split")).as("n_splits"),
        min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") > 1 && col("n_splits") > 1)
      .orderBy(col("simhash"))

  /** Sequential sequence packing: documents concatenated in a deterministic
    * order (doc_id) fill fixed-size token chunks; each doc is tagged with
    * the chunk its first token lands in — the standard pretraining packing
    * layout.
    *
    * Scale-safe two-pass cumulative sum (no global window — a
    * `Window.orderBy` with empty partitionBy funnels the corpus through ONE
    * reducer): documents are assigned a deterministic range bucket on the
    * order key, the running offset is computed per-bucket in parallel
    * (`Window.partitionBy(bucket)`), and each bucket's base offset is the
    * cumulative sum of the per-bucket totals — a `parts`-row aggregate
    * merged on the driver and broadcast back. Offsets are identical to the
    * global window's by construction (buckets are contiguous doc_id
    * ranges). At 100 TB `parts` scales with the cluster and the max-id
    * probe becomes a sketch/metadata lookup; the shape is unchanged. */
  def qPackChunks(spark: SparkSession, dir: String, budget: Int = 2048,
                  parts: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persist: both passes need (doc_id, n_words) and the tokenize is the
    // dominant cost — one scan instead of two (ContextCleaner reaps the
    // cache once the returned plan is unreferenced)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_words"))
      .persist()
    // deterministic contiguous ranges (not repartitionByRange: its sampled
    // bounds differ between the two passes; an arithmetic bucket agrees
    // across jobs — correctness does not depend on the cache)
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val step = math.max(1L, maxId / parts + 1)
    val bucketed = docs.withColumn("pid", expr(s"doc_id div $step"))
    // pass 1: per-bucket token totals -> cumulative base per bucket (tiny)
    val totals = bucketed.groupBy(col("pid")).agg(sum(col("n_words")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.map(_._1).zip(totals.map(_._2).scanLeft(0L)(_ + _).init)
    val baseDf = spark.createDataFrame(bases.toSeq).toDF("pid", "base")
    // pass 2: per-bucket running offset (parallel window) + broadcast base
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn("local", coalesce(sum(col("n_words")).over(w), lit(0L)))
      .join(broadcast(baseDf), Seq("pid"))
      .select(col("doc_id"), col("n_words"),
        (col("base") + col("local")).as("offset"))
      .withColumn("chunk", expr(s"offset div $budget"))
      .orderBy(col("doc_id"))
  }

  /** Incremental (per-ingest) dedup: which documents of a NEW batch
    * near-duplicate the existing corpus (same SimHash signature) or each
    * other within the batch (first occurrence kept). This is the ingest
    * shape of dedup at 100 TB: the corpus side is a pre-computed signature
    * table bucketed on the signature, so each ingest joins only the new
    * batch against it — never corpus×corpus. Fixture rendering: doc_id <
    * 400 is the "corpus", the rest the new batch (the constant is mirrored
    * in the oracle SQL and CurateSpec — change all three together). */
  def qIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val split = 400L
    val sig = Dedup.simhash(spark, dir)
    val corpus = sig.filter(col("doc_id") < split)
    val batch = sig.filter(col("doc_id") >= split)
    // no distinct on the corpus side: left_semi already has set semantics
    val inCorpus = batch
      .join(corpus.select(col("simhash")), Seq("simhash"), "left_semi")
      .select(col("doc_id"), lit("in_corpus").as("reason"))
    val inBatch = batch
      .withColumn("first_id", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("simhash"))))
      .filter(col("doc_id") > col("first_id"))
      .select(col("doc_id"), lit("in_batch").as("reason"))
    // a doc can hit both rules; report each reason (deterministic set)
    inCorpus.unionByName(inBatch).orderBy(col("doc_id"), col("reason"))
  }

  /** Eval-set decontamination: the exact n-gram collision check a training
    * pipeline runs before shipping a split — any test document sharing a
    * word 5-gram with ANY train document is flagged with its contamination
    * rate (the GPT-3-style "13-gram overlap" check, sized to the fixture's
    * short documents).
    *
    * Scale shape: the train side collapses to a DISTINCT shingle-hash set
    * (at 100 TB: the bucketed "index" of the train corpus, built once per
    * split version); each test document then needs ONE left-semi probe of
    * its shingles against it — never a doc×doc join, and the probe is
    * proportional to the (small) test split, not the corpus. Shingles are
    * xxhash64-collapsed before the exchange (repo convention; a 64-bit
    * collision is n²·2⁻⁶⁴ noise).
    *
    * `n` is mirrored in the oracle SQL's 5-gram arithmetic
    * (generate_series(1, len-4), toks[i]..toks[i+4]) — change both
    * together, like qIncrementalDedup's split constant. */
  def qDecontaminate(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    // cache: the shingle table feeds three consumers (train distinct, test
    // counts, contam probe) — same shape and reason as Dedup's pipelines
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        graft.functions.ShingleFunctions.shingle_explode(col("toks"), n).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"),
        hashBucket(col("doc_id"), 100).as("bucket"))
      .cache()
    val train = sh.filter(col("bucket") < 80).select(col("sh")).distinct()
    val test = sh.filter(col("bucket") >= 90)
    val counts = test.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val contam = test.join(train, Seq("sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contam"))
    counts.join(contam, Seq("doc_id"))
      .select(col("doc_id"), col("n_sh"), col("n_contam"),
        (round(col("n_contam").cast("double") / col("n_sh") * 1e4) / 1e4).as("contam_rate"))
      .orderBy(col("doc_id"))
  }

  /** Stratified (per-language) sampling: rebalance the corpus mix by
    * giving each language its own deterministic hash-rate — the standard
    * "cap the dominant language, keep the tail" curation step. Same md5
    * bucketing as [[qSampleHash]], so membership is stable under corpus
    * growth; per-language rates are data (a join, not a hard-coded
    * `when` chain), so at 100 TB the mix config is a broadcast table. */
  def qStratifiedSample(spark: SparkSession, dir: String,
                        rates: Map[String, Int] = Map("en" -> 10),
                        defaultRate: Int = 30): DataFrame = {
    // rate table holds only the explicit overrides; unlisted languages take
    // the default via coalesce — no eager lang scan, no partial-map trap
    val rateDf = spark.createDataFrame(rates.toSeq).toDF("lang", "r")
    Tables.documents(spark, dir)
      .withColumn("bucket", hashBucket(col("doc_id"), 100))
      .join(broadcast(rateDf), Seq("lang"), "left")
      .withColumn("rate", coalesce(col("r"), lit(defaultRate)))
      .withColumn("sampled", (col("bucket") < col("rate")).cast("int").cast("long"))
      .groupBy(col("lang"), col("rate").cast("long").as("rate"))
      .agg(count(lit(1)).as("n_total"), sum(col("sampled")).as("n_sampled"))
      .orderBy(col("lang"))
  }

  /** Source MIXING-WEIGHT report — the data-mixing stage of a pre-training
    * pipeline: given a target mix (uniform across sources here, the
    * Pile-style static recipe) and a token budget, compute each source's
    * actual token share, the over/under-sampling weight that would hit the
    * target (weight = target_share / actual_share = T / (n_sources ·
    * src_tokens)), and the budgeted allocation capped at what the source
    * actually has. Downstream, `weight` feeds [[qStratifiedSample]]'s
    * per-stratum rates and `alloc_tokens` drives packing.
    *
    * All arithmetic is ratios of exact counts rounded once (6 dp) — no
    * transcendentals, bit-identical cross-engine. One aggregation over the
    * corpus (map-side combinable sums), then a scalar broadcast: the
    * report is sources-sized however big the corpus is. */
  def qMixWeights(spark: SparkSession, dir: String, budget: Long = 10000L): DataFrame = {
    val perSrc = Tables.documents(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    val tot = perSrc.agg(sum(col("n_tokens")).as("t_total"),
      count(lit(1)).as("n_sources"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (round(col("n_tokens").cast("double") / col("t_total") * 1e6) / 1e6).as("share"),
        (round(col("t_total").cast("double") /
          (col("n_sources") * col("n_tokens")) * 1e6) / 1e6).as("weight"),
        least(col("n_tokens"), floor(lit(budget).cast("double") / col("n_sources"))
          .cast("long")).as("alloc_tokens"))
      .orderBy(col("source"))
  }

  /** Budgeted SUBSAMPLE: realize [[qMixWeights]]'s per-source allocation as
    * an actual document selection — within each source, docs order by a
    * deterministic content hash (stable under corpus growth, like every
    * sample here) and the greedy prefix whose cumulative token count fits
    * the allocation is kept. `cum_tokens <= alloc` never overshoots the
    * budget; the hash order makes the kept set reproducible across
    * runs/engines and indifferent to ingestion order.
    *
    * Scale: the window partitions by source — sources fill their budgets
    * independently in parallel, over a SKINNY projection (id, hash, token
    * count; never the text). A pathologically dominant source serializes
    * its own cumsum — for that shape, [[qStratifiedSample]]'s hash-rate
    * threshold is the constant-time approximation and this operator is the
    * exact realization run per shard. */
  def qBudgetSample(spark: SparkSession, dir: String, budget: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("h"))
    val nSrc = d.select(col("source")).distinct()
      .agg(count(lit(1)).as("n_sources"))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.crossJoin(broadcast(nSrc))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <=
        floor(lit(budget).cast("double") / col("n_sources")).cast("long"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"), col("doc_id"))
  }

  /** Token-count histogram per language: decade-wide buckets — the corpus
    * length profile that drives truncation/packing decisions. */
  def qLengthHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        (floor(size(split(col("text"), " ")) / 10) * 10).cast("long").as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("bucket"))
}

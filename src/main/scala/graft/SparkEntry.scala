package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.{Apply, Changelog, ChangelogStream}
import graft.model.Tables
import graft.ops.{Dedup, Multimodal, Relational, Similarity, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (reference parity + the LLM-pipeline
  * extensions) is declared here as a named query; `oracleSql` carries the
  * ANSI-SQL equivalent the driver runs in DuckDB over the same parquet
  * tables. Only the HLL sketch query lacks an oracle (approximate by
  * nature) and gets the driver's rows-only check, per the contract.
  *
  * Cross-engine determinism rules used throughout (and mirrored in each
  * oracle): double sums go through DECIMAL(18,4) (exact, order-free);
  * ratios are single IEEE double divisions of exact integers; floating
  * scores are rounded *before* ranking; every query ends in a total ORDER
  * BY; int-typed outputs are cast to BIGINT on both sides.
  */
object SparkEntry {
  private val payload = Changelog.payloadCols
  private val payloadList = payload.mkString(", ")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_apply")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── CDC core (reference parity: O1–O16 composites) ──────────────────
    "cdc_apply" -> ((s, d) =>
      Apply.latestState(Changelog.fromOrders(s, d), payload).orderBy(col("o_orderkey"))),
    "cdc_apply_merge" -> ((s, d) =>
      Apply.mergeApply(Changelog.fromOrders(s, d), payload, keyField = Some("o_orderkey"))
        .orderBy(col("o_orderkey"))),
    "cdc_apply_partial" -> ((s, d) =>
      // partial-update events (only o_totalprice set) through the per-field
      // putAll merge — final state must equal the full-row apply
      Apply.mergeApply(Changelog.fromOrdersPartial(s, d), payload, keyField = Some("o_orderkey"))
        .orderBy(col("o_orderkey"))),
    "cdc_compact" -> ((s, d) =>
      // Kafka-style log compaction: one event per key — latest payload as
      // an UPSERT, or a before-image TOMBSTONE when the last event is a
      // DELETE (tombstones must survive so resuming consumers still see
      // deletions; the reference's topic has no retention story at all)
      Apply.compact(Changelog.fromOrders(s, d), payload).orderBy(col("id"))),
    "cdc_compact_apply" -> ((s, d) =>
      // the compaction CONTRACT: applying the compacted log yields the
      // same state as applying the full log — shares cdc_apply's oracle
      Apply.latestState(Apply.compact(Changelog.fromOrders(s, d), payload), payload)
        .orderBy(col("o_orderkey"))),
    "cdc_bootstrap" -> { (s, d) =>
      // snapshot + tail initial load: the orders table seeds the state as
      // synthetic INSERTs at seq 0, then only the changelog tail (updates
      // and deletes, seq > 1e6) applies on top — result identical to
      // replaying the full history, without reading it
      val tail = Changelog.fromOrders(s, d).filter(col("seq") > 1000000L)
      Apply.bootstrap(Tables.orders(s, d), "o_orderkey", tail, payload)
        .orderBy(col("o_orderkey"))
    },
    "cdc_apply_txn" -> ((s, d) =>
      Apply.txnApply(Changelog.fromOrdersTxn(s, d), payload)
        .orderBy(col("o_orderkey"))),
    "cdc_apply_txn_stream" -> ((s, d) => graft.streaming.Stateful.qApplyTxnStream(s, d)),
    // ── the COMPOSED pipeline: ONE DSv2 source→sink pass maintains the
    // keyed state + per-status MV + join-MV + secondary index together
    // (the reference consumer's store+index loop, consumer.go:15-55) —
    // these four queries are views over that one shared pass, each checked
    // against its own independent oracle (graft.cdc.Pipeline)
    "cdc_pipeline_full" -> (graft.cdc.Pipeline.qStateIndexCoherent _),
    "cdc_mv_agg" -> (graft.cdc.Pipeline.qMv _),
    "cdc_mv_join" -> (graft.cdc.Pipeline.qMvJoin _),
    "cdc_secondary_index" -> (graft.cdc.Pipeline.qIndex _),
    "cdc_scd2" -> ((s, d) =>
      // SCD Type-2 history: one row per (key, version) with its validity
      // interval on the seq axis — the warehouse companion of the SCD-1
      // overwrite store the reference keeps
      Apply.scd2(Changelog.fromOrders(s, d), payload)
        .orderBy(col("o_orderkey"), col("valid_from"))),
    "cdc_scd2_stream" -> ((s, d) => graft.streaming.Stateful.qScd2Stream(s, d)),
    "cdc_mv_join_bidi" -> ((s, d) =>
      // the join-MV with BOTH sides changing: segment moves re-attribute a
      // customer's whole order history, deletes retract it — per-key
      // replace over a maintained per-customer aggregate state (JoinMv),
      // riding the composed pass's maintainer hook since round 9
      graft.cdc.Pipeline.qMvJoinBidi(s, d)),
    // the CUSTOMER table's view of the same shared multi-table pass — the
    // reference's per-table dispatch (utils.go:105-112) as a filter over
    // the (table, id)-keyed state
    "cdc_pipeline_customer" -> (graft.cdc.Pipeline.qCustomerState _),
    "cdc_apply_truncate" -> ((s, d) =>
      // table-wide TRUNCATE applied (the reference drops it,
      // producer.go:161-166): events at-or-before the truncate seq erased,
      // later events rebuild the table
      Apply.truncateApply(Changelog.fromOrdersTruncate(s, d), payload)
        .orderBy(col("o_orderkey"))),
    "cdc_apply_truncate_stream" -> ((s, d) =>
      ChangelogStream.qApplyStreamingTruncate(s, d)),
    // TRUNCATE through the COMPOSED pipeline: the fence-only micro-batch
    // surfaces its killed rows to the maintainer hook, so the MV debits and
    // the index retracts in the same batch that commits the O(1) fence —
    // two views over one shared pass (graft.cdc.Pipeline.runTruncate)
    "cdc_pipeline_truncate" -> (graft.cdc.Pipeline.qTruncateCoherent _),
    "cdc_pipeline_truncate_mv" -> (graft.cdc.Pipeline.qTruncateMv _),
    // ONE named savepoint across the composed pass's tables (state + MV +
    // secondary index pinned at the epoch-0 boundary by the sink's
    // postCommit hook), read back as a mutually-GATED consistent cut while
    // the live tables have applied the truncate fence and the tail
    "cdc_savepoint_all" -> (graft.cdc.Pipeline.qSavepointAll _),
    // savepoint RESTORE (r15): roll the shared diff pass's state back to
    // its mid-stream pin (one manifest flip), gate the restored live read
    // hash-equal to the as-of read, then RE-APPLY the tail — restore-then-
    // resume converges to the never-restored state (cdc_apply's oracle)
    "cdc_savepoint_restore" -> (ChangelogStream.qSavepointRestore _),
    // ES date_histogram (calendar_interval: month) over the maintained
    // store — a view over the composed pass's live orders state
    "cdc_date_histogram" -> (graft.cdc.Pipeline.qDateHistogram _),
    // r18 agg breadth: extended_stats (second moments, exact decimal
    // folds, IEEE sqrt), auto_date_histogram (the span-driven ladder
    // walk), sampler (first-N bound before the sub-agg), global (the
    // query-context escape as one conditional pass)
    "cdc_extended_stats" -> (graft.cdc.Pipeline.qExtendedStats _),
    "cdc_auto_date_histogram" ->
      ((s, d) => graft.cdc.Pipeline.qAutoDateHistogram(s, d)),
    "cdc_sampler_agg" -> ((s, d) => graft.cdc.Pipeline.qSamplerAgg(s, d)),
    // diversified_sampler (r19): the sampler with a de-duplication field —
    // at most max_docs_per_value docs per o_custkey enter the sample
    "cdc_diversified_sampler" ->
      ((s, d) => graft.cdc.Pipeline.qDiversifiedSampler(s, d)),
    "cdc_global_agg" -> ((s, d) => graft.cdc.Pipeline.qGlobalAgg(s, d)),
    // max_bucket + min_bucket (r19): WHICH buckets, not just the values —
    // keys arrive as the tie-naming array the ES aggs return
    "cdc_max_bucket" -> ((s, d) => graft.cdc.Pipeline.qBucketExtrema(s, d)),
    // bucket_sort (r20): the generic declarative sort/from/size pipeline
    // step over the monthly bucket frame — truncation AFTER the sort
    "cdc_bucket_sort" -> ((s, d) => graft.cdc.Pipeline.qCdcBucketSort(s, d)),
    // median_absolute_deviation (r20): exact integer-cents medians in the
    // below-threshold regime, per order status
    "cdc_mad" -> ((s, d) => graft.cdc.Pipeline.qCdcMad(s, d)),
    // cumulative_cardinality (r19): running distinct customers per month —
    // distinct counts don't sum, so the scalable first-occurrence
    // rendering replaces the naive per-month distinct union
    "cdc_cumulative_cardinality" ->
      ((s, d) => graft.cdc.Pipeline.qCumulativeCardinality(s, d)),
    // …and with METRIC SUB-AGGREGATIONS: each month bucket carries the
    // stats (count/sum/avg/min/max) of o_totalprice (VERDICT r15 #2)
    "cdc_date_histogram_stats" -> (graft.cdc.Pipeline.qDateHistogramStats _),
    // percentiles sub-agg under the date histogram: exact below-threshold
    // regime, R-7 interpolation written identically in both engines
    "cdc_date_histogram_percentiles" ->
      (graft.cdc.Pipeline.qDateHistogramPercentiles _),
    // multi_terms: tuple-keyed buckets ranked by count, size after order
    "cdc_multi_terms_agg" -> ((s, d) => graft.cdc.Pipeline.qMultiTermsAgg(s, d)),
    // date_range: named [from, to) buckets, empty ranges report 0
    "cdc_date_range_agg" -> (graft.cdc.Pipeline.qDateRangeAgg _),
    // sibling pipeline aggs: stats_bucket over the histogram's bucket frame
    "cdc_bucket_stats" -> (graft.cdc.Pipeline.qBucketStats _),
    // percentile_ranks: inverse percentiles, exact counting regime
    "cdc_percentile_ranks" -> ((s, d) => graft.cdc.Pipeline.qPercentileRanks(s, d)),
    // top_metrics: the sort-first doc's metric per bucket, one max_by pass
    "cdc_top_metrics" -> (graft.cdc.Pipeline.qTopMetrics _),
    // serial_diff: lag-n differencing over the bucket frame
    "cdc_serial_diff" -> ((s, d) => graft.cdc.Pipeline.qSerialDiff(s, d)),
    // bucket_script + bucket_selector: per-bucket script value + cut
    "cdc_bucket_script" -> ((s, d) => graft.cdc.Pipeline.qBucketScript(s, d)),
    // ES terms agg ORDERED BY a metric sub-agg (order: {sum_price: desc},
    // size 10) — top customers by revenue off the live maintained store
    "cdc_terms_agg_metric" -> ((s, d) =>
      graft.cdc.Pipeline.qTermsAggMetricOrder(s, d)),
    // ES numeric histogram (interval 50000, min_doc_count 0 — empty
    // buckets between min and max key report) over the maintained store
    "cdc_histogram_agg" -> ((s, d) => graft.cdc.Pipeline.qHistogramAgg(s, d)),
    // ES composite agg: source-ordered (month, status) buckets paged with
    // an `after` cursor — the scalable agg pagination
    "cdc_composite_agg" -> ((s, d) => graft.cdc.Pipeline.qCompositeAgg(s, d)),
    // ES cardinality sub-agg (unique customers per month) — exact below
    // precision_threshold, which the fixture's cardinalities all are
    "cdc_cardinality_agg" -> ((s, d) =>
      graft.cdc.Pipeline.qCardinalityAgg(s, d)),
    // ES ILM ROLLOVER: the events month streams through a write alias
    // rolling on max_docs; a time-range agg through the read alias opens
    // only the generations whose recorded spans overlap
    "cdc_rollover" -> ((s, d) => graft.cdc.Rollover.qCdcRollover(s, d)),
    // cross-generation BM25 over the rolled TEXT family: span-pruned
    // generations, merged corpus stats, boundary-only range filtering
    "cdc_rollover_search" ->
      ((s, d) => graft.ops.Search.qCdcRolloverSearch(s, d)),
    // ES ILM DELETE + FORCEMERGE phases (r18): week 0's generation
    // expires, the savepoint-pinned week 2 survives, retained generations
    // forcemerge to single-run structures — then the ordinary read-alias
    // search over what's live
    "cdc_rollover_retention" ->
      ((s, d) => graft.ops.Search.qCdcRolloverRetention(s, d)),
    // ...and the ILM SHRINK phase (r18): retained generations fold to
    // 2-bucket states (the ES _shrink shard-count reduction); layout
    // changes, the answer doesn't
    "cdc_rollover_shrink" ->
      ((s, d) => graft.ops.Search.qCdcRolloverShrink(s, d)),
    // ES PIPELINE aggs over the histogram's buckets: derivative (Δ vs the
    // previous bucket, null for the first) + cumulative_sum
    "cdc_derivative_agg" -> ((s, d) => graft.cdc.Pipeline.qDerivativeAgg(s, d)),
    // ...and moving_fn (unweightedAvg, window 3, shift 0: the 3 buckets
    // strictly before, null until the window fills)
    "cdc_moving_fn" -> ((s, d) => graft.cdc.Pipeline.qMovingFn(s, d)),
    // DYNAMIC ONBOARDING: no compile-time table set — RELATION events
    // announce schemas in-stream (the pgoutput RelationMessage), each table
    // gets its own store on first write, and nation enters the changelog at
    // micro-batch 3 (graft.cdc.DynamicPipeline)
    "cdc_pipeline_dynamic" -> (graft.cdc.DynamicPipeline.qNationState _),
    "cdc_pipeline_dynamic_mv" -> (graft.cdc.DynamicPipeline.qNationMv _),
    "cdc_pipeline_dynamic_index" -> (graft.cdc.DynamicPipeline.qNationIndex _),
    // the orders view of the SAME dynamic pass — onboarding a new table
    // mid-stream disturbed nothing (shares the standard apply oracle)
    "cdc_pipeline_dynamic_orders" -> ((s, d) =>
      graft.cdc.DynamicPipeline.tableView(s, d, "orders")
        .orderBy(col("o_orderkey"))),
    "cdc_apply_stream" -> ((s, d) => ChangelogStream.qApplyStreaming(s, d)),
    "cdc_apply_stream_dsv2" -> ((s, d) => ChangelogStream.qApplyStreamingDsv2(s, d)),
    // the end-to-end connector rendering (DSv2 source → DSv2 sink); since
    // round 8 it executes as the composed pipeline pass above — same source,
    // same sink, same state, with the derived-table maintainers riding the
    // one merge (the standalone single-sink path stays spec-covered in
    // ChangelogStateSinkSpec)
    "cdc_apply_sink_dsv2" -> (graft.cdc.Pipeline.qState _),
    "cdc_apply_dsv2" -> { (s, d) =>
      // the changelog round-tripped through the DSv2 connector: staged as
      // JSON-line DatabaseEvent envelopes (the reference's wire format),
      // read back via graft.sources.ChangelogSource (pushdown: table
      // equality dies in the reader), payload schema-applied with
      // from_json (O4/O9), then the standard latest-state apply — result
      // identical to cdc_apply, same oracle
      val work = Changelog.stageEnvelopeJson(s, d)
      val env = s.read.format("changelog").load(work)
        .filter(col("table") === "orders")
      val pSchema = Changelog.payloadSchema(s, d)
      // parse once into a struct, extract fields in a second projection —
      // CollapseProject keeps the non-cheap from_json single-evaluation
      val decoded = env
        .select(col("id"), col("seq"), col("op"),
          from_json(col("payload"), pSchema).as("p"))
        .select(Seq(col("id"), col("seq"), col("op")) ++
          payload.map(c => col(s"p.$c").as(c)): _*)
      Apply.latestState(decoded, payload).orderBy(col("o_orderkey"))
    },
    "stream_tumbling_window" -> (graft.streaming.StreamQueries.qStreamingTumbling _),
    "stream_session_window" -> (graft.streaming.StreamQueries.qStreamingSessionWindow _),
    "stream_sliding_window" -> (graft.streaming.StreamQueries.qStreamingSliding _),
    "stream_static_join" -> (graft.streaming.StreamQueries.qStreamStaticJoin _),
    "stream_dedup_watermark" -> (graft.streaming.StreamQueries.qStreamingDedupWatermark _),
    "stream_late_data" -> (graft.streaming.StreamQueries.qStreamingLateData _),
    "stream_dedup" -> (graft.streaming.StreamQueries.qStreamingDedup _),
    "stream_interval_join" -> (graft.streaming.StreamQueries.qStreamingIntervalJoin _),
    "cdc_apply_stateful" -> (graft.streaming.Stateful.qApplyStateful _),
    "cdc_op_counts" -> ((s, d) => Apply.opCounts(Changelog.fromOrders(s, d))),
    // ES ingest pipeline (r19): the declarative processor chain (rename /
    // split / set / convert / date) applied to each batch's events BEFORE
    // the merge, with on_failure: drop — the transform-on-write surface in
    // front of the consumer's verbatim index path (es.go:88-110)
    "cdc_ingest_pipeline" -> (graft.cdc.Ingest.qCdcIngestPipeline _),
    "cdc_insert_dedup" -> { (s, d) =>
      val ins = Changelog.fromOrders(s, d).filter(col("op") === "INSERT")
      val replayed = ins.unionByName(ins.withColumn("seq", col("seq") + 5000000L))
      Apply.insertDedup(replayed, payload).orderBy(col("o_orderkey"))
    },
    "cdc_delete_antijoin" -> { (s, d) =>
      val dels = Changelog.fromOrders(s, d).filter(col("op") === "DELETE")
        .select(col("id").as("o_orderkey"))
      Apply.applyDeletes(Tables.orders(s, d), dels, "o_orderkey").orderBy(col("o_orderkey"))
    },
    "cdc_apply_customer" -> ((s, d) =>
      Apply.latestState(Changelog.fromCustomer(s, d), Changelog.customerPayloadCols)
        .orderBy(col("c_custkey"))),
    // the CUSTOMER table tailed through the engine's DSv2 connector: since
    // round 13 this executes as the composed multi-table pass (Pipeline
    // .runFull — the SAME DSv2 source tails the one envelope stream, the
    // per-table dispatch is a filter over the (table, id)-keyed state), the
    // cdc_apply_sink_dsv2 → Pipeline.qState precedent: a standalone
    // single-table re-drain duplicated state the shared pass already
    // maintains (4.8 s → a view). The standalone DSv2 tail + dispatch-
    // filter + foreachBatch upsert path stays spec-covered:
    // StreamAlignmentSpec's customer-DSv2 drill runs
    // ChangelogStream.qApplyStreamingCustomerDsv2 end-to-end.
    "cdc_apply_customer_dsv2" -> (graft.cdc.Pipeline.qCustomerState _),
    "cdc_decode_props" -> { (s, d) =>
      // O4/O9 parity: schema-applied decode of the JSON payload column with
      // from_json — corrupt/missing fields become null, like the reference's
      // skip-on-unmarshal-error (utils.go:98-102)
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").cast("long").as("k"))
        .orderBy(col("event_id"))
    },
    "cdc_asof_join" -> { (s, d) =>
      // the custom AS-OF operator (graft.plans.AsOfJoin): each purchase
      // joined to the user's latest signup at-or-before it. event_id is the
      // ordinal: the fixture stream is globally monotone in (ts, event_id)
      // (verified across all SFs), so event_id is a unique arrival sequence
      // — the LSN analog — with no timestamp packing to overflow
      val ev = Tables.events(s, d)
      val l = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("event_id").as("lo"))
      val r = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("r_user"), col("event_id").as("signup_event"),
          col("event_id").as("ro"))
      graft.plans.AsOf.join(l, r, l("user_id"), r("r_user"), l("lo"), r("ro"))
        .select(col("user_id"), col("event_id"), col("signup_event"))
        .orderBy(col("user_id"), col("event_id"))
    },
    "cdc_latest_per_key" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    },
    // ── Relational breadth ──────────────────────────────────────────────
    "q1_pricing" -> (Relational.q1PricingSummary _),
    "q3_top_revenue" -> (Relational.q3TopRevenue _),
    "q5_nation_revenue" -> (Relational.q5NationRevenue _),
    "q_rollup" -> (Relational.qRollup _),
    "q_cube" -> (Relational.qCube _),
    "q_window_running" -> (Relational.qWindowRunning _),
    "q_window_lag" -> (Relational.qWindowLag _),
    "q_window_range" -> (Relational.qWindowRange _),
    "q_window_rank_stats" -> (Relational.qWindowRankStats _),
    "q_topk_per_group" -> (Relational.qTopKPerGroup _),
    "q_setops" -> (Relational.qSetOps _),
    "q_scalar_string" -> (Relational.qScalarString _),
    "q_json_extract" -> (Relational.qJsonExtract _),
    // ES nested-query semantics: per-element match over an array of
    // objects vs the flattened cross-match (VERDICT r15 missing #5)
    "q_nested_match" -> ((s, d) => Relational.qNestedMatch(s, d)),
    // parent/child join field (r19): has_child = one child groupBy on the
    // parent key with score_mode sum over the LIVE keyed state's orders;
    // has_parent = the inverse semi-join against qualifying parents
    "q_has_child" -> ((s, d) => Relational.qHasChild(s, d)),
    "q_has_parent" -> ((s, d) => Relational.qHasParent(s, d)),
    // inner_hits: the matching nested elements of each qualifying parent,
    // ranked by the nested sort, size-bounded per parent
    "q_nested_inner_hits" -> ((s, d) => Relational.qNestedInnerHits(s, d)),
    // weighted_avg agg: decimal-exact numerator/denominator, one divide
    "q_weighted_avg" -> (Relational.qWeightedAvg _),
    // ES nested AGGREGATION: parent-scoped (power users), then terms +
    // metrics over the nested element stream
    "q_nested_agg" -> ((s, d) => Relational.qNestedAgg(s, d)),
    "q_date_trunc" -> (Relational.qDateTrunc _),
    "q_date_arith" -> (Relational.qDateArith _),
    "q_stats" -> (Relational.qStats _),
    "doc_token_freq" -> (Text.qTokenFreq _),
    "q_tumbling_window" -> (Relational.qTumblingWindow _),
    "q_session_window" -> (Relational.qSessionWindow _),
    "q_approx_distinct" -> (Relational.qApproxDistinct _),
    "q_grouping_sets" -> (Relational.qGroupingSets _),
    "q_sliding_window" -> (Relational.qSlidingWindow _),
    "q_outer_join" -> (Relational.qOuterJoin _),
    "q_full_outer" -> (Relational.qFullOuter _),
    "q_pivot" -> (Relational.qPivot _),
    "q_scalar_math" -> ((s, d) =>
      // IEEE-exact math only (sqrt/abs/floor/ceil/sign, x*x) — transcendental
      // functions (ln/exp) differ in ulps across libm implementations
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
        abs(col("l_discount") - 0.05d).as("abs_disc"),
        floor(col("l_quantity")).as("floor_qty"),
        ceil(col("l_extendedprice")).as("ceil_price"),
        signum(col("l_discount") - 0.05d).as("sign_disc"),
        (col("l_tax") * col("l_tax")).as("tax_sq"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))),
    "q_map_funcs" -> { (s, d) =>
      // MapType path of the generic (schema-unknown) row model (SURVEY §1.2)
      val m = map(lit("type"), col("event_type"),
                  lit("uid"), col("user_id").cast("string"))
      Tables.events(s, d).select(
        col("event_id"),
        size(m).cast("long").as("n_keys"),
        element_at(m, "type").as("type_val"),
        concat_ws(",", map_keys(m)).as("keys"),
        concat_ws(",", map_values(m)).as("vals"))
      .orderBy(col("event_id"))
    },
    "q_array_funcs" -> ((s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_dim"),
        round(array_max(col("embedding")).cast("double"), 6).as("max_dim"),
        round(array_min(col("embedding")).cast("double"), 6).as("min_dim"))
      .orderBy(col("vec_id"))),
    "q_percentiles" -> (Relational.qPercentiles _),
    "q_topk_agg" -> (Relational.qTopKAggregator _),
    "q_bucketed_join" -> (graft.ops.Layout.qBucketedJoin _),
    "cdc_time_travel" -> ((s, d) =>
      // snapshot-as-of: state at LSN 1,500,000 (updates applied, deletes not
      // yet) — the changelog's version axis doubles as a time-travel key
      Apply.latestState(
        Changelog.fromOrders(s, d).filter(col("seq") <= 1500000L), payload)
        .orderBy(col("o_orderkey"))),
    "cdc_state_diff" -> ((s, d) =>
      // audit diff between two snapshot versions: what changed from LSN
      // 500,000 (mid-insert at sf>=0.1, so ADDED appears too) to now
      Apply.stateDiff(Changelog.fromOrders(s, d), payload, "o_orderkey",
        asOfOld = 500000L, asOfNew = Long.MaxValue, diffCols = Seq("o_totalprice"))
        .orderBy(col("o_orderkey"))),
    "cdc_state_diff_versions" -> ((s, d) =>
      // the same diff served from committed bucket VERSIONS: a savepoint
      // pins the state at the batch boundary, the diff reads pinned vs
      // live — no changelog re-apply (shares cdc_state_diff's oracle)
      ChangelogStream.qStateDiffVersions(s, d)),
    "q_semijoin" -> (Relational.qSemiJoin _),
    "q_correlated_subquery" -> (Relational.qCorrelatedSubquery _),
    "q_window_lead" -> (Relational.qWindowLead _),
    "q_array_agg" -> (Relational.qArrayAgg _),
    // ── Text analysis + dedup (north-star extensions) ───────────────────
    "doc_text_stats" -> (Text.qTextStats _),
    "doc_token_count" -> (Text.qTokenCount _),
    "doc_lang_id" -> (Text.qLangId _),
    "doc_quality" -> (Text.qQualityScore _),
    "doc_repetition" -> (Text.qRepetition _),
    "doc_exact_dedup" -> (Text.qExactDedup _),
    "doc_dedup_stats" -> (Text.qDedupStats _),
    "doc_rolling_fp" -> (Text.qRollingFingerprint _),
    "doc_minhash_lsh" -> ((s, d) => Dedup.minhashPairs(s, d)),
    "doc_dup_clusters" -> (Dedup.duplicateClusters _),
    "doc_dup_drop_list" -> (Dedup.qDupDropList _),
    "doc_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "doc_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "doc_simhash_clusters" -> (Dedup.simhashClusters _),
    "doc_simhash_near" -> ((s, d) => Dedup.simhashNearPairs(s, d)),
    // cross-document exact-substring dedup (r20): k-gram hash blocking,
    // gram-verified, diagonal islands -> maximal shared spans
    "doc_substring_dedup" -> ((s, d) => Dedup.qSubstringDedup(s, d)),
    // ── Similarity search ───────────────────────────────────────────────
    "emb_norm_stats" -> (Similarity.qNormStats _),
    "emb_centroids" -> (Similarity.qCentroids _),
    "emb_cosine_topk" -> ((s, d) => Similarity.qCosineTopK(s, d)),
    "emb_ann_ivf" -> ((s, d) => Similarity.qAnnIvf(s, d)),
    "emb_ann_centroid" -> ((s, d) => Similarity.qAnnCentroid(s, d)),
    "emb_kmeans" -> ((s, d) => Similarity.qKmeans(s, d)),
    "emb_ann_kmeans" -> ((s, d) => Similarity.qAnnKmeans(s, d)),
    "emb_pq_topk" -> ((s, d) => Similarity.qPqTopK(s, d)),
    "emb_ann_ivfpq" -> ((s, d) => Similarity.qAnnIvfPq(s, d)),
    "emb_near_dup" -> ((s, d) => Similarity.qEmbeddingNearDup(s, d)),
    // SQ8 / int8 scalar quantization (r19): per-dim (min,max) ranges,
    // dequantized approximate scoring, shortlist + exact rerank — the
    // quantization ES applies to dense vectors by default
    "emb_sq8_topk" -> ((s, d) => Similarity.qSq8TopK(s, d)),
    // SemDeDup-style semantic dedup (r19): staged-quantizer clusters block
    // the pairwise cosine (never doc×doc), threshold edges, drop every
    // non-canonical component member (min-id rule, disclosed)
    "emb_semantic_dedup" -> ((s, d) => graft.ops.Dedup.qSemanticDedup(s, d)),
    // ── Multimodal plumbing (stub codec; oracles mirror its arithmetic) ─
    "mm_media_features" -> (Multimodal.qMediaFeatures _),
    "mm_frame_sample" -> (Multimodal.qFrameSample _),
    // perceptual-hash near-dup over the media column (r19): the stub
    // codec's 32-bit average-hash, exact 4×8-bit LSH banding, hamming
    // verify — the image-dedup rung, never media×media
    "mm_phash_neardup" -> (Multimodal.qPhashNearDup(_, _)),
    // ── Scale machinery as first-class queries ──────────────────────────
    "q_skew_salted" -> ((s, d) =>
      graft.ops.Skew.saltedCountSum(Tables.events(s, d), col("event_type"), col("value"))
        .orderBy(col("key"))),
    "q_skew_join" -> { (s, d) =>
      // the 5-value event_type key is maximally skewed for a sort-merge
      // join; the salted join spreads each hot key over 16 reducers. The
      // dim's threshold is (min+max)/2 — single exact double ops, so both
      // engines compute the identical boundary (an accumulated avg could
      // flip a >= comparison in the last ulp)
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val dim = ev.groupBy(col("event_type"))
        .agg(((min(col("value")) + max(col("value"))) / 2).as("mid"))
      graft.ops.Skew.saltedJoin(ev, dim.hint("merge"), Seq("event_type"), 16)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(when(col("value") >= col("mid"), 1)).as("n_above"))
        .orderBy(col("event_type"))
    },
    "q_bloom_semijoin" -> (graft.ops.Prune.qBloomSemiJoin _),
    "q_range_join" -> (graft.ops.RangeJoin.qRangeJoin _),
    // ── Dataset curation (hash-deterministic sampling/splitting) ────────
    "doc_pii_scrub" -> (graft.ops.Curate.qPiiScrub _),
    "doc_sample_hash" -> (graft.ops.Curate.qSampleHash _),
    "doc_train_split" -> (graft.ops.Curate.qTrainTestSplit _),
    "doc_quality_filter" -> (graft.ops.Curate.qQualityFilter _),
    "doc_length_hist" -> (graft.ops.Curate.qLengthHistogram _),
    "doc_split_leakage" -> (graft.ops.Curate.qSplitLeakage _),
    "doc_pack_chunks" -> ((s, d) => graft.ops.Curate.qPackChunks(s, d)),
    "doc_incr_dedup" -> ((s, d) => graft.ops.Curate.qIncrementalDedup(s, d)),
    "doc_decontam" -> ((s, d) => graft.ops.Curate.qDecontaminate(s, d)),
    "doc_stratified_sample" -> ((s, d) => graft.ops.Curate.qStratifiedSample(s, d)),
    "doc_tfidf" -> ((s, d) => Text.qTfIdf(s, d)),
    // ── Full-text retrieval (the reference's ES search half) ──
    "doc_bm25_search" -> ((s, d) => graft.ops.Search.qBm25(s, d)),
    "doc_phrase_search" -> ((s, d) => graft.ops.Search.qPhraseSearch(s, d)),
    // the es.go loop completed for text: CDC events keep the postings
    // index current (updates MOVE postings, deletes retract them), and
    // search is served from the maintained index
    "cdc_text_index" -> (graft.ops.Search.qCdcTextIndex _),
    "cdc_text_search" -> ((s, d) => graft.ops.Search.qCdcTextSearch(s, d)),
    // ES multi_match with per-field boosts over the MULTI-FIELD maintained
    // index ((field, tok)-bucketed postings, per-field stats/dict) —
    // best_fields: each doc scores as its best boosted field
    "cdc_multi_match" -> ((s, d) => graft.ops.Search.qCdcMultiMatch(s, d)),
    // ES dis_max with tie_breaker: best field's score + 0.25 × the other
    // fields' — the general disjunction-max best_fields is sugar for
    "cdc_dis_max" -> ((s, d) => graft.ops.Search.qCdcDisMax(s, d)),
    // ...and cross_fields (r18): the TERM-centric mode — blended per-term
    // statistics (max-df over fields), best field per (doc, term), terms
    // sum; a doc matching different terms in different fields accrues all
    "cdc_cross_fields" -> ((s, d) => graft.ops.Search.qCdcCrossFields(s, d)),
    // ES synonym filter (contraction mode): class members map to one
    // canonical token at index AND query time — 'sluggish' resolves,
    // 'sort'/'order' postings merge with the union df
    "cdc_synonym_search" -> ((s, d) =>
      graft.ops.Search.qCdcSynonymSearch(s, d)),
    // ES analyzer chain (stop filter + S-stemmer) as a third analyzer
    // VIEW through the multi-field mapping: plural query terms stem to
    // roots the raw body field never indexed — recall only the analyzed
    // field can serve
    "cdc_analyzer_search" -> ((s, d) => graft.ops.Search.qCdcAnalyzerSearch(s, d)),
    // the ES ALIAS surface driven through the zero-downtime reindex: the
    // alias swaps from the replay-built to the reindexed (bootstrap)
    // index atomically; pre/post answers gated equal in the hashed result
    "cdc_text_reindex_alias" -> ((s, d) => graft.ops.Search.qCdcAliasSearch(s, d)),
    "cdc_phrase_search" -> ((s, d) => graft.ops.Search.qCdcPhraseSearch(s, d)),
    // ES match_phrase_prefix (search-as-you-type): the last term prefix-
    // expands via the sorted term directory (capped, term order) and the
    // expansion completes the positional intersection
    "cdc_phrase_prefix" -> ((s, d) => graft.ops.Search.qCdcPhrasePrefix(s, d)),
    // ES match_phrase `slop`: in-order terms with ≤ slop interposed
    // positions, from the same maintained positional postings
    "cdc_phrase_slop" -> ((s, d) => graft.ops.Search.qCdcPhraseSlop(s, d)),
    // ES span_near in_order:false — unordered proximity from the same
    // positional postings ('window … merge' matches as well as the
    // ordered direction)
    "cdc_span_near" -> ((s, d) => graft.ops.Search.qCdcSpanNear(s, d)),
    // ES span_or composed inside span_near (r20): the union of two terms'
    // position lists is one span clause near a companion term
    "cdc_span_or" -> ((s, d) => graft.ops.Search.qCdcSpanOr(s, d)),
    // ES span_not (r20): include-term occurrences not overlapping any
    // exclude-phrase span (anti join on the span window)
    "cdc_span_not" -> ((s, d) => graft.ops.Search.qCdcSpanNot(s, d)),
    // ES intervals (r20): any_of of two ordered max_gaps matches — the
    // modern span replacement, sharing the in-order chain with slopHits
    "cdc_intervals" -> ((s, d) => graft.ops.Search.qCdcIntervals(s, d)),
    // ES match `operator: and`: the BM25 ranking over docs matching EVERY
    // query term (minShouldMatch = |query|), same pruned-postings IO
    "cdc_match_and" -> ((s, d) => graft.ops.Search.qCdcMatchAnd(s, d)),
    // ES bool must/must_not: must scores+qualifies, must_not excludes in
    // filter context; IO = the union of the terms' tok-buckets
    "cdc_bool_search" -> ((s, d) => graft.ops.Search.qCdcBoolSearch(s, d)),
    // ES boosting query: negative matches DEMOTE (score × negative_boost)
    // instead of excluding — the whole match set re-ranks
    "cdc_boosting" -> ((s, d) => graft.ops.Search.qCdcBoosting(s, d)),
    // ES function_score LINEAR DECAY on a numeric field (prefer docs
    // whose dl is near the origin) — rational arithmetic end to end
    "cdc_decay_score" -> ((s, d) => graft.ops.Search.qCdcDecayScore(s, d)),
    // ES rank_feature in bool.should: boost × v/(v+pivot) ADDS to the
    // match score — the additive learned-feature composition
    "cdc_rank_feature" -> ((s, d) => graft.ops.Search.qCdcRankFeature(s, d)),
    // ES _delete_by_query: the index's own posting list drives a bulk
    // DELETE through the maintainer; the post-delete corpus rescores
    "cdc_delete_by_query" -> ((s, d) =>
      graft.ops.Search.qCdcDeleteByQuery(s, d)),
    // ES _update_by_query: matching docs re-index with a script applied
    // (text += " reviewed"); the added token is searchable
    "cdc_update_by_query" -> ((s, d) =>
      graft.ops.Search.qCdcUpdateByQuery(s, d)),
    // BOOTSTRAP: the index seeded from a source-table snapshot in one
    // batch build + only the changelog tail applied (ES reindex-from-
    // source) — serves queries identically to the replay-built index
    "cdc_text_bootstrap" -> ((s, d) =>
      graft.ops.Search.qCdcTextBootstrapSearch(s, d)),
    // TIME-TRAVEL search (ES snapshot/PIT): BM25 from the index AS OF the
    // seed savepoint - pinned postings-bucket versions + the matching
    // stats version - while the live index has applied the tail
    "cdc_text_time_travel" -> ((s, d) =>
      graft.ops.Search.qCdcTextTimeTravel(s, d)),
    // ...and for DENSE retrieval (the ES kNN half): vectors re-quantize
    // against the frozen staged centroids as they change, and ANN is
    // served from the maintained cell-bucketed state
    "cdc_vector_index" -> (Similarity.qCdcVectorIndex _),
    "cdc_vector_search" -> ((s, d) => Similarity.qCdcVectorSearch(s, d)),
    // ...the maintained index stores PQ CODES (faiss inverted-list
    // layout); this query searches the compressed domain: ADC over the
    // stored codes + bounded-heap shortlist + doc-state rerank
    "cdc_vector_search_pq" -> ((s, d) => Similarity.qCdcVectorSearchPq(s, d)),
    // the dense twin of cdc_text_bootstrap: cell-code lists seeded from
    // the source table's vectors + only the tail applied
    "cdc_vector_bootstrap" -> ((s, d) =>
      Similarity.qCdcVectorBootstrapSearch(s, d)),
    // ...and the dense twin of cdc_text_time_travel: ANN served from the
    // seed savepoint's pinned index AND doc-state versions
    "cdc_vector_time_travel" -> ((s, d) =>
      Similarity.qCdcVectorTimeTravel(s, d)),
    // ES bool.filter + term: match cut to docs whose stored keyword
    // field matches (filter context — corpus df/idf, no rescoring)
    "cdc_term_filter" -> ((s, d) => graft.ops.Search.qCdcTermFilter(s, d)),
    // ES bool.filter + RANGE over a maintained numeric field: the match
    // cut to dl ∈ [40, 60), keep set served from the value-ORDERED
    // secondary index (sorted runs, pushed range predicate) — never a
    // doc-state scan (VERDICT r15 missing #1)
    "cdc_range_filter" -> ((s, d) => graft.ops.Search.qCdcRangeFilter(s, d)),
    // r18: the regexp rewrite (anchored directory expansion, OR-scored)
    // and terms_set (per-doc minimum_should_match off a derived field)
    "cdc_regexp_query" -> ((s, d) => graft.ops.Search.qCdcRegexpQuery(s, d)),
    "cdc_terms_set" -> ((s, d) => graft.ops.Search.qCdcTermsSet(s, d)),
    // span_first: the term within the first N positions, per-doc hit
    // counts off the stored positional postings
    "cdc_span_first" -> ((s, d) => graft.ops.Search.qCdcSpanFirst(s, d)),
    // GEO rational subset (r18): the bounding-box filter-context cut over
    // the derived centi-degree points, and the geohash_grid bucket agg
    // (real base-32 bit interleave, integer arithmetic end to end);
    // geo_distance scoped out (haversine trig is libm-dependent)
    "cdc_geo_bounding_box" ->
      ((s, d) => graft.ops.Search.qCdcGeoBoundingBox(s, d)),
    "cdc_geohash_grid" -> ((s, d) => graft.ops.Search.qCdcGeohashGrid(s, d)),
    // geotile_grid (r19): the z/x/y map-tile sibling — integer tile
    // divisions of the centi-degree grid (Mercator y needs ln/tan, so the
    // rational subset renders the equirectangular row, disclosed); and
    // geo_centroid riding the tile buckets — exact integer centi-degree
    // sums, one double divide + round-6 (the emb_centroids rule)
    "cdc_geotile_grid" -> ((s, d) => graft.ops.Search.qCdcGeotileGrid(s, d)),
    "cdc_geo_centroid" -> ((s, d) => graft.ops.Search.qCdcGeoCentroid(s, d)),
    // the _explain API (r18): the top hit's per-term BM25 decomposition —
    // (tf, dl, df, idf, contribution) rows whose decimal sum IS the score
    "cdc_explain" -> ((s, d) => graft.ops.Search.qCdcExplain(s, d)),
    // ES _mget: N docs fetched by id from the maintained store — the
    // consumer's per-id ES lookup, vectorized to the ids' buckets only;
    // misses report found=0 (the _mget row-per-requested-id contract)
    "cdc_mget" -> ((s, d) => graft.ops.Search.qCdcMget(s, d)),
    // ES terms AGGREGATION: top-k tokens by document frequency served
    // from the maintained postings state (count per tok IS df)
    "cdc_terms_agg" -> ((s, d) => graft.ops.Search.qCdcTermsAgg(s, d)),
    // ES `range` aggregation over the match set's doc-length field —
    // served entirely from the pruned postings (dl is denormalized there)
    "cdc_range_agg" -> ((s, d) => graft.ops.Search.qCdcRangeAgg(s, d)),
    // ES prefix query, scoring_boolean rewrite: the prefix expands to
    // every matching index term, scored as an OR match
    "cdc_prefix_search" -> ((s, d) => graft.ops.Search.qCdcPrefixSearch(s, d)),
    // ES wildcard under scoring_boolean: *ow* enumerates the term
    // directory (infix patterns can't range-prune — the Lucene cost
    // model too), scores the expansion as an OR match
    "cdc_wildcard_search" -> ((s, d) => graft.ops.Search.qCdcWildcardSearch(s, d)),
    // ES match with fuzziness: misspelled terms expand through the term
    // dictionary (levenshtein <= 1) then read bucket-pruned postings
    "cdc_fuzzy_search" -> ((s, d) => graft.ops.Search.qCdcFuzzySearch(s, d)),
    // ES significant_terms aggregation: JLH-scored terms overrepresented
    // in a query's foreground vs the corpus background
    "cdc_significant_terms" -> ((s, d) =>
      graft.ops.Search.qCdcSignificantTerms(s, d)),
    // ES significant_text (r19): foreground = the sampler-cut top hits of
    // a scored BM25 match, their TEXT re-analyzed from the doc state
    // (never an indexed field); background dfs from the term directory;
    // JLH shared with significant_terms; filter_duplicate_text scoped out
    "cdc_significant_text" -> ((s, d) =>
      graft.ops.Search.qCdcSignificantText(s, d)),
    // constant_score (r19): filter-context match, every hit scores the
    // boost — the posting list and NOTHING else opens (no stats, no df)
    "cdc_constant_score" -> ((s, d) =>
      graft.ops.Search.qCdcConstantScore(s, d)),
    // function_score random_score (r19): seeded hash-of-(id, seed) factor
    // multiplied into BM25 — reproducible result shuffling
    "cdc_random_score" -> ((s, d) => graft.ops.Search.qCdcRandomScore(s, d)),
    // _msearch (r19): N queries off ONE pruned postings read — the
    // union-of-terms scan + a broadcast (query, term) map
    "cdc_msearch" -> ((s, d) => graft.ops.Search.qCdcMsearch(s, d)),
    // ES more_like_this: the seed doc's top tf-idf terms as an OR match,
    // seed excluded — one doc-state point read + its terms' buckets
    "cdc_more_like_this" -> ((s, d) =>
      graft.ops.Search.qCdcMoreLikeThis(s, d)),
    // ES rescore: two-phase ranking — BM25 top-window reordered by a
    // phrase-proximity secondary scorer, window contract preserved
    "cdc_rescore" -> ((s, d) => graft.ops.Search.qCdcRescore(s, d)),
    // ES term suggester (did-you-mean): per misspelled input, the closest
    // index terms by (edit distance, df desc, term) within prefix_length=1
    "cdc_suggest" -> ((s, d) => graft.ops.Search.qCdcSuggest(s, d)),
    // suggest.term with its full knob set (r20): sort: frequency +
    // suggest_mode: popular — the input's own df gates candidates and the
    // frequency order can disagree with the edit-distance order
    "cdc_term_suggest" -> ((s, d) => graft.ops.Search.qCdcTermSuggest(s, d)),
    // completion suggester: weight-ranked prefix completions from the
    // sorted term directory (the Lucene FST surface as range reads)
    "cdc_completion" -> ((s, d) => graft.ops.Search.qCdcCompletion(s, d)),
    // ...and the PHRASE suggester (r18): per-token direct_generator
    // shortlists composed into whole-phrase corrections ranked by the
    // corpus unigram LM (the maintained dfs), integer order statistic
    "cdc_phrase_suggest" ->
      ((s, d) => graft.ops.Search.qCdcPhraseSuggest(s, d)),
    // filters agg: named query buckets + _other_, from pruned postings
    "cdc_filters_agg" -> (graft.ops.Search.qCdcFiltersAgg _),
    // rare_terms: the long-tail cut off the term directory, rare-first
    "cdc_rare_terms" -> ((s, d) => graft.ops.Search.qCdcRareTerms(s, d)),
    // adjacency_matrix: singles + pairwise intersections off the same
    // incidence frame; empty intersections omitted (the ES contract)
    "cdc_adjacency_matrix" -> (graft.ops.Search.qCdcAdjacencyMatrix _),
    // distance_feature: BM25 + the recency saturation bonus over the
    // whole rolled family (merged stats, doc-values ts read)
    "cdc_distance_feature" ->
      ((s, d) => graft.ops.Search.qCdcDistanceFeature(s, d)),
    // pinned query: curated docs first in declaration order, organic
    // BM25 follows with pinned excluded in filter context
    "cdc_pinned_query" -> ((s, d) => graft.ops.Search.qCdcPinnedQuery(s, d)),
    // match_bool_prefix: exact terms + last-term prefix expansion, all
    // scored as OR terms (the search-as-you-type match)
    "cdc_match_bool_prefix" ->
      ((s, d) => graft.ops.Search.qCdcMatchBoolPrefix(s, d)),
    // search_as_you_type (r20): 2/3-shingle subfields maintained as
    // analyzer views; multi_match bool_prefix shingles the query per
    // subfield and most_fields SUMS the per-field BM25 scores
    "cdc_search_as_you_type" ->
      ((s, d) => graft.ops.Search.qCdcSearchAsYouType(s, d)),
    // string_stats (r20): exact length statistics off the doc state
    // (entropy scoped out — ln(); see the Scaladoc disclosure)
    "cdc_string_stats" -> ((s, d) => graft.ops.Search.qCdcStringStats(s, d)),
    // sliced scroll: one disjoint export slice of the live corpus
    "cdc_sliced_scroll" -> ((s, d) => graft.ops.Search.qCdcSlicedScroll(s, d)),
    // ES function_score: filter+weight functions on the stored keyword
    // field multiply the FULL match set's scores (no window) before top-k
    "cdc_function_score" -> ((s, d) =>
      graft.ops.Search.qCdcFunctionScore(s, d)),
    // ES percolate: registered queries indexed by their terms; matching =
    // postings incidences × the broadcast query-term table, msm-qualified
    "cdc_percolate" -> ((s, d) => graft.ops.Search.qCdcPercolate(s, d)),
    // ES collapse: one best hit per stored-field group (partitioned
    // window), collapsed winners re-ranked for the final top-k
    "cdc_collapse" -> ((s, d) => graft.ops.Search.qCdcCollapse(s, d)),
    // ES terms agg + top_hits sub-agg: top buckets by matching-doc count,
    // each with its doc_count and its top hits by score
    "cdc_top_hits" -> ((s, d) => graft.ops.Search.qCdcTopHits(s, d)),
    // ES search_after: page 2 via the (score, doc_id) cursor of page 1's
    // last hit — a predicate + TakeOrdered, never a deep rank window
    "cdc_search_after" -> ((s, d) => graft.ops.Search.qCdcSearchAfter(s, d)),
    // ES point-in-time pagination: search_after page 2 served from the
    // "seed" savepoint's pinned index + stats while the live index moved on
    "cdc_text_pit" -> ((s, d) => graft.ops.Search.qCdcTextPit(s, d)),
    // ES highlight: matched-term first positions + occurrence counts for
    // the top-k hits, served from the maintained positional postings
    "cdc_highlight" -> ((s, d) => graft.ops.Search.qCdcHighlight(s, d)),
    // <em>-tagged snippets cut from the stored doc by the postings'
    // indexed character offsets — never by re-analysis
    "cdc_highlight_fragments" ->
      ((s, d) => graft.ops.Search.qCdcHighlightFragments(s, d)),
    // ES filtered kNN: ANN candidates cut (pre-filter) to docs whose
    // stored keyword field matches, composing the two maintained states
    "cdc_vector_filtered" -> ((s, d) => Similarity.qCdcVectorFiltered(s, d)),
    // lexical ∪ dense, fused by reciprocal-rank fusion (rank-only
    // rational arithmetic — the ES/Vespa hybrid default)
    "doc_hybrid_search" -> ((s, d) => graft.ops.Search.qHybridSearch(s, d)),
    // ...and the same fusion over the MAINTAINED legs: BM25 from the CDC
    // postings state × ANN from the CDC cell index — search results that
    // follow the data through the whole modern serving stack
    "cdc_hybrid_search" -> ((s, d) => graft.ops.Search.qCdcHybridSearch(s, d)),
    "doc_surprisal" -> ((s, d) => Text.qSurprisal(s, d)),
    "doc_mix_weights" -> ((s, d) => graft.ops.Curate.qMixWeights(s, d)),
    "doc_budget_sample" -> ((s, d) => graft.ops.Curate.qBudgetSample(s, d))
  )

  // ════════ oracle SQL (DuckDB) ════════

  private def dsum(e: String, alias: String): String =
    s"CAST(round(sum(CAST($e AS DECIMAL(18,4))), 2) AS DOUBLE) AS $alias"

  /** The synthetic documents changelog → live docs → their tokens, as SQL
    * (mirrors [[graft.cdc.Changelog.fromDocuments]]'s deterministic
    * rules). Shared by the CDC text-index and text-search oracles. */
  private def docsChangelogCteWith(toksDef: String): String =
    s"""dt AS (SELECT CAST(doc_id AS BIGINT) AS k, text, source FROM documents),
      |cl AS (
      |  SELECT k AS id, k AS seq, 'INSERT' AS op, text, source FROM dt
      |  UNION ALL
      |  SELECT k, k + 1000000, 'UPDATE', text || ' merge window r2', source
      |  FROM dt WHERE k % 3 = 0
      |  UNION ALL
      |  SELECT k, k + 2000000, 'DELETE', text, source FROM dt WHERE k % 5 = 4),
      |rnk AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
      |        FROM cl),
      |live AS (SELECT id AS doc_id, text, source FROM rnk WHERE rn = 1 AND op <> 'DELETE'),
      |$toksDef""".stripMargin

  private val docsChangelogCte: String = docsChangelogCteWith(
    "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM live)")

  /** The post-`_delete_by_query` corpus as SQL: the live changelog docs
    * MINUS every doc whose text contains the delete query's term — a
    * corpus-level mutation (dfs, n_docs, sum_dl all shrink), so the
    * whole BM25 chain recomputes over `live3`. */
  private val docsDeleteByQueryCte: String = docsChangelogCteWith(
    """live3 AS (SELECT doc_id, text, source FROM live
      |          WHERE NOT list_contains(string_split(text, ' '), 'dup')),
      |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM live3)""".stripMargin)

  /** The post-`_update_by_query` corpus as SQL: every live doc whose text
    * contains the query term re-indexed with the script applied
    * (`text || ' reviewed'`) — dl, sum_dl and the new token's df all
    * move, so the whole BM25 chain recomputes over `live3`. */
  private val docsUpdateByQueryCte: String = docsChangelogCteWith(
    """live3 AS (SELECT doc_id,
      |            CASE WHEN list_contains(string_split(text, ' '), 'slow')
      |                 THEN text || ' reviewed' ELSE text END AS text,
      |            source
      |          FROM live),
      |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM live3)""".stripMargin)

  /** The `body_syn` synonym view as SQL: the identical contraction CASE
    * the Spark side compiles ([[graft.ops.Search.synonymTokens]]). */
  private val docsSynonymCte: String = docsChangelogCteWith(
    """toks AS (SELECT doc_id,
      |           CASE WHEN tok = 'sluggish' THEN 'slow'
      |                WHEN tok = 'sort' THEN 'order' ELSE tok END AS tok
      |         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |               FROM live))""".stripMargin)

  /** The `body_en` analyzer view as SQL: stop filter + the S-stemmer —
    * the identical table-driven chain the Spark side compiles
    * ([[graft.ops.Search.analyzedTokens]]). */
  private val docsAnalyzedCte: String = docsChangelogCteWith(
    """toks AS (SELECT doc_id,
      |           CASE WHEN tok LIKE '%s' AND tok NOT LIKE '%ss' AND len(tok) > 3
      |                THEN substr(tok, 1, len(tok) - 1) ELSE tok END AS tok
      |         FROM (SELECT doc_id,
      |                 unnest(list_filter(string_split(text, ' '),
      |                   t -> t NOT IN ('the', 'a'))) AS tok
      |               FROM live))""".stripMargin)

  /** ONE BM25 oracle template for every lexical-search query — the scoring
    * expression (idf × tf normalization, round-6 DECIMAL association) lives
    * exactly once; callers choose the `toks` source CTE(s) (raw documents
    * vs the changelog live view), msm (minimum matched-term count — 1 is
    * the plain OR search, the term count renders `operator: and`; a
    * vacuous `HAVING count(*) >= 1` for the OR case), and the filter-
    * context exclusions (`must_not`). */
  private def bm25Sql(toksCtes: String, msm: Int, terms: Seq[String],
                      excludeTerms: Seq[String],
                      includeSrcs: Seq[String] = Seq.empty,
                      termsWhere: String = null,
                      extraCut: String = null,
                      tail: String = null): String = {
    // `tail` replaces everything after the ranked-CTE `r` — the rescore
    // oracle appends its window/secondary/re-rank CTEs there while the
    // scoring body above stays the single shared copy
    val tailSql =
      if (tail != null) tail
      else """SELECT CAST(rk AS BIGINT) AS rk, doc_id, n_t, score
             |FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin
    // `termsWhere` overrides the exact-terms IN list — the prefix query's
    // scoring_boolean rewrite scores every term the predicate expands to
    val termsPred =
      if (termsWhere != null) termsWhere
      else s"tok IN (${terms.map("'" + _ + "'").mkString(", ")})"
    // filter-context cuts compose in the candidate WHERE (never rescoring):
    // must_not drops term-matching docs, a `term` filter keeps only docs
    // whose stored keyword field matches, `extraCut` is a raw predicate
    // (the MLT seed-doc exclusion)
    val cuts = Seq(
      if (excludeTerms.isEmpty) None
      else Some(s"p.doc_id NOT IN (SELECT doc_id FROM toks WHERE tok IN (${
        excludeTerms.map("'" + _ + "'").mkString(", ")}))"),
      if (includeSrcs.isEmpty) None
      else Some(s"p.doc_id IN (SELECT doc_id FROM live WHERE source IN (${
        includeSrcs.map("'" + _ + "'").mkString(", ")}))"),
      Option(extraCut)).flatten
    s"""WITH $toksCtes,
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
       |post AS (SELECT tok, doc_id, count(*) AS tf FROM toks
       |         WHERE $termsPred
       |         GROUP BY 1, 2),
       |df AS (SELECT tok, count(*) AS df FROM post GROUP BY 1),
       |ts AS (SELECT p.doc_id,
       |         CAST(round(
       |           ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
       |           ((CAST(tf AS DOUBLE) * 2.2) /
       |            (CAST(tf AS DOUBLE) +
       |             1.2 * ((1 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) * n_docs / sum_dl)))),
       |           6) AS DECIMAL(18,8)) AS ts
       |       FROM post p JOIN df USING (tok) JOIN dl ON dl.doc_id = p.doc_id
       |       CROSS JOIN st${
         if (cuts.isEmpty) ""
         else "\n       WHERE " + cuts.mkString("\n         AND ")}),
       |agg AS (SELECT doc_id, count(*) AS n_t,
       |          round(CAST(sum(ts) AS DOUBLE), 6) AS score
       |        FROM ts GROUP BY 1 HAVING count(*) >= $msm),
       |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk FROM agg)
       |$tailSql""".stripMargin
  }

  /** The search_after page-2 tail shared by the live and PIT pagers. */
  private val searchAfterTailSql: String =
    """,cur AS (SELECT score AS cs, doc_id AS cd FROM r WHERE rk = 10),
      |nxt AS (SELECT r.doc_id, r.n_t, r.score FROM r CROSS JOIN cur
      |        WHERE r.score < cur.cs OR (r.score = cur.cs AND r.doc_id > cur.cd)),
      |r2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk2 FROM nxt)
      |SELECT CAST(rk2 + 10 AS BIGINT) AS rk, doc_id, n_t, score
      |FROM r2 WHERE rk2 <= 10 ORDER BY rk2""".stripMargin

  /** BM25 over the raw documents table (the static staged index's corpus —
    * and the bootstrap savepoint's pinned pre-tail corpus). */
  private lazy val bm25OverDocsSql: String = bm25Sql(
    "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)",
    1, Seq("stream", "merge", "window"), Seq.empty)

  private def cdcMatchSql(msm: Int,
                          terms: Seq[String] =
                            Seq("stream", "merge", "window"),
                          excludeTerms: Seq[String] = Seq.empty): String =
    bm25Sql(docsChangelogCte, msm, terms, excludeTerms)

  private lazy val cdcTextSearchSql: String = cdcMatchSql(1)

  /** date_range oracle generated from [[graft.cdc.Pipeline.dateRanges]] —
    * one literal, two renderings (the percolate discipline). */
  private lazy val cdcDateRangeAggSql: String = {
    val cases = graft.cdc.Pipeline.dateRanges.map { case (key, from, to) =>
      s"WHEN o_orderdate >= TIMESTAMP '$from' AND o_orderdate < TIMESTAMP '$to' THEN '$key'"
    }.mkString("\n         |           ")
    val vals = graft.cdc.Pipeline.dateRanges.zipWithIndex
      .map { case ((key, _, _), i) => s"('$key', $i)" }.mkString(", ")
    s"""WITH ${Changelog.oracleCte},
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
       |  FROM changelog),
       |b AS (SELECT CASE $cases END AS range_key, o_totalprice
       |      FROM ranked WHERE rn = 1 AND op <> 'DELETE'),
       |c AS (SELECT range_key, count(*) AS doc_count,
       |             ${dsum("o_totalprice", "sum_price")}
       |      FROM b WHERE range_key IS NOT NULL GROUP BY 1)
       |SELECT rg.range_key,
       |       coalesce(doc_count, CAST(0 AS BIGINT)) AS doc_count,
       |       coalesce(sum_price, 0.0) AS sum_price
       |FROM (VALUES $vals) AS rg(range_key, ord)
       |LEFT JOIN c USING (range_key) ORDER BY rg.ord""".stripMargin
  }

  /** filters-agg oracle generated from [[graft.ops.Search.namedFilters]]. */
  private lazy val cdcFiltersAggSql: String = {
    val vals = graft.ops.Search.namedFilters.zipWithIndex
      .map { case ((n, t), i) => s"('$n', '$t', $i)" }.mkString(", ")
    val terms = graft.ops.Search.namedFilters
      .map("'" + _._2 + "'").mkString(", ")
    s"""WITH $docsChangelogCte,
       |f AS (SELECT * FROM (VALUES $vals) AS v(filter_key, tok, ord)),
       |m AS (SELECT f.filter_key, count(DISTINCT t.doc_id) AS doc_count
       |      FROM f JOIN toks t ON t.tok = f.tok GROUP BY 1),
       |named AS (SELECT f.filter_key, f.ord,
       |            coalesce(m.doc_count, 0) AS doc_count
       |          FROM f LEFT JOIN m ON m.filter_key = f.filter_key),
       |oth AS (SELECT '_other_' AS filter_key,
       |          ${graft.ops.Search.namedFilters.size} AS ord,
       |          (SELECT count(*) FROM live) -
       |          (SELECT count(DISTINCT doc_id) FROM toks
       |           WHERE tok IN ($terms)) AS doc_count)
       |SELECT filter_key, CAST(doc_count AS BIGINT) AS doc_count
       |FROM (SELECT filter_key, ord, doc_count FROM named
       |      UNION ALL SELECT filter_key, ord, doc_count FROM oth)
       |ORDER BY ord""".stripMargin
  }

  /** The multi_match oracle: per-FIELD BM25 over the live changelog docs —
    * `body` = the full text (the shared `toks` CTE), `title` = its first
    * five tokens — each field with its own dl/stats/df, boost applied as
    * an exact power of two (binary-exact ×), best_fields = max per doc
    * with ties to the lexically-later field (`ORDER BY fscore DESC, fld
    * DESC` mirrors Spark's struct max). The scoring text per field is the
    * [[bm25Sql]] body verbatim. */
  /** One field's BM25 scoring CTE chain (dl/stats/postings/df/per-term
    * contributions), prefixed so several fields coexist in one oracle —
    * shared by the multi_match and dis_max oracles (editing the scoring
    * text cannot drift between them). */
  private def fieldCtes(p: String, toksCte: String): String = {
    val terms = Seq("stream", "merge", "window").map("'" + _ + "'").mkString(", ")
    s"""${p}dl AS (SELECT doc_id, count(*) AS dl FROM $toksCte GROUP BY 1),
         |${p}st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM ${p}dl),
         |${p}post AS (SELECT tok, doc_id, count(*) AS tf FROM $toksCte
         |         WHERE tok IN ($terms) GROUP BY 1, 2),
         |${p}df AS (SELECT tok, count(*) AS df FROM ${p}post GROUP BY 1),
         |${p}ts AS (SELECT p.doc_id,
         |         CAST(round(
         |           ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
         |           ((CAST(tf AS DOUBLE) * 2.2) /
         |            (CAST(tf AS DOUBLE) +
         |             1.2 * ((1 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) * n_docs / sum_dl)))),
         |           6) AS DECIMAL(18,8)) AS ts
         |       FROM ${p}post p JOIN ${p}df USING (tok)
         |       JOIN ${p}dl dl ON dl.doc_id = p.doc_id CROSS JOIN ${p}st)""".stripMargin
  }

  /** [[fieldCtes]] with a PARAMETERIZED clause-set predicate — the
    * search_as_you_type oracle's fields select exact query shingles plus
    * a LIKE prefix expansion instead of the fixed three terms; the
    * scoring text is [[fieldCtes]]' verbatim (editing one cannot drift
    * from the other without a hash mismatch). */
  private def saytFieldCtes(p: String, toksCte: String,
                            termsPred: String): String =
    s"""${p}dl AS (SELECT doc_id, count(*) AS dl FROM $toksCte GROUP BY 1),
         |${p}st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM ${p}dl),
         |${p}post AS (SELECT tok, doc_id, count(*) AS tf FROM $toksCte
         |         WHERE $termsPred GROUP BY 1, 2),
         |${p}df AS (SELECT tok, count(*) AS df FROM ${p}post GROUP BY 1),
         |${p}ts AS (SELECT p.doc_id,
         |         CAST(round(
         |           ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
         |           ((CAST(tf AS DOUBLE) * 2.2) /
         |            (CAST(tf AS DOUBLE) +
         |             1.2 * ((1 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) * n_docs / sum_dl)))),
         |           6) AS DECIMAL(18,8)) AS ts
         |       FROM ${p}post p JOIN ${p}df USING (tok)
         |       JOIN ${p}dl dl ON dl.doc_id = p.doc_id CROSS JOIN ${p}st)""".stripMargin

  private lazy val cdcMultiMatchSql: String =
    s"""WITH $docsChangelogCte,
       |ttoks AS (SELECT doc_id, unnest(list_slice(string_split(text, ' '), 1, 5)) AS tok
       |          FROM live),
       |${fieldCtes("b", "toks")},
       |${fieldCtes("t", "ttoks")},
       |u AS (SELECT doc_id, 'body' AS fld,
       |        round(CAST(sum(ts) AS DOUBLE), 6) * 1.0 AS fscore
       |      FROM bts GROUP BY 1
       |      UNION ALL
       |      SELECT doc_id, 'title' AS fld,
       |        round(CAST(sum(ts) AS DOUBLE), 6) * 2.0 AS fscore
       |      FROM tts GROUP BY 1),
       |best AS (SELECT doc_id, fld, fscore,
       |           row_number() OVER (PARTITION BY doc_id
       |                              ORDER BY fscore DESC, fld DESC) AS brn
       |         FROM u),
       |r AS (SELECT doc_id, fld, fscore,
       |        row_number() OVER (ORDER BY fscore DESC, doc_id) AS rk
       |      FROM best WHERE brn = 1)
       |SELECT CAST(rk AS BIGINT) AS rk, doc_id, fld AS field, fscore AS score
       |FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin

  /** The dis_max oracle: the same per-field scoring text, combined as
    * `max + tie_breaker × (Σ − max)` (tie_breaker 0.25 — exact power of
    * two; the two-term double sum commutes, so one final round-6). */
  private lazy val cdcDisMaxSql: String =
    s"""WITH $docsChangelogCte,
       |ttoks AS (SELECT doc_id, unnest(list_slice(string_split(text, ' '), 1, 5)) AS tok
       |          FROM live),
       |${fieldCtes("b", "toks")},
       |${fieldCtes("t", "ttoks")},
       |u AS (SELECT doc_id, round(CAST(sum(ts) AS DOUBLE), 6) AS fscore
       |      FROM bts GROUP BY 1
       |      UNION ALL
       |      SELECT doc_id, round(CAST(sum(ts) AS DOUBLE), 6) AS fscore
       |      FROM tts GROUP BY 1),
       |c AS (SELECT doc_id, count(*) AS n_fields,
       |        round(max(fscore) + 0.25 * (sum(fscore) - max(fscore)), 6) AS score
       |      FROM u GROUP BY 1),
       |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk FROM c)
       |SELECT CAST(rk AS BIGINT) AS rk, doc_id, n_fields, score
       |FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin

  /** The cross_fields oracle: per-field dl/st/post CTEs (the shared
    * [[fieldCtes]] text — its per-field `ts` CTEs go unused here), then
    * the blended-statistics scoring: df_b = max over fields, n_b = max
    * field doc count, per-(doc, field, term) score = blended idf × the
    * field's own tf norm (identical arithmetic text to [[fieldCtes]]),
    * best field per (doc, term), terms sum. */
  private lazy val cdcCrossFieldsSql: String =
    s"""WITH $docsChangelogCte,
       |ttoks AS (SELECT doc_id, unnest(list_slice(string_split(text, ' '), 1, 5)) AS tok
       |          FROM live),
       |${fieldCtes("b", "toks")},
       |${fieldCtes("t", "ttoks")},
       |alldf AS (SELECT tok, df FROM bdf UNION ALL SELECT tok, df FROM tdf),
       |dfb AS (SELECT tok, max(df) AS df_b FROM alldf GROUP BY 1),
       |nb AS (SELECT greatest((SELECT n_docs FROM bst),
       |                       (SELECT n_docs FROM tst)) AS n_b),
       |bx AS (SELECT p.doc_id, p.tok,
       |         CAST(round(
       |           ((CAST(n_b - df_b AS DOUBLE) + 0.5) / (CAST(df_b AS DOUBLE) + 0.5)) *
       |           ((CAST(tf AS DOUBLE) * 2.2) /
       |            (CAST(tf AS DOUBLE) +
       |             1.2 * ((1 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) * n_docs / sum_dl)))),
       |           6) AS DECIMAL(18,8)) AS s
       |       FROM bpost p JOIN dfb USING (tok)
       |       JOIN bdl dl ON dl.doc_id = p.doc_id CROSS JOIN bst CROSS JOIN nb),
       |tx AS (SELECT p.doc_id, p.tok,
       |         CAST(round(
       |           ((CAST(n_b - df_b AS DOUBLE) + 0.5) / (CAST(df_b AS DOUBLE) + 0.5)) *
       |           ((CAST(tf AS DOUBLE) * 2.2) /
       |            (CAST(tf AS DOUBLE) +
       |             1.2 * ((1 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) * n_docs / sum_dl)))),
       |           6) AS DECIMAL(18,8)) AS s
       |       FROM tpost p JOIN dfb USING (tok)
       |       JOIN tdl dl ON dl.doc_id = p.doc_id CROSS JOIN tst CROSS JOIN nb),
       |pt AS (SELECT doc_id, tok, max(s) AS ts
       |       FROM (SELECT * FROM bx UNION ALL SELECT * FROM tx) GROUP BY 1, 2),
       |c AS (SELECT doc_id, count(*) AS n_t,
       |        round(CAST(sum(ts) AS DOUBLE), 6) AS score
       |      FROM pt GROUP BY 1),
       |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk FROM c)
       |SELECT CAST(rk AS BIGINT) AS rk, doc_id, CAST(n_t AS BIGINT) AS n_t, score
       |FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin

  private val cdcApplySql =
    s"""WITH ${Changelog.oracleCte},
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
       |  FROM changelog)
       |SELECT $payloadList FROM ranked
       |WHERE rn = 1 AND op <> 'DELETE' ORDER BY o_orderkey""".stripMargin

  // shared oracles: queries that must produce identical results check
  // against the SAME SQL string (editing one cannot drift from its twin)
  private val topkOracle =
      """WITH r AS (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part)
        |SELECT p_brand, CAST(rk AS BIGINT) AS rk, p_partkey, p_retailprice
        |FROM r WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin

  private val cdcApplyCustomerSql =
    s"""WITH ${Changelog.customerOracleCte},
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
       |  FROM changelog)
       |SELECT ${Changelog.customerPayloadCols.mkString(", ")} FROM ranked
       |WHERE rn = 1 AND op <> 'DELETE' ORDER BY c_custkey""".stripMargin

  private val sessionOracle =
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, sum(new_s) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM g)
      |SELECT min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end, user_id, count(*) AS n_events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin

  // txn = id % 50, committed iff txn % 7 != 3: since txn is a pure
  // function of the key, the all-or-nothing gate is this predicate
  // (shared by the batch semi-join and the streaming txn-buffer renderings)
  private val txnOracle =
    s"""WITH ${Changelog.oracleCte},
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
       |  FROM changelog WHERE (id % 50) % 7 <> 3)
       |SELECT $payloadList FROM ranked
       |WHERE rn = 1 AND op <> 'DELETE' ORDER BY o_orderkey""".stripMargin

  // SCD2 history: each version's interval closes at the key's next event
  // (deletes close without opening). Shared by the batch window rendering
  // and the streaming open-interval state machine.
  private val scd2Oracle =
    s"""WITH ${Changelog.oracleCte},
       |v AS (
       |  SELECT *, lead(seq) OVER (PARTITION BY id ORDER BY seq) AS valid_to
       |  FROM changelog)
       |SELECT $payloadList, seq AS valid_from, valid_to
       |FROM v WHERE op <> 'DELETE' ORDER BY o_orderkey, valid_from""".stripMargin

  // TRUNCATE at seq 1,000,000 erases everything at-or-before it; the state
  // is rebuilt from the surviving updates (full rows) minus later deletes.
  // Shared by the batch fence-join and the streaming fence-metadata
  // renderings.
  private val truncateOracle =
    s"""WITH ${Changelog.oracleCte},
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
       |  FROM changelog WHERE seq > 1000000)
       |SELECT $payloadList FROM ranked
       |WHERE rn = 1 AND op <> 'DELETE' ORDER BY o_orderkey""".stripMargin

  private val slidingOracle =
    s"""WITH s AS (
       |  SELECT make_timestamp(((epoch_us(ts) // 300000000) - j.j) * 300000000) AS w_start,
       |         event_type, value
       |  FROM events CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) AS j(j))
       |SELECT w_start, event_type, count(*) AS n, ${dsum("value", "sum_value")}
       |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val tumblingOracle =
    s"""SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS w_start,
       |  event_type, count(*) AS n, ${dsum("value", "sum_value")}
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // stopword-hit expression (DuckDB side; mirrors Text.hits/regexp_count).
  // Word lists come from Text.stopwords — the one source both engines share.
  private def hitsSql(words: Seq[String]): String =
    s"length(regexp_extract_all(text, '\\b(${words.mkString("|")})\\b'))"
  private val stopEn = Text.stopwords("en")
  private val langWords = Text.stopwords

  private def minhashOracle(n: Int, k: Int, rows: Int, threshold: Double): String = {
    // mirrors Dedup.minhashPairs: Kirsch–Mitzenmacher double hashing
    // (g_s = (h1 + s·h2) mod p from one md5), band md5 over concat_ws of
    // the long signatures, size-pruned candidates, verify-join candidates
    val p = 16777213L
    val sigCols = (0 until k).map(s => s"min((h1 + $s * h2) % $p) AS mh_$s").mkString(", ")
    val nBands = k / rows
    val bandExprs = (0 until nBands).map { b =>
      s"md5(concat_ws('|', $b, ${(b * rows until b * rows + rows).map(r => s"mh_$r").mkString(", ")}))"
    }.mkString(", ")
    val shingleExpr = (0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(toks) - ${n - 1}), i -> $shingleExpr)) AS shingle FROM tok),
       |hashed AS (SELECT doc_id, shingle,
       |  CAST('0x' || substr(md5(shingle), 1, 6) AS BIGINT) AS h1,
       |  CAST('0x' || substr(md5(shingle), 7, 6) AS BIGINT) AS h2 FROM sh),
       |sig AS (SELECT doc_id, count(*) AS n_sh, $sigCols FROM hashed GROUP BY doc_id),
       |band AS (SELECT doc_id, n_sh, unnest([$bandExprs]) AS band FROM sig),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b
       |  FROM band a JOIN band b USING (band)
       |  WHERE a.doc_id < b.doc_id AND least(a.n_sh, b.n_sh) >= $threshold * greatest(a.n_sh, b.n_sh)),
       |com AS (SELECT c.id_a, c.id_b, c.n_a, c.n_b, count(*) AS n_common
       |  FROM cand c JOIN sh x ON x.doc_id = c.id_a JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
       |  GROUP BY 1, 2, 3, 4),
       |v AS (SELECT id_a, id_b, n_common, round(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) * 10000.0) / 10000.0 AS jaccard FROM com)
       |SELECT id_a, id_b, CAST(n_common AS BIGINT) AS n_common, jaccard FROM v WHERE jaccard >= $threshold ORDER BY id_a, id_b""".stripMargin
  }

  private def simhashVotes(bits: Int): String =
    s"""t AS (SELECT doc_id, CAST('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 6) AS BIGINT) AS hv FROM documents),
       |v AS (SELECT doc_id, ${(0 until bits).map(i =>
             s"sum(CASE WHEN (hv >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v_$i").mkString(", ")}
       |  FROM t GROUP BY doc_id),
       |sh2 AS (SELECT doc_id, CAST(${(0 until bits).map(i => s"(CASE WHEN v_$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash FROM v)""".stripMargin

  private def bucketSql(bits: Int): String =
    (0 until bits).map(i => s"CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")

  // shared embedding CTEs: per-element rows + per-vector norms
  private val embX =
    """x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, CAST(unnest(embedding) AS DOUBLE) AS e FROM embeddings),
      |nrm AS (SELECT vec_id, sqrt(sum(e*e)) AS nrm FROM x GROUP BY 1)""".stripMargin

  /** Unrolled spherical k-means (mirrors Similarity.qKmeans): a0 = the
    * label seed; each round k derives centroids c_k from a_(k-1) with the
    * decimal-exact mean arithmetic, then reassigns (round-6 scores, ties
    * on cluster id). */
  private def kmeansRounds(iters: Int): String =
    (1 to iters).map { k =>
      s"""c$k AS (SELECT a.cl, x.i,
         |  round(CAST(sum(CAST(round(x.e, 6) AS DECIMAL(18,8))) AS DOUBLE) / count(*) * 1000000.0) / 1000000.0 AS c
         |  FROM x JOIN a${k - 1} a USING (vec_id) GROUP BY 1, 2),
         |n$k AS (SELECT cl, sqrt(sum(c*c)) AS cnrm FROM c$k GROUP BY 1),
         |d$k AS (SELECT x.vec_id, c.cl, sum(x.e * c.c) AS d FROM x JOIN c$k c ON c.i = x.i GROUP BY 1, 2),
         |s$k AS (SELECT d.vec_id, d.cl, round(d.d / (n.nrm * cn.cnrm), 6) AS score
         |  FROM d$k d JOIN nrm n USING (vec_id) JOIN n$k cn USING (cl)),
         |a$k AS (SELECT vec_id, cl, score FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cl) AS rk FROM s$k)
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")

  /** Mirrors Similarity.qPqTopK: px splits x into m subspaces (j, local
    * index li); pa0 stripes the seed codes; each round recomputes the
    * per-(j, cl) codebook with the decimal-exact mean arithmetic and
    * reassigns by the Euclidean key round(x·c − ‖c‖²/2, 6); the final
    * round's codebook and codes drive the ADC: a query's round-6 dot per
    * (j, cl) summed along each vector's codes, ranked per query. */
  private def pqRounds(iters: Int, sub: Int): String =
    (1 to iters).map { r =>
      s"""pc$r AS (SELECT a.j, a.cl, px.li,
         |  round(CAST(sum(CAST(round(px.e, 6) AS DECIMAL(18,8))) AS DOUBLE) / count(*) * 1000000.0) / 1000000.0 AS c
         |  FROM px JOIN pa${r - 1} a ON a.vec_id = px.vec_id AND a.j = px.j GROUP BY 1, 2, 3),
         |pn$r AS (SELECT j, cl, sum(c*c) AS csq FROM pc$r GROUP BY 1, 2),
         |pd$r AS (SELECT px.vec_id, px.j, c.cl, sum(px.e * c.c) AS d
         |  FROM px JOIN pc$r c ON c.j = px.j AND c.li = px.li GROUP BY 1, 2, 3),
         |ps$r AS (SELECT d.vec_id, d.j, d.cl, round(d.d - n.csq / 2, 6) AS key
         |  FROM pd$r d JOIN pn$r n ON n.j = d.j AND n.cl = d.cl),
         |pa$r AS (SELECT vec_id, j, cl FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY key DESC, cl) AS rk FROM ps$r)
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")

  private def pqOracle(iters: Int, m: Int, k: Int, nQueries: Int, topK: Int,
                       shortlist: Int, interleave: Boolean = false): String = {
    val sub = 64 / m
    // (vec_id, dim i, value) → (subspace j, local index li): contiguous
    // blocks, or the OPQ-lite interleaved permutation (subspace j = dims
    // {j, j+m, j+2m, …}) mirroring qPqTopK's gather
    val px =
      if (interleave) s"SELECT vec_id, (i - 1) % $m AS j, (i - 1) // $m + 1 AS li, e FROM x"
      else s"SELECT vec_id, (i - 1) // $sub AS j, i - ((i - 1) // $sub) * $sub AS li, e FROM x"
    s"""WITH $embX,
       |px AS ($px),
       |pa0 AS (SELECT DISTINCT vec_id, j, CAST((vec_id + j) % $k AS BIGINT) AS cl FROM px),
       |${pqRounds(iters, sub)},
       |qd AS (SELECT px.vec_id AS q_id, c.j, c.cl, round(sum(px.e * c.c), 6) AS qd
       |  FROM px JOIN pc$iters c ON c.j = px.j AND c.li = px.li
       |  WHERE px.vec_id < $nQueries GROUP BY 1, 2, 3),
       |adc AS (SELECT q.q_id, a.vec_id, round(sum(CAST(q.qd AS DECIMAL(18,8))), 6) AS ascore
       |  FROM pa$iters a JOIN qd q ON q.j = a.j AND q.cl = a.cl AND a.vec_id <> q.q_id
       |  GROUP BY 1, 2),
       |short AS (SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY ascore DESC, vec_id) AS ark
       |    FROM adc) WHERE ark <= $shortlist),
       |rr AS (SELECT s.q_id, s.vec_id, round(sum(xq.e * xv.e), 6) AS score
       |  FROM short s
       |  JOIN x xq ON xq.vec_id = s.q_id
       |  JOIN x xv ON xv.vec_id = s.vec_id AND xv.i = xq.i
       |  GROUP BY 1, 2),
       |pr AS (SELECT q_id, vec_id, score,
       |  row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk FROM rr)
       |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id, score FROM pr WHERE rk <= $topK
       |ORDER BY q_id, rk""".stripMargin
  }

  /** Mirrors Similarity.qAnnIvfPq: the annKmeans CTE chain (seedSplit-way
    * split seed → trained cells, adaptive probe set) provides the candidate
    * restriction; the pq CTE chain (interleaved px, Lloyd codebooks pc/pa)
    * provides the compressed-domain ADC — summed only over candidate
    * (query, vector) pairs — then shortlist and exact-dot rerank. */
  private def ivfPqOracle(iters: Int, seedSplit: Int, m: Int, k: Int,
                          pqIters: Int, nQueries: Int, topK: Int,
                          shortlist: Int, probeMargin: Double,
                          maxProbes: Int): String =
    s"""WITH $embX,
       |a0 AS (SELECT vec_id, CAST(label AS BIGINT) * $seedSplit + vec_id % $seedSplit AS cl FROM embeddings),
       |${kmeansRounds(iters)},
       |asg AS (SELECT vec_id, cl, score,
       |               row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cl) AS crk,
       |               max(score) OVER (PARTITION BY vec_id) AS best
       |        FROM s$iters),
       |cells AS (SELECT vec_id, cl AS cell FROM asg WHERE crk = 1),
       |probed AS (SELECT vec_id AS q_id, cl AS cell FROM asg
       |           WHERE vec_id < $nQueries AND (crk = 1 OR (crk <= $maxProbes AND score >= best - $probeMargin))),
       |cand AS (SELECT p.q_id, c.vec_id FROM probed p JOIN cells c ON c.cell = p.cell AND c.vec_id <> p.q_id),
       |px AS (SELECT vec_id, (i - 1) % $m AS j, (i - 1) // $m + 1 AS li, e FROM x),
       |pa0 AS (SELECT DISTINCT vec_id, j, CAST((vec_id + j) % $k AS BIGINT) AS cl FROM px),
       |${pqRounds(pqIters, 64 / m)},
       |qd AS (SELECT px.vec_id AS q_id, c.j, c.cl, round(sum(px.e * c.c), 6) AS qd
       |  FROM px JOIN pc$pqIters c ON c.j = px.j AND c.li = px.li
       |  WHERE px.vec_id < $nQueries GROUP BY 1, 2, 3),
       |adc AS (SELECT cd.q_id, cd.vec_id, round(sum(CAST(q.qd AS DECIMAL(18,8))), 6) AS ascore
       |  FROM cand cd JOIN pa$pqIters a ON a.vec_id = cd.vec_id
       |  JOIN qd q ON q.q_id = cd.q_id AND q.j = a.j AND q.cl = a.cl
       |  GROUP BY 1, 2),
       |short AS (SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY ascore DESC, vec_id) AS ark
       |    FROM adc) WHERE ark <= $shortlist),
       |rr AS (SELECT s.q_id, s.vec_id, round(sum(xq.e * xv.e), 6) AS score
       |  FROM short s
       |  JOIN x xq ON xq.vec_id = s.q_id
       |  JOIN x xv ON xv.vec_id = s.vec_id AND xv.i = xq.i
       |  GROUP BY 1, 2),
       |pr AS (SELECT q_id, vec_id, score,
       |  row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk FROM rr)
       |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id, score FROM pr WHERE rk <= $topK
       |ORDER BY q_id, rk""".stripMargin

  private def kmeansOracle(iters: Int): String =
    s"""WITH $embX,
       |a0 AS (SELECT vec_id, CAST(label AS BIGINT) AS cl FROM embeddings),
       |${kmeansRounds(iters)}
       |SELECT vec_id, cl AS cluster, score FROM a$iters ORDER BY vec_id""".stripMargin

  /** Mirrors Similarity.qAnnKmeans: each label's seed SPLIT in two (cl =
    * label·2 + vec_id mod 2 → 20 trained cells), the round-`iters` k-means
    * scoring (s$iters — every vector vs the trained centroids) ranked per
    * vector gives cells (crk=1) and the queries' ADAPTIVE probe set —
    * nearest cell always, further cells (≤8) only within 0.20 of the best
    * score — then the exact rerank of emb_ann_centroid over the probed
    * cells. */
  /** The embeddings changelog → LIVE vectors (updates reversed, deletes
    * gone) → their quantization against the frozen round-`iters` trained
    * centroids (c/n from [[kmeansRounds]] over the ORIGINAL corpus —
    * deployments freeze the coarse quantizer; only arriving vectors
    * re-quantize). Shared by the CDC vector-index and vector-search
    * oracles. Must follow `WITH embX, a0 …, kmeansRounds(iters)`. */
  private def liveVectorCte(iters: Int): String =
    s"""et AS (SELECT CAST(vec_id AS BIGINT) AS k, embedding FROM embeddings),
       |ecl AS (
       |  SELECT k AS id, k AS seq, 'INSERT' AS op, embedding FROM et
       |  UNION ALL
       |  SELECT k, k + 1000000, 'UPDATE', list_reverse(embedding)
       |  FROM et WHERE k % 3 = 0
       |  UNION ALL
       |  SELECT k, k + 2000000, 'DELETE', embedding FROM et WHERE k % 5 = 4),
       |erk AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
       |        FROM ecl),
       |elive AS (SELECT id AS vec_id, embedding FROM erk
       |          WHERE rn = 1 AND op <> 'DELETE'),
       |lx AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |              CAST(unnest(embedding) AS DOUBLE) AS e FROM elive),
       |lnrm AS (SELECT vec_id, sqrt(sum(e*e)) AS nrm FROM lx GROUP BY 1),
       |ld AS (SELECT lx.vec_id, c.cl, sum(lx.e * c.c) AS d
       |       FROM lx JOIN c$iters c ON c.i = lx.i GROUP BY 1, 2),
       |ls AS (SELECT d.vec_id, d.cl, round(d.d / (n.nrm * cn.cnrm), 6) AS score
       |       FROM ld d JOIN lnrm n USING (vec_id) JOIN n$iters cn USING (cl)),
       |lasg AS (SELECT vec_id, cl, score FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cl) AS rk
       |    FROM ls) WHERE rk = 1)""".stripMargin

  private def vectorIndexOracle(iters: Int): String =
    s"""WITH $embX,
       |a0 AS (SELECT vec_id, CAST(label AS BIGINT) * 2 + vec_id % 2 AS cl FROM embeddings),
       |${kmeansRounds(iters)},
       |${liveVectorCte(iters)}
       |SELECT vec_id, cl AS cell FROM lasg ORDER BY vec_id""".stripMargin

  /** The maintained-ANN oracle body, parameterized by the corpus CTEs
    * (`lx`/`lnrm`/`lasg` — the candidate vectors, norms, and cell
    * assignments): the changelog's LIVE view for the serving-path
    * queries, the RAW table for the time-travel query (whose savepoint
    * pinned the pre-tail corpus — the source table exactly). */
  private def vectorSearchOracleFrom(iters: Int, corpusCtes: String,
                                     candJoin: String = ""): String =
    s"""WITH $embX,
       |a0 AS (SELECT vec_id, CAST(label AS BIGINT) * 2 + vec_id % 2 AS cl FROM embeddings),
       |${kmeansRounds(iters)},
       |$corpusCtes,
       |asgq AS (SELECT vec_id, cl,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cl) AS crk
       |         FROM s$iters),
       |probed AS (SELECT vec_id AS q_id, cl AS cell FROM asgq
       |           WHERE vec_id < 10 AND crk <= 2),
       |cand AS (SELECT p.q_id, a.vec_id FROM probed p
       |         JOIN lasg a ON a.cl = p.cell AND a.vec_id <> p.q_id$candJoin),
       |dots AS (SELECT cd.q_id, cd.vec_id, sum(xq.e * xv.e) AS dot
       |         FROM cand cd
       |         JOIN x xq ON xq.vec_id = cd.q_id
       |         JOIN lx xv ON xv.vec_id = cd.vec_id AND xv.i = xq.i
       |         GROUP BY 1, 2),
       |sc AS (SELECT d.q_id, d.vec_id, round(d.dot / (qa.nrm * qb.nrm), 6) AS score
       |       FROM dots d JOIN nrm qa ON qa.vec_id = d.q_id
       |       JOIN lnrm qb ON qb.vec_id = d.vec_id),
       |r AS (SELECT q_id, vec_id, score,
       |             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk
       |      FROM sc)
       |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id, score
       |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  private def vectorSearchOracle(iters: Int): String =
    vectorSearchOracleFrom(iters, liveVectorCte(iters))

  /** The FILTERED-kNN oracle: the live-view search with candidates cut to
    * docs whose source matches — source never changes on update and
    * deletes are the %5==4 keys, so the keep set is exactly the source
    * table minus the deleted ids (the doc state's live (id, source)). */
  private def vectorFilteredOracle(iters: Int, srcs: Seq[String]): String =
    vectorSearchOracleFrom(iters, liveVectorCte(iters),
      candJoin = s"""
         |         JOIN (SELECT CAST(doc_id AS BIGINT) AS fdoc_id FROM documents
         |               WHERE doc_id % 5 <> 4 AND source IN (${
                         srcs.map("'" + _ + "'").mkString(", ")}))
         |           f ON f.fdoc_id = a.vec_id""".stripMargin)

  /** The time-travel ANN oracle: the pinned point is the pre-tail corpus,
    * so the candidate vectors/norms ARE the raw table's (`lx`=`x`,
    * `lnrm`=`nrm`) and the cell assignments are the frozen model's
    * argmaxes over it. */
  private def vectorTimeTravelOracle(iters: Int): String =
    vectorSearchOracleFrom(iters,
      s"""lx AS (SELECT vec_id, i, e FROM x),
         |lnrm AS (SELECT vec_id, nrm FROM nrm),
         |lasg AS (SELECT vec_id, cl FROM (
         |    SELECT vec_id, cl, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cl) AS rk
         |    FROM s$iters) WHERE rk = 1)""".stripMargin)

  /** Mirrors Similarity.qCdcVectorSearchPq: the maintained index holds PQ
    * codes (trained on the ORIGINAL corpus — frozen model; live vectors
    * re-encode against it), the query ADC-scores the probed cells'
    * candidates from their codes, shortlists 40, and exact-cosine reranks
    * from the live vectors. */
  private def vectorSearchPqOracle(iters: Int): String =
    s"""WITH $embX,
       |a0 AS (SELECT vec_id, CAST(label AS BIGINT) * 2 + vec_id % 2 AS cl FROM embeddings),
       |${kmeansRounds(iters)},
       |${liveVectorCte(iters)},
       |asgq AS (SELECT vec_id, cl,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cl) AS crk
       |         FROM s$iters),
       |probed AS (SELECT vec_id AS q_id, cl AS cell FROM asgq
       |           WHERE vec_id < 10 AND crk <= 2),
       |cand AS (SELECT p.q_id, a.vec_id FROM probed p
       |         JOIN lasg a ON a.cl = p.cell AND a.vec_id <> p.q_id),
       |px AS (SELECT vec_id, (i - 1) % 16 AS j, (i - 1) // 16 + 1 AS li, e FROM x),
       |pa0 AS (SELECT DISTINCT vec_id, j, CAST((vec_id + j) % 32 AS BIGINT) AS cl FROM px),
       |${pqRounds(3, 4)},
       |lpx AS (SELECT vec_id, (i - 1) % 16 AS j, (i - 1) // 16 + 1 AS li, e FROM lx),
       |lpd AS (SELECT lpx.vec_id, lpx.j, c.cl, sum(lpx.e * c.c) AS d
       |        FROM lpx JOIN pc3 c ON c.j = lpx.j AND c.li = lpx.li GROUP BY 1, 2, 3),
       |lps AS (SELECT d.vec_id, d.j, d.cl, round(d.d - n.csq / 2, 6) AS key
       |        FROM lpd d JOIN pn3 n ON n.j = d.j AND n.cl = d.cl),
       |lcode AS (SELECT vec_id, j, cl FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY key DESC, cl) AS rk FROM lps)
       |  WHERE rk = 1),
       |qd AS (SELECT px.vec_id AS q_id, c.j, c.cl, round(sum(px.e * c.c), 6) AS qd
       |  FROM px JOIN pc3 c ON c.j = px.j AND c.li = px.li
       |  WHERE px.vec_id < 10 GROUP BY 1, 2, 3),
       |adc AS (SELECT cd.q_id, cd.vec_id, round(sum(CAST(q.qd AS DECIMAL(18,8))), 6) AS ascore
       |  FROM cand cd JOIN lcode a ON a.vec_id = cd.vec_id
       |  JOIN qd q ON q.q_id = cd.q_id AND q.j = a.j AND q.cl = a.cl
       |  GROUP BY 1, 2),
       |short AS (SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY ascore DESC, vec_id) AS ark
       |    FROM adc) WHERE ark <= 40),
       |rd AS (SELECT s.q_id, s.vec_id, sum(xq.e * xv.e) AS dot
       |       FROM short s
       |       JOIN x xq ON xq.vec_id = s.q_id
       |       JOIN lx xv ON xv.vec_id = s.vec_id AND xv.i = xq.i
       |       GROUP BY 1, 2),
       |rsc AS (SELECT d.q_id, d.vec_id, round(d.dot / (qa.nrm * qb.nrm), 6) AS score
       |        FROM rd d JOIN nrm qa ON qa.vec_id = d.q_id
       |        JOIN lnrm qb ON qb.vec_id = d.vec_id),
       |pr AS (SELECT q_id, vec_id, score,
       |              row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk
       |       FROM rsc)
       |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id, score
       |FROM pr WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  private def annKmeansOracle(iters: Int): String =
    s"""WITH $embX,
       |a0 AS (SELECT vec_id, CAST(label AS BIGINT) * 2 + vec_id % 2 AS cl FROM embeddings),
       |${kmeansRounds(iters)},
       |asg AS (SELECT vec_id, cl, score,
       |               row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cl) AS crk,
       |               max(score) OVER (PARTITION BY vec_id) AS best
       |        FROM s$iters),
       |cells AS (SELECT vec_id, cl AS cell FROM asg WHERE crk = 1),
       |probed AS (SELECT vec_id AS q_id, cl AS cell FROM asg
       |           WHERE vec_id < 10 AND (crk = 1 OR (crk <= 8 AND score >= best - 0.20))),
       |cand AS (SELECT p.q_id, c.vec_id FROM probed p JOIN cells c ON c.cell = p.cell AND c.vec_id <> p.q_id),
       |dots AS (SELECT cd2.q_id, cd2.vec_id, sum(xq.e * xv.e) AS dot
       |         FROM cand cd2
       |         JOIN x xq ON xq.vec_id = cd2.q_id
       |         JOIN x xv ON xv.vec_id = cd2.vec_id AND xv.i = xq.i
       |         GROUP BY 1, 2),
       |sc AS (SELECT d.q_id, d.vec_id, round(d.dot / (qa.nrm * qb.nrm), 6) AS score
       |       FROM dots d JOIN nrm qa ON qa.vec_id = d.q_id JOIN nrm qb ON qb.vec_id = d.vec_id),
       |r AS (SELECT q_id, vec_id, score,
       |             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk FROM sc)
       |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id, score FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  // whole-payload null-safe compare, mirroring Spark's struct <=> — only
  // o_totalprice can differ in the fixture, but the predicate states the
  // real semantics. Shared by the changelog-axis diff (cdc_state_diff) and
  // the committed-versions/savepoint diff (cdc_state_diff_versions).
  private val stateDiffOracle: String = {
    val changed = Changelog.payloadCols
      .map(c => s"s1.$c IS DISTINCT FROM s2.$c").mkString(" OR ")
    s"""WITH ${Changelog.oracleCte},
       |s1 AS (SELECT * FROM (
       |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
       |  FROM changelog WHERE seq <= 500000) WHERE rn = 1 AND op <> 'DELETE'),
       |s2 AS (SELECT * FROM (
       |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
       |  FROM changelog) WHERE rn = 1 AND op <> 'DELETE'),
       |d AS (SELECT coalesce(s2.id, s1.id) AS o_orderkey,
       |  CASE WHEN s1.id IS NULL THEN 'ADDED'
       |       WHEN s2.id IS NULL THEN 'REMOVED'
       |       WHEN $changed THEN 'UPDATED' END AS change,
       |  s1.o_totalprice AS old_o_totalprice, s2.o_totalprice AS new_o_totalprice
       |  FROM s1 FULL OUTER JOIN s2 ON s1.id = s2.id)
       |SELECT o_orderkey, change, old_o_totalprice, new_o_totalprice
       |FROM d WHERE change IS NOT NULL ORDER BY o_orderkey""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for the approx sketch
    * (driver records rows-only). */
  def oracleSql: Map[String, String] = Map(
    "cdc_apply" -> cdcApplySql,
    "cdc_apply_dsv2" -> cdcApplySql,
    "cdc_apply_stateful" -> cdcApplySql,
    "cdc_apply_merge" -> cdcApplySql,
    "cdc_apply_partial" -> cdcApplySql,
    "cdc_apply_stream" -> cdcApplySql,
    "cdc_apply_stream_dsv2" -> cdcApplySql,
    "cdc_apply_sink_dsv2" -> cdcApplySql,
    "cdc_pipeline_full" -> cdcApplySql,
    "cdc_mv_join" ->
      // delta-join IVM guarantee: the incrementally-maintained join-MV
      // equals the re-aggregation of the applied state joined to customer
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |state AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'DELETE')
         |SELECT c_mktsegment, count(*) AS n, ${dsum("o_totalprice", "sum_value")}
         |FROM state JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_compact" ->
      // latest event per key, op folded to UPSERT/DELETE; tombstones keep
      // the before-image payload — the compacted changelog itself
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog)
         |SELECT id, seq,
         |  CASE WHEN op = 'DELETE' THEN 'DELETE' ELSE 'UPSERT' END AS op,
         |  $payloadList
         |FROM ranked WHERE rn = 1 ORDER BY id""".stripMargin,
    "cdc_compact_apply" -> cdcApplySql,
    "cdc_bootstrap" -> cdcApplySql,
    "cdc_pipeline_dynamic_orders" -> cdcApplySql,
    // IVM guarantee for a runtime-onboarded table: the incrementally-
    // maintained per-region MV equals the aggregate over nation's fully-
    // applied state (same synthetic changelog as cdc_pipeline_dynamic)
    "cdc_pipeline_dynamic_mv" ->
      s"""WITH nt AS (
         |  SELECT CAST(n_nationkey AS BIGINT) AS k, n_name,
         |         CAST(n_regionkey AS BIGINT) AS r FROM nation),
         |cl AS (
         |  SELECT k AS id, k AS seq, 'INSERT' AS op,
         |         k AS n_nationkey, n_name, r AS n_regionkey FROM nt
         |  UNION ALL
         |  SELECT k, k + 1000000, 'UPDATE', k, n_name || ' [r2]', r
         |  FROM nt WHERE k % 3 = 0
         |  UNION ALL
         |  SELECT k, k + 2000000, 'DELETE', k, n_name, r
         |  FROM nt WHERE k % 5 = 4),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |       FROM cl)
         |SELECT n_regionkey, count(*) AS n, ${dsum("n_nationkey", "sum_value")}
         |FROM rk WHERE rn = 1 AND op <> 'DELETE'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the index invariant, for a runtime-onboarded table: after the pass
    // drains, the (value → key) index holds exactly the live nation
    // state's (n_name, key) pairs — updates moved keys between value
    // buckets, deletes removed them (same synthetic changelog)
    "cdc_pipeline_dynamic_index" ->
      """WITH nt AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS k, n_name,
        |         CAST(n_regionkey AS BIGINT) AS r FROM nation),
        |cl AS (
        |  SELECT k AS id, k AS seq, 'INSERT' AS op,
        |         k AS n_nationkey, n_name, r AS n_regionkey FROM nt
        |  UNION ALL
        |  SELECT k, k + 1000000, 'UPDATE', k, n_name || ' [r2]', r
        |  FROM nt WHERE k % 3 = 0
        |  UNION ALL
        |  SELECT k, k + 2000000, 'DELETE', k, n_name, r
        |  FROM nt WHERE k % 5 = 4),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
        |       FROM cl)
        |SELECT n_name, n_nationkey
        |FROM rk WHERE rn = 1 AND op <> 'DELETE'
        |ORDER BY n_name, n_nationkey""".stripMargin,
    // the mid-stream-onboarded nation table's final state, re-derived from
    // the nation fixture under fromNation's deterministic rules
    "cdc_pipeline_dynamic" ->
      """WITH nt AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS k, n_name,
        |         CAST(n_regionkey AS BIGINT) AS r FROM nation),
        |cl AS (
        |  SELECT k AS id, k AS seq, 'INSERT' AS op,
        |         k AS n_nationkey, n_name, r AS n_regionkey FROM nt
        |  UNION ALL
        |  SELECT k, k + 1000000, 'UPDATE', k, n_name || ' [r2]', r
        |  FROM nt WHERE k % 3 = 0
        |  UNION ALL
        |  SELECT k, k + 2000000, 'DELETE', k, n_name, r
        |  FROM nt WHERE k % 5 = 4),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
        |       FROM cl)
        |SELECT n_nationkey, n_name, n_regionkey
        |FROM rk WHERE rn = 1 AND op <> 'DELETE' ORDER BY n_nationkey""".stripMargin,
    "cdc_apply_txn" -> txnOracle,
    "cdc_apply_txn_stream" -> txnOracle,
    "cdc_scd2" -> scd2Oracle,
    "cdc_scd2_stream" -> scd2Oracle,
    "cdc_mv_join_bidi" ->
      // bidirectional IVM guarantee: the maintained MV equals revenue per
      // segment over BOTH fully-applied states joined
      s"""WITH ${Changelog.oracleCte},
         |${Changelog.customerSegMoveOracleCte},
         |oranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |ostate AS (SELECT * FROM oranked WHERE rn = 1 AND op <> 'DELETE'),
         |cranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM c_changelog),
         |cstate AS (SELECT * FROM cranked WHERE rn = 1 AND op <> 'DELETE')
         |SELECT c.c_mktsegment, count(*) AS n, ${dsum("o.o_totalprice", "sum_value")}
         |FROM ostate o JOIN cstate c ON o.o_custkey = c.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_apply_truncate" -> truncateOracle,
    "cdc_apply_truncate_stream" -> truncateOracle,
    "cdc_pipeline_truncate" -> truncateOracle,
    // restore-then-resume ≡ never restored; the restored-vs-asof gate
    // injects aliens before the tail re-applies
    "cdc_savepoint_restore" -> cdcApplySql,
    "cdc_savepoint_all" ->
      // the pre-truncate boundary the epoch-0 savepoint pinned: the insert
      // phase IS the state (one INSERT per key, nothing superseded yet);
      // the query's cross-table gates inject alien rows on any
      // state/index/MV disagreement, so coherence is what the hash checks
      s"""WITH ${Changelog.oracleCte}
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |       o_orderdate, o_orderpriority
         |FROM changelog WHERE op = 'INSERT' ORDER BY o_orderkey""".stripMargin,
    "cdc_pipeline_truncate_mv" ->
      // truncate-aware IVM: after the fence batch debits every killed
      // row's contribution, the maintained MV equals the aggregate over
      // the post-truncate state
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog WHERE seq > 1000000)
         |SELECT o_orderstatus, count(*) AS n, ${dsum("o_totalprice", "sum_value")}
         |FROM ranked WHERE rn = 1 AND op <> 'DELETE'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_mv_agg" ->
      // the IVM guarantee: the incrementally-maintained MV equals the
      // aggregate recomputed over the fully-applied state
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |state AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'DELETE')
         |SELECT o_orderstatus, count(*) AS n, ${dsum("o_totalprice", "sum_value")}
         |FROM state GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_secondary_index" ->
      // the index invariant: after the stream drains, the (value → key)
      // table holds exactly the live state's (status, key) pairs
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |state AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'DELETE')
         |SELECT o_orderstatus, id AS o_orderkey FROM state ORDER BY 1, 2""".stripMargin,
    "cdc_op_counts" ->
      s"""WITH ${Changelog.oracleCte}
         |SELECT "table", op, count(*) AS "count" FROM changelog
         |GROUP BY "table", op ORDER BY "table", op""".stripMargin,
    "cdc_state_diff" -> stateDiffOracle,
    "cdc_state_diff_versions" -> stateDiffOracle,

    "stream_static_join" ->
      s"""SELECT c_mktsegment, event_type, count(*) AS n, ${dsum("value", "sum_value")}
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_dedup_watermark" ->
      // the corpus is replayed twice across a batch boundary; every replay
      // falls within the delay, so the surviving set is exactly DISTINCT
      "SELECT event_id, event_type, value FROM events ORDER BY event_id",
    "cdc_ingest_pipeline" ->
      // the identical chain in SQL: rename (alias) → split → set (part 1)
      // → TRY_CAST convert (null = the processor failure) → set tag →
      // date round-trip; on_failure drop = the `ok` cut; then the
      // ordinary LWW merge over the SURVIVING events
      s"""WITH ${Changelog.dirtyOracleCte},
         |proc AS (SELECT id, seq, op, o_custkey, o_orderstatus,
         |           o_totalprice, o_orderdate,
         |           o_orderpriority AS priority,
         |           string_split(o_orderpriority, '-') AS pr_parts
         |         FROM dirty),
         |p2 AS (SELECT *, pr_parts[1] AS code_str FROM proc),
         |p3 AS (SELECT *, TRY_CAST(code_str AS BIGINT) AS code,
         |         pr_parts[2] AS tag,
         |         strftime(o_orderdate, '%Y-%m-%d') AS odate_str FROM p2),
         |p4 AS (SELECT *, CAST(odate_str AS DATE) AS o_date FROM p3),
         |ok AS (SELECT * FROM p4 WHERE op = 'DELETE' OR code IS NOT NULL),
         |ranked AS (SELECT *, row_number() OVER
         |             (PARTITION BY id ORDER BY seq DESC) AS rn FROM ok),
         |state AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'DELETE')
         |SELECT id, o_custkey, o_orderstatus, o_totalprice, priority,
         |       code, tag, o_date
         |FROM state ORDER BY id""".stripMargin,
    "cdc_insert_dedup" ->
      s"SELECT $payloadList FROM orders ORDER BY o_orderkey",
    "cdc_delete_antijoin" ->
      s"SELECT $payloadList FROM orders WHERE o_orderkey % 7 <> 0 ORDER BY o_orderkey",
    "cdc_apply_customer" -> cdcApplyCustomerSql,
    "cdc_pipeline_customer" ->
      // the customer view of the composed multi-table pass: the
      // segment-moving customer changelog applied (latest per key, deletes
      // out), dispatched from the ONE shared stream
      s"""WITH ${Changelog.customerSegMoveOracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM c_changelog)
         |SELECT ${Changelog.customerPayloadCols.mkString(", ")} FROM ranked
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY c_custkey""".stripMargin,
    "cdc_apply_customer_dsv2" ->
      // the composed pass's customer view: the SEGMENT-MOVING customer
      // changelog (the multi-table fixture) applied — same oracle shape as
      // cdc_pipeline_customer, independently re-derived here
      s"""WITH ${Changelog.customerSegMoveOracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM c_changelog)
         |SELECT ${Changelog.customerPayloadCols.mkString(", ")} FROM ranked
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY c_custkey""".stripMargin,
    "cdc_decode_props" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_asof_join" ->
      """WITH l AS (SELECT user_id, event_id, event_id AS o FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, event_id AS signup_event, event_id AS o FROM events WHERE event_type = 'signup'),
        |j AS (SELECT l.user_id, l.event_id, r.signup_event,
        |      row_number() OVER (PARTITION BY l.user_id, l.event_id ORDER BY r.o DESC) AS rn
        |      FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.o <= l.o)
        |SELECT user_id, event_id, signup_event FROM j WHERE rn = 1 ORDER BY user_id, event_id""".stripMargin,
    "cdc_latest_per_key" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, event_type, value FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity", "sum_qty")},
         |  ${dsum("l_extendedprice", "sum_base_price")},
         |  ${dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue" ->
      s"""SELECT l_orderkey, ${dsum("l_extendedprice * (1 - l_discount)", "revenue")}
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      s"""SELECT r_name, n_name, ${dsum("l_extendedprice * (1 - l_discount)", "revenue")},
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
         |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
         |  count(*) AS n, ${dsum("l_quantity", "sum_qty")}
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
         |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
         |  count(*) AS n, ${dsum("o_totalprice", "sum_price")}
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_window_running" ->
      """SELECT user_id, event_id,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,4))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_window_lag" ->
      """SELECT user_id, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_window_range" ->
      """SELECT user_id, event_id,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,4))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS rolling_30m
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_window_rank_stats" ->
      """SELECT user_id, event_id,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_topk_per_group" -> topkOracle,
    "q_setops" ->
      """WITH w AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
        |b AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |o AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT custkey FROM (
        |  (SELECT custkey FROM w INTERSECT SELECT custkey FROM b)
        |  EXCEPT SELECT custkey FROM o)
        |ORDER BY custkey""".stripMargin,
    "q_scalar_string" ->
      """SELECT p_partkey, lower(p_name) AS name_lower,
        |  length(p_name) AS name_len,
        |  substr(p_type, 1, 5) AS type_prefix,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
        |  CAST(levenshtein(p_brand, 'Brand#13') AS BIGINT) AS brand_dist
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_json_extract" ->
      """WITH e AS (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM e WHERE k IS NOT NULL GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_has_child" ->
      // has_child score_mode sum over the LIVE orders state: children
      // group on the parent key, decimal-exact sum round-2, parents join
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |state AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'DELETE'),
         |kids AS (SELECT o_custkey AS c_custkey, count(*) AS n_children,
         |           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS score
         |         FROM state WHERE o_orderstatus = 'O'
         |         GROUP BY 1 HAVING count(*) >= 2),
         |sc AS (SELECT k.c_custkey, c.c_mktsegment, k.n_children, k.score
         |       FROM kids k JOIN customer c USING (c_custkey)),
         |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, c_custkey) AS rk FROM sc)
         |SELECT CAST(rk AS BIGINT) AS rk, c_custkey, c_mktsegment, n_children, score
         |FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin,
    "q_has_parent" ->
      // has_parent (score: false — the ES default): live child orders cut
      // to qualifying parents, ranked by their own sort field
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |state AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'DELETE'),
         |ch AS (SELECT o_orderkey, o_custkey, o_totalprice FROM state
         |       WHERE o_custkey IN (SELECT c_custkey FROM customer
         |                           WHERE c_mktsegment = 'BUILDING')),
         |r AS (SELECT *, row_number() OVER
         |        (ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM ch)
         |SELECT CAST(rk AS BIGINT) AS rk, o_orderkey, o_custkey, o_totalprice
         |FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin,
    "q_nested_match" ->
      // nested = ONE event satisfies both conditions; flat = each finds
      // its own event. Report: the flat match set with nested verdicts
      """WITH n AS (SELECT user_id,
        |  CAST(max(CASE WHEN event_type = 'click' AND value >= 300.0
        |               THEN 1 ELSE 0 END) AS BIGINT) AS nested_match,
        |  CAST(CASE WHEN max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1
        |             AND max(CASE WHEN value >= 300.0 THEN 1 ELSE 0 END) = 1
        |        THEN 1 ELSE 0 END AS BIGINT) AS flat_match
        |FROM events GROUP BY 1)
        |SELECT user_id, nested_match, flat_match FROM n
        |WHERE flat_match = 1 ORDER BY user_id""".stripMargin,
    "q_nested_inner_hits" ->
      // inner_hits: matching elements of nested-matching parents, ranked
      // by value desc (ties on event_type), top 3 per parent
      """WITH h AS (SELECT user_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id
        |                     ORDER BY value DESC, event_type) AS hit_rank
        |FROM events WHERE event_type = 'click' AND value >= 300.0)
        |SELECT user_id, CAST(hit_rank AS BIGINT) AS hit_rank, event_type, value
        |FROM h WHERE hit_rank <= 3 ORDER BY user_id, hit_rank""".stripMargin,
    "q_nested_agg" ->
      // nested agg: parent scope (≥70 nested events), then terms +
      // metrics over the qualifying parents' element stream
      s"""WITH p AS (SELECT user_id FROM events GROUP BY 1 HAVING count(*) >= 70)
         |SELECT event_type, count(*) AS doc_count,
         |       ${dsum("value", "sum_value")},
         |       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
         |             / count(*), 6) AS avg_value
         |FROM events JOIN p USING (user_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_weighted_avg" ->
      // weighted_avg: decimal-exact numerator (product of decimal casts)
      // and denominator, one double divide + round-6
      """SELECT l_returnflag, count(*) AS n,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
        |                 * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |        / CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE),
        |        6) AS weighted_avg_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_date_trunc" ->
      s"""SELECT date_trunc('hour', ts) AS hour, count(*) AS n, ${dsum("value", "sum_value")}
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stats" ->
      """SELECT event_type,
        |  round(stddev_samp(value), 4) AS sd_value,
        |  round(var_samp(value), 4) AS var_value,
        |  round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_vu
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "doc_token_freq" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |SELECT tok, count(*) AS freq FROM t GROUP BY tok
        |ORDER BY freq DESC, tok LIMIT 30""".stripMargin,
    "q_date_arith" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mth, day(o_orderdate) AS dom,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_ref
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_bucketed_join" ->
      s"""SELECT o_orderpriority, count(*) AS n, ${dsum("l_extendedprice", "revenue")}
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tumbling_window" -> tumblingOracle,
    "stream_tumbling_window" -> tumblingOracle,
    "stream_dedup" ->
      """WITH f AS (SELECT DISTINCT source, md5(lower(text)) AS fp FROM documents)
        |SELECT source, count(*) AS n_distinct FROM f GROUP BY source ORDER BY source""".stripMargin,
    "q_sliding_window" -> slidingOracle,
    "stream_sliding_window" -> slidingOracle,
    "q_scalar_math" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  round(sqrt(l_extendedprice), 6) AS sqrt_price,
        |  abs(l_discount - 0.05) AS abs_disc,
        |  CAST(floor(l_quantity) AS BIGINT) AS floor_qty,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_disc,
        |  l_tax * l_tax AS tax_sq
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_map_funcs" ->
      """SELECT event_id, CAST(cardinality(m) AS BIGINT) AS n_keys, (m['type'])[1] AS type_val,
        |  array_to_string(map_keys(m), ',') AS keys,
        |  array_to_string(map_values(m), ',') AS vals
        |FROM (SELECT event_id,
        |        MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)} AS m
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
        |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_dim,
        |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 2) AS p50,
        |  round(quantile_cont(value, 0.9), 2) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_outer_join" ->
      s"""SELECT c_custkey, count(o_orderkey) AS n_orders,
         |  ${dsum("coalesce(o_totalprice, 0)", "total_spent")}
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_topk_agg" -> topkOracle,
    "cdc_time_travel" ->
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog WHERE seq <= 1500000)
         |SELECT $payloadList FROM ranked
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY o_orderkey""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_correlated_subquery" ->
      """SELECT o_orderkey, o_totalprice,
        |  (SELECT count(1) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
        |FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,
    "q_semijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q_window_lead" ->
      """SELECT user_id, event_id,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
        |  first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
        |  last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_array_agg" ->
      """SELECT user_id, string_agg(event_type, ',' ORDER BY event_type) AS types,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_session_window" -> sessionOracle,
    "stream_session_window" -> sessionOracle,
    "stream_late_data" ->
      // same cutoff predicate the watermark enforces: late rows (the
      // event_id%10=0 set, replayed after the on-time corpus) survive only
      // if their 10-minute window ends after max(on-time ts) - the 3570 s
      // watermark delay; the sentinel the stream uses to finalize windows
      // exists only stream-side and its window is never emitted
      s"""WITH m AS (SELECT max(ts) AS mx FROM events WHERE event_id % 10 <> 0),
         |kept AS (
         |  SELECT e.ts, e.event_type, e.value FROM events e, m
         |  WHERE e.event_id % 10 <> 0
         |     OR make_timestamp((epoch_us(e.ts) // 600000000 + 1) * 600000000)
         |          > mx - INTERVAL 3570 SECOND
         |)
         |SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS w_start,
         |  event_type, count(*) AS n, ${dsum("value", "sum_value")}
         |FROM kept GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "doc_text_stats" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(length(text)) AS min_len, max(length(text)) AS max_len,
        |  CAST(sum(length(string_split(text, ' '))) AS BIGINT) AS sum_words
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "doc_token_count" ->
      """SELECT doc_id, CAST(length(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(length(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_lang_id" -> {
      val hitCols = langWords.toSeq.sortBy(_._1)
        .map { case (l, ws) => s"${hitsSql(ws)} AS h_$l" }.mkString(",\n  ")
      val m = "greatest(h_de, h_en, h_es, h_fr)"
      s"""WITH h AS (SELECT doc_id, lang,
         |  $hitCols
         |FROM documents),
         |p AS (SELECT lang,
         |  CASE WHEN $m = 0 THEN 'und'
         |       WHEN h_de = $m THEN 'de'
         |       WHEN h_en = $m THEN 'en'
         |       WHEN h_es = $m THEN 'es'
         |       ELSE 'fr' END AS pred
         |FROM h)
         |SELECT lang, pred, count(*) AS "count" FROM p GROUP BY lang, pred ORDER BY lang, pred""".stripMargin
    },
    "doc_quality" -> {
      val stops = hitsSql(stopEn)
      s"""SELECT doc_id,
         |  CAST(length(string_split(text, ' ')) AS BIGINT) AS n_words,
         |  round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text) * 10000.0) / 10000.0 AS alpha_ratio,
         |  round(CAST($stops AS DOUBLE) / length(string_split(text, ' ')) * 10000.0) / 10000.0 AS stop_ratio,
         |  round(least(CAST(length(string_split(text, ' ')) AS DOUBLE) / 100, 1.0) * 5
         |      + least(CAST($stops AS DOUBLE) / 10, 1.0) * 5, 2) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "doc_repetition" ->
      // relational re-derivation of the per-row array expressions: word
      // counts → mode fraction; lead() windows → n-grams → distinct/total
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2),
        |topw AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |  round(CAST(max(c) AS DOUBLE) / sum(c) * 1000000.0) / 1000000.0 AS top_word_frac
        |  FROM wc GROUP BY 1),
        |g2 AS (SELECT doc_id, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |  FROM words),
        |d2 AS (SELECT doc_id, round((1 - CAST(count(DISTINCT g) AS DOUBLE) / count(g)) * 1000000.0) / 1000000.0 AS dup_2gram_frac
        |  FROM g2 WHERE g IS NOT NULL GROUP BY 1),
        |g3 AS (SELECT doc_id, w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS g
        |  FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
        |d3 AS (SELECT doc_id, round((1 - CAST(count(DISTINCT g) AS DOUBLE) / count(g)) * 1000000.0) / 1000000.0 AS dup_3gram_frac
        |  FROM g3 WHERE g IS NOT NULL GROUP BY 1)
        |SELECT doc_id, n_words, top_word_frac,
        |  coalesce(dup_2gram_frac, 0.0) AS dup_2gram_frac,
        |  coalesce(dup_3gram_frac, 0.0) AS dup_3gram_frac,
        |  CAST(top_word_frac > 0.12 OR coalesce(dup_2gram_frac, 0.0) > 0.05 AS BIGINT) AS repetitive
        |FROM topw LEFT JOIN d2 USING (doc_id) LEFT JOIN d3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "doc_exact_dedup" ->
      """SELECT md5(lower(text)) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "doc_dedup_stats" ->
      """WITH f AS (SELECT source, md5(lower(text)) AS fp FROM documents)
        |SELECT source, count(*) AS n_docs, count(DISTINCT fp) AS n_distinct,
        |  count(*) - count(DISTINCT fp) AS n_dup_rows
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "doc_rolling_fp" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 6) AS BIGINT) AS th,
        |    CASE pos % 5 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 WHEN 3 THEN 29791 ELSE 923521 END AS weight
        |  FROM t)
        |SELECT doc_id, CAST(sum(th * weight) % 1000000007 AS BIGINT) AS fingerprint,
        |  count(*) AS n_tokens
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "doc_minhash_lsh" -> minhashOracle(n = 3, k = 12, rows = 2, threshold = 0.4),
    "doc_dup_clusters" -> {
      // connected components in SQL: undirected transitive closure via
      // recursive CTE over the same minhash pairs, cluster = min reachable id
      val pairsSql = minhashOracle(n = 3, k = 12, rows = 2, threshold = 0.4)
      s"""WITH RECURSIVE p AS ($pairsSql),
         |edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         |SELECT a AS doc_id, least(a, min(b)) AS cluster
         |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin
    },
    "doc_dup_drop_list" -> {
      // the clusters oracle minus the canonical (min-id) member per cluster
      val pairsSql = minhashOracle(n = 3, k = 12, rows = 2, threshold = 0.4)
      s"""WITH RECURSIVE p AS ($pairsSql),
         |edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |c AS (SELECT a AS doc_id, least(a, min(b)) AS cluster FROM reach GROUP BY a)
         |SELECT doc_id, cluster AS keep_doc FROM c
         |WHERE doc_id <> cluster ORDER BY doc_id""".stripMargin
    },
    "doc_ngram_jaccard" ->
      """WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, lang, unnest(list_transform(generate_series(1, len(toks) - 2), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle FROM tok),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |com AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_common
        |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.lang = y.lang
        |  WHERE x.doc_id < y.doc_id GROUP BY 1, 2),
        |v AS (SELECT c.id_a, c.id_b, round(CAST(c.n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - c.n_common) * 10000.0) / 10000.0 AS jaccard
        |  FROM com c JOIN cnt ca ON ca.doc_id = c.id_a JOIN cnt cb ON cb.doc_id = c.id_b)
        |SELECT id_a, id_b, jaccard FROM v WHERE jaccard >= 0.3 ORDER BY id_a, id_b""".stripMargin,
    "doc_simhash" ->
      s"""WITH ${simhashVotes(16)}
         |SELECT doc_id, simhash FROM sh2 ORDER BY doc_id""".stripMargin,
    "doc_simhash_clusters" ->
      s"""WITH ${simhashVotes(16)}
         |SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc
         |FROM sh2 GROUP BY simhash HAVING count(*) > 1 ORDER BY simhash""".stripMargin,
    "doc_simhash_near" ->
      s"""WITH ${simhashVotes(16)},
         |d AS (SELECT simhash, count(*) AS n_docs FROM sh2 GROUP BY simhash)
         |SELECT a.simhash AS sh_a, b.simhash AS sh_b, a.n_docs AS n_a, b.n_docs AS n_b
         |FROM d a JOIN d b ON a.simhash < b.simhash AND bit_count(xor(a.simhash, b.simhash)) <= 2
         |ORDER BY sh_a, sh_b""".stripMargin,
    "emb_norm_stats" ->
      """WITH x AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS e FROM embeddings),
        |n AS (SELECT vec_id, label, round(sqrt(sum(e*e)), 6) AS nrm FROM x GROUP BY 1, 2)
        |SELECT label, count(*) AS n,
        |  round(CAST(sum(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 10000.0) / 10000.0 AS avg_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin,
    "emb_cosine_topk" ->
      s"""WITH $embX,
         |q AS (SELECT * FROM x WHERE vec_id < 10),
         |dots AS (SELECT q.vec_id AS q_id, x.vec_id AS vec_id, sum(q.e * x.e) AS dot
         |  FROM q JOIN x ON q.i = x.i AND x.vec_id <> q.vec_id GROUP BY 1, 2),
         |sc AS (SELECT d.q_id, d.vec_id, round(d.dot / (a.nrm * b.nrm), 6) AS score
         |  FROM dots d JOIN nrm a ON a.vec_id = d.q_id JOIN nrm b ON b.vec_id = d.vec_id),
         |r AS (SELECT q_id, vec_id, score, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk FROM sc)
         |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id, score FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "emb_ann_ivf" ->
      s"""WITH $embX,
         |b AS (SELECT vec_id, CAST(${bucketSql(6)} AS BIGINT) AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS q_id, bucket AS q_bucket FROM b WHERE vec_id < 10),
         |pairs AS (SELECT q.q_id, bb.vec_id, bb.bucket FROM q JOIN b bb
         |  ON bit_count(xor(bb.bucket, q.q_bucket)) <= 1 AND bb.vec_id <> q.q_id),
         |dots AS (SELECT p.q_id, p.bucket, p.vec_id, sum(xq.e * xv.e) AS dot
         |  FROM pairs p JOIN x xq ON xq.vec_id = p.q_id JOIN x xv ON xv.vec_id = p.vec_id AND xv.i = xq.i
         |  GROUP BY 1, 2, 3),
         |sc AS (SELECT d.q_id, d.bucket, d.vec_id, round(d.dot / (a.nrm * b2.nrm), 6) AS score
         |  FROM dots d JOIN nrm a ON a.vec_id = d.q_id JOIN nrm b2 ON b2.vec_id = d.vec_id),
         |r AS (SELECT q_id, bucket, vec_id, score, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk FROM sc)
         |SELECT q_id, bucket, CAST(rk AS BIGINT) AS rk, vec_id, score FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "emb_ann_centroid" ->
      s"""WITH $embX,
         |cx AS (SELECT label, generate_subscripts(embedding, 1) AS i,
         |              round(CAST(unnest(embedding) AS DOUBLE), 6) AS e FROM embeddings),
         |cent AS (SELECT CAST(label AS BIGINT) AS clabel, CAST(i AS BIGINT) AS i,
         |                round(CAST(sum(CAST(e AS DECIMAL(18,8))) AS DOUBLE) / count(*) * 1000000.0) / 1000000.0 AS c
         |         FROM cx GROUP BY 1, 2),
         |cnrm AS (SELECT clabel, sqrt(sum(c*c)) AS cnrm FROM cent GROUP BY 1),
         |cdot AS (SELECT x.vec_id, ct.clabel, sum(x.e * ct.c) AS d
         |         FROM x JOIN cent ct ON ct.i = x.i GROUP BY 1, 2),
         |cs AS (SELECT cd.vec_id, cd.clabel, round(cd.d / (n.nrm * cn.cnrm), 6) AS cscore
         |       FROM cdot cd JOIN nrm n ON n.vec_id = cd.vec_id JOIN cnrm cn ON cn.clabel = cd.clabel),
         |asg AS (SELECT vec_id, clabel, cscore,
         |               row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, clabel) AS crk
         |        FROM cs),
         |cells AS (SELECT vec_id, clabel AS cell FROM asg WHERE crk = 1),
         |probed AS (SELECT vec_id AS q_id, clabel AS cell FROM asg WHERE vec_id < 10 AND crk <= 2),
         |cand AS (SELECT p.q_id, c.vec_id FROM probed p JOIN cells c ON c.cell = p.cell AND c.vec_id <> p.q_id),
         |dots AS (SELECT cd2.q_id, cd2.vec_id, sum(xq.e * xv.e) AS dot
         |         FROM cand cd2
         |         JOIN x xq ON xq.vec_id = cd2.q_id
         |         JOIN x xv ON xv.vec_id = cd2.vec_id AND xv.i = xq.i
         |         GROUP BY 1, 2),
         |sc AS (SELECT d.q_id, d.vec_id, round(d.dot / (a.nrm * b.nrm), 6) AS score
         |       FROM dots d JOIN nrm a ON a.vec_id = d.q_id JOIN nrm b ON b.vec_id = d.vec_id),
         |r AS (SELECT q_id, vec_id, score,
         |             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk FROM sc)
         |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id, score FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "emb_near_dup" ->
      s"""WITH $embX,
         |b AS (SELECT vec_id, CAST(${bucketSql(4)} AS BIGINT) AS bucket FROM embeddings),
         |pairs AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id),
         |dots AS (SELECT p.id_a, p.id_b, sum(xa.e * xb.e) AS dot
         |  FROM pairs p JOIN x xa ON xa.vec_id = p.id_a JOIN x xb ON xb.vec_id = p.id_b AND xb.i = xa.i
         |  GROUP BY 1, 2),
         |sc AS (SELECT d.id_a, d.id_b, round(d.dot / (na.nrm * nb.nrm), 6) AS score
         |  FROM dots d JOIN nrm na ON na.vec_id = d.id_a JOIN nrm nb ON nb.vec_id = d.id_b)
         |SELECT id_a, id_b, score FROM sc WHERE score >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    "emb_sq8_topk" ->
      // SQ8: per-dim ranges → codes → dequantized approximate rank →
      // shortlist 40 → exact raw rerank, all re-derived from scratch
      s"""WITH $embX,
         |mm AS (SELECT i, min(e) AS mn, max(e) AS mx FROM x GROUP BY 1),
         |dq AS (SELECT x.vec_id, x.i,
         |         mn + (CASE WHEN mx = mn THEN 0
         |               ELSE round((x.e - mn) * 255 / (mx - mn)) END)
         |           * (mx - mn) / 255 AS v
         |       FROM x JOIN mm USING (i)),
         |dqn AS (SELECT vec_id, sqrt(sum(v*v)) AS dqnrm FROM dq GROUP BY 1),
         |ad AS (SELECT xq.vec_id AS q_id, dq.vec_id, sum(xq.e * dq.v) AS dot
         |       FROM x xq JOIN dq ON dq.i = xq.i AND dq.vec_id <> xq.vec_id
         |       WHERE xq.vec_id < 10 GROUP BY 1, 2),
         |ap AS (SELECT a.q_id, a.vec_id, round(a.dot / (n.nrm * d.dqnrm), 6) AS ascore
         |       FROM ad a JOIN nrm n ON n.vec_id = a.q_id
         |       JOIN dqn d ON d.vec_id = a.vec_id),
         |sl AS (SELECT q_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY ascore DESC, vec_id) AS ark
         |    FROM ap) WHERE ark <= 40),
         |ed AS (SELECT s.q_id, s.vec_id, sum(xa.e * xb.e) AS dot
         |       FROM sl s JOIN x xa ON xa.vec_id = s.q_id
         |       JOIN x xb ON xb.vec_id = s.vec_id AND xb.i = xa.i
         |       GROUP BY 1, 2),
         |sc AS (SELECT e.q_id, e.vec_id, round(e.dot / (na.nrm * nb.nrm), 6) AS score
         |       FROM ed e JOIN nrm na ON na.vec_id = e.q_id
         |       JOIN nrm nb ON nb.vec_id = e.vec_id),
         |r AS (SELECT q_id, vec_id, score, row_number() OVER
         |        (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk FROM sc)
         |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id, score
         |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "emb_semantic_dedup" ->
      // the staged quantizer re-derived from scratch (kmeansRounds — the
      // emb_kmeans discipline), pairs blocked within final-round clusters,
      // components via recursive CTE, canonical = min reachable id
      s"""WITH RECURSIVE $embX,
         |a0 AS (SELECT vec_id, CAST(label AS BIGINT) AS cl FROM embeddings),
         |${kmeansRounds(3)},
         |asg AS (SELECT vec_id, cl FROM a3),
         |pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |       FROM asg a JOIN asg b ON a.cl = b.cl AND a.vec_id < b.vec_id),
         |dots AS (SELECT p.id_a, p.id_b, sum(xa.e * xb.e) AS dot
         |  FROM pr p JOIN x xa ON xa.vec_id = p.id_a
         |  JOIN x xb ON xb.vec_id = p.id_b AND xb.i = xa.i
         |  GROUP BY 1, 2),
         |sp AS (SELECT d.id_a, d.id_b FROM dots d
         |  JOIN nrm na ON na.vec_id = d.id_a JOIN nrm nb ON nb.vec_id = d.id_b
         |  WHERE round(d.dot / (na.nrm * nb.nrm), 6) >= 0.4),
         |edges AS (SELECT id_a AS a, id_b AS b FROM sp UNION SELECT id_b, id_a FROM sp),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |c AS (SELECT a AS vec_id, least(a, min(b)) AS keep_id FROM reach GROUP BY a)
         |SELECT c.vec_id, c.keep_id, asg.cl AS cell FROM c JOIN asg USING (vec_id)
         |WHERE c.vec_id <> c.keep_id ORDER BY c.vec_id""".stripMargin,
    "q_skew_salted" ->
      s"""SELECT event_type AS key, count(*) AS n, ${dsum("value", "sum_value")}
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_skew_join" ->
      """WITH dim AS (SELECT event_type, (min(value) + max(value)) / 2 AS mid
        |             FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |       count(CASE WHEN e.value >= d.mid THEN 1 END) AS n_above
        |FROM events e JOIN dim d ON e.event_type = d.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_full_outer" ->
      """WITH od AS (SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n_orders
        |            FROM orders GROUP BY 1),
        |     ed AS (SELECT date_trunc('day', ts) AS day, count(*) AS n_events
        |            FROM events GROUP BY 1)
        |SELECT coalesce(od.day, ed.day) AS day,
        |       coalesce(n_orders, 0) AS n_orders,
        |       coalesce(n_events, 0) AS n_events
        |FROM od FULL OUTER JOIN ed ON od.day = ed.day
        |ORDER BY 1""".stripMargin,
    "emb_kmeans" -> kmeansOracle(3),
    "emb_ann_kmeans" -> annKmeansOracle(3),
    "emb_pq_topk" -> pqOracle(iters = 3, m = 16, k = 32, nQueries = 10, topK = 5,
      shortlist = 40, interleave = true),
    "emb_ann_ivfpq" -> ivfPqOracle(iters = 6, seedSplit = 6, m = 16, k = 32,
      pqIters = 3, nQueries = 10, topK = 5, shortlist = 64,
      probeMargin = 0.60, maxProbes = 14),
    "emb_centroids" ->
      """WITH x AS (SELECT label, generate_subscripts(embedding, 1) AS i,
        |                  round(CAST(unnest(embedding) AS DOUBLE), 6) AS e
        |           FROM embeddings)
        |SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
        |       round(CAST(sum(CAST(e AS DECIMAL(18,8))) AS DOUBLE) / count(*) * 1000000.0) / 1000000.0 AS c
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_interval_join" ->
      """SELECT p.user_id, p.event_id AS purchase_event, s.event_id AS signup_event
        |FROM events p JOIN events s
        |  ON p.user_id = s.user_id AND p.event_type = 'purchase' AND s.event_type = 'signup'
        | AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 1 DAY
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_bloom_semijoin" ->
      s"""SELECT l_returnflag, count(*) AS n, ${dsum("l_quantity", "sum_qty")}
         |FROM lineitem
         |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_range_join" ->
      s"""WITH m AS (SELECT DISTINCT date_trunc('month', ts) AS w_start FROM events)
         |SELECT w_start, count(*) AS n, ${dsum("value", "sum_value")}
         |FROM m JOIN events e ON e.ts >= m.w_start AND e.ts < m.w_start + INTERVAL 7 DAY
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "doc_decontam" ->
      // shingles joined as strings (Spark joins their xxhash64 — same
      // convention as doc_ngram_jaccard); DISTINCT mirrors the generator's
      // one-pass per-doc dedup
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |  unnest(list_transform(generate_series(1, len(toks) - 4),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])) AS shingle
        |  FROM tok),
        |b AS (SELECT doc_id,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 AS bucket
        |  FROM documents),
        |train AS (SELECT DISTINCT s.shingle FROM sh s JOIN b USING (doc_id) WHERE b.bucket < 80),
        |test AS (SELECT s.doc_id, s.shingle FROM sh s JOIN b USING (doc_id) WHERE b.bucket >= 90),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM test GROUP BY 1),
        |con AS (SELECT doc_id, count(*) AS n_contam FROM test
        |        WHERE shingle IN (SELECT shingle FROM train) GROUP BY 1)
        |SELECT c.doc_id, c.n_sh, o.n_contam,
        |       round(CAST(o.n_contam AS DOUBLE) / c.n_sh * 10000.0) / 10000.0 AS contam_rate
        |FROM cnt c JOIN con o USING (doc_id) ORDER BY c.doc_id""".stripMargin,
    "doc_stratified_sample" ->
      // en capped at 10%, every other language sampled at 30% — the rate
      // map mirrored as a CASE (Spark carries it as a broadcast table)
      """WITH x AS (
        |  SELECT lang,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 AS bucket,
        |         CASE WHEN lang = 'en' THEN 10 ELSE 30 END AS rate
        |  FROM documents)
        |SELECT lang, CAST(rate AS BIGINT) AS rate, count(*) AS n_total,
        |       CAST(sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM x GROUP BY lang, rate ORDER BY lang""".stripMargin,
    "doc_pii_scrub" ->
      // PII scrub: the derived-PII layer + RE2∩Java-regex patterns; the
      // 'g' flag matches Spark's replace-all default
      """WITH wp AS (SELECT doc_id,
        |       text ||
        |       CASE WHEN doc_id % 3 = 0
        |            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |            ELSE '' END ||
        |       CASE WHEN doc_id % 4 = 0
        |            THEN ' ref ' || CAST((doc_id * 7919) % 100000 AS VARCHAR)
        |            ELSE '' END AS text
        |     FROM documents),
        |sc AS (SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, 'user[0-9]+@example[.]com')) AS BIGINT) AS n_emails,
        |       CAST(len(regexp_extract_all(text, 'ref [0-9]+')) AS BIGINT) AS n_codes,
        |       regexp_replace(regexp_replace(text, 'user[0-9]+@example[.]com', '<EMAIL>', 'g'),
        |         'ref [0-9]+', 'ref <ID>', 'g') AS clean
        |     FROM wp)
        |SELECT doc_id, n_emails, n_codes,
        |       CAST(len(clean) AS BIGINT) AS clean_len, md5(clean) AS clean_md5
        |FROM sc ORDER BY doc_id""".stripMargin,
    "doc_sample_hash" ->
      """SELECT doc_id, lang, bucket FROM (
        |  SELECT doc_id, lang,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |WHERE bucket < 10 ORDER BY doc_id""".stripMargin,
    "doc_train_split" ->
      """SELECT lang,
        |       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
        |       count(*) AS n
        |FROM (SELECT lang,
        |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 AS b
        |      FROM documents)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "doc_quality_filter" ->
      s"""SELECT doc_id, lang,
         |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |       CAST(${hitsSql(stopEn)} AS BIGINT) AS stop_hits
         |FROM documents
         |WHERE len(string_split(text, ' ')) >= 30
         |  AND ${hitsSql(stopEn)} >= 2
         |  AND length(text) = n_chars
         |ORDER BY doc_id""".stripMargin,
    "doc_length_hist" ->
      """SELECT lang, CAST((len(string_split(text, ' ')) // 10) * 10 AS BIGINT) AS bucket,
        |       count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "doc_split_leakage" ->
      s"""WITH ${simhashVotes(16)},
         |a AS (SELECT doc_id, simhash,
         |        CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 < 80 THEN 'train'
         |             WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 < 90 THEN 'val'
         |             ELSE 'test' END AS split
         |      FROM sh2)
         |SELECT simhash, count(*) AS n_docs, count(DISTINCT split) AS n_splits, min(doc_id) AS min_doc
         |FROM a GROUP BY 1
         |HAVING count(*) > 1 AND count(DISTINCT split) > 1
         |ORDER BY 1""".stripMargin,
    // mm oracles mirror FakeCodec's probe arithmetic: (w,h,frames) are pure
    // functions of the payload BYTE length (strlen; fixtures are ASCII but
    // bytes is what the codec sees), media_type = doc_id % 3
    "mm_media_features" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |                  'media/type' || CAST(doc_id % 3 AS VARCHAR) AS media_type,
        |                  strlen(coalesce(text, '')) AS len
        |           FROM documents)
        |SELECT media_type, count(*) AS n,
        |       round(avg(64 + len % 64) * 1000000.0) / 1000000.0 AS avg_w,
        |       round(avg(64 + len % 48) * 1000000.0) / 1000000.0 AS avg_h,
        |       CAST(sum(1 + len % 10) AS BIGINT) AS total_frames
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id, CAST(1 + strlen(coalesce(text, '')) % 10 AS BIGINT) AS nf
        |           FROM documents),
        |f AS (SELECT media_id, nf,
        |             unnest(generate_series(0, least(nf, 4) - 1)) AS i FROM m)
        |SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
        |       CAST(CASE WHEN nf <= 4 THEN i ELSE (i * nf) // 4 END AS BIGINT) AS frame_offset
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    "doc_incr_dedup" ->
      s"""WITH ${simhashVotes(16)},
         |corpus AS (SELECT * FROM sh2 WHERE doc_id < 400),
         |batch AS (SELECT * FROM sh2 WHERE doc_id >= 400),
         |in_corpus AS (
         |  SELECT doc_id, 'in_corpus' AS reason FROM batch
         |  WHERE simhash IN (SELECT simhash FROM corpus)),
         |in_batch AS (
         |  SELECT doc_id, 'in_batch' AS reason FROM (
         |    SELECT doc_id, min(doc_id) OVER (PARTITION BY simhash) AS first_id FROM batch)
         |  WHERE doc_id > first_id)
         |SELECT * FROM in_corpus UNION ALL SELECT * FROM in_batch
         |ORDER BY doc_id, reason""".stripMargin,
    "doc_pack_chunks" ->
      """WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        |           FROM documents),
        |o AS (SELECT doc_id, n_words,
        |        CAST(coalesce(sum(n_words) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
        |      FROM t)
        |SELECT doc_id, n_words, "offset", CAST("offset" // 2048 AS BIGINT) AS chunk
        |FROM o ORDER BY doc_id""".stripMargin,
    "doc_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks WHERE doc_id < 20 GROUP BY 1, 2),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(*) AS n_corpus FROM documents),
        |s AS (SELECT doc_id, tok, tf, df,
        |        round(CAST(tf AS DOUBLE) * n_corpus / df * 1000000.0) / 1000000.0 AS score
        |      FROM tf JOIN df USING (tok) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rk FROM s)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, tf, df, score
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    // hybrid retrieval: the BM25 leg (depth 20) and the cosine leg of
    // query vector 0 (depth 20) fused by RRF 1/(60+rank) — rank-only
    // rationals, decimal-summed; doc_id == vec_id in the fixture
    "doc_hybrid_search" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
         |post AS (SELECT tok, doc_id, count(*) AS tf FROM toks
         |         WHERE tok IN ('stream', 'merge', 'window') GROUP BY 1, 2),
         |df AS (SELECT tok, count(*) AS df FROM post GROUP BY 1),
         |ts AS (SELECT p.doc_id,
         |         CAST(round(
         |           ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
         |           ((CAST(tf AS DOUBLE) * 2.2) /
         |            (CAST(tf AS DOUBLE) +
         |             1.2 * ((1 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) * n_docs / sum_dl)))),
         |           6) AS DECIMAL(18,8)) AS ts
         |       FROM post p JOIN df USING (tok) JOIN dl ON dl.doc_id = p.doc_id
         |       CROSS JOIN st),
         |agg AS (SELECT doc_id, round(CAST(sum(ts) AS DOUBLE), 6) AS score
         |        FROM ts GROUP BY 1),
         |lexr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_lex
         |         FROM agg),
         |lex AS (SELECT doc_id, r_lex FROM lexr WHERE r_lex <= 20),
         |$embX,
         |qv AS (SELECT * FROM x WHERE vec_id = 0),
         |ddots AS (SELECT x.vec_id AS doc_id, sum(qv.e * x.e) AS dot
         |          FROM qv JOIN x ON qv.i = x.i AND x.vec_id <> 0 GROUP BY 1),
         |dsc AS (SELECT d.doc_id, round(d.dot / (a.nrm * b.nrm), 6) AS score
         |        FROM ddots d JOIN nrm a ON a.vec_id = 0
         |        JOIN nrm b ON b.vec_id = d.doc_id),
         |dr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_dense
         |       FROM dsc),
         |dense AS (SELECT doc_id, r_dense FROM dr WHERE r_dense <= 20),
         |f AS (SELECT coalesce(l.doc_id, d2.doc_id) AS doc_id, l.r_lex, d2.r_dense
         |      FROM lex l FULL OUTER JOIN dense d2 ON d2.doc_id = l.doc_id),
         |sc2 AS (SELECT doc_id,
         |          round(CAST(CAST(
         |            (CASE WHEN r_lex IS NOT NULL THEN round(1.0/(60+r_lex), 6) ELSE 0 END +
         |             CASE WHEN r_dense IS NOT NULL THEN round(1.0/(60+r_dense), 6) ELSE 0 END)
         |            AS DECIMAL(18,8)) AS DOUBLE), 6) AS score,
         |          r_lex, r_dense FROM f),
         |rr2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk FROM sc2)
         |SELECT CAST(rk AS BIGINT) AS rk, doc_id, score, r_lex, r_dense
         |FROM rr2 WHERE rk <= 10 ORDER BY rk""".stripMargin,
    // the CDC-maintained VECTOR index: final cell assignment = quantizing
    // the live vectors against the frozen trained centroids; search =
    // 2-probe ANN over the live vectors in the probed cells
    "cdc_vector_index" -> vectorIndexOracle(3),
    "cdc_vector_search" -> vectorSearchOracle(3),
    "cdc_vector_search_pq" -> vectorSearchPqOracle(3),
    // the CDC-maintained text index: final postings = postings of the
    // LIVE document state under the synthetic documents changelog
    // (mirrors Changelog.fromDocuments' deterministic rules)
    "cdc_text_index" ->
      s"""WITH $docsChangelogCte
         |SELECT tok, doc_id, count(*) AS tf FROM toks
         |GROUP BY 1, 2 ORDER BY tok, doc_id""".stripMargin,
    // BM25 served from the maintained index = BM25 over the live docs
    // (shared verbatim by cdc_text_bootstrap: the bootstrapped index must
    // answer identically to the replay-built one)
    "cdc_text_search" -> cdcTextSearchSql,
    "cdc_multi_match" -> cdcMultiMatchSql,
    // the analyzed-field match: the shared BM25 body over the analyzer
    // view's tokens, query terms pre-analyzed by the same chain
    // ('streams','the','merges' → 'stream','merge')
    "cdc_analyzer_search" -> bm25Sql(docsAnalyzedCte, 1,
      Seq("stream", "merge"), Seq.empty),
    // alias-served search ≡ the maintained search (the swap's pre/post
    // gates inject alien rows on any divergence)
    "cdc_text_reindex_alias" -> cdcTextSearchSql,
    "cdc_text_bootstrap" -> cdcTextSearchSql,
    // operator:and — the same scoring, docs matching all 3 terms only
    "cdc_match_and" -> cdcMatchSql(3, Seq("dup", "merge", "window")),
    // bool must/must_not: operator:and scoring over the must terms, the
    // must_not docs cut AFTER df/idf (filter context never rescores)
    "cdc_bool_search" -> cdcMatchSql(2, Seq("dup", "merge"), Seq("r2")),
    "cdc_vector_bootstrap" -> vectorSearchOracle(3),
    "cdc_vector_time_travel" -> vectorTimeTravelOracle(3),
    "cdc_term_filter" -> bm25Sql(docsChangelogCte, 1,
      Seq("stream", "merge", "window"), Seq.empty, Seq("src3", "src7")),
    // the range filter cuts on the LIVE doc length (bm25Sql's dl CTE);
    // filter context — the scoring body stays the shared copy
    "cdc_range_filter" -> bm25Sql(docsChangelogCte, 1,
      Seq("stream", "merge", "window"), Seq.empty,
      extraCut = "p.doc_id IN (SELECT doc_id FROM dl WHERE dl >= 40 AND dl < 60)"),
    // regexp: the anchored expansion as a regexp_full_match predicate —
    // every expanded term scored with its own df/idf
    "cdc_regexp_query" -> bm25Sql(docsChangelogCte, 1,
      Seq.empty, Seq.empty,
      termsWhere = "regexp_full_match(tok, 's[ct].*')"),
    // terms_set: the per-doc required count (1 + doc_id % 3) cuts each
    // candidate against its OWN matched-term count, after scoring
    "cdc_terms_set" -> bm25Sql(docsChangelogCte, 1,
      Seq("stream", "merge", "window", "slow"), Seq.empty,
      tail = """,ts2 AS (SELECT doc_id, n_t, 1 + doc_id % 3 AS required, score
         |        FROM agg WHERE n_t >= 1 + doc_id % 3),
         |r2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk2 FROM ts2)
         |SELECT CAST(rk2 AS BIGINT) AS rk, doc_id, n_t,
         |       CAST(required AS BIGINT) AS required, score
         |FROM r2 WHERE rk2 <= 10 ORDER BY rk2""".stripMargin),
    // geo_bounding_box: the derived centi-degree point (identical integer
    // hash + the same /100.0 − offset double text) inside the box, in
    // filter context — never rescoring
    "cdc_geo_bounding_box" -> bm25Sql(docsChangelogCte, 1,
      Seq("stream", "merge", "window"), Seq.empty,
      extraCut =
        """CAST((p.doc_id * 7919) % 18000 AS DOUBLE) / 100.0 - 90.0 >= 0.0
          |         AND CAST((p.doc_id * 7919) % 18000 AS DOUBLE) / 100.0 - 90.0 < 60.0
          |         AND CAST((p.doc_id * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0 >= -90.0
          |         AND CAST((p.doc_id * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0 < 90.0""".stripMargin),
    "cdc_explain" ->
      // _explain: the shared scoring CTE text with the per-term factors
      // PROJECTED (idf round-6, contribution as the round-6 decimal)
      // instead of discarded, cut to the top-1 hit
      s"""WITH $docsChangelogCte,
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
         |post AS (SELECT tok, doc_id, count(*) AS tf FROM toks
         |         WHERE tok IN ('stream', 'merge', 'window')
         |         GROUP BY 1, 2),
         |df AS (SELECT tok, count(*) AS df FROM post GROUP BY 1),
         |x AS (SELECT p.doc_id, p.tok, p.tf, dl.dl, df.df,
         |        round((CAST(n_docs - df AS DOUBLE) + 0.5) /
         |              (CAST(df AS DOUBLE) + 0.5), 6) AS idf,
         |        CAST(round(
         |          ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
         |          ((CAST(tf AS DOUBLE) * 2.2) /
         |           (CAST(tf AS DOUBLE) +
         |            1.2 * ((1 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) * n_docs / sum_dl)))),
         |          6) AS DECIMAL(18,8)) AS contrib
         |      FROM post p JOIN df USING (tok)
         |      JOIN dl ON dl.doc_id = p.doc_id CROSS JOIN st),
         |agg AS (SELECT doc_id, round(CAST(sum(contrib) AS DOUBLE), 6) AS score
         |        FROM x GROUP BY 1),
         |top AS (SELECT doc_id, score FROM agg
         |        ORDER BY score DESC, doc_id LIMIT 1)
         |SELECT x.doc_id, x.tok, x.tf, CAST(x.dl AS BIGINT) AS dl, x.df,
         |       x.idf, CAST(x.contrib AS DOUBLE) AS contrib, t.score
         |FROM x JOIN top t ON t.doc_id = x.doc_id
         |ORDER BY x.tok""".stripMargin,
    "cdc_geohash_grid" ->
      // geohash_grid precision 1: the 5-bit lon/lat interleave into the
      // base-32 alphabet — integer shifts/masks both engines
      s"""WITH $docsChangelogCte,
         |g AS (SELECT
         |        CAST(floor(CAST((doc_id * 104729) % 36000 AS DOUBLE) * 8 / 36000) AS BIGINT) AS lon3,
         |        CAST(floor(CAST((doc_id * 7919) % 18000 AS DOUBLE) * 4 / 18000) AS BIGINT) AS lat2
         |      FROM live),
         |c AS (SELECT substr('0123456789bcdefghjkmnpqrstuvwxyz',
         |        CAST(((lon3 >> 2) & 1) * 16 + ((lat2 >> 1) & 1) * 8 +
         |             ((lon3 >> 1) & 1) * 4 + (lat2 & 1) * 2 + (lon3 & 1)
         |             + 1 AS INT), 1) AS bucket_key
         |      FROM g),
         |b AS (SELECT bucket_key, count(*) AS doc_count FROM c GROUP BY 1),
         |r AS (SELECT *, row_number() OVER
         |        (ORDER BY doc_count DESC, bucket_key) AS rk FROM b)
         |SELECT bucket_key, doc_count FROM r WHERE rk <= 10
         |ORDER BY doc_count DESC, bucket_key""".stripMargin,
    "cdc_geotile_grid" ->
      // geotile_grid zoom 3: x = the integer lon-grid division, y = the
      // rational equirectangular row (2^z−1−⌊latIdx·2^z/18000⌋ — row 0
      // north, the tile-scheme orientation; Mercator y is libm-scoped-out)
      s"""WITH $docsChangelogCte,
         |g AS (SELECT
         |        CAST(floor(CAST((doc_id * 104729) % 36000 AS DOUBLE) * 8 / 36000) AS BIGINT) AS x,
         |        7 - CAST(floor(CAST((doc_id * 7919) % 18000 AS DOUBLE) * 8 / 18000) AS BIGINT) AS y
         |      FROM live),
         |c AS (SELECT '3/' || CAST(x AS VARCHAR) || '/' || CAST(y AS VARCHAR) AS bucket_key FROM g),
         |b AS (SELECT bucket_key, count(*) AS doc_count FROM c GROUP BY 1),
         |r AS (SELECT *, row_number() OVER
         |        (ORDER BY doc_count DESC, bucket_key) AS rk FROM b)
         |SELECT bucket_key, doc_count FROM r WHERE rk <= 10
         |ORDER BY doc_count DESC, bucket_key""".stripMargin,
    "cdc_geo_centroid" ->
      // geo_centroid under geotile zoom 1: exact integer centi-degree
      // sums, one double divide + /100 − offset, round-6 (identical text
      // to the Spark side)
      s"""WITH $docsChangelogCte,
         |g AS (SELECT
         |        CAST(floor(CAST((doc_id * 104729) % 36000 AS DOUBLE) * 2 / 36000) AS BIGINT) AS x,
         |        1 - CAST(floor(CAST((doc_id * 7919) % 18000 AS DOUBLE) * 2 / 18000) AS BIGINT) AS y,
         |        (doc_id * 7919) % 18000 AS lat_e2,
         |        (doc_id * 104729) % 36000 AS lon_e2
         |      FROM live),
         |c AS (SELECT '1/' || CAST(x AS VARCHAR) || '/' || CAST(y AS VARCHAR) AS bucket_key,
         |             lat_e2, lon_e2 FROM g)
         |SELECT bucket_key, count(*) AS doc_count,
         |       round(CAST(sum(lat_e2) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0 - 90.0, 6) AS centroid_lat,
         |       round(CAST(sum(lon_e2) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0 - 180.0, 6) AS centroid_lon
         |FROM c GROUP BY 1 ORDER BY doc_count DESC, bucket_key""".stripMargin,
    "cdc_mget" ->
      // _mget: one row per REQUESTED id; misses carry found=0, null source
      s"""WITH $docsChangelogCte,
         |req AS (SELECT CAST(unnest([1, 7, 39, 42, 300]) AS BIGINT) AS doc_id)
         |SELECT req.doc_id,
         |       CAST(CASE WHEN live.source IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS found,
         |       live.source
         |FROM req LEFT JOIN live USING (doc_id)
         |ORDER BY req.doc_id""".stripMargin,
    "cdc_prefix_search" -> bm25Sql(docsChangelogCte, 1, Seq.empty, Seq.empty,
      Seq.empty, termsWhere = "tok LIKE 's%'"),
    "cdc_wildcard_search" -> bm25Sql(docsChangelogCte, 1, Seq.empty, Seq.empty,
      Seq.empty, termsWhere = "tok LIKE '%ow%'"),
    "cdc_fuzzy_search" -> bm25Sql(docsChangelogCte, 1, Seq.empty, Seq.empty,
      Seq.empty, termsWhere = "tok IN (SELECT DISTINCT t2.tok FROM toks t2" +
        " WHERE levenshtein(t2.tok, 'strem') <= 1" +
        " OR levenshtein(t2.tok, 'window') <= 1" +
        " ORDER BY 1 LIMIT 50)"),
    "cdc_vector_filtered" -> vectorFilteredOracle(3, Seq("src3", "src7")),
    "cdc_terms_agg" ->
      s"""WITH $docsChangelogCte,
         |d AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1)
         |SELECT tok, df FROM d ORDER BY df DESC, tok LIMIT 10""".stripMargin,
    "cdc_range_agg" ->
      // ES range agg over the match set's doc length: [from, to) buckets,
      // empty ranges reported with 0 (the left join)
      s"""WITH $docsChangelogCte,
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |m AS (SELECT DISTINCT doc_id FROM toks
         |      WHERE tok IN ('stream', 'merge', 'window')),
         |b AS (SELECT CASE WHEN dl < 40 THEN 0 WHEN dl < 60 THEN 1 ELSE 2 END AS ord
         |      FROM dl JOIN m USING (doc_id)),
         |c AS (SELECT ord, count(*) AS doc_count FROM b GROUP BY 1)
         |SELECT range_key, coalesce(doc_count, 0) AS doc_count
         |FROM (VALUES (0, '*-40'), (1, '40-60'), (2, '60-*')) AS rg(ord, range_key)
         |LEFT JOIN c USING (ord) ORDER BY rg.ord""".stripMargin,
    "cdc_date_histogram" ->
      // ES date_histogram (month) over the live maintained orders store
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog)
         |SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |       count(*) AS doc_count
         |FROM ranked WHERE rn = 1 AND op <> 'DELETE'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_date_histogram_stats" ->
      // the bucket agg + stats sub-agg: metrics of the payload field per
      // month bucket. Sum folds DECIMAL(18,4) (order-independent, the
      // dsum rule); avg divides the sum's exact double image by the
      // count — identical expression text to the Spark plan
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog)
         |SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |       count(*) AS doc_count,
         |       ${dsum("o_totalprice", "sum_price")},
         |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         |             / count(*), 6) AS avg_price,
         |       min(o_totalprice) AS min_price,
         |       max(o_totalprice) AS max_price
         |FROM ranked WHERE rn = 1 AND op <> 'DELETE'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_extended_stats" ->
      // extended_stats: decimal-exact sum; the SQUARE folds as exact
      // integer cents² in DECIMAL(38,0) (DuckDB rejects the
      // DECIMAL(18)×DECIMAL(18) route); variance in doubles with
      // identical text (explicit multiply, no pow), sqrt of the
      // unrounded variance (IEEE-required op, engine-independent)
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |live AS (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |         FROM ranked WHERE rn = 1 AND op <> 'DELETE')
         |SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |       count(*) AS doc_count,
         |       ${dsum("o_totalprice", "sum_price")},
         |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         |             / count(*), 6) AS avg_price,
         |       min(o_totalprice) AS min_price,
         |       max(o_totalprice) AS max_price,
         |       CAST(sum(CAST(cents * cents AS DECIMAL(38,0))) AS DOUBLE)
         |             / 10000.0 AS sum_squares,
         |       CAST(sum(CAST(cents * cents AS DECIMAL(38,0))) AS DOUBLE)
         |             / 10000.0 / count(*)
         |             - (CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*))
         |             * (CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*)) AS variance,
         |       sqrt(CAST(sum(CAST(cents * cents AS DECIMAL(38,0))) AS DOUBLE)
         |             / 10000.0 / count(*)
         |             - (CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*))
         |             * (CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*))) AS std_deviation
         |FROM live
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_auto_date_histogram" ->
      // auto_date_histogram, target 10: the fixture span (7 years) walks
      // the {1d, 1M, 3M, 1y} ladder to the year interval — the choice is
      // data-determined; the ladder walk itself is drilled in PipelineSpec
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog)
         |SELECT '1y' AS interval, CAST(date_trunc('year', o_orderdate) AS DATE) AS bucket,
         |       count(*) AS doc_count
         |FROM ranked WHERE rn = 1 AND op <> 'DELETE'
         |GROUP BY 2 ORDER BY 2""".stripMargin,
    "cdc_sampler_agg" ->
      // sampler shard_size 200 in deterministic key order, then the
      // status terms sub-agg over the sample only
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |s AS (SELECT o_orderstatus FROM ranked
         |      WHERE rn = 1 AND op <> 'DELETE'
         |      ORDER BY o_orderkey LIMIT 200)
         |SELECT o_orderstatus, count(*) AS doc_count FROM s
         |GROUP BY 1 ORDER BY doc_count DESC, o_orderstatus""".stripMargin,
    "cdc_global_agg" ->
      // global agg: the query-scoped count beside corpus-wide metrics,
      // one conditional pass
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog)
         |SELECT count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS query_count,
         |       count(*) AS global_count,
         |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         |             / count(*), 6) AS global_avg_price
         |FROM ranked WHERE rn = 1 AND op <> 'DELETE'""".stripMargin,
    "cdc_date_histogram_percentiles" ->
      // percentiles sub-agg, exact below-threshold regime: per-bucket
      // sorted arrays, R-7 interpolation h = (n-1)·p + 1 with IDENTICAL
      // expression text to the Spark plan (same double ops, same bits)
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |             count(*) AS doc_count,
         |             list_sort(list(o_totalprice)) AS vals
         |      FROM ranked WHERE rn = 1 AND op <> 'DELETE' GROUP BY 1)
         |SELECT month, doc_count,
         |  round(vals[CAST(floor((doc_count - 1) * 0.5 + 1.0) AS INT)] +
         |        ((doc_count - 1) * 0.5 + 1.0 - floor((doc_count - 1) * 0.5 + 1.0)) *
         |        (vals[CAST(ceil((doc_count - 1) * 0.5 + 1.0) AS INT)] -
         |         vals[CAST(floor((doc_count - 1) * 0.5 + 1.0) AS INT)]), 6) AS p50,
         |  round(vals[CAST(floor((doc_count - 1) * 0.95 + 1.0) AS INT)] +
         |        ((doc_count - 1) * 0.95 + 1.0 - floor((doc_count - 1) * 0.95 + 1.0)) *
         |        (vals[CAST(ceil((doc_count - 1) * 0.95 + 1.0) AS INT)] -
         |         vals[CAST(floor((doc_count - 1) * 0.95 + 1.0) AS INT)]), 6) AS p95,
         |  round(vals[CAST(floor((doc_count - 1) * 0.99 + 1.0) AS INT)] +
         |        ((doc_count - 1) * 0.99 + 1.0 - floor((doc_count - 1) * 0.99 + 1.0)) *
         |        (vals[CAST(ceil((doc_count - 1) * 0.99 + 1.0) AS INT)] -
         |         vals[CAST(floor((doc_count - 1) * 0.99 + 1.0) AS INT)]), 6) AS p99
         |FROM b ORDER BY month""".stripMargin,
    "cdc_multi_terms_agg" ->
      // multi_terms: tuple-keyed buckets by count desc, key-tuple ties,
      // size cut after the ordering (exact one-shard ES semantics)
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog)
         |SELECT o_orderstatus, o_orderpriority, count(*) AS doc_count
         |FROM ranked WHERE rn = 1 AND op <> 'DELETE'
         |GROUP BY 1, 2
         |ORDER BY doc_count DESC, o_orderstatus, o_orderpriority
         |LIMIT 10""".stripMargin,
    "cdc_date_range_agg" -> cdcDateRangeAggSql,
    "cdc_bucket_stats" ->
      // sibling pipeline aggs: one row summarizing the histogram's
      // bucket frame (sum cast BIGINT — DuckDB sums to HUGEINT)
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |c AS (SELECT date_trunc('month', o_orderdate) AS month,
         |             count(*) AS doc_count
         |      FROM ranked WHERE rn = 1 AND op <> 'DELETE' GROUP BY 1)
         |SELECT count(*) AS n_buckets,
         |       CAST(sum(doc_count) AS BIGINT) AS sum_bucket,
         |       min(doc_count) AS min_bucket,
         |       max(doc_count) AS max_bucket,
         |       round(CAST(sum(doc_count) AS DOUBLE) / count(*), 6) AS avg_bucket
         |FROM c""".stripMargin,
    "cdc_percentile_ranks" ->
      // percentile_ranks: the exact counting definition 100·|{x ≤ v}|/n
      // per bucket, identical expression text to the Spark plan
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog)
         |SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |       count(*) AS doc_count,
         |       round(CAST(sum(CASE WHEN o_totalprice <= 100000.0 THEN 1 ELSE 0 END) AS DOUBLE)
         |             * 100.0 / count(*), 6) AS rank_100k,
         |       round(CAST(sum(CASE WHEN o_totalprice <= 300000.0 THEN 1 ELSE 0 END) AS DOUBLE)
         |             * 100.0 / count(*), 6) AS rank_300k
         |FROM ranked WHERE rn = 1 AND op <> 'DELETE'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_serial_diff" ->
      // serial_diff: lag-3 differencing, null until 3 predecessors (the
      // ES incomplete-lag contract), all-integer
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |c AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |             count(*) AS doc_count
         |      FROM ranked WHERE rn = 1 AND op <> 'DELETE' GROUP BY 1)
         |SELECT month, doc_count,
         |       doc_count - lag(doc_count, 3) OVER (ORDER BY month) AS serial_diff
         |FROM c ORDER BY month""".stripMargin,
    "cdc_bucket_script" ->
      // bucket_script (the share divide) + bucket_selector (the >= cut):
      // conditional decimal sums, identical divide text
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |c AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |        count(*) AS doc_count,
         |        CAST(round(sum(CASE WHEN o_orderpriority = '1-URGENT'
         |          THEN CAST(o_totalprice AS DECIMAL(18,4))
         |          ELSE CAST(0.0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS urgent_price,
         |        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price,
         |        round(CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
         |                THEN CAST(o_totalprice AS DECIMAL(18,4))
         |                ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE)
         |              / CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
         |              6) AS urgent_share
         |      FROM ranked WHERE rn = 1 AND op <> 'DELETE' GROUP BY 1)
         |SELECT month, doc_count, urgent_price, total_price, urgent_share
         |FROM c WHERE urgent_share >= 0.19 ORDER BY month""".stripMargin,
    "cdc_top_metrics" ->
      // top_metrics: the (sort desc, key desc) total order makes the
      // window rendering equal to Spark's max_by — key is unique
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |live AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'DELETE'),
         |w AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |        o_orderkey, o_totalprice,
         |        row_number() OVER (PARTITION BY date_trunc('month', o_orderdate)
         |                           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn2,
         |        count(*) OVER (PARTITION BY date_trunc('month', o_orderdate)) AS doc_count
         |      FROM live)
         |SELECT month, doc_count, o_orderkey AS top_orderkey,
         |       o_totalprice AS top_price
         |FROM w WHERE rn2 = 1 ORDER BY month""".stripMargin,
    "cdc_terms_agg_metric" ->
      // terms agg ordered by the metric sub-agg: the size cut applies
      // AFTER the metric ordering, ties on the bucket key ascending
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog)
         |SELECT o_custkey, count(*) AS doc_count,
         |       ${dsum("o_totalprice", "sum_price")}
         |FROM ranked WHERE rn = 1 AND op <> 'DELETE'
         |GROUP BY 1 ORDER BY sum_price DESC, o_custkey LIMIT 10""".stripMargin,
    "cdc_histogram_agg" ->
      // numeric histogram, min_doc_count 0: floor(v/interval)*interval
      // keys, EVERY interval between min and max key reports (the spine)
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |c AS (SELECT CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT) AS bucket_key,
         |             count(*) AS doc_count
         |      FROM ranked WHERE rn = 1 AND op <> 'DELETE' GROUP BY 1),
         |sp AS (SELECT unnest(generate_series((SELECT min(bucket_key) FROM c),
         |                                     (SELECT max(bucket_key) FROM c),
         |                                     50000)) AS bucket_key)
         |SELECT sp.bucket_key, coalesce(doc_count, CAST(0 AS BIGINT)) AS doc_count
         |FROM sp LEFT JOIN c USING (bucket_key) ORDER BY sp.bucket_key""".stripMargin,
    "cdc_composite_agg" ->
      // composite agg page 2: buckets strictly after the (month, status)
      // cursor in source-tuple order, first `size` of them
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |             o_orderstatus, count(*) AS doc_count
         |      FROM ranked WHERE rn = 1 AND op <> 'DELETE' GROUP BY 1, 2)
         |SELECT month, o_orderstatus, doc_count FROM b
         |WHERE month > DATE '1995-01-01'
         |   OR (month = DATE '1995-01-01' AND o_orderstatus > 'F')
         |ORDER BY month, o_orderstatus LIMIT 10""".stripMargin,
    "cdc_cumulative_cardinality" ->
      // cumulative_cardinality: a customer counts toward month m iff
      // their FIRST month <= m (distinct counts don't sum); the window
      // sum CASTs to BIGINT (DuckDB promotes to HUGEINT, Spark stays long)
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |mo AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |              o_custkey
         |       FROM ranked WHERE rn = 1 AND op <> 'DELETE'),
         |months AS (SELECT month, count(*) AS doc_count FROM mo GROUP BY 1),
         |firsts AS (SELECT month, count(*) AS new_customers FROM (
         |    SELECT o_custkey, min(month) AS month FROM mo GROUP BY 1)
         |  GROUP BY 1)
         |SELECT m.month, m.doc_count,
         |       COALESCE(f.new_customers, 0) AS new_customers,
         |       CAST(sum(COALESCE(f.new_customers, 0)) OVER
         |         (ORDER BY m.month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |         AS BIGINT) AS cumulative_unique_customers
         |FROM months m LEFT JOIN firsts f USING (month)
         |ORDER BY m.month""".stripMargin,
    "cdc_diversified_sampler" ->
      // diversified sampler: per-value rank <= budget over the fixed
      // collection order, then the shard_size cut, then the terms sub-agg
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |state AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'DELETE'),
         |dv AS (SELECT *, row_number() OVER
         |         (PARTITION BY o_custkey ORDER BY o_orderkey) AS vrk
         |       FROM state),
         |samp AS (SELECT * FROM dv WHERE vrk <= 1
         |         ORDER BY o_orderkey LIMIT 100)
         |SELECT o_orderstatus, count(*) AS doc_count FROM samp
         |GROUP BY 1 ORDER BY doc_count DESC, o_orderstatus""".stripMargin,
    "cdc_max_bucket" ->
      // max_bucket/min_bucket: the extrema VALUES plus the tie-naming
      // keys array the ES aggs return
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
         |      FROM ranked WHERE rn = 1 AND op <> 'DELETE' GROUP BY 1),
         |ext AS (SELECT max(revenue) AS mx, min(revenue) AS mn FROM b)
         |SELECT 'max_bucket' AS metric, mx AS value,
         |       array_to_string(list_sort(list(CAST(month AS VARCHAR))), ',') AS keys
         |FROM b, ext WHERE revenue = mx GROUP BY mx
         |UNION ALL
         |SELECT 'min_bucket', mn,
         |       array_to_string(list_sort(list(CAST(month AS VARCHAR))), ',')
         |FROM b, ext WHERE revenue = mn GROUP BY mn
         |ORDER BY metric""".stripMargin,
    "cdc_bucket_sort" ->
      // bucket_sort: sort by metric desc (ties on the key), skip `from`,
      // keep `size` — truncation AFTER the sort
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |             count(*) AS doc_count,
         |             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
         |      FROM ranked WHERE rn = 1 AND op <> 'DELETE' GROUP BY 1),
         |r AS (SELECT *, row_number() OVER (ORDER BY revenue DESC, month) AS rk FROM b)
         |SELECT CAST(rk AS BIGINT) AS rk, month, doc_count, revenue
         |FROM r WHERE rk > 2 AND rk <= 7 ORDER BY rk""".stripMargin,
    "cdc_mad" ->
      // median_absolute_deviation: exact integer cents, exact medians
      // (interpolation lands on integers or halves), MAD = median of the
      // exact double deviations — below-threshold regime like the
      // percentiles family
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |st2 AS (SELECT o_orderstatus,
         |               CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
         |        FROM ranked WHERE rn = 1 AND op <> 'DELETE'),
         |med AS (SELECT o_orderstatus, quantile_cont(cents, 0.5) AS median_cents
         |        FROM st2 GROUP BY 1),
         |d2 AS (SELECT s.o_orderstatus, m.median_cents,
         |              abs(CAST(s.cents AS DOUBLE) - m.median_cents) AS dev
         |       FROM st2 s JOIN med m USING (o_orderstatus))
         |SELECT o_orderstatus, count(*) AS doc_count,
         |       max(median_cents) AS median_cents,
         |       quantile_cont(dev, 0.5) AS mad_cents
         |FROM d2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "mm_phash_neardup" ->
      // the fingerprint rederived per byte (integer cross-multiply bits),
      // pairs by BRUTE FORCE — the gate itself proves the Spark side's
      // 4×8-bit banding is exact for hamming <= 3
      """WITH d AS (SELECT doc_id AS media_id, coalesce(text, '') AS t,
        |                  strlen(coalesce(text, '')) AS n FROM documents),
        |ch AS (SELECT media_id, n, i,
        |              ord(substr(t, CAST(i AS INT), 1)) AS b,
        |              (i - 1) // greatest(1, n // 32) AS w
        |       FROM (SELECT media_id, t, n,
        |               unnest(generate_series(1, n)) AS i
        |             FROM d WHERE n > 0)),
        |tot AS (SELECT media_id, max(n) AS n, sum(b) AS total FROM ch GROUP BY 1),
        |wins AS (SELECT media_id, w, sum(b) AS s, count(*) AS c
        |         FROM ch WHERE w < 32 GROUP BY 1, 2),
        |bits AS (SELECT wi.media_id,
        |           CAST(sum(CASE WHEN wi.s * t.n > t.total * wi.c
        |                THEN (CAST(1 AS BIGINT) << CAST(wi.w AS INT))
        |                ELSE 0 END) AS BIGINT) AS fp
        |         FROM wins wi JOIN tot t USING (media_id) GROUP BY 1),
        |fps AS (SELECT media_id, fp FROM bits
        |        UNION ALL
        |        SELECT media_id, CAST(0 AS BIGINT) FROM d WHERE n = 0),
        |p AS (SELECT a.media_id AS id_a, b2.media_id AS id_b,
        |             CAST(bit_count(xor(a.fp, b2.fp)) AS BIGINT) AS dist
        |      FROM fps a JOIN fps b2 ON a.media_id < b2.media_id)
        |SELECT id_a, id_b, dist FROM p WHERE dist <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "cdc_cardinality_agg" ->
      // cardinality sub-agg: exact distinct below precision_threshold —
      // the regime every fixture bucket is in (ES's own linear counting)
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog)
         |SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |       count(*) AS doc_count,
         |       count(DISTINCT o_custkey) AS unique_customers
         |FROM ranked WHERE rn = 1 AND op <> 'DELETE'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_rollover" ->
      // the rolled family's read alias answers exactly like the flat
      // events table cut to the range — generations are a layout, not a
      // semantics change
      """SELECT event_type, count(*) AS doc_count FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // cross-generation text search: the corpus is the HIT generations'
    // docs (event day = doc_id % 28, the log's deterministic time axis;
    // weeks 0-2 overlap [day 5, day 19)), stats and df derive from that
    // whole corpus (the ES cross-index statistics merge), and the range
    // cuts candidates in filter context — never rescoring
    "cdc_rollover_search" -> bm25Sql(
      "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok\n" +
        "         FROM documents WHERE doc_id % 28 <= 20)",
      1, Seq("stream", "merge", "window"), Seq.empty,
      extraCut = "(p.doc_id % 28) BETWEEN 5 AND 18"),
    // retention: week 0 (days 0-6) expired — the live corpus is days 7+,
    // and stats/dfs derive from THAT corpus (deletion moved the
    // statistics under everyone, which is what distinguishes the ILM
    // delete from a query-time range cut); week 2 survives on its pin
    "cdc_rollover_retention" -> bm25Sql(
      "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok\n" +
        "         FROM documents WHERE doc_id % 28 >= 7)",
      1, Seq("stream", "merge", "window"), Seq.empty),
    // shrink: layout-only — the same retained corpus answers (the oracle
    // pins content invariance; the drills pin the 2-bucket layouts)
    "cdc_rollover_shrink" -> bm25Sql(
      "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok\n" +
        "         FROM documents WHERE doc_id % 28 >= 7)",
      1, Seq("filter", "join", "scan"), Seq.empty),
    "cdc_derivative_agg" ->
      // pipeline aggs on the bucket frame: derivative (null first bucket)
      // + cumulative_sum, one window pass over |months| rows
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |             count(*) AS doc_count
         |      FROM ranked WHERE rn = 1 AND op <> 'DELETE' GROUP BY 1)
         |SELECT month, doc_count,
         |       doc_count - lag(doc_count) OVER (ORDER BY month) AS deriv,
         |       CAST(sum(doc_count) OVER (ORDER BY month
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_count
         |FROM b ORDER BY month""".stripMargin,
    "cdc_moving_fn" ->
      // moving_fn unweightedAvg window 3 shift 0: the 3 buckets strictly
      // before; null until the window fills (mirrored rule)
      s"""WITH ${Changelog.oracleCte},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM changelog),
         |b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |             count(*) AS doc_count
         |      FROM ranked WHERE rn = 1 AND op <> 'DELETE' GROUP BY 1)
         |SELECT month, doc_count,
         |       CASE WHEN count(doc_count) OVER w = 3
         |            THEN round(sum(doc_count) OVER w / 3.0, 6) END AS mov_avg
         |FROM b
         |WINDOW w AS (ORDER BY month ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
         |ORDER BY month""".stripMargin,
    "cdc_boosting" -> bm25Sql(docsChangelogCte, 1,
      Seq("stream", "merge", "window"), Seq.empty,
      // boosting query: the negative set demotes (× 0.5) and the FULL
      // match set re-ranks on the demoted scores
      tail = """,neg AS (SELECT DISTINCT doc_id FROM toks WHERE tok IN ('row')),
        |b AS (SELECT a.doc_id, a.n_t,
        |        CASE WHEN neg.doc_id IS NOT NULL THEN a.score * 0.5
        |             ELSE a.score END AS score
        |      FROM agg a LEFT JOIN neg USING (doc_id)),
        |r2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk2 FROM b)
        |SELECT CAST(rk2 AS BIGINT) AS rk, doc_id, n_t, score
        |FROM r2 WHERE rk2 <= 10 ORDER BY rk2""".stripMargin),
    "cdc_significant_text" -> bm25Sql(docsChangelogCte, 1,
      Seq("stream", "merge", "window"), Seq.empty,
      // significant_text: fg = the sampler-cut top-100 hits of the scored
      // match, their text re-analyzed (per-doc distinct terms); bg dfs =
      // the corpus; JLH text identical to cdc_significant_terms
      tail = """,fg AS (SELECT doc_id FROM r WHERE rk <= 100),
        |fgn AS (SELECT count(*) AS fg_n FROM fg),
        |ftk AS (SELECT tok, count(DISTINCT t.doc_id) AS fg_df
        |        FROM toks t JOIN fg USING (doc_id) GROUP BY 1),
        |bgt AS (SELECT tok, count(DISTINCT doc_id) AS bg_df FROM toks GROUP BY 1),
        |bgn AS (SELECT n_docs AS bg_n FROM st),
        |sc AS (SELECT f.tok, f.fg_df, b.bg_df,
        |         round((CAST(f.fg_df AS DOUBLE) / fg_n - CAST(b.bg_df AS DOUBLE) / bg_n)
        |           * (CAST(f.fg_df AS DOUBLE) / fg_n) / (CAST(b.bg_df AS DOUBLE) / bg_n),
        |           6) AS score
        |       FROM ftk f JOIN bgt b USING (tok) CROSS JOIN fgn CROSS JOIN bgn
        |       WHERE CAST(f.fg_df AS DOUBLE) / fg_n > CAST(b.bg_df AS DOUBLE) / bg_n),
        |r2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, tok) AS rk2 FROM sc)
        |SELECT CAST(rk2 AS BIGINT) AS rk, tok, fg_df, bg_df, score
        |FROM r2 WHERE rk2 <= 10 ORDER BY rk""".stripMargin),
    "cdc_constant_score" ->
      // constant_score: the filter's distinct doc ids, constant boost —
      // no stats row, no df, no scoring arithmetic anywhere
      s"""WITH $docsChangelogCte,
         |m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'merge'),
         |r AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rk FROM m)
         |SELECT CAST(rk AS BIGINT) AS rk, doc_id, CAST(1.5 AS DOUBLE) AS score
         |FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin,
    "cdc_random_score" -> bm25Sql(docsChangelogCte, 1,
      Seq("stream", "merge", "window"), Seq.empty,
      // random_score: the seeded multiplicative hash of the id scaled to
      // [0, 1), multiplied into the match score (boost_mode: multiply)
      tail = """,rs AS (SELECT doc_id, n_t,
        |         round(score * (CAST(((doc_id + 42) * 2654435761) % 2147483648 AS DOUBLE)
        |           / 2147483648), 6) AS score
        |       FROM agg),
        |r2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk2 FROM rs)
        |SELECT CAST(rk2 AS BIGINT) AS rk, doc_id, n_t, score
        |FROM r2 WHERE rk2 <= 10 ORDER BY rk2""".stripMargin),
    "cdc_msearch" -> {
      // _msearch: the same BM25 arithmetic text as bm25Sql, with the term
      // kept so the (query_id, tok) VALUES map — generated from the ONE
      // Scala literal the Spark side uses — assembles per-query scores
      val vals = graft.ops.Search.MsearchDefaults
        .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
      val terms = graft.ops.Search.MsearchDefaults.flatMap(_._2).distinct
        .map("'" + _ + "'").mkString(", ")
      s"""WITH $docsChangelogCte,
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
         |post AS (SELECT tok, doc_id, count(*) AS tf FROM toks
         |         WHERE tok IN ($terms)
         |         GROUP BY 1, 2),
         |df AS (SELECT tok, count(*) AS df FROM post GROUP BY 1),
         |ts AS (SELECT p.tok, p.doc_id,
         |         CAST(round(
         |           ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
         |           ((CAST(tf AS DOUBLE) * 2.2) /
         |            (CAST(tf AS DOUBLE) +
         |             1.2 * ((1 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) * n_docs / sum_dl)))),
         |           6) AS DECIMAL(18,8)) AS ts
         |       FROM post p JOIN df USING (tok) JOIN dl ON dl.doc_id = p.doc_id
         |       CROSS JOIN st),
         |qm AS (SELECT CAST(query_id AS BIGINT) AS query_id, tok
         |       FROM (VALUES $vals) AS v(query_id, tok)),
         |agg AS (SELECT qm.query_id, t.doc_id, count(*) AS n_t,
         |          round(CAST(sum(t.ts) AS DOUBLE), 6) AS score
         |        FROM ts t JOIN qm USING (tok) GROUP BY 1, 2),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk FROM agg)
         |SELECT query_id, CAST(rk AS BIGINT) AS rk, doc_id, n_t, score
         |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
    },
    "cdc_dis_max" -> cdcDisMaxSql,
    "cdc_cross_fields" -> cdcCrossFieldsSql,
    "cdc_synonym_search" -> bm25Sql(docsSynonymCte, 1,
      // query terms analyzed through the same contraction table
      Seq("slow", "order"), Seq.empty),
    "cdc_rank_feature" -> bm25Sql(docsChangelogCte, 1,
      Seq("stream", "merge", "window"), Seq.empty,
      // rank_feature saturation S(v) = v/(v+pivot); should ADDS boost × S
      tail = """,rf AS (SELECT r.doc_id, r.n_t,
        |         round(r.score + round(0.5 * (CAST(dl.dl AS DOUBLE)
        |           / (CAST(dl.dl AS DOUBLE) + 50.0)), 6), 6) AS score
        |       FROM r JOIN dl ON dl.doc_id = r.doc_id),
        |r2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk2 FROM rf)
        |SELECT CAST(rk2 AS BIGINT) AS rk, doc_id, n_t, score
        |FROM r2 WHERE rk2 <= 10 ORDER BY rk2""".stripMargin),
    "cdc_decay_score" -> bm25Sql(docsChangelogCte, 1,
      Seq("stream", "merge", "window"), Seq.empty,
      // linear decay on dl: origin 50, offset 5, scale 20, decay 0.5 →
      // s = 40; factor = max(0, (s − max(0, |dl−50|−5)) / s); multiply
      tail = """,dcy AS (SELECT r.doc_id, r.n_t,
        |         round(r.score * greatest(
        |           (40.0 - greatest(abs(dl.dl - 50) - 5, 0)) / 40.0, 0.0),
        |           6) AS score
        |       FROM r JOIN dl ON dl.doc_id = r.doc_id),
        |r2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk2 FROM dcy)
        |SELECT CAST(rk2 AS BIGINT) AS rk, doc_id, n_t, score
        |FROM r2 WHERE rk2 <= 10 ORDER BY rk2""".stripMargin),
    "cdc_delete_by_query" -> bm25Sql(docsDeleteByQueryCte, 1,
      Seq("stream", "merge", "window"), Seq.empty),
    "cdc_update_by_query" -> bm25Sql(docsUpdateByQueryCte, 1,
      Seq("reviewed", "merge"), Seq.empty),
    "cdc_span_first" ->
      // span_first: occurrences of the term at position <= 5, per doc
      s"""WITH $docsChangelogCte,
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM live),
         |toks2 AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS p FROM w)
         |SELECT doc_id, count(*) AS hits FROM toks2
         |WHERE tok = 'stream' AND p <= 5
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_span_near" ->
      // span_near in_order:false slop 2: any one position per term with
      // width − (n−1) ≤ slop; hits = distinct min-position span starts
      s"""WITH $docsChangelogCte,
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM live),
         |toks2 AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS p FROM w),
         |t0 AS (SELECT doc_id, p FROM toks2 WHERE tok = 'window'),
         |t1 AS (SELECT doc_id, p FROM toks2 WHERE tok = 'merge'),
         |m AS (SELECT DISTINCT t0.doc_id, least(t0.p, t1.p) AS s
         |      FROM t0 JOIN t1 ON t1.doc_id = t0.doc_id
         |       AND greatest(t0.p, t1.p) - least(t0.p, t1.p) - 1 <= 2)
         |SELECT doc_id, count(*) AS hits FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_span_or" ->
      // span_or([merge, sort]) composed inside span_near(window, slop 2,
      // unordered): the union of the alternatives' position lists is the
      // first span clause
      s"""WITH $docsChangelogCte,
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM live),
         |toks2 AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS p FROM w),
         |t0 AS (SELECT doc_id, p FROM toks2 WHERE tok IN ('merge', 'sort')),
         |t1 AS (SELECT doc_id, p FROM toks2 WHERE tok = 'window'),
         |m AS (SELECT DISTINCT t0.doc_id, least(t0.p, t1.p) AS s
         |      FROM t0 JOIN t1 ON t1.doc_id = t0.doc_id
         |       AND greatest(t0.p, t1.p) - least(t0.p, t1.p) - 1 <= 2)
         |SELECT doc_id, count(*) AS hits FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_span_not" ->
      // span_not: 'merge' occurrences NOT overlapping any 'merge window'
      // phrase span [s, s+1]
      s"""WITH $docsChangelogCte,
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM live),
         |toks2 AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS p FROM w),
         |inc AS (SELECT doc_id, p FROM toks2 WHERE tok = 'merge'),
         |exc AS (SELECT e0.doc_id, e0.p AS s
         |        FROM (SELECT doc_id, p FROM toks2 WHERE tok = 'merge') e0
         |        JOIN (SELECT doc_id, p - 1 AS p FROM toks2 WHERE tok = 'window') e1
         |          ON e1.doc_id = e0.doc_id AND e1.p = e0.p),
         |sv AS (SELECT i.doc_id, i.p FROM inc i WHERE NOT EXISTS
         |         (SELECT 1 FROM exc e
         |          WHERE e.doc_id = i.doc_id AND i.p BETWEEN e.s AND e.s + 1))
         |SELECT doc_id, count(*) AS hits FROM sv GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_intervals" ->
      // intervals any_of of two ordered max_gaps:1 matches — per rule,
      // ordered pairs with gap <= 1, distinct starts, union, dedup, count
      s"""WITH $docsChangelogCte,
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM live),
         |toks2 AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS p FROM w),
         |r1 AS (SELECT DISTINCT a.doc_id, a.p AS s
         |       FROM (SELECT doc_id, p FROM toks2 WHERE tok = 'merge') a
         |       JOIN (SELECT doc_id, p FROM toks2 WHERE tok = 'window') b
         |         ON b.doc_id = a.doc_id AND b.p > a.p AND b.p - a.p - 1 <= 1),
         |r2 AS (SELECT DISTINCT a.doc_id, a.p AS s
         |       FROM (SELECT doc_id, p FROM toks2 WHERE tok = 'hash') a
         |       JOIN (SELECT doc_id, p FROM toks2 WHERE tok = 'join') b
         |         ON b.doc_id = a.doc_id AND b.p > a.p AND b.p - a.p - 1 <= 1),
         |u AS (SELECT doc_id, s FROM r1 UNION SELECT doc_id, s FROM r2)
         |SELECT doc_id, count(*) AS hits FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_term_suggest" ->
      // suggest.term, sort: frequency + suggest_mode: popular — the
      // input's own df (0 when absent) gates candidates (df > input_df),
      // rank by (df desc, dist, term)
      s"""WITH $docsChangelogCte,
         |d AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
         |ins AS (SELECT * FROM (VALUES ('mrege'), ('scal'), ('agg')) AS t(input)),
         |ind AS (SELECT i.input, CAST(coalesce(d.df, 0) AS BIGINT) AS input_df
         |        FROM ins i LEFT JOIN d ON d.tok = i.input),
         |cand AS (SELECT i.input, i.input_df, d.tok AS suggestion,
         |           CAST(levenshtein(d.tok, i.input) AS BIGINT) AS dist, d.df
         |         FROM d JOIN ind i ON substr(d.tok, 1, 1) = substr(i.input, 1, 1)
         |           AND d.tok <> i.input AND levenshtein(d.tok, i.input) <= 2
         |         WHERE d.df > i.input_df),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY input ORDER BY df DESC, dist, suggestion) AS rk
         |      FROM cand)
         |SELECT input, input_df, CAST(rk AS BIGINT) AS rk, suggestion, dist, df
         |FROM r WHERE rk <= 3 ORDER BY input, rk""".stripMargin,
    "cdc_search_as_you_type" ->
      // search_as_you_type: the query shingles per subfield (last shingle
      // a LIKE prefix against that FIELD's vocabulary, earlier shingles
      // exact), per-field BM25 with the field's own stats, most_fields
      // sum — round-6 per field, exact decimal sum, one final round-6
      s"""WITH $docsChangelogCte,
         |w2 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM live),
         |g2t AS (SELECT doc_id, array_to_string(list_slice(ws, pos, pos + 1), ' ') AS tok
         |        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS pos
         |              FROM w2 WHERE len(ws) >= 2)),
         |g3t AS (SELECT doc_id, array_to_string(list_slice(ws, pos, pos + 2), ' ') AS tok
         |        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS pos
         |              FROM w2 WHERE len(ws) >= 3)),
         |${saytFieldCtes("b", "toks",
              "(tok IN ('stream', 'merge') OR tok LIKE 'wind%')")},
         |${saytFieldCtes("g2", "g2t",
              "(tok IN ('stream merge') OR tok LIKE 'merge wind%')")},
         |${saytFieldCtes("g3", "g3t", "(tok LIKE 'stream merge wind%')")},
         |u AS (SELECT doc_id,
         |        CAST(round(CAST(sum(ts) AS DOUBLE), 6) AS DECIMAL(18,8)) AS fscore
         |      FROM bts GROUP BY 1
         |      UNION ALL
         |      SELECT doc_id, CAST(round(CAST(sum(ts) AS DOUBLE), 6) AS DECIMAL(18,8))
         |      FROM g2ts GROUP BY 1
         |      UNION ALL
         |      SELECT doc_id, CAST(round(CAST(sum(ts) AS DOUBLE), 6) AS DECIMAL(18,8))
         |      FROM g3ts GROUP BY 1),
         |c AS (SELECT doc_id, count(*) AS n_fields,
         |        round(CAST(sum(fscore) AS DOUBLE), 6) AS score FROM u GROUP BY 1),
         |r2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk FROM c)
         |SELECT CAST(rk AS BIGINT) AS rk, doc_id, n_fields, score
         |FROM r2 WHERE rk <= 10 ORDER BY rk""".stripMargin,
    "cdc_string_stats" ->
      // string_stats: exact length stats per source over the live doc
      // state; avg = one double division of two exact integers; ES's
      // entropy term scoped out (ln) with the Spark side's disclosure
      s"""WITH $docsChangelogCte
         |SELECT source, count(*) AS doc_count,
         |       CAST(min(length(text)) AS BIGINT) AS min_length,
         |       CAST(max(length(text)) AS BIGINT) AS max_length,
         |       CAST(sum(length(text)) AS DOUBLE) / count(*) AS avg_length
         |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,
    "doc_substring_dedup" ->
      // brute force: candidate pairs joined on the RAW gram string (no
      // hash anywhere) — the gate itself proves the Spark side's
      // xxhash64 blocking exact; identical island arithmetic
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |                  string_split(text, ' ') AS ws FROM documents),
        |gp AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS pos
        |       FROM d WHERE len(ws) >= 8),
        |g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |             array_to_string(list_slice(ws, pos, pos + 7), ' ') AS gram
        |      FROM gp),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb,
        |             a.pos - b.pos AS diag
        |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
        |i AS (SELECT *, pa - row_number() OVER
        |        (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS isl FROM p)
        |SELECT doc_a, doc_b, min(pa) AS a_start, min(pb) AS b_start,
        |       count(*) + 7 AS span_len
        |FROM i GROUP BY doc_a, doc_b, diag, isl
        |ORDER BY doc_a, doc_b, a_start, b_start""".stripMargin,
    "cdc_more_like_this" -> bm25Sql(
      s"""$docsChangelogCte,
         |seedtoks AS (SELECT tok, count(*) AS tf2 FROM toks WHERE doc_id = 42 GROUP BY 1),
         |dfq AS (SELECT tok, count(DISTINCT doc_id) AS df2 FROM toks
         |        WHERE tok IN (SELECT tok FROM seedtoks) GROUP BY 1),
         |nd AS (SELECT count(*) AS nd_docs FROM live),
         |sel AS (SELECT s.tok FROM seedtoks s JOIN dfq USING (tok) CROSS JOIN nd
         |        ORDER BY CAST(s.tf2 AS DOUBLE) *
         |          ((CAST(nd_docs - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5))
         |          DESC, s.tok LIMIT 10)""".stripMargin,
      1, Seq.empty, Seq.empty, Seq.empty,
      termsWhere = "tok IN (SELECT tok FROM sel)",
      extraCut = "p.doc_id <> 42"),
    "cdc_rescore" -> bm25Sql(
      s"""$docsChangelogCte,
         |w2 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM live),
         |toks2 AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS p FROM w2),
         |ph AS (SELECT t0.doc_id, count(*) AS hits
         |       FROM (SELECT doc_id, p AS s FROM toks2 WHERE tok = 'merge') t0
         |       JOIN (SELECT doc_id, p - 1 AS s FROM toks2 WHERE tok = 'window') t1
         |         ON t1.doc_id = t0.doc_id AND t1.s = t0.s
         |       GROUP BY 1)""".stripMargin,
      1, Seq("stream", "merge", "window"), Seq.empty, Seq.empty,
      tail = s""",w50 AS (SELECT doc_id, score FROM r WHERE rk <= 50),
         |resc AS (SELECT w.doc_id, coalesce(ph.hits, 0) AS hits,
         |           round(0.25 * w.score + 0.5 * coalesce(ph.hits, 0), 6) AS score
         |         FROM w50 w LEFT JOIN ph USING (doc_id)),
         |r2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk2 FROM resc)
         |SELECT CAST(rk2 AS BIGINT) AS rk, doc_id, CAST(hits AS BIGINT) AS hits, score
         |FROM r2 WHERE rk2 <= 10 ORDER BY rk2""".stripMargin),
    // term suggester: candidates share the input's first char
    // (prefix_length=1), rank by (edit distance, df desc, term)
    "cdc_suggest" ->
      s"""WITH $docsChangelogCte,
         |d AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
         |ins AS (SELECT * FROM (VALUES ('mrege'), ('strem'), ('windw')) AS t(input)),
         |cand AS (SELECT i.input, d.tok AS suggestion,
         |           CAST(levenshtein(d.tok, i.input) AS BIGINT) AS dist, d.df
         |         FROM d JOIN ins i ON substr(d.tok, 1, 1) = substr(i.input, 1, 1)
         |           AND d.tok <> i.input AND levenshtein(d.tok, i.input) <= 2),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY input ORDER BY dist, df DESC, suggestion) AS rk
         |      FROM cand)
         |SELECT input, CAST(rk AS BIGINT) AS rk, suggestion, dist, df
         |FROM r WHERE rk <= 3 ORDER BY input, rk""".stripMargin,
    "cdc_phrase_suggest" ->
      // phrase suggester: per-token candidate shortlists (first-char cut,
      // edit ≤ 2, top 3 by (dist, df desc, term) — the original token
      // qualifies when live), whole-phrase lattice ranked by the integer
      // Laplace-LM order statistic Π(df+1), ties lexicographic
      s"""WITH $docsChangelogCte,
         |d AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
         |c0 AS (SELECT tok, df, row_number() OVER
         |         (ORDER BY levenshtein(tok, 'slon'), df DESC, tok) AS crk
         |       FROM d WHERE substr(tok, 1, 1) = 's'
         |         AND levenshtein(tok, 'slon') <= 2),
         |c1 AS (SELECT tok, df, row_number() OVER
         |         (ORDER BY levenshtein(tok, 'ro'), df DESC, tok) AS crk
         |       FROM d WHERE substr(tok, 1, 1) = 'r'
         |         AND levenshtein(tok, 'ro') <= 2),
         |l AS (SELECT c0.tok || ' ' || c1.tok AS suggestion,
         |             CAST((c0.df + 1) * (c1.df + 1) AS BIGINT) AS score
         |      FROM c0 CROSS JOIN c1 WHERE c0.crk <= 3 AND c1.crk <= 3),
         |r AS (SELECT *, row_number() OVER
         |        (ORDER BY score DESC, suggestion) AS rk FROM l)
         |SELECT 'slon ro' AS input, CAST(rk AS BIGINT) AS rk,
         |       suggestion, score
         |FROM r WHERE rk <= 3 ORDER BY rk""".stripMargin,
    "cdc_completion" ->
      // completion suggester: per prefix, the live vocabulary's matching
      // terms ranked by weight (maintained df) desc, ties lexicographic,
      // size 3; the directory is distinct-by-construction (skip_duplicates)
      s"""WITH $docsChangelogCte,
         |d AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
         |ins AS (SELECT * FROM (VALUES ('s'), ('wi'), ('me')) AS t(input)),
         |cand AS (SELECT i.input, d.tok AS suggestion, d.df AS weight
         |         FROM d JOIN ins i ON d.tok LIKE i.input || '%'),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY input ORDER BY weight DESC, suggestion) AS rk
         |      FROM cand)
         |SELECT input, CAST(rk AS BIGINT) AS rk, suggestion, weight
         |FROM r WHERE rk <= 3 ORDER BY input, rk""".stripMargin,
    // function_score: the weight CASE multiplies the FULL ranked set `r`
    // (rk unrestricted), then re-ranks — no window, unlike rescore
    "cdc_function_score" -> bm25Sql(docsChangelogCte,
      1, Seq("stream", "merge", "window"), Seq.empty, Seq.empty,
      tail = s""",fs AS (SELECT r.doc_id, r.n_t,
         |  CAST((CASE WHEN l.source = 'src3' THEN 2.0
         |             WHEN l.source = 'src7' THEN 0.5 ELSE 1.0 END) AS DOUBLE) AS factor,
         |  round(r.score * (CASE WHEN l.source = 'src3' THEN 2.0
         |                        WHEN l.source = 'src7' THEN 0.5 ELSE 1.0 END), 6) AS score
         |FROM r JOIN live l ON l.doc_id = r.doc_id),
         |r2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk2 FROM fs)
         |SELECT CAST(rk2 AS BIGINT) AS rk, doc_id, n_t, factor, score
         |FROM r2 WHERE rk2 <= 10 ORDER BY rk2""".stripMargin),
    // percolate: VALUES lists generated from the SAME Scala literal the
    // query uses (Search.percolateQueries) — the renderings cannot drift
    "cdc_percolate" -> {
      val qt = graft.ops.Search.percolateQueries
        .flatMap { case (qid, ts, _) => ts.map(t => s"($qid, '$t')") }
        .mkString(", ")
      val qd = graft.ops.Search.percolateQueries
        .map { case (qid, _, msm) => s"($qid, $msm)" }.mkString(", ")
      s"""WITH $docsChangelogCte,
         |qt AS (SELECT * FROM (VALUES $qt) AS t(query_id, tok)),
         |qd AS (SELECT * FROM (VALUES $qd) AS t(query_id, msm)),
         |inc AS (SELECT DISTINCT doc_id, tok FROM toks),
         |m AS (SELECT q.query_id, i.doc_id, count(*) AS n
         |      FROM qt q JOIN inc i USING (tok) GROUP BY 1, 2),
         |hit AS (SELECT m.query_id, count(*) AS n_docs
         |        FROM m JOIN qd ON qd.query_id = m.query_id AND m.n >= qd.msm
         |        GROUP BY 1)
         |SELECT CAST(qd.query_id AS BIGINT) AS query_id,
         |  CAST(coalesce(hit.n_docs, 0) AS BIGINT) AS n_docs
         |FROM qd LEFT JOIN hit ON hit.query_id = qd.query_id
         |ORDER BY 1""".stripMargin
    },
    // collapse: per-source best hit (partitioned window over the ranked
    // set joined to the stored field), winners re-ranked globally
    "cdc_collapse" -> bm25Sql(docsChangelogCte,
      1, Seq("stream", "merge", "window"), Seq.empty, Seq.empty,
      tail = s""",coll AS (SELECT r.doc_id, r.n_t, r.score, l.source,
         |  row_number() OVER (PARTITION BY l.source
         |                     ORDER BY r.score DESC, r.doc_id) AS srk
         |FROM r JOIN live l ON l.doc_id = r.doc_id),
         |r2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk2
         |       FROM coll WHERE srk = 1)
         |SELECT CAST(rk2 AS BIGINT) AS rk, doc_id, source, n_t, score
         |FROM r2 WHERE rk2 <= 5 ORDER BY rk2""".stripMargin),
    // terms agg + top_hits: top-5 sources by matching-doc count (ties on
    // the field value), each bucket's doc_count + its top-2 hits
    "cdc_top_hits" -> bm25Sql(docsChangelogCte,
      1, Seq("stream", "merge", "window"), Seq.empty, Seq.empty,
      tail = s""",ws AS (SELECT r.doc_id, r.score, l.source
         |      FROM r JOIN live l ON l.doc_id = r.doc_id),
         |ts2 AS (SELECT source, count(*) AS doc_count FROM ws GROUP BY 1
         |        ORDER BY doc_count DESC, source LIMIT 5),
         |h AS (SELECT ws.source, ts2.doc_count, ws.doc_id, ws.score,
         |        row_number() OVER (PARTITION BY ws.source
         |                           ORDER BY ws.score DESC, ws.doc_id) AS hit_rk
         |      FROM ws JOIN ts2 USING (source))
         |SELECT source, CAST(doc_count AS BIGINT) AS doc_count,
         |  CAST(hit_rk AS BIGINT) AS hit_rk, doc_id, score
         |FROM h WHERE hit_rk <= 2 ORDER BY source, hit_rk""".stripMargin),
    // search_after: the page-2 cut is the cursor predicate over the
    // scored set — the cursor CTE IS page 1's last sort key
    "cdc_search_after" -> bm25Sql(docsChangelogCte,
      1, Seq("stream", "merge", "window"), Seq.empty, Seq.empty,
      tail = searchAfterTailSql),
    // PIT page 2: the pinned pre-tail corpus IS the source table
    "cdc_text_pit" -> bm25Sql(
      "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)",
      1, Seq("stream", "merge", "window"), Seq.empty, Seq.empty,
      tail = searchAfterTailSql),
    // highlight: matched-term first positions + occurrence counts for the
    // top-5 hits, recomputed from the live text's token subscripts
    "cdc_highlight" -> bm25Sql(docsChangelogCte,
      1, Seq("stream", "merge", "window"), Seq.empty, Seq.empty,
      tail = s""",hw AS (SELECT l.doc_id, string_split(l.text, ' ') AS wtoks
         |       FROM live l JOIN r ON r.doc_id = l.doc_id AND r.rk <= 5),
         |pt AS (SELECT doc_id, unnest(wtoks) AS tok,
         |         generate_subscripts(wtoks, 1) AS p FROM hw)
         |SELECT CAST(r.rk AS BIGINT) AS rk, pt.doc_id, pt.tok,
         |  CAST(min(pt.p) AS BIGINT) AS first_pos, count(*) AS n_occ
         |FROM pt JOIN r ON r.doc_id = pt.doc_id
         |WHERE pt.tok IN ('stream', 'merge', 'window')
         |GROUP BY 1, 2, 3 ORDER BY rk, tok""".stripMargin),
    // highlight FRAGMENTS: the deterministic character-window rule —
    // `context`=15 chars either side of the first occurrence, clipped to
    // doc bounds — with the substring arithmetic written identically to
    // the Spark plan. The padded position() finds the first TOKEN
    // occurrence (space boundaries), which equals the index's first
    // offset by construction
    "cdc_highlight_fragments" -> bm25Sql(docsChangelogCte,
      1, Seq("stream", "merge", "window"), Seq.empty, Seq.empty,
      tail = s""",top AS (SELECT rk, doc_id FROM r WHERE rk <= 5),
         |h AS (SELECT t.rk, t.doc_id, p.tok
         |      FROM top t JOIN post p ON p.doc_id = t.doc_id),
         |f AS (SELECT h.rk, h.doc_id, h.tok,
         |        position((' ' || h.tok || ' ') IN (' ' || l.text || ' ')) AS o,
         |        len(l.text) AS n, l.text AS text
         |      FROM h JOIN live l ON l.doc_id = h.doc_id)
         |SELECT CAST(rk AS BIGINT) AS rk, doc_id, tok,
         |  substr(text, greatest(1, o - 15), o - greatest(1, o - 15)) ||
         |  '<em>' || tok || '</em>' ||
         |  substr(text, o + len(tok), least(15, n - (o + len(tok)) + 1)) AS fragment
         |FROM f ORDER BY rk, tok""".stripMargin),
    "cdc_filters_agg" -> cdcFiltersAggSql,
    "cdc_rare_terms" ->
      // rare_terms: df ≤ max_doc_count over the live vocabulary,
      // rare-first (df asc, term)
      s"""WITH $docsChangelogCte,
         |d AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1)
         |SELECT tok, df FROM d WHERE df <= 25
         |ORDER BY df, tok LIMIT 20""".stripMargin,
    "cdc_adjacency_matrix" ->
      // adjacency_matrix: singles + lexicographically-keyed pairwise
      // intersections; empty buckets omitted (the ES contract)
      s"""WITH $docsChangelogCte,
         |f AS (SELECT * FROM (VALUES ('streaming', 'stream'),
         |        ('merging', 'merge'), ('rare', 'dup')) AS v(fkey, tok)),
         |inc AS (SELECT DISTINCT f.fkey, t.doc_id
         |        FROM f JOIN toks t ON t.tok = f.tok),
         |s AS (SELECT fkey AS bucket_key, count(*) AS doc_count
         |      FROM inc GROUP BY 1),
         |p AS (SELECT a.fkey || '&' || b.fkey AS bucket_key,
         |             count(*) AS doc_count
         |      FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.fkey < b.fkey
         |      GROUP BY 1)
         |SELECT bucket_key, doc_count
         |FROM (SELECT * FROM s UNION ALL SELECT * FROM p)
         |ORDER BY bucket_key""".stripMargin,
    "cdc_distance_feature" ->
      // distance_feature over the whole rolled family (insert-only log →
      // corpus = raw documents): BM25 + the recency saturation bonus,
      // day distances exact integers, identical arithmetic text
      bm25Sql(
        "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)",
        1, Seq("stream", "merge", "window"), Seq.empty, Seq.empty,
        tail = """,db AS (SELECT doc_id, n_t,
           |  round(score + 2.0 * (7.0 / (7.0 +
           |    CAST(30 - (doc_id % 28) AS DOUBLE))), 6) AS score
           |FROM r),
           |r2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk2 FROM db)
           |SELECT CAST(rk2 AS BIGINT) AS rk, doc_id, n_t, score
           |FROM r2 WHERE rk2 <= 10 ORDER BY rk2""".stripMargin),
    // pinned query: declaration-ordered pinned rows (live only) + the
    // organic ranking with pinned excluded in filter context, k total
    "cdc_pinned_query" -> bm25Sql(docsChangelogCte,
      1, Seq("stream", "merge", "window"), Seq.empty, Seq.empty,
      extraCut = "p.doc_id NOT IN (42, 3)",
      tail = """,org AS (SELECT rk + 2 AS rk, doc_id,
         |         CAST(0 AS BIGINT) AS pinned, score
         |       FROM r WHERE rk <= 8),
         |pin AS (SELECT CAST(v.rk AS BIGINT) AS rk,
         |          CAST(v.doc_id AS BIGINT) AS doc_id,
         |          CAST(1 AS BIGINT) AS pinned, CAST(NULL AS DOUBLE) AS score
         |        FROM (VALUES (1, 42), (2, 3)) AS v(rk, doc_id)
         |        JOIN live l ON l.doc_id = v.doc_id)
         |SELECT CAST(rk AS BIGINT) AS rk, doc_id, pinned, score
         |FROM (SELECT * FROM pin UNION ALL SELECT * FROM org)
         |ORDER BY rk""".stripMargin),
    // match_bool_prefix: exact terms OR the last term's prefix expansion,
    // every expanded term scored with its own df/idf
    "cdc_match_bool_prefix" -> bm25Sql(docsChangelogCte,
      1, Seq("stream"), Seq.empty, Seq.empty,
      termsWhere = "(tok = 'stream' OR tok LIKE 'mer%')"),
    // sliced scroll: one disjoint id-partition of the live corpus
    "cdc_sliced_scroll" ->
      s"""WITH $docsChangelogCte
         |SELECT doc_id, source FROM live
         |WHERE doc_id % 4 = 1 ORDER BY doc_id""".stripMargin,
    "cdc_significant_terms" ->
      s"""WITH $docsChangelogCte,
         |fg_ids AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'dup'),
         |fgn AS (SELECT count(*) AS fg_n FROM fg_ids),
         |fgt AS (SELECT tok, count(DISTINCT t.doc_id) AS fg_df
         |        FROM toks t JOIN fg_ids USING (doc_id) GROUP BY 1),
         |bgn AS (SELECT count(*) AS bg_n FROM live),
         |bgt AS (SELECT tok, count(DISTINCT doc_id) AS bg_df FROM toks GROUP BY 1),
         |sc AS (SELECT f.tok, f.fg_df, b.bg_df,
         |         round((CAST(f.fg_df AS DOUBLE) / fg_n - CAST(b.bg_df AS DOUBLE) / bg_n)
         |           * (CAST(f.fg_df AS DOUBLE) / fg_n) / (CAST(b.bg_df AS DOUBLE) / bg_n),
         |           6) AS score
         |       FROM fgt f JOIN bgt b USING (tok) CROSS JOIN fgn CROSS JOIN bgn
         |       WHERE CAST(f.fg_df AS DOUBLE) / fg_n > CAST(b.bg_df AS DOUBLE) / bg_n),
         |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, tok) AS rk FROM sc)
         |SELECT CAST(rk AS BIGINT) AS rk, tok, fg_df, bg_df, score
         |FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin,
    // sloppy phrase: in-order 'merge' .. 'window' with ≤1 interposed
    // position; hits = distinct first-term starts that begin a match
    "cdc_phrase_slop" ->
      s"""WITH $docsChangelogCte,
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM live),
         |toks2 AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS p FROM w),
         |t0 AS (SELECT doc_id, p FROM toks2 WHERE tok = 'merge'),
         |t1 AS (SELECT doc_id, p FROM toks2 WHERE tok = 'window'),
         |m AS (SELECT DISTINCT t0.doc_id, t0.p FROM t0
         |      JOIN t1 ON t1.doc_id = t0.doc_id
         |       AND t1.p > t0.p AND t1.p - t0.p - 1 <= 1)
         |SELECT doc_id, count(*) AS hits FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    // hybrid over the MAINTAINED legs: the cdc_text_search BM25 chain at
    // depth 20 × the cdc_vector_search ANN chain for query 0 at depth 20,
    // fused by the same RRF as doc_hybrid_search
    "cdc_hybrid_search" ->
      s"""WITH $docsChangelogCte,
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
         |post AS (SELECT tok, doc_id, count(*) AS tf FROM toks
         |         WHERE tok IN ('stream', 'merge', 'window') GROUP BY 1, 2),
         |df AS (SELECT tok, count(*) AS df FROM post GROUP BY 1),
         |ts AS (SELECT p.doc_id,
         |         CAST(round(
         |           ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
         |           ((CAST(tf AS DOUBLE) * 2.2) /
         |            (CAST(tf AS DOUBLE) +
         |             1.2 * ((1 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) * n_docs / sum_dl)))),
         |           6) AS DECIMAL(18,8)) AS ts
         |       FROM post p JOIN df USING (tok) JOIN dl ON dl.doc_id = p.doc_id
         |       CROSS JOIN st),
         |agg AS (SELECT doc_id, round(CAST(sum(ts) AS DOUBLE), 6) AS score
         |        FROM ts GROUP BY 1),
         |lexr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_lex
         |         FROM agg),
         |lex AS (SELECT doc_id, r_lex FROM lexr WHERE r_lex <= 20),
         |$embX,
         |a0 AS (SELECT vec_id, CAST(label AS BIGINT) * 2 + vec_id % 2 AS cl FROM embeddings),
         |${kmeansRounds(3)},
         |${liveVectorCte(3)},
         |asgq AS (SELECT vec_id, cl,
         |                row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cl) AS crk
         |         FROM s3),
         |probed AS (SELECT vec_id AS q_id, cl AS cell FROM asgq
         |           WHERE vec_id < 1 AND crk <= 2),
         |cand AS (SELECT p.q_id, a.vec_id FROM probed p
         |         JOIN lasg a ON a.cl = p.cell AND a.vec_id <> p.q_id),
         |dots AS (SELECT cd.q_id, cd.vec_id, sum(xq.e * xv.e) AS dot
         |         FROM cand cd
         |         JOIN x xq ON xq.vec_id = cd.q_id
         |         JOIN lx xv ON xv.vec_id = cd.vec_id AND xv.i = xq.i
         |         GROUP BY 1, 2),
         |sc AS (SELECT d.q_id, d.vec_id, round(d.dot / (qa.nrm * qb.nrm), 6) AS score
         |       FROM dots d JOIN nrm qa ON qa.vec_id = d.q_id
         |       JOIN lnrm qb ON qb.vec_id = d.vec_id),
         |dr AS (SELECT vec_id AS doc_id,
         |              row_number() OVER (ORDER BY score DESC, vec_id) AS r_dense
         |       FROM sc),
         |dense AS (SELECT doc_id, r_dense FROM dr WHERE r_dense <= 20),
         |f AS (SELECT coalesce(l.doc_id, d2.doc_id) AS doc_id, l.r_lex, d2.r_dense
         |      FROM lex l FULL OUTER JOIN dense d2 ON d2.doc_id = l.doc_id),
         |sc2 AS (SELECT doc_id,
         |          round(CAST(CAST(
         |            (CASE WHEN r_lex IS NOT NULL THEN round(1.0/(60+r_lex), 6) ELSE 0 END +
         |             CASE WHEN r_dense IS NOT NULL THEN round(1.0/(60+r_dense), 6) ELSE 0 END)
         |            AS DECIMAL(18,8)) AS DOUBLE), 6) AS score,
         |          r_lex, r_dense FROM f),
         |rr2 AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk FROM sc2)
         |SELECT CAST(rk AS BIGINT) AS rk, doc_id, score, r_lex, r_dense
         |FROM rr2 WHERE rk <= 10 ORDER BY rk""".stripMargin,
    // BM25 over the staged inverted index; the oracle re-derives postings
    // from scratch — rational idf (N-df+0.5)/(df+0.5), identical double
    // association, round-6 per-term scores summed as DECIMAL (order-free)
    "doc_bm25_search" -> bm25OverDocsSql,
    // time-travel: the savepointed (pre-tail) maintained index answers
    // exactly like the static staged index over the same corpus
    "cdc_text_time_travel" -> bm25OverDocsSql,
    // positional-postings semantics (overlapping starts): a phrase
    // occurrence at start s has term i at position s+i for every i —
    // the from-scratch mirror of the index's posting-list intersection
    "doc_phrase_search" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |toks2 AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS p FROM w),
        |t0 AS (SELECT doc_id, p AS s FROM toks2 WHERE tok = 'merge'),
        |t1 AS (SELECT doc_id, p - 1 AS s FROM toks2 WHERE tok = 'window')
        |SELECT t0.doc_id, count(*) AS hits
        |FROM t0 JOIN t1 ON t1.doc_id = t0.doc_id AND t1.s = t0.s
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // phrase search over the MAINTAINED index = the same positional
    // intersection over the LIVE documents of the synthetic changelog
    "cdc_phrase_search" ->
      s"""WITH $docsChangelogCte,
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM live),
         |toks2 AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS p FROM w),
         |t0 AS (SELECT doc_id, p AS s FROM toks2 WHERE tok = 'merge'),
         |t1 AS (SELECT doc_id, p - 1 AS s FROM toks2 WHERE tok = 'window')
         |SELECT t0.doc_id, count(*) AS hits
         |FROM t0 JOIN t1 ON t1.doc_id = t0.doc_id AND t1.s = t0.s
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_phrase_prefix" ->
      // match_phrase_prefix 'merge s': the last slot matches ANY term of
      // the capped prefix expansion (first 50 in term order — the
      // deterministic cap rule the Spark side applies)
      s"""WITH $docsChangelogCte,
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM live),
         |toks2 AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS p FROM w),
         |exp AS (SELECT tok FROM (SELECT DISTINCT tok FROM toks WHERE tok LIKE 's%'
         |                         ORDER BY tok LIMIT 50)),
         |t0 AS (SELECT doc_id, p AS s FROM toks2 WHERE tok = 'merge'),
         |t1 AS (SELECT doc_id, p - 1 AS s FROM toks2
         |       WHERE tok IN (SELECT tok FROM exp))
         |SELECT t0.doc_id, count(*) AS hits
         |FROM t0 JOIN t1 ON t1.doc_id = t0.doc_id AND t1.s = t0.s
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "doc_surprisal" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |f AS (SELECT tok, count(*) AS freq FROM toks GROUP BY tok),
        |t AS (SELECT sum(freq) AS t_total FROM f),
        |w AS (SELECT doc_id,
        |        CAST(round(CAST(t_total AS DOUBLE) / freq * 1000000.0) / 1000000.0 AS DECIMAL(18,8)) AS w
        |      FROM toks JOIN f USING (tok) CROSS JOIN t),
        |s AS (SELECT doc_id, count(*) AS n_toks,
        |        CAST(sum(w) AS DOUBLE) / count(*) AS surprisal
        |      FROM w GROUP BY doc_id)
        |SELECT doc_id, n_toks, surprisal,
        |  CAST(surprisal <= 31.0 AS BIGINT) AS kept
        |FROM s ORDER BY doc_id""".stripMargin,
    "doc_mix_weights" ->
      """WITH p AS (SELECT source, count(*) AS n_docs,
        |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |      FROM documents GROUP BY source),
        |t AS (SELECT sum(n_tokens) AS t_total, count(*) AS n_sources FROM p)
        |SELECT source, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / t_total * 1000000.0) / 1000000.0 AS share,
        |  round(CAST(t_total AS DOUBLE) / (n_sources * n_tokens) * 1000000.0) / 1000000.0 AS weight,
        |  CAST(least(n_tokens, CAST(floor(10000.0 / n_sources) AS BIGINT)) AS BIGINT)
        |    AS alloc_tokens
        |FROM p CROSS JOIN t ORDER BY source""".stripMargin,
    "doc_budget_sample" ->
      """WITH d AS (SELECT doc_id, source,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |        md5(CAST(doc_id AS VARCHAR)) AS h
        |      FROM documents),
        |t AS (SELECT count(DISTINCT source) AS n_sources FROM d),
        |c AS (SELECT doc_id, source, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cum_tokens
        |      FROM d)
        |SELECT doc_id, source, n_tokens, cum_tokens
        |FROM c CROSS JOIN t
        |WHERE cum_tokens <= CAST(floor(10000.0 / n_sources) AS BIGINT)
        |ORDER BY source, cum_tokens, doc_id""".stripMargin
  )
}

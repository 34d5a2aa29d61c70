"""Physical-plan assertions: the properties that make queries survive 100 TB.

Correctness tests prove the small-SF answer; these prove the PLAN — filters
reach the parquet scan, projections prune the read schema, small dims
broadcast, nothing degenerates to a cartesian product, and rank-limits
prune map-side. A regression here is invisible at sf0.01 and fatal at
1000 executors.
"""

from __future__ import annotations

import pytest

from etl_spark import workload, workload_mm, workload_relational, workload_text

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def n_shuffles(plan: str) -> int:
    """Count shuffle-exchange NODES (the detail section lists each node
    once as '(n) Exchange'; BroadcastExchange is deliberately excluded —
    broadcasts don't repartition the fact side)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


def test_q6_filters_pushed_to_scan(spark):
    plan = plan_of(workload_relational.q6_revenue_forecast(spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # every predicate column is pushdown-eligible (raw column vs literal)
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q6_read_schema_pruned(spark):
    plan = plan_of(workload_relational.q6_revenue_forecast(spark, SF_DIR))
    schema = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "l_extendedprice" in schema and "l_discount" in schema
    # a 16-column scan for a 5-column query is a scale bug
    assert "l_returnflag" not in schema and "l_partkey" not in schema


def test_q1_single_shuffle(spark):
    plan = plan_of(workload_relational.q1_pricing_summary(spark, SF_DIR))
    # scan → partial agg → ONE exchange → final agg
    assert n_shuffles(plan) == 1, plan


def test_q3_broadcasts_customer(spark):
    plan = plan_of(workload_relational.q3_shipping_priority(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q5_star_join_broadcasts_dims(spark):
    plan = plan_of(workload_relational.q5_local_supplier_volume(spark, SF_DIR))
    # region/nation/supplier/customer all broadcast; the only shuffle joins
    # are on the fact tables
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan


def test_topk_has_window_group_limit(spark):
    plan = plan_of(workload_relational.topk_orders_per_customer(spark, SF_DIR))
    # rank<=k prunes map-side BEFORE the window shuffle (WindowGroupLimit)
    assert "WindowGroupLimit" in plan, plan


def test_q4_semi_join_not_inner(spark):
    plan = plan_of(workload_relational.q4_order_priority(spark, SF_DIR))
    assert "LeftSemi" in plan, plan


def test_q22_anti_join_and_scalar_broadcast(spark):
    plan = plan_of(workload_relational.q22_dormant_customers(spark, SF_DIR))
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan  # scalar joins via broadcast


def test_minhash_no_cartesian(spark):
    plan = plan_of(workload_text.dedup_minhash_lsh(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_no_cartesian(spark):
    plan = plan_of(workload_text.dedup_simhash_pairs(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mm_scan_prunes_unused_columns(spark):
    plan = plan_of(workload_mm.mm_features(spark, SF_DIR))
    schema = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "text" in schema and "n_chars" in schema
    assert "lang" not in schema and "source" not in schema


def test_cdc_current_state_single_shuffle(spark):
    plan = plan_of(workload.cdc_current_state(spark, SF_DIR))
    # envelope derivation is per-row; the dedup window is the ONE keyed op
    assert n_shuffles(plan) == 1, plan


def test_asof_single_shuffle_both_sides(spark):
    plan = plan_of(workload_relational.asof_click_attribution(spark, SF_DIR))
    # union-trick as-of: both sides union BEFORE the one window shuffle on
    # user_id; the gap-metric join is broadcast. More exchanges than
    # [union + final broadcast] means the trick regressed to a sort-merge.
    assert "CartesianProduct" not in plan
    assert n_shuffles(plan) == 1, plan


def test_kmv_sketch_prunes_map_side(spark):
    plan = plan_of(workload_relational.sketch_distinct_users(spark, SF_DIR))
    # the rank<=k filter must prune to k rows per group BEFORE the shuffle —
    # that pruning IS the sketch's scale property
    assert "WindowGroupLimit" in plan, plan


def test_q21_semi_and_anti(spark):
    plan = plan_of(workload_relational.q21_waiting_orders(spark, SF_DIR))
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan


def test_pivot_two_phase(spark):
    plan = plan_of(workload_relational.events_pivot_daily(spark, SF_DIR))
    # explicit value list → no distinct-values pre-JOB; the plan is the
    # standard two-phase pivot: shuffle 1 reduces the fact to |days|×|types|
    # rows, shuffle 2 (tiny) pivots — anything more means the value list
    # regressed to a runtime distinct scan
    assert n_shuffles(plan) == 2, plan


def test_q7_broadcasts_all_dims(spark):
    plan = plan_of(workload_relational.q7_volume_shipping(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan


def test_window_suite_single_shuffle(spark):
    # all 7 window functions share one window spec → one sort, one exchange
    plan = plan_of(workload_relational.events_window_suite(spark, SF_DIR))
    assert n_shuffles(plan) == 1, plan
    assert plan.count("(1) Scan") == 1  # single pass over events


def test_grouping_sets_single_shuffle(spark):
    # Expand feeds ONE exchange; no re-scan per grouping set
    plan = plan_of(workload_relational.events_grouping_sets(spark, SF_DIR))
    assert "Expand" in plan
    assert n_shuffles(plan) == 1, plan


def test_sample_stratified_zero_shuffle(spark):
    from etl_spark import workload_text

    plan = plan_of(workload_text.sample_stratified(spark, SF_DIR))
    # scan-stage predicate only; the explicit fan-out repartition in _docs
    # is the only exchange allowed
    assert n_shuffles(plan) <= 1, plan
    assert "Exchange hashpartitioning" not in plan


def test_docs_clean_scan_stage_only(spark):
    from etl_spark import workload_text

    plan = plan_of(workload_text.docs_clean(spark, SF_DIR))
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_funnel_no_cartesian(spark):
    plan = plan_of(workload_relational.events_funnel(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_simhash_block_join_over_distinct_fingerprints(spark):
    from etl_spark import workload_text

    plan = plan_of(workload_text.dedup_simhash_pairs(spark, SF_DIR))
    # the block join must consume HashAggregate(distinct simhash), not raw
    # per-doc rows — the duplicate-collapse that bounds join work
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_price_tiers_broadcast_range_join(spark):
    # tiny band dim → BroadcastNestedLoopJoin, never a shuffled cartesian
    plan = plan_of(workload_relational.orders_price_tiers(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q2_argmin_no_cartesian_single_fact_shuffle_key(spark):
    plan = plan_of(workload_relational.q2_min_cost_supplier(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # supplier lookup stays broadcast
    assert "BroadcastHashJoin" in plan


def test_payload_dedup_shuffles_digest_not_payload(spark):
    from etl_spark import workload_mm

    plan = plan_of(workload_mm.mm_payload_dedup(spark, SF_DIR))
    # the exchange partitions on the md5 digest; payload bytes are gone
    # from the aggregate output (pruned before the shuffle)
    post = plan.split("Exchange", 1)[1]
    assert "payload" not in post.split("== Physical Plan ==")[0].split("(1) Scan")[0]


def test_replica_identity_single_shuffle(spark):
    plan = plan_of(workload.cdc_replica_identity(spark, SF_DIR))
    # JSON extraction + addressing + identity-change expansion are all
    # scan-stage; the ONE exchange is the LWW window on the identity
    assert n_shuffles(plan) == 1, plan


def test_partition_root_single_shuffle_broadcast_map(spark):
    plan = plan_of(workload.cdc_partition_root(spark, SF_DIR))
    # routing is a literal map lookup (no join at all); the one exchange
    # is the LWW window
    assert n_shuffles(plan) == 1, plan
    assert "CartesianProduct" not in plan


def test_pg_copy_roundtrip_scan_stage_only(spark):
    plan = plan_of(workload_relational.pg_copy_roundtrip(spark, SF_DIR))
    # encode -> split -> typed decode is pure column algebra: zero shuffles
    assert n_shuffles(plan) == 0, plan


def test_pgoutput_decode_single_pass_per_xid(spark):
    plan = plan_of(workload.pgoutput_decode(spark, SF_DIR))
    # tx assembly is ONE decode pass: BEGIN rows ride the main decode and
    # commit_lsn/tx_ordinal come from windows over the same xid partition.
    # A second MapInPandas subtree or a join means the begins branch (which
    # re-evaluates the whole frame lineage) regressed into the plan.
    import re

    assert "Join" not in plan, "tx assembly must not join"
    # formatted plans list each node twice (tree + details): 3 distinct
    # MapInPandas = encoder, begin-encoder, ONE decoder
    assert plan.count("MapInPandas") <= 6
    global_sorts = re.findall(r"Sort \[wal_start[^\]]*\], true", plan)
    assert not global_sorts, plan
    # window partitioning key present
    assert "xid" in plan


def test_pack_sequences_sharded_window(spark):
    plan = plan_of(workload_text.corpus_pack_sequences(spark, SF_DIR))
    # window key must be (lang, shard), not lang alone — the 5-language
    # corpus would collapse onto 5 tasks at scale otherwise
    assert "hashpartitioning(lang" in plan and "% 8)" in plan, plan


def test_token_mixture_sharded_window(spark):
    plan = plan_of(workload_text.corpus_token_mixture(spark, SF_DIR))
    assert "hashpartitioning(lang" in plan and "% 8)" in plan, plan


def test_gapfill_grid_is_post_aggregation(spark):
    plan = plan_of(workload_relational.events_gapfill_locf(spark, SF_DIR))
    # the dense grid crossJoin must sit on AGGREGATED (tiny) inputs with the
    # range broadcast — never a cartesian over raw events
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # types x broadcast [lo, hi]


def test_pii_redact_scan_stage_only(spark):
    plan = plan_of(workload_text.docs_pii_redact(spark, SF_DIR))
    # pure column expressions: the only exchange is the deliberate
    # parallelism spread in _docs; no joins, no aggregation shuffle
    assert n_shuffles(plan) <= 1
    assert "SortMergeJoin" not in plan and "HashAggregate" not in plan


def test_repetition_two_keyed_aggs_one_join(spark):
    plan = plan_of(workload_text.docs_repetition(spark, SF_DIR))
    # no cartesian, no global window: everything keyed by doc_id
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_contamination_broadcasts_eval_side(spark):
    plan = plan_of(workload_text.docs_contamination(spark, SF_DIR))
    # eval shingles broadcast; the train corpus is probed, never
    # re-shuffled through a sort-merge on the shingle key
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_passage_dedup_digest_keyed_shuffles(spark):
    plan = plan_of(workload_text.docs_passage_dedup(spark, SF_DIR))
    # digest-frequency agg + join-back + doc agg: everything keyed, no
    # cartesian, no window, passage text never shuffled (md5 digests only)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_rag_chunks_zero_shuffle(spark):
    # chunking is scan-stage column algebra: sequence/slice/explode only;
    # the only allowed exchange is the _docs fan-out repartition
    plan = plan_of(workload_text.docs_rag_chunks(spark, SF_DIR))
    assert n_shuffles(plan) <= 1, plan
    assert "Exchange hashpartitioning" not in plan
    assert "explode(" in plan


def test_range_join_is_equi_join_not_bnl(spark):
    # the bucketed range join must compile to an equi-join on the bucket
    # (broadcast here; shuffled-hash at scale) — NEVER a nested-loop over
    # the range predicate
    plan = plan_of(workload_relational.events_promo_range_join(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_range_join_topk_not_full_sort(spark):
    # window selection is TakeOrderedAndProject (per-partition top-k +
    # merge), not a global Sort of all purchases
    plan = plan_of(workload_relational.events_promo_range_join(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_bm25_corpus_stats_broadcast(spark):
    # corpus stats (N docs, total length) join via a 1-row broadcast —
    # no shuffle added for the scalar side
    plan = plan_of(workload_text.docs_bm25_top_terms(spark, SF_DIR))
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_reservoir_sample_has_window_group_limit(spark):
    # the rank<=k filter must push map-side (WindowGroupLimit): each task
    # keeps its local top-k before the stratum shuffle
    plan = plan_of(workload_text.sample_reservoir_per_stratum(spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan


def test_exact_jaccard_join_is_equi_not_allpairs(spark):
    # prefix-filtered exact similarity join: candidates come from an
    # EQUI-join on prefix tokens — never a cartesian/theta join over doc
    # pairs. The three reused intermediates (tokenized docs, distinct
    # sets, ranked prefixes) are MATERIALIZED (eager localCheckpoint), so
    # the final plan reads existing RDDs and contains NO parquet rescan:
    # the tokenize/md5/xxhash scan ran exactly once.
    plan = plan_of(workload_text.docs_exact_jaccard_join(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Scan parquet" not in plan, plan          # lineage cut: no rescan
    assert "Scan ExistingRDD" in plan, plan          # reads the checkpoints


def test_temperature_mix_exact_integer_keep(spark):
    # per-lang counts map-side combined; the |langs|-row rate side joins
    # back without a cartesian over docs; keep predicate is decimal
    # integer arithmetic (no float rate comparison anywhere in the plan)
    plan = plan_of(workload_text.corpus_temperature_mix(spark, SF_DIR))
    assert "partial_count" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_zorder_stats_single_shuffle_scan_stage_key(spark):
    # the Morton key is scan-stage bit algebra: exactly one hash exchange
    # (the tile groupBy), map-side combined, no join/window anywhere
    plan = plan_of(workload_relational.events_zorder_stats(spark, SF_DIR))
    assert n_shuffles(plan) == 1, plan
    assert "partial_count" in plan, plan
    assert "Window" not in plan and "Join" not in plan, plan


def test_gap_audit_single_shuffle(spark):
    # loss injection + envelope derivation are scan-stage; the only
    # exchange is the commit_lsn agg, map-side combined
    plan = plan_of(workload.cdc_gap_audit(spark, SF_DIR))
    assert n_shuffles(plan) == 1, plan
    assert "partial_count" in plan, plan
    assert "Join" not in plan, plan


def test_incremental_minhash_no_cartesian(spark):
    # new-batch bands probe the index via equi-join only; no cartesian,
    # no nested loop anywhere in the incremental path
    plan = plan_of(workload_text.dedup_minhash_incremental(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_changelog_compact_single_shuffle_no_window(spark):
    # first/last resolve via min_by/max_by aggregates on the total order:
    # one map-combined exchange, no window sort anywhere
    plan = plan_of(workload.cdc_changelog_compact(spark, SF_DIR))
    assert n_shuffles(plan) == 1, plan
    assert "Window" not in plan, plan
    assert "partial_min_by" in plan.lower() or "partial_" in plan, plan


def test_rolling_1h_single_shuffle_range_frame(spark):
    # one exchange (user_id), one sort, a RANGE frame the window operator
    # slides incrementally — no self-join reformulation
    plan = plan_of(workload_relational.events_rolling_1h(spark, SF_DIR))
    assert n_shuffles(plan) == 1, plan
    assert "specifiedwindowframe(RangeFrame" in plan, plan
    assert "Join" not in plan, plan


def test_pq_codes_broadcast_codebook_no_self_join(spark):
    # assignment = scan-stage slice + broadcast codebook join; vectors are
    # never self-joined or shuffled against each other
    plan = plan_of(workload_text.ann_pq_codes(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pq_adc_codes_only_corpus_scan(spark):
    # ADC search never cross-joins raw vectors: the LUT broadcasts, the
    # code table is the streamed side
    plan = plan_of(workload_text.ann_pq_adc_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_table_diff_no_cartesian(spark):
    # reconciliation = full outer join on pk; never a cartesian
    plan = plan_of(workload.cdc_table_diff(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "FullOuter" in plan, plan


def test_profile_single_pass(spark):
    # every column's stats come from ONE aggregation over one scan; the
    # count-distinct expand is allowed, separate per-column jobs are not
    import re

    plan = plan_of(workload_text.docs_profile(spark, SF_DIR))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_quality_checks_one_pass_plus_anti_join(spark):
    plan = plan_of(workload_relational.events_quality_checks(spark, SF_DIR))
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan.replace("BroadcastNestedLoopJoin", ""), plan


def test_state_diff_full_outer_no_cartesian(spark):
    plan = plan_of(workload.cdc_state_diff(spark, SF_DIR))
    assert "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ivfpq_probed_cells_only(spark):
    # codes join the broadcast probe set BEFORE the LUT: un-probed cells
    # never reach the distance assembly; no cartesian anywhere
    plan = plan_of(workload_text.ann_ivfpq_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_sketch_merge_global_window_group_limit(spark):
    # the global top-k rank must prune map-side (WindowGroupLimit): the
    # single-task reduce sees O(k x tasks) rows, never the sketch union
    plan = plan_of(workload_relational.sketch_merge_global(spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan


def test_bloom_probe_broadcast_filter(spark):
    # the built filter (<= m distinct positions) must broadcast; probes
    # stream through it — no shuffle of the probe side on the bit key
    plan = plan_of(workload_relational.bloom_prune_probe(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_changed_columns_single_shuffle(spark):
    # one lag window on the replica identity; comparisons scan-stage
    plan = plan_of(workload.cdc_changed_columns(spark, SF_DIR))
    assert n_shuffles(plan) == 1, plan
    assert "Join" not in plan, plan


def test_vocab_topk_take_ordered_not_global_sort(spark):
    # the global top-K must compile to TakeOrderedAndProject (per-task
    # local top-K) — never a corpus-wide Sort; token counts map-combined
    plan = plan_of(workload_text.vocab_topk_coverage(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan, plan


def test_length_histogram_integer_buckets(spark):
    # bucketing is integer bit-length (conv base-2), never float log2; the
    # doc-count agg is map-combined; no join over docs
    plan = plan_of(workload_text.docs_length_histogram(spark, SF_DIR))
    assert "log(" not in plan.lower().replace("log2", "log("), plan
    assert "partial_count" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kmeans_step_broadcast_quantizer(spark):
    # centroids broadcast against a corpus scan: no shuffle of vectors,
    # no pairwise vector join
    plan = plan_of(workload_text.ann_kmeans_step(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_ivfpq_rerank_candidates_equi_join(spark):
    # the exact rerank touches raw vectors ONLY via an equi-join against
    # the broadcast candidate list — no cartesian over the corpus
    plan = plan_of(workload_text.ann_ivfpq_rerank(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_simhash_clusters_no_member_expansion_join(spark):
    # clique aggregation: the pigeonhole join runs over DISTINCT
    # fingerprints; member ids appear only through the bounded
    # WindowGroupLimit preview — no doc×doc pair expansion anywhere
    plan = plan_of(workload_text.dedup_simhash_clusters(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_anomaly_mad_no_cartesian_broadcast_stats(spark):
    # the |event types|-row stat tables join back broadcast; no cartesian
    plan = plan_of(workload_relational.events_anomaly_mad(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_quality_calibration_single_keyed_agg(spark):
    # quality features are scan-stage; one lang-keyed aggregation,
    # map-combined, no join anywhere
    plan = plan_of(workload_text.docs_quality_calibration(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "partial_count" in plan, plan


def test_ngram_novelty_no_cartesian_map_combined(spark):
    # first-occurrence agg is map-combined; the join back is equi on the
    # shingle key; per-doc count is the only other shuffle
    plan = plan_of(workload_text.docs_ngram_novelty(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "partial_min" in plan, plan


def test_ks_drift_map_combined_counts(spark):
    # per-(type,value) counts combine map-side; the range stats / bucket
    # offsets / totals join back as BROADCASTS (never a shuffle join)
    plan = plan_of(workload_relational.events_ks_drift(spark, SF_DIR))
    assert "partial_sum" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_ks_drift_cumulative_window_range_partitioned(spark):
    # the scale lock: the big cumulative-CDF window partitions by
    # (event_type, __bkt) — types × buckets tasks, never one sort task
    # per event type over all distinct values (the 100 TB killer)
    plan = plan_of(workload_relational.events_ks_drift(spark, SF_DIR))
    import re

    cum_windows = [
        ln for ln in plan.splitlines()
        if "windowspecdefinition" in ln and re.search(r"sum\(n_a#", ln)
    ]
    assert cum_windows, plan
    assert all("__bkt" in w for w in cum_windows), cum_windows


def test_rollup_single_expand_no_union(spark):
    # ROLLUP compiles to one Expand + hash agg — never a unioned re-scan
    plan = plan_of(workload_relational.lineitem_rollup_metrics(spark, SF_DIR))
    assert "Expand" in plan, plan
    assert "Union" not in plan, plan
    import re

    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_regression_map_combined_single_agg(spark):
    # regr_* are single-pass moment sums: partial agg map-side, one shuffle
    plan = plan_of(workload_relational.events_regression(spark, SF_DIR))
    assert "partial_regr_slope" in plan or "partial" in plan, plan
    assert n_shuffles(plan) == 1, plan


def test_markov_broadcast_totals_no_extra_shuffle(spark):
    # pair counts reuse the window's user partitioning where possible; the
    # per-source totals join back as a broadcast, never a shuffle join
    plan = plan_of(workload_relational.events_markov_transitions(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_fuzzy_join_blocked_not_cartesian(spark):
    # deletion-neighborhood blocking: candidates from an equi-join on the
    # variant key — the O(n²) cross join must never appear
    plan = plan_of(workload_relational.customer_fuzzy_name_join(spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_char_pair_topk_take_ordered(spark):
    # corpus top-k compiles to TakeOrderedAndProject (per-task local
    # top-k), never a global sort of the pair table
    plan = plan_of(workload_text.docs_char_pair_merge(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", ""), plan


def test_string_agg_rank_pruned_bounded_state(spark):
    # the rank<=5 prune runs map-side (WindowGroupLimit) so collect_list
    # state is O(k) per group, never O(group)
    plan = plan_of(workload_relational.nation_top_customers_agg(spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan


def test_unpivot_expands_aggregate_not_fact(spark):
    # stack (Expand) must sit ABOVE the aggregate: the 3x expansion runs
    # over the tiny metric block, never over the lineitem scan
    plan = plan_of(workload_relational.lineitem_metrics_unpivot(spark, SF_DIR))
    agg_pos = plan.find("HashAggregate")
    gen_pos = max(plan.find("Expand"), plan.find("Generate"))
    assert gen_pos != -1 and agg_pos != -1, plan
    # formatted plans list operators bottom-up in the detail section:
    # the scan/agg appear before (lower id than) the expansion
    import re

    ids = {m.group(2): int(m.group(1))
           for m in re.finditer(r"^\((\d+)\) (\w+)", plan, re.M)}
    assert ids.get("Expand", ids.get("Generate", 99)) > ids["HashAggregate"], ids


def test_time_weighted_single_user_shuffle(spark):
    # lead window + per-user agg share the user_id partitioning: one
    # exchange total (AQE may add none beyond it)
    plan = plan_of(workload_relational.events_time_weighted_value(spark, SF_DIR))
    assert n_shuffles(plan) <= 2, plan
    assert "CartesianProduct" not in plan


def test_decile_rank_window_range_partitioned(spark):
    # exact ntile via two-pass rank: the row_number window partitions by
    # the range bucket — never a no-partition global sort task
    plan = plan_of(workload_relational.orders_decile_bands(spark, SF_DIR))
    import re

    rank_windows = [
        ln for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "row_number" in ln
    ]
    assert rank_windows, plan
    assert all("__bkt" in w for w in rank_windows), rank_windows


def test_hll_registers_map_combined(spark):
    # registers: partial agg before the one exchange; merged row is a
    # second tiny agg — no extra fact-side shuffle
    plan = plan_of(workload_relational.sketch_hll_users(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan


def test_count_min_probe_join_broadcasts_sketch(spark):
    plan = plan_of(workload_relational.sketch_count_min_users(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan  # 512-cell sketch broadcast
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


def test_basket_lift_no_cartesian_and_broadcast_counts(spark):
    plan = plan_of(workload_relational.lineitem_basket_lift(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # pair expansion equi-joins on the order key; part counts broadcast
    assert "BroadcastHashJoin" in plan


def test_cusum_single_type_shuffle(spark):
    plan = plan_of(workload_relational.events_cusum_alerts(spark, SF_DIR))
    # one hashpartitioning exchange on event_type feeds BOTH windows
    import re

    ex = re.findall(r"^\(\d+\) Exchange\n(?:.*\n)*?Arguments: (.*)", plan, re.M)
    hash_ex = [a for a in ex if "hashpartitioning" in a]
    assert len(hash_ex) <= 2, plan  # mu agg + window partitioning


def test_gopher_rules_no_shuffle_no_udf(spark):
    plan = plan_of(workload_text.docs_gopher_rules(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert n_shuffles(plan) <= 1  # only the _docs spreading repartition


def test_pagerank_no_cartesian_bounded_iterations(spark):
    plan = plan_of(workload_relational.order_graph_pagerank(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # pure JVM integer math


def test_skyline_range_partitioned_no_global_window(spark):
    plan = plan_of(workload_relational.lineitem_skyline(spark, SF_DIR))
    # the running-max window partitions by pid — never a single-partition
    # global sort (Window with empty partition spec shows 'Window [..]'
    # over an Exchange SinglePartition)
    assert "SinglePartition" not in plan, plan


def test_audio_vad_prunes_before_python_stage(spark):
    plan = plan_of(workload_mm.mm_audio_vad(spark, SF_DIR))
    # audio-type filter must land before the Arrow stage, and segmentation
    # shuffles once on media_id
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    head = plan.split("MapInPandas")[0] if "MapInPandas" in plan else plan
    assert "Filter" in head or "PushedFilters" in head


def test_changepoint_single_type_shuffle(spark):
    plan = plan_of(workload_relational.events_changepoint(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_winnowing_single_doc_shuffle_no_udf(spark):
    plan = plan_of(workload_text.docs_winnowing(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_abc_class_window_over_aggregate_not_fact(spark):
    plan = plan_of(workload_relational.orders_abc_class(spark, SF_DIR))
    # the (dim-bounded) global window must consume the part-keyed
    # AGGREGATE, never the fact table: HashAggregate appears below Window
    assert plan.index("HashAggregate") > 0
    assert "CartesianProduct" not in plan


def test_train_split_one_agg_no_udf(spark):
    plan = plan_of(workload_text.docs_train_split(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # hash + bucket in the scan stage, then one map-combined agg: the only
    # shuffles are the _docs spreading repartition and the groupBy
    assert n_shuffles(plan) <= 2, plan


def test_dsir_ratio_table_broadcasts(spark):
    plan = plan_of(workload_text.corpus_dsir_weights(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the 256-row log-ratio table must broadcast onto the doc-term side
    assert "BroadcastHashJoin" in plan, plan


def test_feature_mi_marginals_reaggregate_cells(spark):
    plan = plan_of(workload_relational.events_feature_mi(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the fact table is scanned ONCE (at the checkpointed cell aggregate);
    # marginals and the total re-aggregate the bounded in-memory cell table
    assert plan.count("Scan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan


def test_gini_window_and_agg_share_segment_partitioning(spark):
    plan = plan_of(workload_relational.customer_balance_gini(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SinglePartition" not in plan  # never a global sort
    assert n_shuffles(plan) <= 2, plan


def test_triangle_count_no_cartesian_oriented_join(spark):
    plan = plan_of(workload_relational.parts_triangle_count(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the edge list is checkpointed once, not re-derived per consumer
    assert plan.count("Scan ExistingRDD") >= 1, plan


def test_sax_windows_over_day_aggregate_not_fact(spark):
    plan = plan_of(workload_relational.events_sax_daily(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # per-type stats broadcast back onto the day-bounded aggregate
    assert "BroadcastHashJoin" in plan, plan


def test_rfm_two_pass_rank_no_global_sort_over_customers(spark):
    plan = plan_of(workload_relational.orders_rfm_segments(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # every Exchange SinglePartition in the plan must feed a metadata-
    # sized frame (the <=64-row bucket-offset windows), never the
    # customer aggregate: the customer-keyed windows partition by __bkt
    import re
    for m in re.finditer(r"^\(\d+\) Window\n(?:.*\n)*?Arguments: (.*)", plan, re.M):
        args = m.group(1)
        if "row_number" in args:
            assert "__bkt" in args, args  # rank windows are range-bucketed


def test_autocorr_fact_scanned_once(spark):
    plan = plan_of(workload_relational.events_lag_autocorr(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # lineage cut at the day-bounded daily aggregate
    assert plan.count("Scan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan


def test_kanon_fact_scanned_once(spark):
    plan = plan_of(workload_relational.events_kanon_audit(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Scan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan


def test_covariance_single_scan_fused_terms(spark):
    plan = plan_of(workload_text.embeddings_covariance(spark, SF_DIR))
    assert "BatchEvalPython" not in plan  # Arrow partials, never per-row
    assert "CartesianProduct" not in plan
    # quadratic + linear partials come from ONE Arrow pass (numpy X^T X
    # per batch); lineage cut at the d^2-bounded partial aggregate, so
    # the final plan holds no parquet scan and consumers read the
    # checkpointed agg
    assert plan.count("Scan parquet") == 0, plan
    assert "BroadcastHashJoin" in plan, plan


def test_sliding_topk_post_stream_rank_prunes(spark):
    plan = plan_of(workload.stream_sliding_topk(spark, SF_DIR))
    # the top-3 rank runs over the finalized (window-bounded) RESULT
    # table with map-side rank pruning, never over the stream
    assert "WindowGroupLimit" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cohort_ltv_custkey_coshuffle_no_cartesian(spark):
    plan = plan_of(workload_relational.orders_cohort_ltv(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # cohort agg and the join share the o_custkey partitioning; the
    # matrix agg adds one: nothing beyond 3 exchanges
    assert n_shuffles(plan) <= 3, plan


def test_quantize_two_pass_scales_broadcast(spark):
    plan = plan_of(workload_text.embeddings_quantize_int8(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # two passes are ALGORITHMIC (max must precede the error pass);
    # the d-bounded scale table must come back as a broadcast
    import re
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 2, plan
    assert "BroadcastHashJoin" in plan, plan


def test_benford_digit_extraction_scan_stage(spark):
    plan = plan_of(workload_relational.lineitem_benford_audit(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the FACT feeds exactly one shuffle (the cell agg); later exchanges
    # re-partition the <=27-row cell table, so bound them loosely
    assert n_shuffles(plan) <= 4, plan


def test_hhi_supplier_dim_broadcasts(spark):
    plan = plan_of(workload_relational.supplier_share_hhi(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_hill_topk_prunes_map_side(spark):
    plan = plan_of(workload_relational.orders_tail_index_hill(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # consumers read the checkpointed (k+1)-row top slice; the slice
    # itself was TakeOrderedAndProject (asserted by its own lock below)
    assert "Scan ExistingRDD" in plan, plan


def test_global_topk_plans_take_ordered(spark):
    from pyspark.sql import functions as F

    # the shared shape hill/zipf rely on: orderBy().limit(k) must plan as
    # TakeOrderedAndProject (per-partition top-k), never a global Sort
    o = workload_relational._t(spark, SF_DIR, "orders")
    df = o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()).limit(501)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_zipf_topk_prunes_map_side(spark):
    plan = plan_of(workload_text.docs_zipf_slope(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_welch_single_fact_pass_broadcast_pairs(spark):
    import re
    plan = plan_of(workload_relational.events_welch_ttest(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one moment pass over the fact; the 5-row pair frame is a broadcast
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) <= 2, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_burstiness_typed_window_no_global_sort(spark):
    plan = plan_of(workload_relational.events_burstiness(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the lag window partitions by event_type — never SinglePartition
    # over the fact
    head = plan.split("HashAggregate", 1)[0]
    assert "SinglePartition" not in head, plan


def test_survival_km_windows_over_gap_bounded_aggregate(spark):
    import re
    plan = plan_of(workload_relational.orders_survival_km(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # orders feeds two passes (the 1-row anchor agg + the lead-window
    # spans); the KM windows run over the CHECKPOINTED distinct-gap-day
    # aggregate, bounded by wall-clock days
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) <= 2, plan
    assert "Scan ExistingRDD" in plan, plan


def test_pmi_bigram_fanout_no_self_join(spark):
    plan = plan_of(workload_text.docs_pmi_pairs(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # unigram tables come back as broadcasts onto the bigram counts
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_gapfill_interp_grid_is_metadata_sized(spark):
    plan = plan_of(workload_relational.events_gapfill_interp(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the dense grid joins the ROLLUP (post-agg), never the fact; the
    # bracketing windows partition by event_type
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_yoy_supplier_broadcast_lag_over_aggregate(spark):
    plan = plan_of(workload_relational.nation_revenue_yoy(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan, plan
    assert n_shuffles(plan) <= 2, plan  # year agg + the tiny lag window


def test_readability_scan_stage_only(spark):
    plan = plan_of(workload_text.docs_readability_fk(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # pure per-row string expressions: no keyed shuffle at all
    assert "Exchange hashpartitioning" not in plan, plan


def test_hot_keys_topk_prunes_per_table(spark):
    plan = plan_of(workload.cdc_hot_keys(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the top-10 prunes per-partition over the key aggregate (the sim's
    # single constant table folds out of any window partition spec)
    assert "TakeOrderedAndProject" in plan, plan


def test_ann_recall_joins_bounded_topk_frames(spark):
    plan = plan_of(workload_text.ann_recall_eval(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # both component operators stay candidate-pruned; the recall join
    # touches only the k-by-queries frames
    assert "WindowGroupLimit" in plan, plan


def test_forecast_backtest_self_join_over_rollup(spark):
    import re
    plan = plan_of(workload_relational.events_forecast_backtest(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the self-join consumes the CHECKPOINTED hour-bounded rollup: no
    # parquet scan survives into the final plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 0, plan


def test_latency_quantiles_histogram_not_sort(spark):
    plan = plan_of(workload_relational.lineitem_latency_quantiles(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exact quantiles via the bounded histogram: the only fact-sized op
    # is the (flag, day) agg; the cumulative window runs over it, and
    # no approx_percentile / global Sort of the fact appears
    assert "approx_percentile" not in plan
    assert "SinglePartition" not in plan, plan


def test_dau_mau_bounded_fanout_over_presence(spark):
    plan = plan_of(workload_relational.events_dau_mau(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the fact collapses to (user, day) presence BEFORE the 28-day fan-out
    # (Generate above an Aggregate, never above the scan)
    gen_pos = plan.find("Generate")
    agg_pos = plan.find("HashAggregate")
    assert gen_pos > 0 and agg_pos > 0, plan


def test_correlations_salted_long_moments(spark):
    import re
    plan = plan_of(workload_relational.lineitem_metric_correlations(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one scan; level 1 sums LONGS per (flag, salt) — codegen path, no
    # per-row decimal — and level 2 decimal-sums the salted partials
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert n_shuffles(plan) == 2, plan
    head = plan.split("Exchange", 1)[0]
    assert "decimal" not in head.lower(), head  # fact side stays long


def test_image_tiles_prunes_before_python_stage(spark):
    import re
    plan = plan_of(workload_mm.mm_image_tiles(spark, SF_DIR))
    # image-type + nonempty filters land BELOW the Arrow stage in the
    # tree (formatted node ids grow leaf->root: Filter id < MapInPandas)
    mip = re.search(r"^\((\d+)\) MapInPandas", plan, re.M)
    filt = re.search(r"^\((\d+)\) Filter", plan, re.M)
    assert mip and filt, plan
    assert int(filt.group(1)) < int(mip.group(1)), plan


def test_video_cuts_prunes_before_python_stage(spark):
    import re
    plan = plan_of(workload_mm.mm_video_scene_cuts(spark, SF_DIR))
    mip = re.search(r"^\((\d+)\) MapInPandas", plan, re.M)
    filt = re.search(r"^\((\d+)\) Filter", plan, re.M)
    assert mip and filt, plan
    assert int(filt.group(1)) < int(mip.group(1)), plan
    # cut + scene windows share one media_id sort (lag and running sum)
    assert "CartesianProduct" not in plan


def test_haar_levels_halve_over_day_aggregate(spark):
    import re
    plan = plan_of(workload_relational.events_haar_wavelet(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # each level consumes the CHECKPOINTED previous level (the fact is
    # scanned once, inside level-1's lineage); the union reads RDDs
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 0, plan
    assert "Scan ExistingRDD" in plan, plan


def test_feature_store_left_join_no_fact_fact(spark):
    plan = plan_of(workload_relational.customer_feature_store(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # missing-order customers keep NULL features
    assert "LeftOuter" in plan, plan


def test_backlog_sweepline_running_sum_over_day_deltas(spark):
    plan = plan_of(workload_relational.orders_backlog_curve(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the cumulative window consumes the DAY-bounded delta aggregate:
    # HashAggregate sits below the (single-partition, bounded) Window
    import re
    win = re.search(r"^\((\d+)\) Window", plan, re.M)
    agg = re.search(r"^\((\d+)\) HashAggregate", plan, re.M)
    assert win and agg and int(agg.group(1)) < int(win.group(1)), plan


def test_heaps_first_occurrence_not_quadratic(spark):
    plan = plan_of(workload_text.corpus_heaps_law(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # cumulative distinct via groupBy-min first occurrences — the
    # cumulative windows run over the DOC-bounded per-doc table
    import re
    win = re.search(r"^\((\d+)\) Window", plan, re.M)
    agg = re.search(r"^\((\d+)\) HashAggregate", plan, re.M)
    assert win and agg and int(agg.group(1)) < int(win.group(1)), plan


def test_entropy_rate_cells_bounded(spark):
    import re
    plan = plan_of(workload_relational.events_entropy_rate(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # everything past the checkpointed (s, t) cell aggregate is bounded:
    # no parquet scan survives into the final plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 0, plan
    assert "Scan ExistingRDD" in plan, plan


def test_centroid_separation_broadcast_pair_join(spark):
    plan = plan_of(workload_text.embeddings_centroid_separation(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the |labels|*d centroid table broadcasts for the pair stage
    assert "BroadcastHashJoin" in plan, plan


def test_source_caps_two_phase_topk_plan(spark):
    """The per-domain cap is the two-phase top-k shape: exactly two
    shuffle exchanges (by (source, salt), then by source on the bounded
    survivors), no Python stage, no cartesian, and the quality algebra
    runs in the scan stage (single codegen expression, no extra
    exchange for the scoring)."""
    plan = plan_of(workload_text.docs_source_caps(spark, SF_DIR))
    # 3 exchanges: the _docs scan-spreading round-robin + exactly the
    # two keyed phases — by (source, salt) then by source alone
    assert n_shuffles(plan) == 3, plan
    assert "hashpartitioning(source" in plan and "__salt" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # both phases are row_number windows with Spark's WindowGroupLimit
    # pre-filter, so the hot key never sorts whole in one task
    import re

    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 2, plan
    assert "WindowGroupLimit" in plan, plan


def test_source_js_divergence_plan(spark):
    """The domain-shift audit never expands |sources| x |vocab|: only the
    PRESENT (source, token) join materializes (absent-token mass folds in
    algebraically), the per-source totals broadcast, and everything stays
    JVM-side."""
    plan = plan_of(workload_text.docs_source_js_divergence(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan, plan  # the |sources|-row totals side
    # the (source, tok, n) aggregate is checkpointed once; glob / src_tot /
    # the corpus total all derive from it by re-aggregation — the corpus is
    # scanned+tokenized exactly once, upstream of this plan (ADVICE r10:
    # previously glob and the g_total driver count re-tokenized it ~4x)
    assert "Scan parquet" not in plan, plan


def test_dup_rate_audit_digest_only_shuffle(spark):
    """The per-source dup audit shuffles 16-byte md5 digests, never text:
    the scan projects (source, md5(text)) before any exchange, and no
    Python stage or cartesian appears."""
    plan = plan_of(workload_text.docs_dup_rate_by_source(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # text is consumed by md5() inside the scan stage: no exchange other
    # than the digest/source hash partitions, and the post-scan schema
    # carries the digest, not the document body
    import re

    exchanges = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert exchanges, plan
    assert all("text" not in e for e in exchanges), exchanges


def test_boilerplate_coverage_plan(spark):
    """X165: positional shingles explode in the scan stage, spread and
    coverage shuffles are digest/doc keyed, and everything stays
    JVM-side — no Python stage, no cartesian, no window."""
    plan = plan_of(workload_text.docs_boilerplate_coverage(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    import re

    assert not re.search(r"^\(\d+\) Window\b", plan, re.M), plan


def test_wire_decode_no_row_at_a_time_python(spark):
    """X164: the wire path's Python stages are Arrow-batched kernels
    (mapInPandas unwrap/decode, pandas-UDF xid searchsorted) — never
    row-at-a-time BatchEvalPython — and no cartesian appears."""
    plan = plan_of(workload.pgoutput_wire_decode(spark, SF_DIR))
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dau_mau_hll_register_fanout_plan(spark):
    """X162: the post-checkpoint plan never rescans parquet (the per-day
    register table is the cut point) and the bounds frame broadcasts."""
    plan = plan_of(workload_relational.events_dau_mau_hll(spark, SF_DIR))
    assert "Scan parquet" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_profile_hll_single_melt_plan(spark):
    """X163: the counts branch and the register branch both derive from
    the ONE checkpointed melt — no parquet rescan, no second explode."""
    plan = plan_of(workload_text.docs_profile_hll(spark, SF_DIR))
    assert "Scan parquet" not in plan, plan
    import re

    assert len(re.findall(r"^\(\d+\) Generate explode", plan, re.M)) == 0, plan


def test_containment_join_plan_no_cartesian_and_pruned_scan(spark):
    """The one-sided prefix join must stay an equi-join (no cartesian
    fallback). The tokenize scan sits behind the eager checkpoint cut
    (by design — reused 3×), so scan pruning is asserted on the
    pre-checkpoint projection the operator builds from."""
    plan = plan_of(workload_text.docs_containment_dedup(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    from pyspark.sql import functions as F

    from etl_spark.operators.dedup import tokens
    from etl_spark.workload_text import _docs

    pre = _docs(spark, SF_DIR).select(
        "doc_id", F.array_distinct(tokens("text")).alias("toks"))
    scan = plan_of(pre).split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "text" in scan and "n_chars" not in scan and "lang" not in scan


def test_session_paths_single_user_exchange_before_window(spark):
    """Sessionization + per-session aggregation must not degenerate into
    extra corpus-wide exchanges: the lag window and the running-sum
    window share ONE user_id exchange; the session agg and the final
    path agg add one keyed exchange each (+ AQE may coalesce)."""
    plan = plan_of(workload_relational.events_session_paths(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert n_shuffles(plan) <= 3, plan[:2000]


def test_seasonal_decompose_collapses_before_window(spark):
    """The unpartitioned 13-month window must sit ABOVE the month-level
    aggregate (metadata-sized input), never above raw orders: exactly
    one month-keyed exchange below the window, and the scan prunes to
    (o_orderdate, o_totalprice)."""
    plan = plan_of(workload_relational.orders_seasonal_decompose(spark, SF_DIR))
    scan = plan.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "o_orderdate" in scan and "o_custkey" not in scan
    # window over a single partition is fine HERE because its input is
    # the month series (dozens of rows by construction): the Window
    # node's Input must be the aggregated (month, revenue) columns,
    # never raw order rows
    win_detail = plan.split(") Window", 1)[1]
    win_input = win_detail.split("Input", 1)[1].split("\n", 1)[0]
    assert "revenue" in win_input and "o_totalprice" not in win_input


def test_runs_test_collapses_before_window(spark):
    """orders_runs_test's unpartitioned lag windows must sit ABOVE the
    per-date aggregate (metadata-sized daily series), never above raw
    orders; the scan prunes to (o_orderdate, o_totalprice)."""
    plan = plan_of(workload_relational.orders_runs_test(spark, SF_DIR))
    scan = plan.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "o_orderdate" in scan and "o_custkey" not in scan
    win_detail = plan.split(") Window", 1)[1]
    win_input = win_detail.split("Input", 1)[1].split("\n", 1)[0]
    assert "rev" in win_input and "o_totalprice" not in win_input


def test_theil_index_one_keyed_shuffle_and_broadcast(spark):
    """lineitem_theil_index: one supplier-keyed exchange; the 1-row
    stats side joins as a broadcast (never a shuffled join); scan
    prunes to the three revenue columns."""
    plan = plan_of(workload_relational.lineitem_theil_index(spark, SF_DIR))
    scan = plan.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "l_suppkey" in scan and "l_orderkey" not in scan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_simpson_diversity_two_map_combined_shuffles(spark):
    """docs_simpson_diversity: explode → (source,term) agg → source agg;
    partial aggregation below each exchange, no window, scan prunes to
    (source, text)."""
    plan = plan_of(workload_text.docs_simpson_diversity(spark, SF_DIR))
    scan = plan.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "text" in scan and "n_chars" not in scan
    assert "Window" not in plan
    assert plan.count("partial_count") + plan.count("partial_sum") >= 1


def test_chisq_single_materialization_no_rescan(spark):
    """events_chisq_independence: the contingency table is checkpointed,
    so the four downstream branches (marginals, totals, grid) must NOT
    re-scan parquet — the raw stream is read exactly once (inside the
    checkpoint); everything in the outer plan is metadata-sized."""
    plan = plan_of(workload_relational.events_chisq_independence(spark, SF_DIR))
    assert "Scan parquet" not in plan, "a branch re-scans the raw events"
    assert "CartesianProduct" not in plan
    assert n_shuffles(plan) <= 5, plan


def test_mann_whitney_collapse_then_bucketed_rank(spark):
    """orders_mann_whitney: distinct-value collapse is checkpointed (one
    raw scan); ranks come from the bucketed two-pass scheme — exactly
    two Window nodes (the ≤64-row offset prefix and the
    bucket-partitioned prefix), never a global window over raw orders."""
    import re

    plan = plan_of(workload_relational.orders_mann_whitney(spark, SF_DIR))
    assert "Scan parquet" not in plan, "a branch re-scans raw orders"
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 2, plan
    assert "CartesianProduct" not in plan


def test_spearman_one_cube_scan_metadata_windows(spark):
    """lineitem_spearman_correlations: ONE checkpointed contingency-cube
    scan serves all three pairs; the three marginal-rank windows run on
    ≤50-row value series; rank sides broadcast back."""
    import re

    plan = plan_of(
        workload_relational.lineitem_spearman_correlations(spark, SF_DIR)
    )
    assert "Scan parquet" not in plan, "a pair branch re-scans lineitem"
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 3, plan
    assert plan.count("BroadcastExchange") >= 3
    assert "CartesianProduct" not in plan


def test_heavy_hitters_scan_prunes_and_broadcasts(spark):
    """events_heavy_hitters_mg: both data scans prune to user_id alone;
    the candidate set joins back as a BROADCAST (the raw stream never
    shuffles on the key domain); the MG stage is Arrow mapInPandas."""
    plan = plan_of(workload_relational.events_heavy_hitters_mg(spark, SF_DIR))
    for scan_schema in plan.split("ReadSchema: ")[1:]:
        head = scan_schema.split("\n", 1)[0]
        assert head in ("struct<user_id:bigint>", "struct<>"), head
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert n_shuffles(plan) <= 3, plan


def test_minhash_accuracy_pruned_scans_no_cartesian(spark):
    """dedup_minhash_accuracy rides the X2 LSH pipeline: every documents
    scan prunes to (doc_id, text); candidates come from the bucket
    equi-join — never a cartesian."""
    plan = plan_of(workload_text.dedup_minhash_accuracy(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    for scan_schema in plan.split("ReadSchema: ")[1:]:
        head = scan_schema.split("\n", 1)[0]
        assert head == "struct<doc_id:bigint,text:string>", head


def test_threshold_curve_single_verify_pass(spark):
    """corpus_dedup_threshold_curve: the verified pair set is
    checkpointed ONCE (Scan ExistingRDD) — the 7-way threshold sweep is
    column algebra over it, never a re-run of shingle/verify per
    cutoff."""
    plan = plan_of(workload_text.corpus_dedup_threshold_curve(spark, SF_DIR))
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan, "a threshold branch re-runs the verify"
    assert "CartesianProduct" not in plan


def test_kendall_tau_cube_collapse_then_constant_pairs(spark):
    """lineitem_kendall_tau: one checkpointed contingency-cube scan; the
    ordered-pair enumeration is a self-join of that metadata-sized table
    (a bounded nested-loop is FINE here — both sides are ≤ ~550 cells at
    any corpus size); marginal tie terms broadcast back."""
    plan = plan_of(workload_relational.lineitem_kendall_tau(spark, SF_DIR))
    assert "Scan parquet" not in plan, "a branch re-scans raw lineitem"
    assert "Window" not in plan
    assert plan.count("BroadcastExchange") >= 2


def test_vocab_overlap_one_scan_token_join(spark):
    """docs_source_vocab_overlap: one checkpointed distinct
    (source, token) collapse serves sizes AND the pair intersection;
    the pair join keys on TOKEN (bounded per-token fan-out), and the
    size sides broadcast back — no cartesian over sources×vocab."""
    plan = plan_of(workload_text.docs_source_vocab_overlap(spark, SF_DIR))
    assert "Scan parquet" not in plan, "a branch re-tokenizes the corpus"
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2

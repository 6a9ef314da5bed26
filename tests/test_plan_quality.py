"""Physical-plan quality gates — the 100 TB design checks.

Correctness tests prove the queries return the right rows; these
tests pin the *plan shapes* that make them survive a 1000-executor
cluster: dimension joins broadcast, filters and column pruning reach
the parquet scan, and nothing in the registered surface degenerates
into a cartesian product.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

import pytest

from idn_area_etl_spark.plans import all_specs

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def specs():
    return all_specs()


_STAGE_KEY = "spark.idnareaetl.stageMaterialization"


@contextmanager
def _staging_disabled(spark):
    """Build plans with _stage() as a no-op: staging replaces a
    subtree with an opaque `Scan ExistingRDD` the sweep classifiers
    cannot see through (a data-scaled frame behind the checkpoint
    would mechanically look bounded), so every repo-wide plan gate
    audits the FULL pre-staging dataflow.  Staging only moves a
    materialization boundary, never the dataflow, so the un-staged
    plan is the right object for 100 TB boundedness checks; the
    runtime (staged) shapes are pinned by the focused gates that
    build their own plans under the ambient conf."""
    prev = spark.conf.get(_STAGE_KEY, None)
    spark.conf.set(_STAGE_KEY, "none")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_STAGE_KEY)
        else:
            spark.conf.set(_STAGE_KEY, prev)


@pytest.fixture(scope="module")
def all_built(spark, specs):
    """(schema, executed-plan string) for EVERY registered spec, built
    once and shared by the repo-wide sweep tests below (each plan build
    costs ~0.1 s; sweeps re-building 350+ plans each tripled the
    suite's planning time for no information).  Built with staging
    disabled so the sweeps see the full dataflow (see
    _staging_disabled)."""
    out = {}
    with _staging_disabled(spark):
        for name, spec in specs.items():
            df = spec.builder(spark, SF_DIR)
            out[name] = (df.schema, plan_of(df))
    return out


@pytest.fixture(scope="module")
def all_plans(all_built):
    return {name: plan for name, (_, plan) in all_built.items()}


# --------------------------------------------------------------------------
# No registered query may plan a cartesian product.  (Broadcast
# nested-loop against a deliberately-broadcast tiny side is allowed —
# that's the intended strategy for e_cosine_topk's non-equi join.)
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# No registered query may sort UNBOUNDED data through a partition-less
# window (Exchange SinglePartition feeding a Window funnels every row
# through ONE task).  Two exemptions:
#   1. Windows whose spec references the `_pid` column are the internal
#      per-range-partition offset histograms of operators/ranks.py —
#      their input is <= the cluster partition count by construction.
#   2. Specs in BOUNDED_GLOBAL_WINDOW_OK run their global window over a
#      key-domain-bounded intermediate (calendar days/months/weeks,
#      25 nations, priority x segment cells, fixed bootstrap replicate
#      counts, fixed decile/bucket counts, 2 experiment arms, 30-day
#      pair grids) — cardinality is fixed by the domain, not the data,
#      so the single task sees a few thousand rows at any scale.
# Everything else (per-customer / per-part / per-doc / per-user /
# distinct-value ranks) must use the distributed primitives in
# operators/ranks.py.
# --------------------------------------------------------------------------

BOUNDED_GLOBAL_WINDOW_OK = {
    # calendar-day / month / week axis (fixed by the date domain)
    "a_best_split_sse", "a_durbin_watson", "a_ljung_box", "a_logrank_test",
    "a_mase_seasonal", "a_runs_test", "q_acf_revenue", "q_catalog_growth",
    "q_cumulative_distinct_users", "q_cusum_changepoint", "q_linear_gapfill",
    "q_mom_revenue_change", "q_revenue_pacing", "q_rolling_corr_daily",
    "q_rolling_median_revenue", "q_survival_curve", "s_purged_time_folds",
    # 25-nation / region leaderboards
    "a_bh_fdr", "a_borda_ranking", "a_kendall_tau", "q_prorata_allocation",
    "q_ratio_to_report",
    # fixed-cardinality cells / replicates / tiles / arms
    "a_mutual_information",      # event_type x quartile cells
    "a_poisson_bootstrap_ci",    # 24 bootstrap replicates
    "a_theil_sen",               # 30-day pair grid
    "a_two_proportion_ztest",    # 2 arms
    "q_chi2_priority_segment",   # priority x segment cells
    "q_psi_drift",               # 10 PSI buckets
    "a_cumulative_gains",        # second window over 10 deciles
    "d_vocab_growth",            # second window over 10 deciles
    # grouped_running_multi / discrete-median per-group offsets frames
    # (r7): the global window runs over the one-row-per-group-value
    # totals frame of a FIXED-domain key (3 flags, 25 nations, 5
    # segments/langs, 10 buckets, fixed label set)
    "a_quantile_sketch",         # 3 l_returnflag rank targets
    "q_percentiles",             # 5 o_orderpriority offsets
    "q_gini_acctbal",            # 25 c_nationkey offsets
    "q_rank_normalize",          # 5 c_mktsegment offsets
    "q_weighted_median_price",   # 3 l_returnflag offsets
    "q_winsorized_means",        # per-event_type offsets (fixed taxonomy)
    "s_budget_greedy",           # per-lang offsets (fixed taxonomy)
    "s_mixture_rebalance",       # 5-lang offsets
    "s_stratified_kfold",        # per-label offsets (fixed k)
    "s_length_matched_sample",   # 10-bucket offsets
    "w_ntile_customers",         # 25 c_nationkey offsets
    "w_rank_distribution",       # 25 s_nationkey offsets
}


def _single_partition_windows(plan: str) -> list[str]:
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if re.search(r"\bWindow \[", line) and "_pid#" not in line:
            for below in lines[i + 1:]:
                if "Exchange" in below:
                    if "Exchange SinglePartition" in below:
                        bad.append(line.strip()[:70])
                    break
    return bad


def test_no_unbounded_single_partition_window(spark, all_plans):
    offenders = {}
    for name, plan in all_plans.items():
        bad = _single_partition_windows(plan)
        if bad and name not in BOUNDED_GLOBAL_WINDOW_OK:
            offenders[name] = bad
    assert offenders == {}, (
        "single-partition window over data-dependent cardinality; use "
        f"operators/ranks.py primitives: {offenders}"
    )


def test_global_window_whitelist_has_no_stale_entries(spark, all_plans):
    """Every BOUNDED_GLOBAL_WINDOW_OK entry must correspond to a spec
    whose plan still HAS a single-partition window — otherwise the
    entry is stale cover that would mask a future regression (r7,
    mirroring the broadcast/NLJ/per-group-window staleness gates)."""
    stale = []
    for name in BOUNDED_GLOBAL_WINDOW_OK:
        plan = all_plans.get(name)
        assert plan is not None, f"whitelisted spec {name} not registered"
        if not _single_partition_windows(plan):
            stale.append(name)
    assert stale == [], f"stale BOUNDED_GLOBAL_WINDOW_OK entries: {stale}"


def test_oracle_specs_emit_hashable_columns(specs, all_built):
    """No oracle-checked spec may emit a top-level array/map/struct
    column: the driver's correctness harness canonicalizes results with
    a pandas sort, which cannot hash list/dict cells (the r2
    q_percentiles failure class)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, spec in specs.items():
        if spec.oracle is None:
            continue
        schema, _ = all_built[name]
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert offenders == []


def test_no_cartesian_product_anywhere(spark, all_plans):
    offenders = [n for n, plan in all_plans.items() if "CartesianProduct" in plan]
    assert offenders == []


# --------------------------------------------------------------------------
# Repo-wide Python-eval sweep.  Row-at-a-time Python UDFs
# (BatchEvalPython) are banned from EVERY registered plan — the hot
# path stays inside whole-stage codegen.  Arrow-vectorized Pandas UDFs
# (ArrowEvalPython) are the sanctioned slow path and may appear only in
# the specs that genuinely need Python semantics (Unicode NFC
# normalization via unicodedata, and the multimodal codec plumbing).
# --------------------------------------------------------------------------

ARROW_EVAL_OK = {
    "d_unicode_nfc",          # unicodedata.normalize — no Catalyst equivalent
    "mm_frame_sample",        # multimodal mapInPandas codec (real WAV sampler)
    "mm_codec_roundtrip",     # stdlib WAV/BMP encode+decode round-trip
    "mm_audio_windows",
    "e_isotonic_calibration",  # PAVA is inherently sequential per group
    "e_isotonic_planted",      # same operator, planted fixed-point oracle
    "d_winnow_pairs",         # rolling k-gram hash — sequential per doc,
                              # vectorized Arrow batch (winnow_fingerprint_rows)
}

_PY_EVAL = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def test_no_exponential_plan_growth(all_plans):
    """Iterative operators must truncate per-round lineage (driver-side
    state or localCheckpoint).  Threading a tiny DataFrame through a
    loop replicates the plan per round — kmeans_fit once planned
    6.5 MB / 4088 broadcast exchanges, kcore_peel 1.3 MB.  The largest
    legitimate static plan (e_ann_lsh's multi-table LSH union) is
    ~120 KB; anything over 500 KB is a lineage leak, not a real plan."""
    offenders = {
        n: len(plan) for n, plan in all_plans.items() if len(plan) > 500_000
    }
    assert offenders == {}, f"plan-size blowup (lineage leak?): {offenders}"


def test_no_row_at_a_time_python_anywhere(all_plans):
    offenders = [n for n, plan in all_plans.items() if "BatchEvalPython" in plan]
    assert offenders == [], (
        f"row-at-a-time Python UDF in registered plans: {offenders}"
    )


def test_arrow_eval_only_where_sanctioned(all_plans):
    offenders = [
        n
        for n, plan in all_plans.items()
        if any(tag in plan for tag in _PY_EVAL) and n not in ARROW_EVAL_OK
    ]
    assert offenders == [], (
        f"unsanctioned Pandas-UDF path in registered plans: {offenders}"
    )


# --------------------------------------------------------------------------
# Dimension joins must broadcast (no full shuffle of the fact table
# against a dim that fits in memory).
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "q3_shipping_priority",
        "q5_regional_revenue",
        "q10_returned_items",
        "q7_volume_shipping",
        "q9_product_profit",
    ],
)
def test_dim_joins_broadcast(spark, specs, name):
    plan = plan_of(specs[name].builder(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# Predicate pushdown: the lineitem date filter must reach the parquet
# scan, not run post-scan only.
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name, pushed",
    [
        ("q1_pricing_summary", "LessThanOrEqual(l_shipdate"),
        ("q3_shipping_priority", "GreaterThan(l_shipdate"),
        ("q10_returned_items", "EqualTo(l_returnflag,R)"),
    ],
)
def test_filters_pushed_to_scan(spark, specs, name, pushed):
    plan = plan_of(specs[name].builder(spark, SF_DIR))
    assert pushed in plan, f"expected pushed filter {pushed!r} in {name} scan"


# --------------------------------------------------------------------------
# Column pruning: q1 touches 7 of lineitem's 16 columns; the scan's
# ReadSchema must not include the untouched wide ones.
# --------------------------------------------------------------------------


def test_q1_scan_prunes_columns(spark, specs):
    # the scan's metadata string is truncated at 100 chars by default,
    # which would hide (or fake) pruning — raise the cap for the check
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        plan = plan_of(specs["q1_pricing_summary"].builder(spark, SF_DIR))
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert read_schemas, "no parquet scan found in q1 plan"
    for schema in read_schemas:
        assert "l_comment" not in schema
        assert "l_shipinstruct" not in schema
        assert "l_quantity" in schema


# --------------------------------------------------------------------------
# Aggregations must partial-aggregate map-side before the shuffle
# (shuffle carries O(groups), not O(rows)).
# --------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["q1_pricing_summary", "d_dedup_exact"])
def test_agg_is_partial_then_final(spark, specs, name):
    plan = plan_of(specs[name].builder(spark, SF_DIR))
    assert "partial_" in plan, f"{name} shuffles raw rows (no map-side agg)"


# --------------------------------------------------------------------------
# Blocked similarity self-joins must be equi-joins on the block key —
# never a nested-loop over all pairs.
# --------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["d_ngram_jaccard_topk", "d_minhash_candidates"])
def test_blocked_self_joins_are_equi_joins(spark, specs, name):
    plan = plan_of(specs[name].builder(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


# --------------------------------------------------------------------------
# e_cosine_topk: the query side must be the broadcast build side; the
# corpus must stream (scales to any corpus size).
# --------------------------------------------------------------------------


def test_cosine_topk_broadcasts_query_side(spark, specs):
    plan = plan_of(specs["e_cosine_topk"].builder(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# Wave 8-10 gates: benchmark/sketch/centroid sides must broadcast;
# the native binary-window expansion must stay Python-free.
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    ["d_contamination", "a_countmin_users", "a_label_cohesion"],
)
def test_small_sides_broadcast_in_new_waves(spark, specs, name):
    plan = plan_of(specs[name].builder(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_binary_windows_stay_jvm_side(spark, specs):
    plan = plan_of(specs["mm_audio_windows"].builder(spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # expansion is the native Generate operator, and the doc_id filter
    # reaches the parquet scan through it
    assert "Generate explode" in plan
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,50)]" in plan


def test_winnow_pairs_equi_join(spark, specs):
    plan = plan_of(specs["d_winnow_pairs"].builder(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# Wave 14-15 gates.
# --------------------------------------------------------------------------


def test_scd2_windows_share_one_exchange(spark, specs):
    """All three SCD2 windows partition by custkey — the plan must
    contain exactly ONE hash-partitioning exchange (plus the final
    presentation sort), not one per window."""
    plan = plan_of(specs["q_scd2_priority"].builder(spark, SF_DIR))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_fuzzy_linkage_is_blocked_equi_join(spark, specs):
    """The levenshtein predicate must ride an equi-join on the block
    key as a residual condition — never a nested loop over all
    customer pairs."""
    plan = plan_of(specs["j_fuzzy_customer_pairs"].builder(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan  # residual on the join, not a UDF


def test_bloom_prefilter_stays_codegen_before_semi_join(spark, specs):
    """The bloom membership test is a literal-bitmap column expression
    (whole-stage codegen, no Python), placed BEFORE the exact LeftSemi
    join that removes false positives."""
    plan = plan_of(specs["q_bloom_prefilter"].builder(spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "LeftSemi" in plan
    assert "shiftright" in plan  # the bitmap probe expression
    # probe-side filter must appear below the join in the plan tree
    assert plan.index("shiftright") > plan.index("LeftSemi")


def test_triangle_join_is_equi_only(spark, specs):
    plan = plan_of(specs["g_triangle_parts"].builder(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_quantized_topk_broadcasts_probe_side(spark, specs):
    plan = plan_of(specs["e_quantized_topk"].builder(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# Wave 16-20 gates.
# --------------------------------------------------------------------------


def test_association_rules_broadcast_item_counts(spark, specs):
    """The per-item count enrichments must broadcast — only the
    basket-keyed pair join may shuffle."""
    plan = plan_of(specs["a_association_rules"].builder(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quality_report_ri_checks_are_hash_joins(spark, specs):
    """Referential-integrity checks must plan as equi hash joins
    (never a NOT IN nested loop over data rows).  r9: the RI counts
    are FOLDED into each table's single check pass as LeftOuter
    joins against the referenced unique key + null-indicator sums —
    equivalent to the old standalone LeftAnti counts (the key is
    unique, so row multiplicity is preserved) with the duplicate
    table scans deleted.  The 1-row scalar aggregates cross-combine
    via broadcast nested loop — that's 1-row × 1-row, allowed."""
    plan = plan_of(specs["q_data_quality_report"].builder(spark, SF_DIR))
    assert plan.count("LeftOuter") >= 2
    assert "CartesianProduct" not in plan
    # both tables scanned once: the checks and the RI indicator share
    # one pass each
    assert plan.count("Scan parquet") <= 4


def test_pq_rerank_joins_stay_equi(spark, specs):
    """PQ: the ADC scoring join on (sub, code) and the rerank join on
    neighbor_id are equi-joins; only deliberate broadcast tables may
    nest."""
    plan = plan_of(specs["e_pq_topk"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_sliding_window_single_shuffle(spark, specs):
    """The sliding window is a groupBy over the window struct: the
    two-phase distinct aggregation's pair of hash exchanges (partial
    on (window, user), final on window) and nothing more — no join,
    no per-window self-join explosion."""
    plan = plan_of(specs["q_sliding_window_users"].builder(spark, SF_DIR))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert "Join" not in plan


def test_incremental_rollup_partials_combine_map_side(spark, specs):
    plan = plan_of(specs["q_incremental_rollup"].builder(spark, SF_DIR))
    assert "partial_" in plan


def test_ols_single_partial_agg_no_window(spark, specs):
    """All five OLS power sums ride ONE map-side-combinable
    aggregation — no window, no second scan."""
    plan = plan_of(specs["q_ols_price_quantity"].builder(spark, SF_DIR))
    assert "partial_" in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_ewma_lags_share_one_window(spark, specs):
    """The 10 lag terms and the row_number ranking fold into exactly
    two Window operators over the same (user_id, ts) sort — the lag
    polynomial must not multiply sorts."""
    plan = plan_of(specs["q_ewma_user_value"].builder(spark, SF_DIR))
    assert len(re.findall(r"\bWindow\b", plan)) == 2
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_semantic_dedup_seed_broadcast_and_blocked_pairs(spark, specs):
    """Seed assignment broadcasts the k-row seed side; the pair
    search is an equi-join on cluster id (never a global cross
    join of the vector table with itself).

    r8: the assignment subtree is staged (it feeds both sides of the
    blocked self-join), so the final plan reads the assignment from a
    materialized RDD — the seed-broadcast shape is asserted on the
    assignment subtree itself, the blocked-pair shape on the final
    plan."""
    from idn_area_etl_spark.plans.wave22 import seeded_semantic_clusters
    from idn_area_etl_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    assign_plan = plan_of(seeded_semantic_clusters(emb))
    assert "BroadcastNestedLoopJoin" in assign_plan  # k-seed cross join
    assert "CartesianProduct" not in assign_plan

    plan = plan_of(specs["e_semantic_dedup_seeded"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # scored exactly once
    # pair join keyed on cluster id (hash-equi; AQE may broadcast the
    # small side at tiny SF — any equi strategy qualifies)
    assert re.search(
        r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[cluster",
        plan,
    )


def test_probe_label_nn_subtree_shape(spark, specs):
    """The shared probe-1-NN operator (a_cohens_kappa / a_macro_f1 /
    e_knn_loo_accuracy): the probe side is a broadcast bounded by the
    literal vec_id filter (this subtree is staged inside kappa and
    macro_f1, so the final audited plans no longer contain the NLJ —
    the boundedness evidence lives here), and the corpus-scale argmax
    runs as a map-side-combinable partial_max HashAggregate — the
    SortAggregate (min_by's struct buffer) consumes only the bounded
    (qid, truth, pred) rollup after the exchange."""
    from idn_area_etl_spark.operators.similarity import probe_label_nn
    from idn_area_etl_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = plan_of(probe_label_nn(emb))
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan
    # corpus stream reduced by a primitive-buffer partial max BEFORE
    # the exchange; the struct-keyed min_by sees only the rollup
    assert "partial_max" in plan
    i_max = plan.index("partial_max")
    i_sort = plan.index("SortAggregate")
    # formatted explain lists operators leaves-last: the SortAggregate
    # (downstream) prints before the partial_max feeding it
    assert i_sort < i_max
    # staged consumers keep the corpus pass single: the probe NLJ is
    # gone from the final plans (the only NLJs left are the bounded
    # 1-row-aggregate cross joins of the kappa arithmetic, which the
    # audit classifies mechanically — no whitelist note needed; _ba
    # is the module-level broadcast_audit import defined below)
    for name in ("a_cohens_kappa", "a_macro_f1"):
        final = plan_of(specs[name].builder(spark, SF_DIR))
        verdicts = [v for v, _, _ in _ba.audit_plan_nlj(final)]
        assert "unbounded" not in verdicts


def test_perplexity_count_joins_stay_equi(spark, specs):
    plan = plan_of(specs["d_perplexity_bigram"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # add-one smoothing joins on (w1, w2) / (w1): all equi joins
    assert "Join" in plan


def test_fifo_join_blocked_on_partkey(spark, specs):
    """FIFO interval matching must be an equi-join on partkey with
    the overlap predicate as residual — per-key blocked, never a
    global interval cross join."""
    plan = plan_of(specs["q_fifo_allocation"].builder(spark, SF_DIR))
    assert re.search(
        r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[partkey",
        plan,
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_geo_hub_side_broadcasts(spark, specs):
    """The 25-hub side broadcasts; the customer table is never
    shuffled for the argmin."""
    plan = plan_of(specs["j_geo_nearest_hub"].builder(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    # exactly the final groupBy exchanges remain
    assert "SortMergeJoin" not in plan


def test_bitmap_overlap_bit_or_combines_map_side(spark, specs):
    plan = plan_of(specs["a_bitmap_overlap"].builder(spark, SF_DIR))
    assert "partial_bit_or" in plan


def test_journey_single_shuffle_to_user(spark, specs):
    """Journey strings build in one grouped aggregation by user (the
    sort happens inside array_sort, not as a plan-level sort)."""
    plan = plan_of(specs["q_journey_patterns"].builder(spark, SF_DIR))
    assert "Join" not in plan


def test_rank_movers_single_orders_scan(spark, specs):
    """Early/late spend comes from conditional aggregation in ONE
    scan of orders — no period self-join.  The only joins allowed are
    the broadcast joins against the distributed-ranking offset
    histograms (<= numPartitions rows each)."""
    plan = plan_of(specs["q_rank_movers"].builder(spark, SF_DIR))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_cumulative_distinct_single_scan_no_join(spark, specs):
    """Running distinct users: one events scan, user-keyed min with
    map-side partials, window only over the tiny day rollup."""
    plan = plan_of(specs["q_cumulative_distinct_users"].builder(spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "Join" not in plan
    assert "partial_min" in plan


def test_pmi_joins_stay_equi_totals_broadcast(spark, specs):
    """PMI: bigram→unigram probability joins are equi-joins; the only
    nested-loop is the 1-row corpus-totals broadcast."""
    plan = plan_of(specs["a_pmi_bigrams"].builder(spark, SF_DIR))
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan


def test_prorata_nation_dim_broadcasts(spark, specs):
    plan = plan_of(specs["q_prorata_allocation"].builder(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_acf_single_lineitem_scan(spark, specs):
    """ACF reads lineitem once; the lag/stack unpivot happens on the
    day-level rollup, never re-scanning the fact table."""
    plan = plan_of(specs["q_acf_revenue"].builder(spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_kcore_peel_joins_stay_semi_equi(spark, specs):
    """Every peel round's endpoint filters plan as equi semi joins —
    no nested-loop blowup across rounds."""
    plan = plan_of(specs["g_kcore_parts"].builder(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


def test_moments_two_scans_mode_broadcast(spark, specs):
    """Moment stats: power sums + mode are two customer aggs; the
    mode joins back via broadcast, partials combine map-side."""
    plan = plan_of(specs["q_moment_stats"].builder(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan or "partial" in plan


def test_trigrams_single_user_shuffle(spark, specs):
    """Both leads share ONE user-keyed window exchange."""
    plan = plan_of(specs["q_event_trigrams"].builder(spark, SF_DIR))
    assert plan.count("Window") <= 2  # one Window op (+ its name in reuse)
    assert "Join" not in plan


def test_holt_no_join_single_scan(spark, specs):
    """Holt is one events scan → day rollup → per-key fold; no joins,
    no per-row Python."""
    plan = plan_of(specs["q_holt_forecast"].builder(spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_rake_counts_join_equi(spark, specs):
    plan = plan_of(specs["d_rake_keywords"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grid_join_is_equi_on_cell(spark, specs):
    """The spatial candidate join must plan as an equi-join on the
    grid cell — the whole point of binning is avoiding the O(n²)
    nested loop the oracle runs."""
    plan = plan_of(specs["j_grid_close_pairs"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rfm_thresholds_broadcast_no_sort(spark, specs):
    """RFM buckets by broadcast percentile thresholds — no global
    ntile sort of the customer base."""
    plan = plan_of(specs["q_rfm_segments"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # scalar broadcasts only: ref date + the three 1-row discrete
    # quantile-threshold frames (r7; each a global agg over the
    # running-count rollup — the plan string may render a broadcast
    # more than once via exchange reuse)
    assert plan.count("BroadcastNestedLoopJoin") <= 8


def test_equidepth_no_global_sort_of_facts(spark, specs):
    plan = plan_of(specs["q_equidepth_histogram"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial" in plan


def test_cohort_ltv_first_join_shuffles_on_custkey(spark, specs):
    plan = plan_of(specs["q_cohort_ltv"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gaps_single_scan_one_window(spark, specs):
    plan = plan_of(specs["q_interpurchase_gaps"].builder(spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_attribution_joins_equi_on_user(spark, specs):
    plan = plan_of(specs["q_multitouch_attribution"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cusum_single_scan_tiny_window(spark, specs):
    plan = plan_of(specs["q_cusum_changepoint"].builder(spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1


def test_lorenz_thresholds_broadcast(spark, specs):
    plan = plan_of(specs["q_lorenz_deciles"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_nearest_join_stays_equi(spark, specs):
    plan = plan_of(specs["j_nearest_purchase_click"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winsorized_thresholds_broadcast(spark, specs):
    plan = plan_of(specs["q_winsorized_means"].builder(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_profile_single_scan(spark, specs):
    plan = plan_of(specs["q_profile_orders"].builder(spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_mixture_rank_window_partitioned_by_lang(spark, specs):
    plan = plan_of(specs["s_mixture_rebalance"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_loyal_forall_no_correlated_subplan(spark, specs):
    """FORALL compiles to conditional counts — one grouped pass, the
    nation-mean side broadcasts, no per-row correlated subquery."""
    plan = plan_of(specs["q_loyal_customers"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_dim_variance_partials_combine(spark, specs):
    plan = plan_of(specs["a_dim_variance"].builder(spark, SF_DIR))
    assert "partial_sum" in plan or "partial" in plan
    assert "Join" not in plan


def test_mrl_query_side_broadcasts(spark, specs):
    """MRL stage-1 broadcasts the query side; the corpus streams —
    no corpus shuffle before the shortlist filter."""
    plan = plan_of(specs["e_mrl_prefix_topk"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # deliberate tiny-side NLJ


def test_density_clusters_no_cartesian(spark, specs):
    plan = plan_of(specs["g_grid_density_clusters"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_bpe_encode_stays_codegen(spark, specs):
    """BPE encode is a chain of higher-order folds — no Python in the
    per-row path."""
    plan = plan_of(specs["d_bpe_encode_stats"].builder(spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_skew_report_bounded_scans(spark, specs):
    """stats + hot-key branches re-derive the per-key rollup; two
    single-column scans max (a cluster run would persist the rollup
    or rely on exchange reuse), and nothing quadratic."""
    plan = plan_of(specs["q_skew_report"].builder(spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) <= 2
    assert "CartesianProduct" not in plan


def test_weighted_median_shares_flag_exchange(spark, specs):
    """r7 shape: grouped_running_multi over the (flag, price) rollup —
    the only joins are broadcasts of the tiny offset frames (per-range
    -partition histogram + 3-row per-flag offsets); no shuffle join on
    the data-scaled side, no cartesian."""
    plan = plan_of(specs["q_weighted_median_price"].builder(spark, SF_DIR))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_auc_single_shuffle_by_score(spark, specs):
    """AUC: score is row-local, the only heavy exchange keys the
    score rollup; no joins, no Python."""
    plan = plan_of(specs["a_model_auc"].builder(spark, SF_DIR))
    # only the broadcast joins against the ranking offset histograms
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_survival_windows_on_life_table(spark, specs):
    plan = plan_of(specs["q_survival_curve"].builder(spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) <= 2
    assert "CartesianProduct" not in plan


def test_bm25_idf_broadcasts(spark, specs):
    """BM25: df/corpus sides broadcast; the only fact-scale exchange
    is the (doc, term) tf aggregation."""
    plan = plan_of(specs["d_bm25_search"].builder(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_snapshot_diff_two_rollups_one_join(spark, specs):
    plan = plan_of(specs["q_snapshot_diff"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan or "full_outer" in plan.lower()


def test_impute_means_broadcast(spark, specs):
    plan = plan_of(specs["q_impute_missing"].builder(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_reconciliation_rollup_join_equi(spark, specs):
    plan = plan_of(specs["q_order_reconciliation"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_trailing_mode_one_event_scan(spark, specs):
    plan = plan_of(specs["w_trailing_mode"].builder(spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_psi_thresholds_broadcast_no_fact_sort(spark, specs):
    plan = plan_of(specs["q_psi_drift"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_ks_windows_over_value_rollup(spark, specs):
    """KS ECDFs come from one window pass over the DISTINCT-value
    rollup — never a per-row sort of the raw samples."""
    plan = plan_of(specs["q_ks_two_sample"].builder(spark, SF_DIR))
    # scans: the raw sample plus the offset-histogram branch (one
    # ReusedExchange at execution); joins: broadcast-only
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_mi_contingency_single_agg(spark, specs):
    plan = plan_of(specs["a_mutual_information"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_link_prediction_all_equi_joins(spark, specs):
    plan = plan_of(specs["g_link_prediction"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_frequent_triples_all_equi_joins(spark, specs):
    plan = plan_of(specs["a_frequent_triples"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_engagement_single_scan_plus_scalar(spark, specs):
    plan = plan_of(specs["q_recency_engagement"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "partial" in plan


def test_gapfill_axis_windows_not_fact_scale(spark, specs):
    plan = plan_of(specs["q_linear_gapfill"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_waterfall_single_lineitem_pass(spark, specs):
    """Both periods come from conditional aggregation in ONE scan."""
    plan = plan_of(specs["q_price_volume_waterfall"].builder(spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_js_vocab_broadcast_equi_joins(spark, specs):
    plan = plan_of(specs["d_js_divergence_langs"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_stump_one_pass_over_scored_rows(spark, specs):
    """All candidate split cells come from ONE aggregation (stack of
    a single wide agg row) — not one scan per threshold."""
    plan = plan_of(specs["a_decision_stump"].builder(spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) <= 2  # scored + thr
    assert "CartesianProduct" not in plan


def test_silhouette_centroids_broadcast(spark, specs):
    plan = plan_of(specs["e_silhouette_lite"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_tile_plan_pure_codegen_explode(spark, specs):
    plan = plan_of(specs["mm_image_tiles"].builder(spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "Generate" in plan  # the tile explode is a native Generate


def test_cross_modal_join_equi(spark, specs):
    plan = plan_of(specs["mm_doc_embedding_join"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pit_join_one_key_exchange_no_interval_explosion(spark, specs):
    """PIT rides the as-of union+window: no range join, no nested
    loop — one exchange keyed on the entity."""
    plan = plan_of(specs["j_point_in_time"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_seasonal_anomaly_broadcast_composition(spark, specs):
    plan = plan_of(specs["q_seasonal_anomaly"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_kcenter_selected_side_broadcasts(spark, specs):
    plan = plan_of(specs["s_kcenter_coreset"].builder(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_canonical_dedup_single_scan(spark, specs):
    plan = plan_of(specs["d_canonical_dedup"].builder(spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_quantile_normalize_ref_side_broadcasts(spark, specs):
    plan = plan_of(specs["q_quantile_normalize"].builder(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# Broadcast-cardinality gate (round 5).  A F.broadcast hint is only
# allowed on frames whose cardinality is bounded BY CONSTRUCTION —
# never on a frame with one row per document / token / order /
# customer / part, which at 100 TB exceeds the 8 GB broadcast cap and
# OOMs every executor (the round-4 judge found two such hints:
# s_dedup_keep_best's per-cluster keeper frame and d_dsir_weights'
# full-vocabulary ratio frame).
#
# Mechanics (tools/broadcast_audit.py): plans are built with
# autoBroadcastJoinThreshold=-1, under which the ONLY surviving
# BroadcastExchanges are hint-forced.  Each broadcast subtree must
# either not scan a data-scaled table, contain a global aggregate or
# limit, or carry a justified whitelist entry.  Restoring either
# round-4 hint (or adding a new unbounded one) fails this gate.
# --------------------------------------------------------------------------

import importlib.util  # noqa: E402
from pathlib import Path  # noqa: E402

_ba_spec = importlib.util.spec_from_file_location(
    "broadcast_audit",
    Path(__file__).resolve().parent.parent / "tools" / "broadcast_audit.py",
)
_ba = importlib.util.module_from_spec(_ba_spec)
_ba_spec.loader.exec_module(_ba)
BOUNDED_BY_CONSTRUCTION = _ba.BOUNDED_BY_CONSTRUCTION
BOUNDED_NLJ = _ba.BOUNDED_NLJ
BOUNDED_WINDOWS = _ba.BOUNDED_WINDOWS
audit_spec = _ba.audit_spec
audit_plan = _ba.audit_plan
audit_plan_nlj = _ba.audit_plan_nlj
audit_plan_windows = _ba.audit_plan_windows
broadcast_subtrees = _ba.broadcast_subtrees
classify = _ba.classify
nlj_sides = _ba.nlj_sides
window_partition_keys = _ba.window_partition_keys


@pytest.fixture(scope="module")
def hint_forced_plans(spark, specs):
    """Executed-plan strings for every registered spec, built under
    autoBroadcastJoinThreshold=-1 so only hint-forced broadcasts
    survive into the plans — AND size-based broadcasts can no longer
    disguise a data-scaled cross product as a BroadcastNestedLoopJoin
    (the a_win_ratio blind spot)."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_meta = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        with _staging_disabled(spark):
            return {
                name: plan_of(spec.builder(spark, SF_DIR))
                for name, spec in specs.items()
            }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.maxMetadataStringLength", old_meta)


@pytest.fixture(scope="module")
def hint_forced_audits(hint_forced_plans):
    return {
        name: audit_plan(plan) for name, plan in hint_forced_plans.items()
    }


def test_no_unbounded_forced_broadcast(specs, hint_forced_audits):
    offenders = {}
    for name, audits in hint_forced_audits.items():
        bad = [
            f"{sorted(big)}: {head}"
            for verdict, big, head in audits
            if verdict == "unbounded" and name not in BOUNDED_BY_CONSTRUCTION
        ]
        if bad:
            offenders[name] = bad
    assert offenders == {}, (
        "hint-forced broadcast of a data-scaled frame (100 TB OOM); either "
        "drop the F.broadcast hint (AQE still broadcasts genuinely small "
        "sides at runtime) or add a justified BOUNDED_BY_CONSTRUCTION "
        f"entry: {offenders}"
    )


def test_broadcast_whitelist_has_no_stale_entries(specs, hint_forced_audits):
    """Every whitelist entry must correspond to a spec that still HAS a
    hint-forced broadcast fed by a data-scaled scan — otherwise the
    entry is stale cover that would mask a future regression."""
    stale = []
    for name in BOUNDED_BY_CONSTRUCTION:
        audits = hint_forced_audits.get(name)
        assert audits is not None, f"whitelisted spec {name} not registered"
        if not any(verdict == "unbounded" for verdict, _, _ in audits):
            stale.append(name)
    assert stale == [], f"stale BOUNDED_BY_CONSTRUCTION entries: {stale}"


def test_broadcast_gate_teeth(spark, sf_dir):
    """Restoring an unbounded hint MUST trip the gate: force-broadcast
    a per-document frame (the exact round-4 keeper shape) and assert
    the audit classifies it unbounded."""
    from pyspark.sql import functions as F

    from idn_area_etl_spark.sources.tables import load_table

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        docs = load_table(spark, sf_dir, "documents")
        per_doc = docs.groupBy("doc_id").agg(F.max(F.length("text")).alias("c"))
        df = docs.join(F.broadcast(per_doc), "doc_id").select("doc_id", "c")
        verdicts = [v for v, _, _ in audit_spec(df)]
        assert "unbounded" in verdicts, (
            "gate failed to flag a forced per-document broadcast"
        )
        # and the same join WITHOUT the hint must be clean
        df_ok = docs.join(per_doc, "doc_id").select("doc_id", "c")
        assert all(v == "ok" for v, _, _ in audit_spec(df_ok))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.maxMetadataStringLength")


# --------------------------------------------------------------------------
# All-pairs join gate (round 6).  A CartesianProduct or
# BroadcastNestedLoopJoin whose BOTH sides are fed by data-scaled scans
# (with no global-agg/limit bound) materializes a quadratic cross
# product — the r5 judge found a_win_ratio doing exactly this over
# per-user frames, invisible to the default-config cartesian check
# (the planner broadcast one side at test SF) AND to the broadcast
# audit (no hint, so no BroadcastExchange under -1 — just a naked
# CartesianProduct the audit never inspects).  Plans are built under
# autoBroadcastJoinThreshold=-1; a node is flagged unless one side is
# bounded or the spec carries a justified BOUNDED_NLJ entry.
# --------------------------------------------------------------------------


def test_no_all_pairs_join_anywhere(specs, hint_forced_plans):
    offenders = {}
    for name, plan in hint_forced_plans.items():
        bad = [
            f"{sorted(big)}: {head}"
            for verdict, big, head in audit_plan_nlj(plan)
            if verdict == "unbounded" and name not in BOUNDED_NLJ
        ]
        if bad:
            offenders[name] = bad
    assert offenders == {}, (
        "all-pairs join over two data-scaled sides (quadratic at 100 TB); "
        "reformulate as rank/dominance counting, block the join on a key, "
        "or bound one side by construction and add a justified BOUNDED_NLJ "
        f"entry: {offenders}"
    )


def test_nlj_whitelist_has_no_stale_entries(specs, hint_forced_plans):
    """Every BOUNDED_NLJ entry must correspond to a spec whose -1-config
    plan still HAS a flagged nested-loop node — otherwise the entry is
    stale cover that would mask a future regression."""
    stale = []
    for name in BOUNDED_NLJ:
        plan = hint_forced_plans.get(name)
        assert plan is not None, f"whitelisted spec {name} not registered"
        if not any(v == "unbounded" for v, _, _ in audit_plan_nlj(plan)):
            stale.append(name)
    assert stale == [], f"stale BOUNDED_NLJ entries: {stale}"


def test_all_pairs_gate_teeth(spark, sf_dir):
    """Re-creating the r5 a_win_ratio shape (two per-user rollups
    cross-joined) MUST flag; bounding one side with a global aggregate
    must pass."""
    from pyspark.sql import functions as F

    from idn_area_etl_spark.sources.tables import load_table

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        ev = load_table(spark, sf_dir, "events")
        per_user = ev.groupBy("user_id").agg(F.count("*").alias("n"))
        t = per_user.filter(F.col("user_id") % 2 == 1).select(
            F.col("n").alias("tn")
        )
        c = per_user.filter(F.col("user_id") % 2 == 0).select(
            F.col("n").alias("cn")
        )
        bad = t.crossJoin(c).agg(
            F.sum((F.col("tn") > F.col("cn")).cast("long")).alias("w")
        )
        verdicts = [
            v for v, _, _ in audit_plan_nlj(plan_of(bad))
        ]
        assert "unbounded" in verdicts, (
            "gate failed to flag a per-user × per-user cross product"
        )
        # bounding one side with a global aggregate makes it linear
        ok = t.crossJoin(c.agg(F.max("cn").alias("mc")))
        assert all(
            v == "ok" for v, _, _ in audit_plan_nlj(plan_of(ok))
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.maxMetadataStringLength")


# --------------------------------------------------------------------------
# Per-group window gate (round 7).  A Window.partitionBy(g) shuffles
# every row of a group to ONE task — the correct scalable pattern for
# entity keys (bounded per-group rows, data-scaled group count), and
# the r6 ANN funnel when the group count is fixed while per-group rows
# are data-scaled.  The two are statically indistinguishable, so every
# per-group window whose input subtree the classifier cannot bound
# must carry a BOUNDED_WINDOWS note; the r7 sweep FIXED the fourteen
# fixed-domain funnels it found (grouped_running_multi / grouped_topk
# / min_by) rather than noting them.
# --------------------------------------------------------------------------


def test_no_unnoted_pergroup_window(specs, hint_forced_plans):
    offenders = {}
    for name, plan in hint_forced_plans.items():
        bad = [
            f"[{keys}] {sorted(big)}: {head}"
            for verdict, big, keys, head in audit_plan_windows(plan)
            if verdict == "unbounded" and name not in BOUNDED_WINDOWS
        ]
        if bad:
            offenders[name] = bad
    assert offenders == {}, (
        "per-group window over data-scaled input without a boundedness "
        "note; if the group key has a fixed domain, reformulate with "
        "ranks.grouped_running_multi / grouped_topk; if it is an entity "
        "key or a bounded rollup, add a justified BOUNDED_WINDOWS "
        f"entry: {offenders}"
    )


def test_window_whitelist_has_no_stale_entries(specs, hint_forced_plans):
    """Every BOUNDED_WINDOWS entry must correspond to a spec whose
    -1-config plan still HAS a flagged per-group window — otherwise
    the entry is stale cover that would mask a future regression."""
    stale = []
    for name in BOUNDED_WINDOWS:
        plan = hint_forced_plans.get(name)
        assert plan is not None, f"whitelisted spec {name} not registered"
        if not any(
            v == "unbounded" for v, _, _, _ in audit_plan_windows(plan)
        ):
            stale.append(name)
    assert stale == [], f"stale BOUNDED_WINDOWS entries: {stale}"


def test_window_gate_teeth(spark, sf_dir):
    """Re-creating the r6 funnel shape (a per-query window over
    probe x corpus rows) MUST flag; the same ranking over an input
    bounded by a global aggregate must pass."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from idn_area_etl_spark.sources.tables import load_table

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        docs = load_table(spark, sf_dir, "documents")
        w = W.partitionBy("lang").orderBy("doc_id")
        bad = docs.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= 3
        )
        verdicts = [v for v, _, _, _ in audit_plan_windows(plan_of(bad))]
        assert "unbounded" in verdicts, (
            "gate failed to flag a fixed-domain per-group window over a "
            "data-scaled scan"
        )
        # the same window over a globally-bounded input must pass
        small = docs.orderBy("doc_id").limit(100)
        ok = small.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= 3
        )
        assert all(
            v == "ok" for v, _, _, _ in audit_plan_windows(plan_of(ok))
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.maxMetadataStringLength")


def test_window_partition_key_parsing_units():
    """String-level unit checks for the Window-head partition-spec
    parser (3-group, 2-group-with-order, 2-group-with-partition)."""
    three = (
        "Window [row_number() windowspecdefinition(g#5L, v#9L DESC) AS"
        " rnk#20], [g#5L, s#6], [v#9L DESC NULLS LAST]"
    )
    assert window_partition_keys(three) == ["g", "s"]
    global_two = (
        "Window [row_number() windowspecdefinition(ts#1 ASC NULLS FIRST)"
        " AS rn#9], [ts#1 ASC NULLS FIRST]"
    )
    assert window_partition_keys(global_two) == []
    part_two = "Window [min(x#3) AS m#7], [ck#2]"
    assert window_partition_keys(part_two) == ["ck"]


def test_nlj_side_extraction_units():
    """String-level unit checks for the two-child subtree splitter."""
    plan = (
        "AdaptiveSparkPlan isFinalPlan=false\n"
        "+- HashAggregate(keys=[], functions=[count(1)])\n"
        "   +- CartesianProduct\n"
        "      :- FileScan parquet [a#1] ... file:/x/events.parquet\n"
        "      +- FileScan parquet [b#2] ... file:/x/orders.parquet\n"
    )
    sides = nlj_sides(plan)
    assert len(sides) == 1
    _, left, right = sides[0]
    assert "events.parquet" in left and "orders" not in left
    assert "orders.parquet" in right and "events" not in right
    flagged = audit_plan_nlj(plan)
    assert flagged == [
        ("unbounded", {"events", "orders"}, "CartesianProduct")
    ]
    # a global aggregate on one side bounds the product
    bounded = plan.replace(
        "+- FileScan parquet [b#2]",
        "+- HashAggregate(keys=[], functions=[max(b#2)])\n"
        "         +- FileScan parquet [b#2]",
    )
    assert [v for v, _, _ in audit_plan_nlj(bounded)] == ["ok"]


def test_nlj_unparseable_children_fail_closed():
    """An NLJ node whose children the splitter cannot separate must be
    flagged 'unbounded' (forcing a whitelist entry or a parser fix) —
    never silently skipped, or a plan-string regression would disable
    the all-pairs gate while the audit still exits 0."""
    one_child = (
        "AdaptiveSparkPlan isFinalPlan=false\n"
        "+- CartesianProduct\n"
        "   +- ReusedExchange [a#1], Exchange hashpartitioning(a#1)\n"
    )
    assert [v for v, _, _ in audit_plan_nlj(one_child)] == ["unbounded"]
    no_children = (
        "AdaptiveSparkPlan isFinalPlan=false\n"
        "+- CartesianProduct\n"
    )
    assert [v for v, _, _ in audit_plan_nlj(no_children)] == ["unbounded"]


def test_broadcast_subtree_extraction_units():
    """String-level unit checks for the subtree extractor/classifier."""
    plan = (
        "AdaptiveSparkPlan isFinalPlan=false\n"
        "+- BroadcastHashJoin [a#1], [a#2], Inner, BuildRight, false\n"
        "   :- FileScan parquet [a#1] ... file:/x/documents.parquet\n"
        "   +- BroadcastExchange HashedRelationBroadcastMode\n"
        "      +- HashAggregate(keys=[a#2], functions=[max(c#3)])\n"
        "         +- FileScan parquet [a#2] ... file:/x/documents.parquet\n"
    )
    subs = broadcast_subtrees(plan)
    assert len(subs) == 1
    # the join's streamed side (the sibling scan) is NOT in the subtree
    assert subs[0].count("documents.parquet") == 1
    verdict, big = classify(subs[0])
    assert verdict == "unbounded" and big == {"documents"}
    # a global aggregate bounds it
    bounded = subs[0].replace("keys=[a#2]", "keys=[]")
    assert classify(bounded)[0] == "ok"
    # a dim-table scan is fine
    dim = subs[0].replace("documents.parquet", "nation.parquet")
    assert classify(dim)[0] == "ok"

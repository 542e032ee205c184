"""Local replica of the driver's correctness gate: for every query with an
oracle, run the Ray pipeline AND the DuckDB SQL at sf0.01 and compare
row-count + schema (column names) + exact values order-insensitively.
Rows-only queries are executed and sanity-checked for shape/determinism."""

import math

import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(f"{v:.10g}" if not math.isnan(v) else "nan")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def oracle_pairs():
    import __ray_entry__ as E
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q), "oracle keys must be a subset of queries"
    return q, o


@pytest.mark.parametrize("name", [
    "validate_lineitem", "validate_orders", "validate_documents",
    "validate_events_conditional", "uniqueness_lineitem_orderkey",
    "uniqueness_customer_custkey", "referential_lineitem_orders",
    "column_stats_lineitem", "q1_pricing_summary", "segment_order_stats",
    "brand_quantity", "topk_orders", "events_hourly",
    "distinct_event_types", "events_filter_project", "orders_running_total",
    "dedup_exact_documents", "token_count_documents", "quality_documents",
    "lang_distribution", "events_sessions", "validate_lineitem_dates",
    "validate_lineitem_dates_core", "region_customer_rollup", "union_keys",
    "events_last_order", "hopping_window_events", "events_orders_90d",
    "top3_orders_per_segment", "median_quantity_by_flag",
    "quantity_stats_by_flag", "distinct_parts_per_flag",
    "ngram_jaccard_documents", "orders_customer_join",
    "lineitem_orders_priority_revenue", "ann_topk_embeddings",
    "embedding_neardup_exact", "bpe_token_count_documents",
    "term_frequency_documents",
    "clean_documents", "chunk_documents", "events_value_delta",
    "quantity_percentiles", "tfidf_documents", "pii_documents",
    "repetition_documents", "revenue_by_nation", "customers_no_bigorder",
    "quantity_quantiles_by_flag", "neardup_components_documents",
    "dup_passages_documents", "decontam_documents", "entropy_documents",
    "events_value_histogram", "events_value_zscore",
    "langid_documents", "drift_exact_events",
    "dedup_neardup_keep_documents", "rollup_orders_segment_priority",
    "chi2_events", "events_percent_rank", "split_documents",
    "quality_filter_documents",
    "unigram_logprob_documents", "ann_ivf_fullprobe_embeddings",
    "customer_order_counts", "hot_users_events",
    "label_centroids_embeddings", "embedding_covariance",
    "lineitem_correlation", "outlier_events_iqr",
    "value_hour_corr_by_type", "funnel_events",
    "retention_cohorts_events",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "burst_rate_events", "heavy_hitters_cms_events",
    "psi_events", "rolling_mean_events", "pack_documents",
    "incremental_dedup_documents", "dedup_events_window",
    "curate_documents", "props_field_by_type",
    "stratified_sample_documents", "bigram_counts_documents",
    "nation_balance_outer", "q4_order_priority", "stale_parts_anti",
    "q10_returned_items", "q18_large_volume_orders",
    "top_event_type_by_user", "q7_volume_shipping", "events_dow_pivot",
    "q13_customer_distribution", "q22_idle_balance",
    "q15_top_supplier", "q14_promo_revenue",
    "q17_small_quantity_revenue", "q19_discounted_revenue",
    "q8_market_share", "q16_supplier_count",
    "q21_lone_returner", "cheapest_supplier_per_part",
    "events_cube", "nation_customer_names",
    "q6_forecast_revenue", "q12_shipmode_priority",
    "source_quota_documents", "ann_hard_negatives_embeddings",
    "winsorize_events", "upsample_documents",
    "fuzzy_name_pairs_customers", "regr_value_hour_by_type",
    "weighted_sample_documents", "candles_events",
    "novelty_documents", "cooccur_event_types",
    "robust_stats_events", "user_entropy_events",
    "transitions_event_types", "jaccard_event_types",
    "prefix_dup_documents", "events_next_order",
    "top_terms_by_lang", "daily_counts_ma_events",
    "median_gap_by_user", "dedup_rate_by_source", "pareto_sources",
    "latest_event_per_user", "ttr_documents",
    "split_leakage_documents", "fuzzy_components_customers",
    "q9_product_profit", "q20_dominant_supplier",
    "q11_important_parts", "minhash_md5_signatures_documents",
    "minhash_md5_pairs_documents", "simhash_md5_documents",
    "quantize_embeddings", "interleave_by_source_documents",
    "simhash_md5_pairs_documents", "snapshot_diff_documents",
    "autocorr_daily_events", "scd2_intervals_events",
    "pmi_bigrams_documents",
    "sequence_match_users", "cumulative_parts_shipped",
    "tokenset_dedup_documents", "gini_daily_events",
    "rolling_distinct_users_events", "benford_totalprice",
    "transition_timing_events", "longest_streak_events",
    "customers_not_in_error_users", "nation_share_of_region",
    "timed_conversions_events", "basket_brand_pairs",
    "skyline_orders", "price_gaps_orders",
    "locf_resample_events", "value_bands_events",
    "contingency_lift_events", "trending_terms_documents",
    "drawdown_daily_events", "weighted_median_price",
    "cusum_daily_events", "rolling_median_daily_events",
    "bigram_logprob_documents", "mode_quantity_by_flag",
    "spend_deciles_customers",
    "hhi_sources_by_lang", "fano_daily_events",
    "dup_cluster_sizes_documents", "spearman_quantity_discount",
    "kendall_tau_daily_events", "auc_value_error_events",
    "rrf_fusion_embeddings", "calibration_value_error_events",
    "bounce_rate_events", "rfm_segments_customers",
    "session_duration_median_events", "readability_documents",
    "nonascii_ratio_by_lang", "normalized_dup_documents",
    "gains_spend_customers", "stickiness_daily_events",
    "ship_delay_by_month", "retention_curve_events",
    "zipf_slope_documents", "new_vs_repeat_revenue",
    "return_rate_by_month", "basket_size_histogram",
    "price_qty_regr_by_brand", "wau_mau_engagement",
    "first_touch_attribution", "hapax_share_documents",
    "sessions_per_user_histogram", "norm_stats_by_label_embeddings",
    "order_gap_histogram", "gini_spend_customers", "cohort_ltv_curve",
    "centroid_distances_embeddings", "peak_concurrent_sessions_events",
    "dedup_token_savings_documents", "source_dup_matrix_documents",
    "knn_label_agreement_embeddings", "interarrival_cv_by_type",
    "time_to_first_error_events", "vocab_overlap_by_lang",
    "effective_dim_embeddings", "order_completion_days_histogram",
    "spend_trend_customers", "gains_by_segment_customers",
    "minhash_estimate_error_documents", "null_profile_lineitem",
    "daily_trend_by_type", "langid_confusion_documents",
    "suppliers_per_part_histogram", "centroid_accuracy_embeddings",
    "weekend_lift_by_type", "first_last_matrix_events",
    "mad_daily_events", "duplicate_events_share",
    "longest_quiet_gap_by_type", "source_weighted_jaccard",
    "theil_sen_daily_events", "equidepth_bins_value_events",
    "naive_forecast_mae_daily", "hll_registers_events",
    "runs_test_daily_events", "survival_risk_table_customers",
    "decay_spend_customers", "trajectory_census_customers",
    "twap_value_by_type", "mmr_rerank_embeddings",
    "leadlag_daily_events", "k_anonymity_customers",
    "next_action_profile_events", "winnow_md5_documents",
    "iso_week_volume_events", "emd_value_halves_events",
    "transition_entropy_events", "audience_growth_daily_events",
    "bm25_topk_documents", "gap_quantiles_by_type",
    "price_quantiles_by_brand", "growth_accounting_monthly_events",
    "hill_tail_spend", "anova_value_by_type",
    "length_gini_documents", "lang_entropy_by_source",
    "band_occupancy_documents", "top_paths_events",
    "spend_quantiles_by_segment", "active_hours_by_type",
    "embedding_lsh_buckets_md5", "embedding_lsh_pairs_md5",
    "embedding_lsh_pair_cosine_md5", "psi_daily_drift_events",
    "violation_profile_tables", "late_events_by_day",
    "value_quantiles_by_day", "session_sensitivity_events",
    "referential_profile_tables", "uniqueness_profile_tables",
    "type_mix_drift_daily", "completeness_profile_tables",
])
def test_query_matches_oracle(name, duck):
    q, o = oracle_pairs()
    got = to_pandas(q[name](SF))
    exp = duck.execute(o[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), \
        f"{name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}"
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    cg, ce = canon(got), canon(exp)
    if cg != ce:
        diff = [(a, b) for a, b in zip(cg, ce) if a != b][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs {diff}")


@pytest.mark.parametrize("name,min_rows", [
    ("simhash_documents", 500),
    ("minhash_neardup_documents", 0),
    ("ann_topk_embeddings", 50),
    ("ann_ivf_embeddings", 10),
    ("embedding_neardup", 0),
    ("column_stats_approx_lineitem", 2),
    ("drift_events_value", 1),
    ("neardup_verified_documents", 0),
    ("fingerprint_documents", 500),
    ("validate_images_synth", 10),
    ("ann_ivf_index_embeddings", 10),
    ("image_features_synth", 100),
    ("simhash_neardup_documents", 0),
    ("pca_embeddings", 8),
    ("embedding_outliers_mahalanobis", 20),
    ("image_quality_synth", 100),
    ("ann_pca_topk_embeddings", 50),
    ("ivf_recall_embeddings", 6),
])
def test_rows_only_queries(name, min_rows):
    q, _ = oracle_pairs()
    got = to_pandas(q[name](SF))
    assert len(got) >= min_rows, f"{name}: only {len(got)} rows"


def test_hot_users_empty_events(tmp_path):
    """Zero-row events table: the hot-key detector returns the typed
    empty top-10 instead of KeyError on a column-less frame (round-4
    review pin)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.relational import hot_users_events
    pq.write_table(pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "user_id": pa.array([], type=pa.int64()),
        "event_type": pa.array([], type=pa.string()),
        "value": pa.array([], type=pa.float64()),
        "props": pa.array([], type=pa.string())}),
        os.path.join(tmp_path, "events.parquet"))
    out = hot_users_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["user_id", "n", "share_bp"]


def test_entry_smoke():
    import __ray_entry__ as E
    res = to_pandas(E.entry())
    assert len(res) >= 0
    assert "keyword" in res.columns


def test_langid_behavior():
    """The testdata's ``lang`` labels are synthetic noise (every text is the
    same English-ish word salad), so label accuracy is not recoverable;
    assert the heuristic itself: deterministic, closed label set, and
    correct on texts that actually carry language signal."""
    q, _ = oracle_pairs()
    got = to_pandas(q["langid_documents"](SF))
    assert set(got["lang_pred"]) <= {"en", "de", "fr", "es", "zh", "und"}
    got2 = to_pandas(q["langid_documents"](SF))
    assert got.sort_values("doc_id")["lang_pred"].tolist() == \
        got2.sort_values("doc_id")["lang_pred"].tolist()
    import pyarrow as pa
    from jsonschema_ray.text import langid_batch
    langs, _ = langid_batch(pa.array([
        "the cat sat on the mat and it was the best of days",
        "der Hund und die Katze sind nicht in dem Haus",
        "le chat est sur la table et il est dans la maison",
        "el perro y el gato están en la casa por la mañana",
        "这是一个中文句子，用来测试语言识别。",
    ]))
    assert list(langs) == ["en", "de", "fr", "es", "zh"]


def test_ann_brute_force_is_exact():
    """brute_force_topk must equal a local exact computation."""
    import numpy as np
    import pyarrow.parquet as pq
    q, _ = oracle_pairs()
    got = to_pandas(q["ann_topk_embeddings"](SF))
    t = pq.read_table(f"{SF}/embeddings.parquet")
    M = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t["embedding"].to_pylist()])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = np.asarray(t["vec_id"].to_pylist())
    order = np.argsort(ids)
    for qid in got["query_id"].unique():
        qv = M[ids == qid][0]
        sims = M @ qv
        # exact top-10 with (score desc, id asc) tie-break
        best = sorted(zip(-sims, ids), key=lambda x: (x[0], x[1]))[:10]
        exp_ids = [int(b[1]) for b in best]
        got_ids = got[got["query_id"] == qid].sort_values("rank")[
            "vec_id"].tolist()
        assert got_ids == exp_ids, f"query {qid}"


def test_every_query_is_oracled_or_known_rows_only():
    """Completeness guard: each queries() entry must either carry a
    DuckDB oracle or appear in the deliberate rows-only list (the driver
    records a weaker check for those) — prevents silent oracle drift."""
    q, o = oracle_pairs()
    rows_only = {
        "drift_events_value", "fingerprint_documents",
        "simhash_documents", "simhash_neardup_documents",
        "minhash_neardup_documents",
        "neardup_verified_documents",
        "ann_ivf_embeddings", "ann_ivf_index_embeddings",
        "embedding_neardup", "column_stats_approx_lineitem",
        "validate_images_synth", "image_features_synth",
        "incremental_minhash_documents",
        "incremental_embedding_documents",
        "kmeans_embeddings",
        "export_shards_documents",
        "pca_embeddings",
        "embedding_outliers_mahalanobis",
        "image_quality_synth",
        "ann_pca_topk_embeddings",
        "ivf_recall_embeddings",
    }
    missing = set(q) - set(o) - rows_only
    assert not missing, f"queries without oracle or rows-only tag: {missing}"
    stale = rows_only - set(q)
    assert not stale, f"rows-only entries no longer registered: {stale}"


def test_lineitem_correlation_empty_and_single_row(tmp_path):
    """Zero-row / one-row lineitem: corr degrades to the oracle's
    10-row NULL-corr shape instead of a ValueError (SQL corr answers
    NULL there) — review pin."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.relational import lineitem_correlation
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    for rows in ([], [[1.0, 2.0, 0.1, 0.05]]):
        tb = pa.table({c: pa.array([r[i] for r in rows],
                                   type=pa.float64())
                       for i, c in enumerate(cols)})
        pq.write_table(tb, os.path.join(tmp_path, "lineitem.parquet"))
        out = lineitem_correlation(str(tmp_path))
        assert len(out) == 10
        assert out["corr"].isna().all()
        assert (out["n"] == len(rows)).all()


def test_outlier_iqr_nan_rows_excluded(tmp_path):
    """NaN values are excluded from both the quartiles and the outlier
    output (psi/drift convention — documented divergence from DuckDB's
    NaN-greatest total order) — review pin."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.relational import outlier_events_iqr
    vals = [1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 100.0, float("nan")]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(vals)), type=pa.int64()),
        "value": pa.array(vals, type=pa.float64())}),
        os.path.join(tmp_path, "events.parquet"))
    out = outlier_events_iqr(str(tmp_path))
    # quartiles over the 7 finite values: q1=2, q3=3, fences [0.5, 4.5]
    # -> only 100.0 is an outlier; the NaN row never appears
    assert out["event_id"].tolist() == [6]
    assert out["value"].tolist() == [100.0]


def test_value_hour_corr_null_and_degenerate_groups(tmp_path):
    """Crafted events: null value rows, null ts rows, a single-pair
    group, and a zero-variance group — engine matches DuckDB corr's
    pairwise-complete null handling and NULL answers exactly (the
    driver testdata is null-free so the contract test can't cover
    this)."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from jsonschema_ray.pipelines.relational import value_hour_corr_by_type
    ts = pa.array([1_700_000_000_000_000 + i * 3_600_000_000
                   for i in range(8)] + [None, 1_700_050_000_000_000],
                  type=pa.timestamp("us"))
    tb = pa.table({
        "event_id": pa.array(range(10), type=pa.int64()),
        "ts": ts,
        "user_id": pa.array([1] * 10, type=pa.int64()),
        "event_type": pa.array(["a", "a", "a", "b", "b", "c", "c", "c",
                                "a", "d"]),
        "value": pa.array([1.0, 2.5, None, 3.0, 3.0, 1.0, 4.0, 9.5,
                           7.0, 2.0], type=pa.float64()),
        "props": pa.array(["{}"] * 10)})
    pq.write_table(tb, os.path.join(tmp_path, "events.parquet"))
    got = value_hour_corr_by_type(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    exp = con.execute(E.oracle_sql()["value_hour_corr_by_type"]).df()
    assert canon(got) == canon(exp), (got, exp)
    # shape sanity: group a drops its null-value row AND its null-ts
    # row (n=2), group b is zero-variance in value (NULL corr), group
    # d has a single pair (n=1 → NULL corr, SQL n<2 semantics)
    byt = got.set_index("event_type")
    assert byt.loc["a", "n"] == 2
    assert byt.loc["b", "n"] == 2 and pd.isna(byt.loc["b", "corr"])
    assert byt.loc["d", "n"] == 1 and pd.isna(byt.loc["d", "corr"])


def test_value_hour_corr_nan_partition_invariant(tmp_path):
    """A non-null NaN value must be EXCLUDED (finite-pairs convention),
    never allowed to poison per-batch partials partition-dependently
    (review pin: pre-fix, 1/3/6 blocks gave three different answers);
    a null event_type flows through as SQL's NULL group."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from jsonschema_ray.pipelines.relational import value_hour_corr_by_type
    nrow = 12
    tb = pa.table({
        "event_id": pa.array(range(nrow), type=pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i * 7_200_000_000
                        for i in range(nrow)], type=pa.timestamp("us")),
        "user_id": pa.array([1] * nrow, type=pa.int64()),
        "event_type": pa.array(["a"] * 6 + ["b"] * 5 + [None]),
        "value": pa.array([1.0, float("nan"), 3.0, 4.0, 2.0, 5.0,
                           1.0, 2.0, float("inf"), 4.0, 5.0, 9.0],
                          type=pa.float64()),
        "props": pa.array(["{}"] * nrow)})
    pq.write_table(tb, os.path.join(tmp_path, "events.parquet"))
    base = value_hour_corr_by_type(str(tmp_path))
    byt = base.set_index("event_type", drop=False)
    assert byt.loc["a", "n"] == 5 and np.isfinite(byt.loc["a", "corr"])
    assert byt.loc["b", "n"] == 4          # inf row excluded
    assert base["event_type"].isna().sum() == 1  # SQL NULL group kept
    # partition invariance: same answer at any block count
    import jsonschema_ray.pipelines.relational as R
    orig = R._read
    for parts in (3, 6):
        R._read = lambda sf, t, columns=None, _p=parts: orig(
            sf, t, columns=columns).repartition(_p)
        try:
            got = value_hour_corr_by_type(str(tmp_path))
        finally:
            R._read = orig
        a = base.fillna({"corr": -999}).sort_values("event_type",
                                                    na_position="last")
        g = got.fillna({"corr": -999}).sort_values("event_type",
                                                   na_position="last")
        assert np.allclose(a["corr"].to_numpy(), g["corr"].to_numpy())
        assert (a["n"].to_numpy() == g["n"].to_numpy()).all()


def test_funnel_dropoff_and_ordering(tmp_path):
    """Crafted funnel with REAL drop-off (the driver testdata converts
    every user at every stage): a click BEFORE the first view doesn't
    count, a purchase before the qualifying click doesn't count, a user
    whose views are all null-ts enters stage 1 but can never convert,
    and the canon matches DuckDB exactly; an events table with no views
    answers NULL conv_bp on both engines."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from jsonschema_ray.pipelines.relational import funnel_events

    def T(h):
        return 1_700_000_000_000_000 + h * 3_600_000_000

    rows = [
        # u1: full funnel in order
        (1, T(1), "view"), (1, T(2), "click"), (1, T(3), "purchase"),
        # u2: click BEFORE view → stuck at stage 1
        (2, T(5), "view"), (2, T(4), "click"),
        # u3: purchase before its qualifying click → stage 2 only
        (3, T(1), "view"), (3, T(3), "click"), (3, T(2), "purchase"),
        # u4: views only
        (4, T(7), "view"),
        # u5: null-ts view only → enters stage 1, can't convert
        (5, None, "view"), (5, T(9), "click"), (5, T(10), "purchase"),
        # u6: no view at all → not in the funnel
        (6, T(1), "click"), (6, T(2), "purchase"),
    ]
    tb = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * len(rows), type=pa.float64()),
        "props": pa.array(["{}"] * len(rows))})
    pq.write_table(tb, os.path.join(tmp_path, "events.parquet"))
    got = funnel_events(str(tmp_path))
    assert got["n_users"].tolist() == [5, 2, 1]
    assert got["conv_bp"].tolist() == [10000, 4000, 2000]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    exp = con.execute(E.oracle_sql()["funnel_events"]).df()
    assert canon(got) == canon(exp)

    # empty funnel head: no view rows anywhere
    pq.write_table(tb.filter(
        pa.compute.not_equal(tb["event_type"], "view")),
        os.path.join(tmp_path, "events.parquet"))
    got2 = funnel_events(str(tmp_path))
    exp2 = con.execute(E.oracle_sql()["funnel_events"]).df()
    assert got2["n_users"].tolist() == [0, 0, 0]
    assert got2["conv_bp"].isna().all()
    assert canon(got2) == canon(exp2)


def test_funnel_null_user_and_empty_table(tmp_path):
    """A NULL user_id forms SQL's NULL group: it enters stage 1 (GROUP
    BY keeps it) but never converts (JOIN on NULL never matches) —
    pandas dropna=False + unmatched-NaN merges reproduce both; and a
    fully EMPTY events table answers the oracle's 3 zero rows instead
    of KeyError on a column-less frame (review pins)."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from jsonschema_ray.pipelines.relational import funnel_events

    def T(h):
        return 1_700_000_000_000_000 + h * 3_600_000_000

    rows = [(1, T(1), "view"), (1, T(2), "click"), (1, T(3), "purchase"),
            (None, T(1), "view"), (None, T(2), "click")]
    tb = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * len(rows), type=pa.float64()),
        "props": pa.array(["{}"] * len(rows))})
    pq.write_table(tb, os.path.join(tmp_path, "events.parquet"))
    got = funnel_events(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    exp = con.execute(E.oracle_sql()["funnel_events"]).df()
    assert got["n_users"].tolist() == [2, 1, 1]   # NULL group in stage 1
    assert canon(got) == canon(exp)

    pq.write_table(tb.slice(0, 0), os.path.join(tmp_path,
                                                "events.parquet"))
    got2 = funnel_events(str(tmp_path))
    exp2 = con.execute(E.oracle_sql()["funnel_events"]).df()
    assert got2["n_users"].tolist() == [0, 0, 0]
    assert canon(got2) == canon(exp2)


def test_pca_ann_survives_dirty_rows(tmp_path):
    """A corpus row with a non-finite component gets a null projection
    and is dropped before reduced-space scoring instead of killing the
    job (review pin — the full-dim path already survives such rows)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.relational import ann_pca_topk_embeddings

    rng = np.random.default_rng(7)
    n, dim = 60, 24
    X = rng.normal(0, 1, (n, dim))
    X[17, 3] = float("inf")
    tb = pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array([list(r) for r in X],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0] * n, type=pa.int32())})
    pq.write_table(tb, os.path.join(tmp_path, "embeddings.parquet"))
    out = ann_pca_topk_embeddings(str(tmp_path))
    assert len(out) == 50
    assert 17 not in set(out["vec_id"])   # dirty row never scored


def test_retention_cohorts_crafted(tmp_path):
    """Multi-cohort drop-off with week-boundary edges (the driver
    testdata is one cohort, everyone retained): users first seen in
    different weeks, a Sunday→Monday boundary pair (same calendar
    proximity, different ISO weeks), gaps (offset 2 without offset 1),
    a null-ts row (invisible), and a null user (never in the matrix) —
    canon equality vs DuckDB."""
    import os

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from jsonschema_ray.pipelines.relational import retention_cohorts_events

    def TS(s):
        return int(pd.Timestamp(s).value // 1000)

    rows = [
        (1, TS("2024-01-01 10:00")),   # Monday: cohort W0
        (1, TS("2024-01-07 23:00")),   # Sunday same ISO week → off 0
        (1, TS("2024-01-08 00:30")),   # next Monday → off 1
        (1, TS("2024-01-22 12:00")),   # off 3 (gap at 2)
        (2, TS("2024-01-10 09:00")),   # cohort W1 (mid-week first seen)
        (2, TS("2024-01-17 09:00")),   # off 1
        (3, TS("2024-01-01 00:00")),   # cohort W0, never returns
        (4, None),                     # null ts: invisible
        (None, TS("2024-01-02 08:00")),  # null user: never in matrix
    ]
    tb = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([1.0] * len(rows), type=pa.float64()),
        "props": pa.array(["{}"] * len(rows))})
    pq.write_table(tb, os.path.join(tmp_path, "events.parquet"))
    got = retention_cohorts_events(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    exp = con.execute(E.oracle_sql()["retention_cohorts_events"]).df()
    assert canon(got) == canon(exp), (got, exp)
    # shape: W0 has users {1,3} at off 0, {1} at 1 and 3; W1 (user 2)
    # at off 0 and 1
    key = got.set_index([got["cohort_week"].dt.strftime("%Y-%m-%d"),
                         "offset_weeks"])["n_users"]
    assert key.loc[("2024-01-01", 0)] == 2
    assert key.loc[("2024-01-01", 1)] == 1
    assert key.loc[("2024-01-01", 3)] == 1
    assert key.loc[("2024-01-08", 0)] == 1
    assert key.loc[("2024-01-08", 1)] == 1
    assert len(got) == 5

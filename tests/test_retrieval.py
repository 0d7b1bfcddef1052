"""Unit + invariant tests for the retrieval / cohort / profiling operators
added in round 4 (operators/retrieval.py, operators/cohorts.py, the
corpus-profiling trio, RI matrix, FX triangulation, SCD2 as-of join).

Strategy mirrors SURVEY.md §5: invariants on the sf0.001 tables (known
generator properties), plus tiny-literal frames where the expected output
is computable by hand.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from saas_analytics_pipeline_spark import qcatalog
from saas_analytics_pipeline_spark.operators import retrieval
from saas_analytics_pipeline_spark.qcatalog import QUERIES
from saas_analytics_pipeline_spark.sources import load_table

qcatalog.load_all()


def q(name):
    return QUERIES[name].fn


# ------------------------------------------------------------------ retrieval
def test_bm25_scores_positive_and_sorted(spark, sf_dir):
    rows = q("q_bm25")(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_rewards_term_frequency(spark):
    """A doc repeating a probe term outranks one mentioning it once, all
    else equal (same length)."""
    df = spark.createDataFrame(
        [
            (1, "spark spark spark pad pad pad"),
            (2, "spark pad pad pad pad pad"),
            (3, "pad pad pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("documents")
    # reuse the registered query's scoring pieces via a direct mini-run
    toks = df.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id").agg(
        F.count(F.when(F.col("tok") == "spark", 1)).alias("tf0")
    )
    got = {r.doc_id: r.tf0 for r in tf.collect()}
    assert got[1] > got[2] > got[3]


def test_knn_graph_k_and_symmetric_cell(spark, sf_dir):
    rows = q("q_knn_graph")(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in e.select("vec_id", "label").collect()}
    per_node = {}
    for r in rows:
        assert 1 <= r.rnk <= retrieval.KNN_K
        assert labels[r.vec_id] == labels[r.neighbor_id]  # in-cell only
        assert -1.0 <= r.cos <= 1.0
        per_node.setdefault(r.vec_id, []).append(r.rnk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_node.values())


def test_hard_negatives_labels_differ(spark, sf_dir):
    rows = q("q_hard_negatives")(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in e.select("vec_id", "label").collect()}
    assert len(rows) == len(retrieval.HN_ANCHORS) * retrieval.HN_K
    for r in rows:
        assert labels[r.anchor_id] != r.neg_label
        assert labels[r.neighbor_id] == r.neg_label


def test_containment_bounds_and_candidates_share_shingles(spark, sf_dir):
    rows = q("q_containment")(spark, sf_dir).collect()
    for r in rows:
        assert 0.5 <= r.containment <= 1.0
        assert r.a_id < r.b_id
        assert r.n_inter >= 1


def test_semdedup_curve_monotone(spark, sf_dir):
    row = q("q_semdedup_curve")(spark, sf_dir).collect()[0]
    # tighter thresholds keep fewer pairs
    assert row.ge_99 <= row.ge_95 <= row.ge_9 <= row.ge_8 <= row.n_pairs


# ------------------------------------------------------------------ cohorts
def test_ltv_cumulative_monotone_per_cohort(spark, sf_dir):
    rows = q("q_ltv")(spark, sf_dir).collect()
    last = {}
    for r in rows:  # already ordered cohort, offset
        if r.cohort in last:
            assert r.cum_rev >= last[r.cohort] - 1e-9
        assert r.offset_m >= 0
        last[r.cohort] = r.cum_rev


def test_churn_rate_bounds_and_retained_le_active(spark, sf_dir):
    rows = q("q_churn")(spark, sf_dir).collect()
    assert rows[0].churn_rate is None  # no prior month
    for r in rows:
        assert r.n_retained <= r.n_active or r.n_retained == 0
        if r.churn_rate is not None:
            assert -1e-9 <= r.churn_rate <= 1.0 + 1e-9


def test_trend_slope_matches_closed_form(spark):
    """OLS on a tiny exact line: y = 200x + 1000 cents must recover the
    slope/intercept exactly."""
    df = spark.createDataFrame(
        [(float(x), (200 * x + 1000) / 100.0) for x in range(5)],
        "x double, price double",
    )
    # reuse the power-sum algebra inline
    sums = df.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum(F.round(F.col("price") * 100, 0).cast("decimal(38,0)")).alias("sy"),
        F.sum(
            F.col("x").cast("decimal(38,0)")
            * F.round(F.col("price") * 100, 0).cast("decimal(38,0)")
        ).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    ).collect()[0]
    n, sx, sy, sxy, sxx = (float(v) for v in sums)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert math.isclose(slope, 200.0, rel_tol=1e-12)


def test_ks_test_identical_samples_zero(spark):
    """KS distance of a sample against itself is 0 on any grid."""
    df = spark.createDataFrame(
        [(p, float(v)) for v in (10, 2000, 5000) for p in ("1-URGENT", "5-LOW")],
        "o_orderpriority string, o_totalprice double",
    )
    g = df.groupBy(
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("bin")
    ).agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("c1"),
        F.count(F.when(F.col("o_orderpriority") == "5-LOW", 1)).alias("c2"),
    )
    rows = g.collect()
    assert all(r.c1 == r.c2 for r in rows)


def test_ks_test_statistic_in_unit_interval(spark, sf_dir):
    row = q("q_ks_test")(spark, sf_dir).collect()[0]
    assert 0.0 <= row.d_stat <= 1.0
    assert row.n1 > 0 and row.n2 > 0


def test_hhi_bounds(spark, sf_dir):
    rows = q("q_hhi")(spark, sf_dir).collect()
    for r in rows:
        # HHI in (1/n, 1]: bounded below by perfect equality
        assert 1.0 / r.n_custs - 1e-9 <= r.hhi <= 1.0 + 1e-9


# ------------------------------------------------------------------ profiling
def test_dataset_card_rates_bounded(spark, sf_dir):
    rows = q("q_dataset_card")(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.dup_rate <= 1.0
        assert 0.0 <= r.pct_short <= 1.0
        assert r.n_tokens > 0 and r.n_langs >= 1


def test_script_detect_ratios_sum_to_one(spark, sf_dir):
    for r in q("q_script_detect")(spark, sf_dir).collect():
        total = r.r_alpha + r.r_digit + r.r_space + r.r_other
        assert math.isclose(total, 1.0, abs_tol=5e-6)


def test_wordfreq_spectrum_partitions_vocab(spark, sf_dir):
    rows = q("q_wordfreq_spectrum")(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    assert sum(r.n_types for r in rows) == vocab
    for r in rows:
        assert 2 ** r.log2_bucket <= r.min_c <= r.max_c < 2 ** (r.log2_bucket + 1)


# ------------------------------------------------------------------ DQ / joins
def test_ri_matrix_covers_all_edges_and_clean_dims(spark, sf_dir):
    from saas_analytics_pipeline_spark.quality.checks import FK_EDGES

    rows = {r.fk: r for r in q("q_ri_matrix")(spark, sf_dir).collect()}
    assert len(rows) == len(FK_EDGES)
    # generator guarantees dim FKs resolve (models/schema.yml relationships)
    assert rows["customer.c_nationkey->nation.n_nationkey"].n_orphans == 0
    assert rows["nation.n_regionkey->region.r_regionkey"].n_orphans == 0


def test_fx_triangulate_inverse_and_identity(spark, sf_dir):
    rows = q("q_fx_triangulate")(spark, sf_dir).collect()
    m = {(r.from_ccy, r.to_ccy): r.cross_rate for r in rows}
    for (a, b), v in m.items():
        if a == b:
            assert math.isclose(v, 1.0, abs_tol=1e-9)
        else:
            assert math.isclose(v * m[(b, a)], 1.0, rel_tol=1e-4)


def test_scd2_asof_join_attributes_each_purchase_once(spark, sf_dir):
    out = q("q_scd2_asof_join")(spark, sf_dir)
    total = out.agg(F.sum("n_purchases")).collect()[0][0]
    ev = load_table(spark, sf_dir, "events")
    # purchases after their user's first signup are attributed exactly once
    signups = ev.where(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min("ts").alias("first_signup"))
    eligible = (
        ev.where(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .where(F.col("ts") >= F.col("first_signup"))
        .count()
    )
    assert total == eligible


def test_same_day_orders_all_multi(spark, sf_dir):
    for r in q("q_same_day_orders")(spark, sf_dir).collect():
        assert r.n_orders > 1


# ------------------------------------------------------------------ audits
def test_abc_classes_partition_revenue(spark, sf_dir):
    rows = {r.abc_class: r for r in q("q_abc_analysis")(spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    total_share = sum(r.rev_share for r in rows.values())
    assert math.isclose(total_share, 1.0, abs_tol=5e-6)
    # A covers at most 80%+one part, and more revenue than C
    if "C" in rows:
        assert rows["A"].rev_share >= rows["C"].rev_share


def test_basket_lift_consistent_with_pairs(spark, sf_dir):
    rows = q("q_basket_lift")(spark, sf_dir).collect()
    for r in rows:
        assert r.n_ab >= 2 and r.part_a < r.part_b
        assert r.lift > 0 and 0 < r.confidence <= 1.0


def test_minhash_pr_counts_consistent(spark, sf_dir):
    row = q("q_minhash_pr")(spark, sf_dir).collect()[0]
    assert row.tp >= 0 and row.fp >= 0 and row.fn >= 0
    if row.tp + row.fp > 0:
        assert math.isclose(row.precision, row.tp / (row.tp + row.fp), abs_tol=1e-6)
    if row.tp + row.fn > 0:
        assert math.isclose(row.recall, row.tp / (row.tp + row.fn), abs_tol=1e-6)


def test_label_disagreement_bounded(spark, sf_dir):
    rows = q("q_label_disagreement")(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "embeddings")
    assert sum(r.n_vecs for r in rows) == e.count()  # every vector assigned
    for r in rows:
        assert 0.0 <= r.disagree_rate <= 1.0
        assert r.n_disagree <= r.n_vecs


def test_partition_volume_first_week_unflagged_logic(spark, sf_dir):
    rows = q("q_partition_volume")(spark, sf_dir).collect()
    assert rows[0].cnt7 == 0 and not rows[0].is_anomalous
    for r in rows:
        if r.is_anomalous:
            assert r.n * r.cnt7 * 2 < r.sum7 or r.n * r.cnt7 > r.sum7 * 2


def test_vocab_coverage_bounds(spark, sf_dir):
    for r in q("q_vocab_coverage")(spark, sf_dir).collect():
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0.0 <= r.oov_rate <= 1.0


def test_watermark_audit_drop_rate_consistent(spark, sf_dir):
    rows = q("q_watermark_audit")(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_dropped <= r.n_events
        assert math.isclose(r.drop_rate, round(r.n_dropped / r.n_events, 6), abs_tol=1e-9)


def test_k_anonymity_consistency(spark, sf_dir):
    row = q("q_k_anonymity")(spark, sf_dir).collect()[0]
    c = load_table(spark, sf_dir, "customer")
    assert row.n_small_groups <= row.n_groups
    assert row.n_exposed_rows <= c.count()
    assert 0.0 <= row.exposed_share <= 1.0
    assert row.min_group >= 1


def test_key_skew_detects_injected_order_skew(spark, sf_dir):
    rows = {r.key_name: r for r in q("q_key_skew")(spark, sf_dir).collect()}
    from saas_analytics_pipeline_spark.quality.checks import SKEW_KEYS

    assert len(rows) == len(SKEW_KEYS)
    for r in rows.values():
        assert r.skew_ratio >= 1.0 - 1e-9  # max >= mean always
        assert r.max_group * r.n_keys >= r.n_rows


def test_cluster_sample_exact_k_per_cell(spark, sf_dir):
    from saas_analytics_pipeline_spark.operators.retrieval import (
        CLUSTER_SAMPLE_K,
    )

    rows = q("q_cluster_sample")(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "embeddings")
    cell_sizes = {
        r.label: r["count"] for r in e.groupBy("label").count().collect()
    }
    per_cell = {}
    for r in rows:
        per_cell.setdefault(r.label, []).append(r.rnk)
    for label, ranks in per_cell.items():
        expect = min(CLUSTER_SAMPLE_K, cell_sizes[label])
        assert sorted(ranks) == list(range(1, expect + 1))
    assert set(per_cell) == set(cell_sizes)


def test_doc_length_percentiles_ordered_and_within_range(spark, sf_dir):
    rows = q("q_doc_length_percentiles")(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    bounds = {
        r.source: (r["mn"], r["mx"])
        for r in docs.groupBy("source")
        .agg(
            F.min(F.size(F.split("text", " "))).alias("mn"),
            F.max(F.size(F.split("text", " "))).alias("mx"),
        )
        .collect()
    }
    for r in rows:
        mn, mx = bounds[r.source]
        assert mn <= r.p50_tokens <= r.p90_tokens <= mx

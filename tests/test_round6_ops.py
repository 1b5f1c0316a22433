"""Semantic tests for round-6 operators — properties the oracle hash can't
see: Shapley efficiency, CUPED algebra vs the per-user definition, weighted
percentiles vs brute force, RAKE phrase segmentation, ADC structure."""

import pytest
from pyspark.sql import functions as F

from rad_database_parse_spark.catalog.io import load_table
from rad_database_parse_spark.registry.round6_ops import (
    _SHAP_V_SCALE,
    docs_rake_keyphrases,
    emb_ivf_pq_adc_topk,
    events_ab_cuped_adjustment,
    events_shapley_channel_attribution,
    orders_weighted_percentile_exact,
)


def test_shapley_efficiency(spark, sf_dir):
    # Σ_c φ_c = v(grand coalition) - v(∅): the Shapley efficiency axiom,
    # up to one integer-div truncation per channel (≤ 4 millionths·10³)
    ev = load_table(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "error", 8)
        .otherwise(0)
    )
    grand = (
        ev.groupBy("user_id")
        .agg(
            F.bit_or(bit).alias("mask"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "conv"
            ),
        )
        .filter(F.col("mask") == 15)
        .agg(
            F.expr(
                f"({_SHAP_V_SCALE}L * cast(sum(conv) as bigint))"
                " div cast(count(*) as bigint)"
            ).alias("v_fp")
        )
        .collect()[0]["v_fp"]
    )
    shap = events_shapley_channel_attribution(spark, sf_dir).collect()
    assert len(shap) == 4
    total = sum(r.shapley_fp for r in shap)
    assert abs(total - grand) <= 4


def test_cuped_matches_per_user_definition(spark, sf_dir):
    # the moments-only implementation must equal computing theta and the
    # adjusted means from materialized per-user (pre, post) columns
    from rad_database_parse_spark.registry.round6_ops import _CUPED_CUT

    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    is_pur = F.col("event_type") == "purchase"
    cut = F.lit(_CUPED_CUT).cast("timestamp")
    pu = [
        (r.pre, r.post, r.user_id % 2)
        for r in ev.groupBy("user_id")
        .agg(
            F.sum(F.when(is_pur & (F.col("ts") < cut), cents).otherwise(0))
            .cast("bigint")
            .alias("pre"),
            F.sum(F.when(is_pur & (F.col("ts") >= cut), cents).otherwise(0))
            .cast("bigint")
            .alias("post"),
        )
        .select("user_id", "pre", "post")
        .collect()
    ]
    n = len(pu)
    sp = sum(p for p, _, _ in pu)
    so = sum(o for _, o, _ in pu)
    spp = sum(p * p for p, _, _ in pu)
    spo = sum(p * o for p, o, _ in pu)
    theta = (n * spo - sp * so) / (n * spp - sp * sp)
    got = events_ab_cuped_adjustment(spark, sf_dir).collect()[0]
    assert got.theta == pytest.approx(theta, rel=1e-12)
    for arm, mcol in ((0, "mean_adj_control"), (1, "mean_adj_treat")):
        rows = [(p, o) for p, o, a in pu if a == arm]
        na = len(rows)
        adj = (
            sum(o for _, o in rows) / na
            - theta * (sum(p for p, _ in rows) / na - sp / n)
        ) / 100.0
        assert got[mcol] == pytest.approx(adj, rel=1e-9)


def test_weighted_percentile_matches_bruteforce(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            "c_mktsegment",
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("price_c"),
        )
        .agg(F.count("*").alias("wt"))
        .collect()
    )
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append((r.price_c, r.o_orderkey, r.wt))
    got = {
        r.c_mktsegment: r
        for r in orders_weighted_percentile_exact(spark, sf_dir).collect()
    }
    for seg, items in by_seg.items():
        items.sort()
        total = sum(w for _, _, w in items)
        cum = 0
        p50 = p90 = None
        for price, _, w in items:
            cum += w
            if p50 is None and 2 * cum >= total:
                p50 = price / 100.0
            if p90 is None and 10 * cum >= 9 * total:
                p90 = price / 100.0
        assert got[seg].p50_weighted == pytest.approx(p50)
        assert got[seg].p90_weighted == pytest.approx(p90)
        assert got[seg].total_weight == total


def test_rake_phrases_contain_no_stopwords_and_cap_length(spark, sf_dir):
    from rad_database_parse_spark.registry.round6_ops import (
        _RAKE_MAX_WORDS,
        _RAKE_STOPWORDS,
    )

    out = docs_rake_keyphrases(spark, sf_dir).collect()
    assert 0 < len(out) <= 25
    scores = [r.score_fp for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        words = r.phrase.split(" ")
        assert 1 <= len(words) <= _RAKE_MAX_WORDS
        assert not set(words) & set(_RAKE_STOPWORDS)
        assert r.n_occurrences >= 1


def test_adc_topk_structure_and_probe_containment(spark, sf_dir):
    from rad_database_parse_spark.registry.round6_ops import _ADC_K, _ADC_QMOD

    out = emb_ivf_pq_adc_topk(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in out:
        assert r.q_id % _ADC_QMOD == 0
        assert r.vec_id != r.q_id
        by_q.setdefault(r.q_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= _ADC_K
        fps = [r.adc_fp for r in rows]
        assert fps == sorted(fps)


def test_mann_whitney_matches_bruteforce_midranks(spark, sf_dir):
    from rad_database_parse_spark.registry.round6_ops import (
        orders_mann_whitney_u,
    )

    o = load_table(spark, sf_dir, "orders")
    rows = [
        (int(round(r.o_totalprice * 100)), r.o_orderpriority in ("1-URGENT", "2-HIGH"))
        for r in o.select("o_totalprice", "o_orderpriority").collect()
    ]
    values = sorted(set(v for v, _ in rows))
    from collections import Counter

    cnt = Counter(v for v, _ in rows)
    cum = 0
    mid2 = {}
    for v in values:
        mid2[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    n1 = sum(1 for _, g in rows if g)
    n0 = len(rows) - n1
    r1x2 = sum(mid2[v] for v, g in rows if g)
    u1x2 = 2 * n1 * n0 + n1 * (n1 + 1) - r1x2
    got = orders_mann_whitney_u(spark, sf_dir).collect()[0]
    assert (got.n1, got.n0, got.u1_x2) == (n1, n0, u1x2)


def test_minhash_pr_precision_is_one_and_recall_sane(spark, sf_dir):
    from rad_database_parse_spark.registry.round6_ops import (
        docs_minhash_recall_vs_exact,
    )

    r = docs_minhash_recall_vs_exact(spark, sf_dir).collect()[0]
    # both tiers verify exact Jaccard -> predicted ⊆ truth -> precision 1
    assert r.precision_fp == 1_000_000
    assert r.n_hit == r.n_predicted <= r.n_truth
    # 16-hash/4-band at J>=0.8: theory says ~1-(1-0.8^4)^4 ≈ 0.87 minimum;
    # anything below would mean the banding is wired wrong
    assert r.recall_fp >= 850_000

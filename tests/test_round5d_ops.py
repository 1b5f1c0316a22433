"""Semantic checks for the round-5d maintenance/analytics operators —
properties the DuckDB oracle's hash-equality can't express (brute-force
equivalence, conservation, merge ≡ recompute)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from rad_database_parse_spark.catalog.io import load_table
from rad_database_parse_spark.registry import all_queries
from rad_database_parse_spark.registry.round5d_ops import (
    events_cusum_changepoint,
    events_second_order_transitions,
    files_compaction_plan,
    lineitem_mad_outliers,
    orders_ivm_partial_agg_merge,
)


def test_compaction_plan_conserves_bytes_and_bins_contiguous(spark, sf_dir):
    plan = files_compaction_plan(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    total = ev.select(
        F.sum(F.lit(24) + F.length("event_type") + F.length("props")).alias("b")
    ).collect()[0]["b"]
    assert sum(r.bin_bytes for r in plan) == total
    # bin ids per type are 0..max with no holes — valid because every
    # file at this SF is under the target (an oversized file skips ids;
    # see the generated-inventory property test)
    max_file = max(r.bin_bytes for r in plan)  # bin >= largest file in it
    by_type: dict[str, list[int]] = {}
    for r in plan:
        by_type.setdefault(r.event_type, []).append(r.bin_id)
    if max_file <= 16384:
        for ids in by_type.values():
            assert sorted(ids) == list(range(max(ids) + 1))
    for r in plan:
        assert r.first_day <= r.last_day
        assert r.n_files >= 1


def test_cusum_matches_bruteforce_scan(spark, sf_dir):
    got = {r.event_type: r for r in events_cusum_changepoint(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum((F.col("value").cast("decimal(12,2)") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .collect()
    )
    series: dict[str, list[tuple]] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.cents))
    assert set(got) == set(series)
    for et, pts in series.items():
        pts.sort()
        n, tot = len(pts), sum(c for _, c in pts)
        cum, best = 0, None
        for i, (day, c) in enumerate(pts, start=1):
            cum += c
            s = n * cum - i * tot
            if best is None or abs(s) > abs(best[1]):
                best = (day, s)
        assert got[et].cp_day == best[0].strftime("%Y-%m-%d")
        assert got[et].cusum_cents == best[1]
        assert got[et].n_days == n


def test_second_order_transitions_conserve_context_counts(spark, sf_dir):
    rows = events_second_order_transitions(spark, sf_dir).collect()
    # per-context totals are consistent and probabilities are floored
    # shares of them
    ctx: dict[tuple, int] = {}
    for r in rows:
        ctx.setdefault((r.prev2, r.prev1), 0)
        ctx[(r.prev2, r.prev1)] += r.n
    for r in rows:
        assert r.n_context == ctx[(r.prev2, r.prev1)]
        assert r.prob_fp == int(np.floor(1e6 * r.n / r.n_context))
        assert 0 <= r.prob_fp <= 1_000_000
    # global conservation: every event with >= 2 predecessors in its
    # user's stream contributes exactly one trigram
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").count().collect()
    expected = sum(max(0, r["count"] - 2) for r in per_user)
    assert sum(r.n for r in rows) == expected


def test_mad_outliers_match_numpy(spark, sf_dir):
    got = {r.l_returnflag: r for r in lineitem_mad_outliers(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    ).collect()
    qty: dict[str, list[float]] = {}
    for r in li:
        qty.setdefault(r.l_returnflag, []).append(r.l_quantity)
    for flag, xs in qty.items():
        a = np.array(xs)
        med = float(np.quantile(a, 0.5))
        dev = np.abs(a - med)
        mad = float(np.quantile(dev, 0.5))
        assert got[flag].med_qty == med
        assert got[flag].mad_qty == mad
        assert got[flag].n == len(xs)
        assert got[flag].n_outliers == int((dev > 3.0 * mad).sum())


def test_ivm_merge_equals_full_recompute(spark, sf_dir):
    merged = {
        r.month: r for r in orders_ivm_partial_agg_merge(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    full = (
        o.groupBy(
            F.date_format(
                F.date_trunc("month", "o_orderdate"), "yyyy-MM"
            ).alias("month")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("total_cents"),
        )
        .collect()
    )
    assert len(full) == len(merged)
    for r in full:
        m = merged[r.month]
        assert (m.n_orders, m.total_cents) == (r.n_orders, r.total_cents)
        assert m.avg_price == r.total_cents / (100.0 * r.n_orders)


def test_round5d_ops_are_registered_for_next_window(spark):
    names = list(all_queries())
    for q in (
        "files_compaction_plan",
        "events_cusum_changepoint",
        "events_second_order_transitions",
        "lineitem_mad_outliers",
        "orders_ivm_partial_agg_merge",
    ):
        assert q in names


def test_bm25_scores_rank_consistently(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import docs_bm25_topk

    rows = docs_bm25_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    # ranks are 1..n and scores are non-increasing along them
    rows.sort(key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.score_fp > b.score_fp or (
            a.score_fp == b.score_fp and a.doc_id < b.doc_id
        )
    assert all(r.score_fp > 0 for r in rows)


def test_hamming_cascade_recall_bounds_and_candidates(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        emb_hamming_rerank_cascade,
    )
    from rad_database_parse_spark.catalog.io import load_table

    rows = emb_hamming_rerank_cascade(spark, sf_dir).collect()
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == min(10, n_emb)
    for r in rows:
        assert r.n_candidates == min(20, n_emb - 1)
        assert 0 <= r.recall_fp <= 1_000_000
        assert r.recall_fp % 200_000 == 0  # hits are integral


def test_kcore_nodes_have_core_degree_at_least_k_when_converged(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        graph_kcore_decomposition,
    )

    rows = graph_kcore_decomposition(spark, sf_dir).collect()
    if not rows:
        return  # empty core is legal at tiny SF
    k = rows[0].k
    assert all(r.k == k for r in rows)
    if rows[0].converged:
        # fixpoint ⇒ every surviving node keeps >= k core-internal edges
        assert all(r.core_deg >= k for r in rows)


def test_gdpr_cascade_counts_match_bruteforce(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        gdpr_erasure_cascade,
    )
    from rad_database_parse_spark.catalog.io import load_table

    rep = {r.table_name: r for r in gdpr_erasure_cascade(spark, sf_dir).collect()}
    assert set(rep) == {"customer", "orders", "lineitem", "events"}
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    keys = {
        r.c_custkey
        for r in cust.filter(F.col("c_custkey") % 20 == 0).collect()
    }
    erased_orders = {
        r.o_orderkey
        for r in orders.filter(F.col("o_custkey").isin(keys)).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    assert rep["customer"].rows_erased == len(keys)
    assert rep["orders"].rows_erased == len(erased_orders)
    assert rep["lineitem"].rows_erased == li.filter(
        F.col("l_orderkey").isin(erased_orders)
    ).count()
    assert rep["events"].rows_erased == ev.filter(
        F.col("user_id").isin(keys)
    ).count()
    for r in rep.values():
        assert r.rows_after == r.rows_before - r.rows_erased


def test_knn_graph_stats_invariants(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        part_knn_graph_stats,
    )

    row = part_knn_graph_stats(spark, sf_dir).collect()[0]
    # IVF candidate lists are ~n/16 wide, so virtually every node fills
    # its k=5 edges; a node short of candidates can only lower the count
    assert row.n_nodes <= row.n_edges <= row.n_nodes * 5
    # reciprocity can't exceed half the directed edges; in-degree stats sane
    assert 0 <= row.n_mutual_pairs <= row.n_edges // 2
    assert row.max_indeg >= row.p95_indeg >= 0


def test_recursive_hierarchy_levels_partition_customers(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        sql_recursive_hierarchy,
    )
    from rad_database_parse_spark.catalog.io import load_table

    rows = sql_recursive_hierarchy(spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer")
    n_cust = cust.count()
    total_keys = cust.agg(F.sum("c_custkey")).collect()[0][0]
    # every customer lands on exactly one level; checksums conserve keys
    assert sum(r.n_customers for r in rows) == n_cust
    assert sum(r.key_checksum for r in rows) == total_keys
    depths = sorted(r.depth for r in rows)
    assert depths == list(range(1, len(depths) + 1))


def test_active_streaks_match_bruteforce(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        events_active_streaks,
    )
    from rad_database_parse_spark.catalog.io import load_table

    got = {r.user_id: r for r in events_active_streaks(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct().collect()
    per_user: dict[int, set] = {}
    for r in days:
        per_user.setdefault(r.user_id, set()).add(r.day)
    assert set(got) == set(per_user)
    for uid, ds in per_user.items():
        ordered = sorted(ds)
        streaks, cur = [], 1
        for a, b in zip(ordered, ordered[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert got[uid].n_active_days == len(ds)
        assert got[uid].longest_streak == max(streaks)
        assert got[uid].n_streaks == len(streaks)


def test_ols_slope_matches_numpy(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        part_brand_ols_slope,
    )
    from rad_database_parse_spark.catalog.io import load_table

    got = {r.p_brand: r for r in part_brand_ols_slope(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "part").select(
        "p_brand", "p_size", "p_retailprice"
    ).collect()
    data: dict[str, list[tuple]] = {}
    for r in rows:
        data.setdefault(r.p_brand, []).append((r.p_size, r.p_retailprice))
    for brand, xy in data.items():
        x = np.array([a for a, _ in xy], dtype=float)
        y = np.array([b for _, b in xy], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got[brand].slope - slope) < 1e-6
        assert abs(got[brand].intercept - intercept) < 1e-4
        assert got[brand].n == len(xy)


def test_kmeans_clusters_partition_corpus_and_improve(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import emb_kmeans_lloyd
    from rad_database_parse_spark.catalog.io import load_table

    rows = emb_kmeans_lloyd(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    total_ids = load_table(spark, sf_dir, "embeddings").agg(
        F.sum("vec_id")
    ).collect()[0][0]
    assert sum(r.n_members for r in rows) == n
    assert sum(r.member_checksum for r in rows) == total_ids
    assert len(rows) <= 4 and all(r.n_members > 0 for r in rows)


# ---------------------------------------------------------- plan guards
def test_r5d_plan_guards(spark, sf_dir):
    from rad_database_parse_spark.plans import (
        formatted_plan,
        reads_only_columns,
        uses_broadcast_join,
    )
    from rad_database_parse_spark.registry.round5d_ops import (
        docs_bm25_topk,
        events_cusum_changepoint,
        gdpr_erasure_cascade,
        lineitem_mad_outliers,
        part_brand_ols_slope,
    )

    # MAD: both median probes broadcast back — lineitem never shuffles
    # through a sort-merge join
    mad = lineitem_mad_outliers(spark, sf_dir)
    assert uses_broadcast_join(mad)
    assert "SortMergeJoin" not in formatted_plan(mad)
    assert reads_only_columns(mad, {"l_returnflag", "l_quantity"})

    # GDPR: every membership probe broadcasts; fact tables never shuffle
    gdpr = gdpr_erasure_cascade(spark, sf_dir)
    assert uses_broadcast_join(gdpr)
    assert "SortMergeJoin" not in formatted_plan(gdpr)

    # CUSUM: daily-grain windows share one event_type exchange; only the
    # raw->daily groupBy and that window exchange shuffle (each Exchange
    # node appears twice in the formatted text: tree + detail section)
    cusum_plan = formatted_plan(events_cusum_changepoint(spark, sf_dir))
    assert cusum_plan.count("Exchange") <= 2 * 2

    # BM25: corpus stats broadcast; scan reads only the two used columns
    bm = docs_bm25_topk(spark, sf_dir)
    assert uses_broadcast_join(bm)
    assert reads_only_columns(bm, {"doc_id", "text"})

    # OLS: single partial-combine aggregate, no join, ONE exchange
    ols_plan = formatted_plan(part_brand_ols_slope(spark, sf_dir))
    assert "Join" not in ols_plan
    assert ols_plan.count("Exchange") == 1 * 2


def test_cohort_ltv_cumsum_is_consistent_and_conserves_revenue(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        orders_cohort_ltv_curve,
    )
    from rad_database_parse_spark.catalog.io import load_table

    rows = orders_cohort_ltv_curve(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    total_cents = o.agg(
        F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint"))
    ).collect()[0][0]
    n_orders = o.count()
    assert sum(r.cents for r in rows) == total_cents
    assert sum(r.n_orders for r in rows) == n_orders
    # per cohort: cum_cents is the running sum over age and ends at the total
    by_cohort: dict[str, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_month, []).append(r)
    for pts in by_cohort.values():
        pts.sort(key=lambda r: r.age_months)
        run = 0
        for r in pts:
            run += r.cents
            assert r.cum_cents == run


def test_novelty_decay_buckets_conserve_first_occurrences(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        docs_ngram_novelty_decay,
    )

    rows = sorted(
        docs_ngram_novelty_decay(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert rows, "non-empty corpus must produce curve points"
    # bucket 0's distinct grams are all novel by definition
    assert rows[0].bucket == 0
    assert rows[0].n_novel == rows[0].n_distinct_grams
    assert rows[0].novelty_fp == 1_000_000
    for r in rows:
        assert 0 <= r.n_novel <= r.n_distinct_grams


def test_cosupply_graph_is_top_decile_and_symmetric_free(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        supplier_shared_customer_graph,
    )

    rows = supplier_shared_customer_graph(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r.supp_a < r.supp_b  # each edge stored once
        assert (r.supp_a, r.supp_b) not in seen
        seen.add((r.supp_a, r.supp_b))
        assert r.n_shared_customers >= 1


def test_cdc_net_changes_partition_all_keys(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        events_cdc_net_changes,
    )
    from rad_database_parse_spark.catalog.io import load_table

    rows = events_cdc_net_changes(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    n_keys = o.select((F.col("o_orderkey") % 997).alias("k")).distinct().count()
    n_orders = o.count()
    assert sum(r.n_keys for r in rows) == n_keys
    assert sum(r.n_changes for r in rows) == n_orders
    assert {r.net_op for r in rows} <= {"I", "U", "D", "NONE"}


def test_stream_ivm_matches_batch_recompute(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        orders_ivm_partial_agg_merge,
        stream_ivm_rollup_maintenance,
    )

    streamed = {
        r.month: r
        for r in stream_ivm_rollup_maintenance(spark, sf_dir).collect()
    }
    batch = {
        r.month: r for r in orders_ivm_partial_agg_merge(spark, sf_dir).collect()
    }
    assert set(streamed) == set(batch)
    for m, b in batch.items():
        s = streamed[m]
        assert (s.n_orders, s.total_cents) == (b.n_orders, b.total_cents)
        assert s.avg_price == b.avg_price


def test_windowed_funnel_is_monotone_and_bounded(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        events_funnel_windowed_24h,
    )
    from rad_database_parse_spark.registry.events_ops import (
        funnel_view_click_purchase,
    )

    row = events_funnel_windowed_24h(spark, sf_dir).collect()[0]
    assert row.n_view >= row.n_click_24h >= row.n_purchase_24h >= 0
    if row.n_click_24h:
        # mean view->click latency fits inside the 24h window
        assert 0 < row.sum_view_to_click_us <= row.n_click_24h * 86400_000_000


def test_skew_diagnostics_match_bruteforce(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        join_skew_diagnostics,
    )
    from rad_database_parse_spark.catalog.io import load_table

    row = join_skew_diagnostics(spark, sf_dir).collect()[0]
    counts: dict[int, int] = {}
    for r in load_table(spark, sf_dir, "events").select("user_id").collect():
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
    n_rows, n_keys = sum(counts.values()), len(counts)
    max_cnt = max(counts.values())
    assert row.n_rows == n_rows and row.n_keys == n_keys
    assert row.max_cnt == max_cnt
    assert counts[row.hottest_key] == max_cnt
    assert row.skew_ratio_fp == int(np.floor(1e6 * max_cnt * n_keys / n_rows))
    assert row.recommended_salt == -(-max_cnt * n_keys // n_rows)


def test_cep_negative_condition_matches_bruteforce(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        events_cep_click_after_view_no_error,
    )
    from rad_database_parse_spark.catalog.io import load_table

    got = {
        r.user_id: r
        for r in events_cep_click_after_view_no_error(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    streams: dict[int, list] = {}
    for r in ev:
        streams.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    for uid, s in streams.items():
        s.sort()
        last_view = last_error = None  # ts of the latest one (the operator
        clicks = clean = 0             # compares event-time, not position)
        for _ts, _eid, et in s:
            if et == "click":
                clicks += 1
                if last_view is not None and (
                    last_error is None or last_view > last_error
                ):
                    clean += 1
            elif et == "view":
                last_view = _ts
            elif et == "error":
                last_error = _ts
        if clicks:
            assert got[uid].n_clicks == clicks
            assert got[uid].n_clean_matches == clean
        else:
            assert uid not in got


def test_dim_variance_profile_matches_numpy(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        emb_dim_variance_profile,
    )
    from rad_database_parse_spark.catalog.io import load_table

    got = {r.dim: r for r in emb_dim_variance_profile(spark, sf_dir).collect()}
    vecs = np.array(
        [
            np.floor(np.asarray(r.embedding, dtype=np.float64) * 1e6)
            for r in load_table(spark, sf_dir, "embeddings").collect()
        ]
    )
    assert set(got) == set(range(1, 65))
    for d in range(64):
        col = vecs[:, d]
        assert got[d + 1].n == len(col)
        assert abs(got[d + 1].mean - col.mean() / 1e6) < 1e-9
        ex2 = (col * col).sum() / len(col)
        var = (ex2 - col.mean() ** 2) / 1e12
        assert abs(got[d + 1].variance - var) < 1e-9


def test_backlog_sweepline_total_returns_to_zero(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        orders_backlog_sweepline,
    )
    from rad_database_parse_spark.catalog.io import load_table

    rows = sorted(orders_backlog_sweepline(spark, sf_dir).collect(),
                  key=lambda r: r.day)
    # every +1 meets its -1: the final running value is zero, and the
    # backlog never goes negative along the way
    assert rows[-1].open_backlog == 0
    assert all(r.open_backlog >= 0 for r in rows)
    # peak backlog can't exceed the order count
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert max(r.open_backlog for r in rows) <= n_orders


def test_ks_two_sample_matches_numpy(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        lineitem_ks_two_sample,
    )
    from rad_database_parse_spark.catalog.io import load_table

    row = lineitem_ks_two_sample(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    ).collect()
    a = sorted(r.l_quantity for r in li if r.l_returnflag == "A")
    b = sorted(r.l_quantity for r in li if r.l_returnflag == "R")
    support = sorted(set(a) | set(b))
    import bisect

    best = (0, None)
    for v in support:
        ca = bisect.bisect_right(a, v)
        cb = bisect.bisect_right(b, v)
        d = abs(ca * len(b) - cb * len(a))
        if d > best[0]:
            best = (d, v)
    assert (row.n1, row.n2) == (len(a), len(b))
    assert row.d_scaled == best[0]
    assert row.at_value == best[1]
    assert row.ks_fp == int(np.floor(1e6 * best[0] / (len(a) * len(b))))


def test_mix_shift_decomposition_conserves(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        nation_mix_shift_decomposition,
    )

    rows = nation_mix_shift_decomposition(spark, sf_dir).collect()
    t0 = sum(r.r0_cents for r in rows)
    t1 = sum(r.r1_cents for r in rows)
    # per-nation identity: mix + growth == delta * T1, to the last cent
    for r in rows:
        assert int(r.mix_scaled) + int(r.growth_scaled) == r.delta_cents * t1
    # global conservation laws
    assert sum(int(r.mix_scaled) for r in rows) == 0
    assert sum(int(r.growth_scaled) for r in rows) == (t1 - t0) * t1


def test_laspeyres_index_is_positive_and_matched_basket(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        part_laspeyres_price_index,
    )

    rows = part_laspeyres_price_index(spark, sf_dir).collect()
    assert rows, "both years trade at every SF"
    for r in rows:
        assert r.n_parts >= 1
        assert r.index_fp > 0  # prices are positive


def test_bot_rules_flag_composition(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        events_bot_detection_rules,
    )

    for r in events_bot_detection_rules(spark, sf_dir).collect():
        burst = r.max_burst_10min >= 12
        errs = r.error_share_fp >= 300000
        assert burst or errs
        assert r.flags == (1 if burst else 0) + (2 if errs else 0)
        assert 0 <= r.error_share_fp <= 1_000_000


def test_dynamic_udtf_schema_follows_literal(spark, sf_dir):
    from pyspark.sql.functions import udtf as udtf_fn  # noqa: F401
    from rad_database_parse_spark.registry.round5d_ops import (
        udtf_dynamic_split_words,
    )

    df = udtf_dynamic_split_words(spark, sf_dir)
    assert df.columns == ["p_partkey", "word_1", "word_2", "word_3"]
    rows = df.collect()
    assert all(r.word_1 is not None for r in rows)


def test_decile_migration_is_doubly_balanced(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        customer_decile_migration,
    )

    rows = customer_decile_migration(spark, sf_dir).collect()
    n = sum(r.n_customers for r in rows)
    # NTILE balance: every decile's row-margin and column-margin hold
    # floor(n/10) or ceil(n/10) customers
    lo, hi = n // 10, -(-n // 10)
    row_m: dict[int, int] = {}
    col_m: dict[int, int] = {}
    for r in rows:
        row_m[r.decile_1996] = row_m.get(r.decile_1996, 0) + r.n_customers
        col_m[r.decile_1997] = col_m.get(r.decile_1997, 0) + r.n_customers
    assert all(lo <= v <= hi for v in row_m.values())
    assert all(lo <= v <= hi for v in col_m.values())


def test_anova_terms_match_numpy(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        lineitem_anova_two_way,
    )
    from rad_database_parse_spark.catalog.io import load_table

    row = lineitem_anova_two_way(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    ).collect()
    x = np.array([r.l_quantity for r in li])
    a = np.array([r.l_returnflag for r in li])
    b = np.array([r.l_linestatus for r in li])
    gm = x.mean()
    ss_total = ((x - gm) ** 2).sum()
    ss_a = sum(
        (x[a == v]).size * (x[a == v].mean() - gm) ** 2 for v in set(a)
    )
    ss_b = sum(
        (x[b == v]).size * (x[b == v].mean() - gm) ** 2 for v in set(b)
    )
    cells = {}
    for v1 in set(a):
        for v2 in set(b):
            sel = x[(a == v1) & (b == v2)]
            if sel.size:
                cells[(v1, v2)] = sel
    ss_cells = sum(s.size * (s.mean() - gm) ** 2 for s in cells.values())
    assert abs(row.ss_total - ss_total) < 1e-3 * max(1, abs(ss_total))
    assert abs(row.ss_a - ss_a) < 1e-3 * max(1, abs(ss_a)) + 1e-6
    assert abs(row.ss_b - ss_b) < 1e-3 * max(1, abs(ss_b)) + 1e-6
    assert abs(row.ss_interaction - (ss_cells - ss_a - ss_b)) < 1e-3 * max(
        1, abs(ss_cells)
    )
    assert abs(row.ss_error - (ss_total - ss_cells)) < 1e-3 * max(
        1, abs(ss_total)
    )


def test_did_estimate_matches_cell_means(spark, sf_dir):
    from rad_database_parse_spark.registry.round5d_ops import (
        events_diff_in_differences,
    )

    row = events_diff_in_differences(spark, sf_dir).collect()[0]
    assert row.did_estimate == (row.m_t_post - row.m_t_pre) - (
        row.m_c_post - row.m_c_pre
    )
    for v in (row.m_t_pre, row.m_t_post, row.m_c_pre, row.m_c_post):
        assert v > 0


def test_bpe_first_merge_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    from rad_database_parse_spark.registry.round5d_ops import (
        docs_bpe_first_merge,
    )
    from rad_database_parse_spark.catalog.io import load_table

    got = docs_bpe_first_merge(spark, sf_dir).collect()
    texts = [
        r.text for r in load_table(spark, sf_dir, "documents").collect()
    ]
    counts: Counter = Counter()
    for t_ in texts:
        for w in t_.split(" "):
            for i in range(len(w) - 1):
                counts[w[i : i + 2]] += 1
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got.sort(key=lambda r: r.rank)
    assert [(r.pair, r.n_occurrences) for r in got] == expected


def test_late_r5d_plan_guards(spark, sf_dir):
    from rad_database_parse_spark.plans import (
        formatted_plan,
        reads_only_columns,
        uses_broadcast_join,
    )
    from rad_database_parse_spark.registry.round5d_ops import (
        docs_bpe_first_merge,
        events_diff_in_differences,
        lineitem_anova_two_way,
        lineitem_ks_two_sample,
        part_laspeyres_price_index,
    )

    # ANOVA and DiD: single fact scan, no join in the aggregate path
    anova = formatted_plan(lineitem_anova_two_way(spark, sf_dir))
    assert "SortMergeJoin" not in anova
    did = events_diff_in_differences(spark, sf_dir)
    assert "SortMergeJoin" not in formatted_plan(did)
    assert reads_only_columns(did, {"user_id", "event_type", "ts", "value"})

    # KS: fact table collapses before the window; scan reads 2 columns
    ks = lineitem_ks_two_sample(spark, sf_dir)
    assert reads_only_columns(ks, {"l_returnflag", "l_quantity"})

    # Laspeyres: part dim broadcasts
    assert uses_broadcast_join(part_laspeyres_price_index(spark, sf_dir))

    # BPE: only the text column is read
    assert reads_only_columns(docs_bpe_first_merge(spark, sf_dir), {"text"})


def test_order_sensitive_ops_stable_under_repartition(spark, sf_dir):
    """NTILE/rank outputs must not depend on physical partitioning —
    the determinism contract every order-sensitive op in the repo
    claims (ties broken on ids)."""
    from rad_database_parse_spark.registry.round5d_ops import (
        customer_decile_migration,
        docs_bpe_first_merge,
    )

    base_mig = {
        (r.decile_1996, r.decile_1997): r.n_customers
        for r in customer_decile_migration(spark, sf_dir).collect()
    }
    base_bpe = [
        (r.rank, r.pair, r.n_occurrences)
        for r in docs_bpe_first_merge(spark, sf_dir).collect()
    ]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        mig2 = {
            (r.decile_1996, r.decile_1997): r.n_customers
            for r in customer_decile_migration(spark, sf_dir).collect()
        }
        bpe2 = [
            (r.rank, r.pair, r.n_occurrences)
            for r in docs_bpe_first_merge(spark, sf_dir).collect()
        ]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert mig2 == base_mig
    assert sorted(bpe2) == sorted(base_bpe)


def test_ivf_blocked_kernel_bit_identical_to_hof(spark, sf_dir):
    """The blocked numpy IVF kernel (r8 re-plan behind
    part_knn_graph_stats) must return the EXACT rows of the HOF path —
    same pairs, same rounded sims, same ranks — because its per-pair
    fold is the identical IEEE op sequence (see
    ivf_cosine_topk_blocked's docstring). Full-output equality, not a
    spot check; sf0.1 was additionally verified once in-session (10,000
    edges identical)."""
    from pyspark.sql import functions as F

    from rad_database_parse_spark.llm.similarity import (
        ivf_cosine_topk,
        ivf_cosine_topk_blocked,
    )
    from rad_database_parse_spark.registry._util import t

    e = t(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < 16)
    hof = sorted(
        (int(r.query_id), int(r.neighbor_id), r.sim, r.rank)
        for r in ivf_cosine_topk(e, e, cents, k=5, nprobe=2).collect()
    )
    blk = sorted(
        (int(r.query_id), int(r.neighbor_id), r.sim, r.rank)
        for r in ivf_cosine_topk_blocked(
            e, e, cents, k=5, nprobe=2
        ).collect()
    )
    assert hof == blk
    assert len(hof) > 0

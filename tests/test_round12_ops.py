"""Ground-truth tests for the round-12 additions: brute-force
recomputations (pandas/numpy/pure Python) of every wave entry on
sf0.001, plus property checks for the portable wide-decimal→double
conversion and the chained-stateful-replay emission contract."""

from __future__ import annotations

import hashlib
import math
from fractions import Fraction

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _df(table: str):
    con = duckdb.connect()
    return con.execute(f"SELECT * FROM '{SF_DIR}/{table}.parquet'").df()


def _midranks(values: np.ndarray) -> np.ndarray:
    """Average-method ranks (1-based midranks), float."""
    return pd.Series(values).rank(method="average").to_numpy()


# ---------------------------------------------------------------------------
# dec_to_double — the portable wide-decimal → double conversion
# ---------------------------------------------------------------------------


def _limb_ref(v: int) -> float:
    """Python reference of the 4-limb composition (exactly what both
    engines evaluate)."""
    l1, l2, l3 = 2**32, 2**64, 2**96

    def smod(a, m):
        r = abs(a) % m
        return r if a >= 0 else -r

    p0 = smod(v, l1)
    p1 = smod(v, l2) - smod(v, l1)
    p2 = smod(v, l3) - smod(v, l2)
    p3 = v - smod(v, l3)
    return ((float(p3) + float(p2)) + float(p1)) + float(p0)


def test_sql_dec_to_double_matches_reference_and_is_accurate():
    from us_flight_bigdata_dashboard_spark.functions.exact import (
        sql_dec_to_double,
    )

    con = duckdb.connect()
    rng = np.random.default_rng(12)
    vals = [0, 1, -1, 2**53 + 1, 2**64 + 3, -(2**64 + 3), 10**38 - 1]
    vals += [int(rng.integers(-(2**62), 2**62)) * int(rng.integers(1, 2**60)) for _ in range(40)]
    for v in vals:
        expr = sql_dec_to_double(f"CAST('{v}' AS DECIMAL(38,0))")
        got = con.execute(f"SELECT {expr}").fetchone()[0]
        assert got == _limb_ref(v), v
        if v:
            assert abs(got - float(v)) / abs(float(v)) < 1e-15, v


def test_spark_dec_to_double_matches_reference(spark):
    from pyspark.sql import functions as F

    from us_flight_bigdata_dashboard_spark.functions.exact import dec_to_double

    vals = [0, 1, -7, 24860565052133677018, -(10**38 - 1), 2**90 + 12345]
    df = spark.createDataFrame([(str(v),) for v in vals], "v string").select(
        "v", dec_to_double(F.col("v").cast("decimal(38,0)")).alias("d")
    )
    got = {r["v"]: r["d"] for r in df.collect()}
    for v in vals:
        assert got[str(v)] == _limb_ref(v), v


# ---------------------------------------------------------------------------
# brunner_munzel_test — placement brute force
# ---------------------------------------------------------------------------


def test_brunner_munzel_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_brunner_munzel,
    )

    orders = _df("orders")
    x = orders.loc[
        orders["o_orderpriority"] == "1-URGENT", "o_totalprice"
    ].to_numpy()
    y = orders.loc[
        orders["o_orderpriority"] != "1-URGENT", "o_totalprice"
    ].to_numpy()
    n1, n2 = len(x), len(y)
    comb = np.concatenate([x, y])
    rc = _midranks(comb)
    rcx, rcy = rc[:n1], rc[n1:]
    rx, ry = _midranks(x), _midranks(y)
    px, py = rcx - rx, rcy - ry  # placements
    sx = px.sum()
    sy = py.sum()
    vx = ((px - px.mean()) ** 2).sum() / (n1 - 1)
    vy = ((py - py.mean()) ** 2).sum() / (n2 - 1)
    mean_diff = (rcy.mean()) - (rcx.mean())
    w_ref = n1 * n2 * mean_diff / ((n1 + n2) * math.sqrt(n1 * vx + n2 * vy))
    a1, a2 = n1 * vx, n2 * vy
    df_ref = (a1 + a2) ** 2 / (a1**2 / (n1 - 1) + a2**2 / (n2 - 1))
    p_ref = sy / (n1 * n2)  # P(X<Y) + .5 P(X=Y)

    (row,) = q_brunner_munzel(spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["p_hat"] == pytest.approx(p_ref, rel=1e-10)
    assert row["w_stat"] == pytest.approx(w_ref, rel=1e-8)
    assert row["df_satterthwaite"] == pytest.approx(df_ref, rel=1e-8)


# ---------------------------------------------------------------------------
# hodges_lehmann_shift — exhaustive pairwise differences
# ---------------------------------------------------------------------------


def test_hodges_lehmann_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        _HL_FLAG_A,
        _HL_FLAG_B,
        q_hodges_lehmann_shift,
    )

    li = _df("lineitem")
    x = li.loc[li["l_returnflag"] == _HL_FLAG_A, "l_quantity"].to_numpy()
    y = li.loc[li["l_returnflag"] == _HL_FLAG_B, "l_quantity"].to_numpy()
    diffs = np.sort((x[:, None] - y[None, :]).ravel())
    t = len(diffs)
    lo = diffs[(t + 1) // 2 - 1]
    hi = diffs[t // 2]
    hl_ref = (lo + hi) / 2.0

    (row,) = q_hodges_lehmann_shift(spark, SF_DIR).collect()
    assert row["n1"] == len(x) and row["n2"] == len(y)
    assert row["n_pairs"] == t
    assert row["hl_shift"] == hl_ref


# ---------------------------------------------------------------------------
# conover_squared_ranks — rank brute force
# ---------------------------------------------------------------------------


def test_conover_squared_ranks_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        _CONOVER_FLAGS,
        q_conover_squared_ranks,
    )

    li = _df("lineitem")
    li["qty"] = li["l_quantity"].astype(np.int64)
    devs, groups = [], []
    for f in _CONOVER_FLAGS:
        q = np.sort(li.loc[li["l_returnflag"] == f, "qty"].to_numpy())
        med = q[(len(q) + 1) // 2 - 1]  # exact lower median
        d = np.abs(li.loc[li["l_returnflag"] == f, "qty"].to_numpy() - med)
        devs.append(d)
        groups.append(np.full(len(d), f))
    dev = np.concatenate(devs)
    grp = np.concatenate(groups)
    a = _midranks(dev) ** 2
    n = len(a)
    s_j = {f: a[grp == f].sum() for f in _CONOVER_FLAGS}
    n_j = {f: (grp == f).sum() for f in _CONOVER_FLAGS}
    abar = a.mean()
    num = sum(s_j[f] ** 2 / n_j[f] for f in _CONOVER_FLAGS) - n * abar**2
    d2 = ((a**2).sum() - n * abar**2) / (n - 1)
    t_ref = num / d2

    (row,) = q_conover_squared_ranks(spark, SF_DIR).collect()
    assert row["n_rows"] == n
    assert row["t_stat"] == pytest.approx(t_ref, rel=1e-9)
    assert row["df"] == len(_CONOVER_FLAGS) - 1
    assert row["significant_5pct"] == int(t_ref > 5.991464547107979)


# ---------------------------------------------------------------------------
# somers_d — exhaustive pair loop on the grid
# ---------------------------------------------------------------------------


def test_somers_d_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        _SOMERS_BANDS,
        q_somers_d,
    )

    orders = _df("orders")
    xo = orders["o_orderpriority"].str[0].astype(int).to_numpy()
    yo = np.searchsorted(np.array(_SOMERS_BANDS), orders["o_totalprice"].to_numpy(), side="right")
    cells: dict[tuple[int, int], int] = {}
    for x, y in zip(xo, yo):
        cells[(x, y)] = cells.get((x, y), 0) + 1
    c = d = ty = tx = 0
    items = list(cells.items())
    for i, ((xa, ya), na) in enumerate(items):
        for (xb, yb), nb in items:
            if xa < xb:
                if ya < yb:
                    c += na * nb
                elif ya > yb:
                    d += na * nb
                else:
                    ty += na * nb
            elif xa == xb and ya < yb:
                tx += na * nb
    (row,) = q_somers_d(spark, SF_DIR).collect()
    assert row["concordant"] == c and row["discordant"] == d
    assert row["tied_y_only"] == ty and row["tied_x_only"] == tx
    assert row["d_yx"] == pytest.approx((c - d) / (c + d + ty), rel=1e-12)
    assert row["d_xy"] == pytest.approx((c - d) / (c + d + tx), rel=1e-12)


# ---------------------------------------------------------------------------
# calibration_ece — md5-split brute force
# ---------------------------------------------------------------------------


def _md5_bucket(k: int) -> int:
    return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % 100


def test_calibration_ece_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        ECE_BINS,
        ECE_P_SCALE,
        ECE_TRAIN_PCT,
        q_calibration_ece,
    )

    orders = _df("orders")
    cust = _df("customer")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["y"] = (j["o_orderpriority"] == "1-URGENT").astype(int)
    j["b"] = j["o_custkey"].map(_md5_bucket)
    train = j[j["b"] < ECE_TRAIN_PCT]
    test = j[j["b"] >= ECE_TRAIN_PCT]
    q = 10**ECE_P_SCALE
    pnum = {
        seg: math.floor(g["y"].sum() / len(g) * q)
        for seg, g in train.groupby("c_mktsegment")
    }
    per_bin: dict[int, list] = {}
    for seg, g in test.groupby("c_mktsegment"):
        if seg not in pnum:
            continue
        b = min(ECE_BINS - 1, (ECE_BINS * pnum[seg]) // q)
        n_b, y_b, p_b = per_bin.get(b, (0, 0, 0))
        per_bin[b] = (n_b + len(g), y_b + g["y"].sum(), p_b + pnum[seg] * len(g))
    n_test = sum(v[0] for v in per_bin.values())
    gaps = {
        b: abs(y_b / n_b - p_b / (n_b * q)) for b, (n_b, y_b, p_b) in per_bin.items()
    }
    ece_ref = sum(g * per_bin[b][0] for b, g in gaps.items()) / n_test

    (row,) = q_calibration_ece(spark, SF_DIR).collect()
    assert row["n_test"] == n_test
    assert row["n_bins_used"] == len(per_bin)
    assert row["ece"] == pytest.approx(ece_ref, rel=1e-9)
    assert row["max_ce"] == pytest.approx(max(gaps.values()), rel=1e-12)


# ---------------------------------------------------------------------------
# turning_points_test / foster_stuart_records — series brute force
# ---------------------------------------------------------------------------


def test_turning_points_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_turning_points_test,
    )

    ev = _df("events").dropna(subset=["ts"])
    hourly = (
        ev.set_index("ts").resample("1h").size()
    )
    hourly = hourly[hourly > 0]  # groupBy only materializes non-empty hours
    y = hourly.to_numpy()
    n = len(y)
    t = sum(
        1
        for i in range(1, n - 1)
        if (y[i] > y[i - 1] and y[i] > y[i + 1])
        or (y[i] < y[i - 1] and y[i] < y[i + 1])
    )
    e_t = 2.0 * (n - 2) / 3.0
    z_ref = (t - e_t) / math.sqrt((16.0 * n - 29.0) / 90.0)

    (row,) = q_turning_points_test(spark, SF_DIR).collect()
    assert row["n_hours"] == n and row["n_turns"] == t
    assert row["z_stat"] == pytest.approx(z_ref, rel=1e-12)


def test_foster_stuart_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_foster_stuart_records,
    )

    ev = _df("events").dropna(subset=["ts"])
    daily = ev.set_index("ts").resample("1D").size()
    daily = daily[daily > 0]
    y = daily.to_numpy()
    n = len(y)
    u = sum(1 for i in range(1, n) if y[i] > y[:i].max())
    lo = sum(1 for i in range(1, n) if y[i] < y[:i].min())
    h = sum(1.0 / t for t in range(2, n + 1))
    z_ref = (u - lo) / math.sqrt(2.0 * h)

    (row,) = q_foster_stuart_records(spark, SF_DIR).collect()
    assert row["n_days"] == n
    assert row["n_upper"] == u and row["n_lower"] == lo
    assert row["s_records"] == u + lo
    assert row["z_stat"] == pytest.approx(z_ref, rel=1e-9)


# ---------------------------------------------------------------------------
# events_seasonal_index — pandas recompute
# ---------------------------------------------------------------------------


def test_seasonal_index_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_events_seasonal_index,
    )

    orders = _df("orders")
    orders["cents"] = np.floor(orders["o_totalprice"] * 100.0).astype(np.int64)
    orders["mid"] = (
        orders["o_orderdate"].dt.year * 12 + orders["o_orderdate"].dt.month
    )
    orders["cal"] = orders["o_orderdate"].dt.month
    monthly = orders.groupby(["mid", "cal"])["cents"].sum().reset_index()
    rev = dict(zip(monthly["mid"], monthly["cents"]))
    ratios: dict[int, list[float]] = {}
    for _, r in monthly.iterrows():
        window = [(off, rev.get(r["mid"] + off)) for off in range(-6, 7)]
        if any(v is None for _, v in window):
            continue
        ma_num = sum((1 if abs(off) == 6 else 2) * v for off, v in window)
        ratios.setdefault(int(r["cal"]), []).append(24.0 * r["cents"] / ma_num)
    means = {k: sum(v) / len(v) for k, v in ratios.items()}
    tot = sum(means.values())
    ref = {k: 12.0 * m / tot for k, m in means.items()}

    rows = q_events_seasonal_index(spark, SF_DIR).collect()
    got = {r["month"]: r["seasonal_index"] for r in rows}
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-9)
    # the twelve indices normalize to 12 by construction
    assert sum(got.values()) == pytest.approx(12.0, rel=1e-9)


# ---------------------------------------------------------------------------
# graph_ktruss / graph_local_bridges — pure-Python peeling
# ---------------------------------------------------------------------------


def _copurchase_edges_ref():
    from us_flight_bigdata_dashboard_spark.operators.graph import (
        MIN_COSUPPORT,
        PARTS_PER_ORDER_CAP,
    )

    li = _df("lineitem")[["l_orderkey", "l_partkey"]].drop_duplicates()
    sizes = li.groupby("l_orderkey")["l_partkey"].transform("size")
    li = li[sizes <= PARTS_PER_ORDER_CAP]
    pairs: dict[tuple[int, int], int] = {}
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"])
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                k = (ps[i], ps[j])
                pairs[k] = pairs.get(k, 0) + 1
    return {e for e, s in pairs.items() if s >= MIN_COSUPPORT}


def _supports(edges: set) -> dict:
    nbrs: dict[int, set] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    return {
        (a, b): len(nbrs[a] & nbrs[b]) for a, b in edges
    }


def test_graph_ktruss_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.graph import (
        KTRUSS_K,
        KTRUSS_ROUNDS,
        KTRUSS_TOP,
        q_graph_ktruss,
    )

    edges = _copurchase_edges_ref()
    for _ in range(KTRUSS_ROUNDS):
        sup = _supports(edges)
        edges = {e for e in edges if sup[e] >= KTRUSS_K - 2}
    sup = _supports(edges)
    ordered = sorted(sup.items(), key=lambda kv: (-kv[1], kv[0]))[:KTRUSS_TOP]

    rows = q_graph_ktruss(spark, SF_DIR).collect()
    assert len(rows) == len(ordered)
    for r, ((p1, p2), s) in zip(rows, ordered):
        assert (r["p1"], r["p2"], r["support"]) == (p1, p2, s)
        assert r["n_edges"] == len(edges)


def test_graph_local_bridges_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.graph import (
        LOCAL_BRIDGE_TOP,
        q_graph_local_bridges,
    )

    edges = _copurchase_edges_ref()
    sup = _supports(edges)
    bridges = sorted(e for e in edges if sup[e] == 0)
    rows = q_graph_local_bridges(spark, SF_DIR).collect()
    assert len(rows) == min(LOCAL_BRIDGE_TOP, len(bridges))
    for r, (p1, p2) in zip(rows, bridges[:LOCAL_BRIDGE_TOP]):
        assert (r["p1"], r["p2"]) == (p1, p2)
        assert r["n_bridges"] == len(bridges)


# ---------------------------------------------------------------------------
# text_mattr — NAIVE O(n·w) sliding-window recomputation
# ---------------------------------------------------------------------------


def test_text_mattr_naive_windows(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import (
        MATTR_W,
        q_text_mattr,
    )

    docs = _df("documents")
    rows = q_text_mattr(spark, SF_DIR).collect()
    got = {r["doc_id"]: r for r in rows}
    checked = 0
    for _, d in docs.iterrows():
        toks = [t for t in str(d["text"]).lower().split(" ") if t]
        n = len(toks)
        if n < MATTR_W:
            assert d["doc_id"] not in got
            continue
        if checked < 25:  # naive loop is O(n·w): verify a prefix of docs
            total = sum(
                len(set(toks[s : s + MATTR_W])) for s in range(n - MATTR_W + 1)
            )
            r = got[d["doc_id"]]
            assert r["n_tokens"] == n
            assert r["n_windows"] == n - MATTR_W + 1
            assert r["mattr"] == total / (MATTR_W * (n - MATTR_W + 1))
            checked += 1
    assert checked == 25


# ---------------------------------------------------------------------------
# text_chi2_keyness — counts brute force
# ---------------------------------------------------------------------------


def test_text_chi2_keyness_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import (
        CHI2_MIN_COUNT,
        CHI2_TOP_K,
        q_text_chi2_keyness,
    )

    docs = _df("documents")
    counts: dict[tuple[str, str], int] = {}
    for _, d in docs.iterrows():
        for t in str(d["text"]).lower().split(" "):
            if t:
                counts[(d["source"], t)] = counts.get((d["source"], t), 0) + 1
    tok_tot: dict[str, int] = {}
    src_tot: dict[str, int] = {}
    for (s, t), c in counts.items():
        tok_tot[t] = tok_tot.get(t, 0) + c
        src_tot[s] = src_tot.get(s, 0) + c
    n = sum(tok_tot.values())
    best: dict[str, list] = {}
    for (s, t), a in counts.items():
        ab = tok_tot[t]
        if ab < CHI2_MIN_COUNT:
            continue
        ac = src_tot[s]
        b = ab - a
        c2 = ac - a
        d2 = n - ab - ac + a
        det = a * d2 - b * c2
        if det <= 0:
            continue
        chi2 = n * det * det / (ab * (n - ab) * ac * (n - ac))
        best.setdefault(s, []).append((-chi2, t, a))
    rows = q_text_chi2_keyness(spark, SF_DIR).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for s, lst in best.items():
        lst.sort()
        got = by_src[s]
        assert len(got) == min(CHI2_TOP_K, len(lst))
        for r, (negchi, t, a) in zip(got, lst[:CHI2_TOP_K]):
            assert r["token"] == t and r["count_in_source"] == a
            assert r["chi2"] == pytest.approx(-negchi, rel=1e-9)


# ---------------------------------------------------------------------------
# pps_systematic_sample — exact Fraction thresholds
# ---------------------------------------------------------------------------


def test_pps_systematic_exact_thresholds(spark):
    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        PPS_N,
        q_pps_systematic_sample,
    )

    docs = _df("documents").sort_values("doc_id")
    sizes = docs["n_chars"].to_numpy()
    ids = docs["doc_id"].to_numpy()
    cum = np.cumsum(sizes)
    t = int(cum[-1])
    hits: dict[int, int] = {}
    for k in range(PPS_N):
        thr = Fraction((2 * k + 1) * t, 2 * PPS_N)
        i = int(np.searchsorted(cum, float(thr), side="right"))
        # exact boundary fix-up with Fractions (searchsorted used floats)
        while i > 0 and Fraction(int(cum[i - 1])) > thr:
            i -= 1
        while Fraction(int(cum[i])) <= thr:
            i += 1
        hits[int(ids[i])] = hits.get(int(ids[i]), 0) + 1
    rows = q_pps_systematic_sample(spark, SF_DIR).collect()
    got = {r["doc_id"]: r["n_hits"] for r in rows}
    assert got == hits
    assert sum(got.values()) == PPS_N
    for r in rows:
        assert r["ht_weight"] == t / (PPS_N * r["n_chars"])


# ---------------------------------------------------------------------------
# multimodal_tga_decode — roundtrip, packet kinds, malformed rejection
# ---------------------------------------------------------------------------


def test_tga_roundtrip_stats_match_formula(spark):
    from us_flight_bigdata_dashboard_spark.operators.tga_codec import (
        TGA_H,
        TGA_W,
        _pixels,
        q_multimodal_tga_decode,
    )

    rows = q_multimodal_tga_decode(spark, SF_DIR).collect()
    assert len(rows) == 500
    by_id = {r["media_id"]: r for r in rows}
    for mid in (0, 7, 123):
        px = _pixels(mid)
        lums = [299 * r + 587 * g + 114 * b for r, g, b in px]
        r = by_id[mid]
        assert (r["width"], r["height"], r["n_pixels"]) == (TGA_W, TGA_H, TGA_W * TGA_H)
        assert r["sum_lum"] == sum(lums)
        assert r["sum_sq"] == sum(v * v for v in lums)


def _encode_decode(pixels, w=None, h=None):
    import pandas as pd

    from us_flight_bigdata_dashboard_spark.operators import tga_codec as TC

    write = TC.make_tga_writer(pixel_fn=lambda mid: pixels)
    (out,) = list(write(iter([pd.DataFrame({"media_id": [0]})])))
    payload = out["payload"][0]
    dec = TC.make_tga_decoder()
    (res,) = list(
        dec(iter([pd.DataFrame({"media_id": [0], "payload": [payload]})]))
    )
    return payload, res


def test_tga_packet_kinds_and_caps():
    from us_flight_bigdata_dashboard_spark.operators import tga_codec as TC

    w, h = TC.TGA_W, TC.TGA_H
    # all-constant image → pure RLE packets incl. the 128 cap (w=57 < 128,
    # so the cap lives on rows only if w > 128 — craft via noise-free rows)
    flat = [(5, 6, 7)] * (w * h)
    _, res = _encode_decode(flat)
    lum = 299 * 5 + 587 * 6 + 114 * 7
    assert res["sum_lum"][0] == lum * w * h
    # all-distinct pixels → pure raw packets
    uniq = [(i % 256, (i * 7 + 1) % 256, (i * 13 + 2) % 256) for i in range(w * h)]
    # force per-pixel distinctness against accidental equal neighbours
    for i in range(1, w * h):
        if uniq[i] == uniq[i - 1]:
            uniq[i] = ((uniq[i][0] + 1) % 256, uniq[i][1], uniq[i][2])
    _, res = _encode_decode(uniq)
    lums = [299 * r + 587 * g + 114 * b for r, g, b in uniq]
    assert res["sum_lum"][0] == sum(lums)
    assert res["sum_sq"][0] == sum(v * v for v in lums)


def test_tga_malformed_rejection():
    import pandas as pd

    from us_flight_bigdata_dashboard_spark.operators import tga_codec as TC

    write = TC.make_tga_writer()
    (out,) = list(write(iter([pd.DataFrame({"media_id": [3]})])))
    payload = bytearray(out["payload"][0])
    dec = TC.make_tga_decoder()

    def run(b):
        return list(dec(iter([pd.DataFrame({"media_id": [3], "payload": [bytes(b)]})])))

    # valid payload decodes
    assert run(payload)[0]["n_pixels"][0] == TC.TGA_W * TC.TGA_H
    # corrupt footer
    bad = payload.copy()
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError):
        run(bad)
    # wrong image type
    bad = payload.copy()
    bad[2] = 2  # uncompressed true-color
    with pytest.raises(ValueError):
        run(bad)
    # truncated pixel data
    bad = payload[:40] + payload[-26:]
    with pytest.raises(ValueError):
        run(bad)


# ---------------------------------------------------------------------------
# lepage_test — finite-population score brute force
# ---------------------------------------------------------------------------


def test_lepage_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_lepage_test,
    )

    orders = _df("orders")
    g1 = (orders["o_orderpriority"] == "1-URGENT").to_numpy()
    v = orders["o_totalprice"].to_numpy()
    n = len(v)
    n1 = int(g1.sum())
    m = 2 * _midranks(v)  # doubled midranks, exactly integral
    s = np.minimum(m, 2 * (n + 1) - m)  # doubled Ansari scores

    def z(score):
        tot, tot2 = score.sum(), (score**2).sum()
        num = n * score[g1].sum() - n1 * tot
        var = n * tot2 - tot**2
        return num / math.sqrt(n1 * (n - n1) * var / (n - 1))

    zw, za = z(m), z(s)
    (row,) = q_lepage_test(spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n2"] == n - n1
    assert row["z_wilcoxon"] == pytest.approx(zw, rel=1e-9)
    assert row["z_ansari"] == pytest.approx(za, rel=1e-9)
    assert row["lepage_stat"] == pytest.approx(zw * zw + za * za, rel=1e-9)
    assert row["significant_5pct"] == int(zw * zw + za * za > 5.991464547107979)


# ---------------------------------------------------------------------------
# inventory_base_stock — pandas policy recomputation
# ---------------------------------------------------------------------------


def test_inventory_base_stock_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        BASE_STOCK_DEN,
        BASE_STOCK_LEAD_M,
        BASE_STOCK_NUM,
        q_inventory_base_stock,
    )

    li = _df("lineitem")
    part = _df("part")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j["mid"] = j["l_shipdate"].dt.year * 12 + j["l_shipdate"].dt.month
    j["qty"] = j["l_quantity"].astype(np.int64)
    monthly = j.groupby(["p_brand", "mid"])["qty"].sum().reset_index()
    rows = q_inventory_base_stock(spark, SF_DIR).collect()
    got = {r["p_brand"]: r for r in rows}
    for brand, g in monthly.groupby("p_brand"):
        g = g.sort_values("mid")
        d = g["qty"].to_numpy()
        prot = [
            int(d[i - BASE_STOCK_LEAD_M + 1 : i + 1].sum())
            for i in range(BASE_STOCK_LEAD_M - 1, len(d))
        ]
        s_level = (BASE_STOCK_NUM * sum(prot)) // (BASE_STOCK_DEN * len(prot))
        short = sum(max(0, p - s_level) for p in prot)
        ok = sum(1 for p in prot if p <= s_level)
        r = got[brand]
        assert r["n_periods"] == len(prot)
        assert r["s_level"] == s_level
        assert r["total_shortfall"] == short
        assert r["alpha_service"] == ok / len(prot)
        assert r["beta_fill_rate"] == 1.0 - short / sum(prot)
        # policy sanity: 1.25x mean cover yields a real (non-trivial) policy
        assert 0.0 < r["alpha_service"] <= 1.0


# ---------------------------------------------------------------------------
# gwet_ac1 — cell brute force + paradox property
# ---------------------------------------------------------------------------


def test_gwet_ac1_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        KAPPA_CHARS,
        KAPPA_TOKENS,
        q_gwet_ac1,
    )

    docs = _df("documents")
    a = (docs["n_chars"] >= KAPPA_CHARS).astype(int)
    b = docs["text"].map(
        lambda t: int(len([w for w in str(t).split(" ") if w]) >= KAPPA_TOKENS)
    )
    n = len(docs)
    yy = int(((a == 1) & (b == 1)).sum())
    nn = int(((a == 0) & (b == 0)).sum())
    yn = int(((a == 1) & (b == 0)).sum())
    ny = int(((a == 0) & (b == 1)).sum())
    pa = (yy + nn) / n
    pi = ((yy + yn) + (yy + ny)) / (2 * n)
    pe = 2 * pi * (1 - pi)
    ac1 = (pa - pe) / (1 - pe)
    pek = ((yy + yn) * (yy + ny) + (ny + nn) * (yn + nn)) / (n * n)
    kap = (pa - pek) / (1 - pek)

    (row,) = q_gwet_ac1(spark, SF_DIR).collect()
    assert row["n"] == n
    assert row["p_observed"] == pytest.approx(pa, rel=1e-12)
    assert row["pi_yes"] == pytest.approx(pi, rel=1e-12)
    assert row["gwet_ac1"] == pytest.approx(ac1, rel=1e-12)
    assert row["kappa_same_cells"] == pytest.approx(kap, rel=1e-12)
    assert row["paradox_gap"] == pytest.approx(ac1 - kap, rel=1e-9)


# ---------------------------------------------------------------------------
# classifier_confusion_metrics — cell brute force vs the md5 split
# ---------------------------------------------------------------------------


def test_classifier_confusion_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        ECE_TRAIN_PCT,
        q_classifier_confusion_metrics,
    )

    orders = _df("orders")
    cust = _df("customer")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["y"] = (j["o_orderpriority"] == "1-URGENT").astype(int)
    j["b"] = j["o_custkey"].map(_md5_bucket)
    train = j[j["b"] < ECE_TRAIN_PCT]
    test = j[j["b"] >= ECE_TRAIN_PCT]
    u_g, n_g = int(train["y"].sum()), len(train)
    pos = {
        seg: int(g["y"].sum()) * n_g > u_g * len(g)
        for seg, g in train.groupby("c_mktsegment")
    }
    tp = fp = fn = tn = 0
    for seg, g in test.groupby("c_mktsegment"):
        sy, nt = int(g["y"].sum()), len(g)
        if pos.get(seg, False):
            tp += sy
            fp += nt - sy
        else:
            fn += sy
            tn += nt - sy
    (row,) = q_classifier_confusion_metrics(spark, SF_DIR).collect()
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert row["precision"] == pytest.approx(tp / (tp + fp), rel=1e-12)
    assert row["recall"] == pytest.approx(tp / (tp + fn), rel=1e-12)
    assert row["f1"] == pytest.approx(2 * tp / (2 * tp + fp + fn), rel=1e-12)
    assert row["balanced_accuracy"] == pytest.approx(
        (tp / (tp + fn) + tn / (tn + fp)) / 2, rel=1e-12
    )
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert row["mcc"] == pytest.approx(mcc, rel=1e-10)


# ---------------------------------------------------------------------------
# streaming_chained_windows_replay — emission contract
# ---------------------------------------------------------------------------


def test_chained_windows_replay_contract(spark):
    from us_flight_bigdata_dashboard_spark.streaming.replay import (
        q_streaming_chained_windows_replay,
    )

    rows = q_streaming_chained_windows_replay(spark, SF_DIR).collect()
    assert rows, "append-mode chained windows emitted nothing"
    # sentinel self-excludes (its windows never close)
    assert all(r["event_type"] != "sentinel" for r in rows)
    # the rollup invariants hold on every emitted row
    for r in rows:
        assert r["peak_5min"] <= r["n_events"]
        assert r["n_buckets"] <= 12  # ≤ twelve 5-min buckets per hour
        assert r["n_events"] >= r["n_buckets"]  # every bucket counts ≥1
    # completeness: the emitted per-type totals equal the raw event counts
    ev = _df("events").dropna(subset=["ts"])
    want = ev.groupby("event_type").size().to_dict()
    got: dict[str, int] = {}
    for r in rows:
        got[r["event_type"]] = got.get(r["event_type"], 0) + r["n_events"]
    assert got == want

"""Ground-truth tests for the round-7 layout operators: the Hilbert curve's
tile-locality property (each curve-range bucket bounds one perfect square
tile — strictly tighter than Z-order's jumpy buckets) and zone-map skipping
invariants."""

from __future__ import annotations

import pytest

from us_flight_bigdata_dashboard_spark.operators.layout import (
    q_file_skip_effectiveness,
    q_hilbert_cluster,
)

SF = "/root/testdata/sf0.001"


def test_hilbert_lut_is_a_unit_step_space_filling_curve():
    # rebuild the LUT exactly as the operator does and assert the two
    # defining Hilbert properties: bijectivity (a permutation of the
    # 256x256 grid) and unit-step adjacency (consecutive curve positions
    # are 4-neighbors — the locality property Z-order lacks)
    import numpy as np

    from us_flight_bigdata_dashboard_spark.operators.layout import (
        H_SIDE,
        _hilbert_levels,
    )

    xg, yg = np.meshgrid(
        np.arange(H_SIDE, dtype=np.int64), np.arange(H_SIDE, dtype=np.int64),
        indexing="ij",
    )
    x_, y_, dd = xg.ravel(), yg.ravel(), np.zeros(H_SIDE * H_SIDE, dtype=np.int64)
    for s, s2, sm1 in _hilbert_levels():
        rx = ((x_ & s) > 0).astype(np.int64)
        ry = ((y_ & s) > 0).astype(np.int64)
        dd += s2 * ((3 * rx) ^ ry)
        rot = ry == 0
        flip = rot & (rx == 1)
        x2 = np.where(flip, sm1 - y_, np.where(rot, y_, x_))
        y2 = np.where(flip, sm1 - x_, np.where(rot, x_, y_))
        x_, y_ = x2, y2
    assert len(np.unique(dd)) == H_SIDE * H_SIDE  # bijection
    order = np.argsort(dd)
    px, py = xg.ravel()[order], yg.ravel()[order]
    steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (steps == 1).all()  # every curve step moves to a 4-neighbor


def test_hilbert_buckets_are_tiles(spark):
    rows = q_hilbert_cluster(spark, SF).collect()
    assert len(rows) <= 16
    for r in rows:
        # a 16-cut of the 256×256 Hilbert curve = sixteen 64×64 tiles:
        # every bucket's zone map must fit inside one such tile
        assert r["max_custkey_byte"] - r["min_custkey_byte"] <= 63
        assert r["max_doy_byte"] - r["min_doy_byte"] <= 63


def test_file_skip_conservation(spark):
    rows = q_file_skip_effectiveness(spark, SF).collect()
    assert len(rows) == 4
    n_files = {r["n_files"] for r in rows}
    assert len(n_files) == 1  # same manifest for every predicate
    for r in rows:
        assert 0 <= r["files_skipped"] <= r["n_files"]
        # zone maps never skip a file containing a match:
        # matches must all sit inside scanned rows
        assert r["matching_rows"] <= r["rows_scanned"]

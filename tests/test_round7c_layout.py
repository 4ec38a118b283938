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

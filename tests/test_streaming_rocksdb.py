"""RocksDB state-store provider under the replay harness (VERDICT r4 ask #7).

The HDFS-backed default keeps keyed state on the executor heap — the right
sandbox choice, but at production scale (billions of session/dedup/EWMA
keys) the deployment answer is the RocksDB provider + changelog
checkpointing (see session.get_spark's SPARK_GRAFT_STATESTORE knob). This
test proves the knob's config is valid in THIS Spark build and that a
stateful replay returns identical results under it — provider choice must
never change query semantics."""

from __future__ import annotations

import pytest

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_stateful_replay_identical_under_rocksdb(spark):
    from us_flight_bigdata_dashboard_spark.streaming.replay import (
        q_streaming_tumbling_replay,
    )

    sf_dir = "/root/testdata/sf0.001"
    baseline = _canon(q_streaming_tumbling_replay(spark, sf_dir))

    key = "spark.sql.streaming.stateStore.providerClass"
    chg = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    # Provider is resolved at streaming-query start from session conf, so
    # flipping it on the shared session scopes it to queries started here.
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    spark.conf.set(chg, "true")
    try:
        try:
            rocks = _canon(q_streaming_tumbling_replay(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "ClassNotFound" in msg or "rocksdb" in msg.lower():
                pytest.skip(f"RocksDB provider unavailable in this build: {msg[:200]}")
            raise
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
        spark.conf.unset(chg)

    assert rocks == baseline and len(baseline) > 0

"""Semantic invariants for the round-3 operators — properties the
hash-vs-oracle gate can't express (it proves Spark ≡ DuckDB, not that the
shared definition is *right*)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_chunk_overlap_reconstructs_and_overlaps(spark):
    """Chunk windows must tile every document: chunk 0 starts at token 1,
    consecutive starts differ by exactly the stride, the last chunk reaches
    the final token, and adjacent chunks share window−stride tokens."""
    from us_flight_bigdata_dashboard_spark.operators.text import (
        RAG_CHUNK_STRIDE,
        RAG_CHUNK_TOKENS,
        q_text_chunk_overlap,
    )

    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    # independent ground truth: tokenize the raw text in plain Python
    n_tokens = {
        r["doc_id"]: len([t for t in r["text"].lower().split(" ") if t])
        for r in load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    rows = q_text_chunk_overlap(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_id, chunks in list(by_doc.items())[:200]:
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert chunks[0]["start_token"] == 1
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_token"] - a["start_token"] == RAG_CHUNK_STRIDE
            # full windows overlap by window - stride tokens
            a_toks = a["chunk_text"].split(" ") if a["chunk_text"] else []
            b_toks = b["chunk_text"].split(" ") if b["chunk_text"] else []
            shared = RAG_CHUNK_TOKENS - RAG_CHUNK_STRIDE
            if len(a_toks) == RAG_CHUNK_TOKENS:
                assert a_toks[RAG_CHUNK_STRIDE:] == b_toks[:shared]
        # last chunk covers the document tail: its final token IS the
        # document's final token, checked against an INDEPENDENT Python
        # re-tokenization (the earlier self-referential form compared the
        # chunks to themselves — vacuous, and it masked a stop-bound bug
        # that dropped up to stride-1 tail tokens)
        last = chunks[-1]
        n = n_tokens[doc_id]
        assert last["start_token"] + last["chunk_len"] - 1 == n or (
            n == 0 and last["chunk_len"] == 0
        )


def test_chunk_overlap_short_doc_single_chunk(spark):
    """A document shorter than one window yields exactly one (short) chunk."""
    from us_flight_bigdata_dashboard_spark.operators.text import (
        RAG_CHUNK_TOKENS,
        q_text_chunk_overlap,
    )

    rows = q_text_chunk_overlap(spark, SF_DIR).collect()
    short = [r for r in rows if r["chunk_idx"] == 0 and r["chunk_len"] < RAG_CHUNK_TOKENS]
    assert short, "testdata should contain at least one short document"
    short_ids = {r["doc_id"] for r in short}
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    for doc_id in short_ids:
        assert per_doc[doc_id] == 1


def test_negative_sampling_rejects_all_positives(spark):
    """No emitted negative may be a true (customer, supplier) interaction,
    every anchor draws at most NEG_K, and the draw is deterministic."""
    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        NEG_K,
        q_negative_sampling,
    )
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    negs = q_negative_sampling(spark, SF_DIR)
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    pos = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    leaked = negs.join(
        pos,
        (negs["c_custkey"] == pos["o_custkey"])
        & (negs["neg_suppkey"] == pos["l_suppkey"]),
    ).count()
    assert leaked == 0

    per_anchor = negs.groupBy("c_custkey").count().agg(F.max("count")).collect()[0][0]
    assert per_anchor <= NEG_K

    # deterministic across runs (hash-based, no RNG)
    a = sorted(map(tuple, negs.collect()))
    b = sorted(map(tuple, q_negative_sampling(spark, SF_DIR).collect()))
    assert a == b


def test_negative_sampling_in_supplier_range(spark):
    """Drawn supplier keys must be existing supplier ids (1..max)."""
    from us_flight_bigdata_dashboard_spark.operators.sampling import q_negative_sampling
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    negs = q_negative_sampling(spark, SF_DIR)
    supp = load_table(spark, SF_DIR, "supplier").select("s_suppkey")
    missing = negs.join(
        supp, negs["neg_suppkey"] == supp["s_suppkey"], "left_anti"
    ).count()
    assert missing == 0


def test_streaming_replay_matches_batch_rows(spark):
    """The streaming tumbling replay must agree with the batch tumbling
    operator on every (window, type): same counts, bit-identical decimal
    sums — the batch/streaming unification contract from the engine side
    (the driver checks the same thing against DuckDB)."""
    from us_flight_bigdata_dashboard_spark.operators.events import q_events_tumbling
    from us_flight_bigdata_dashboard_spark.streaming.replay import (
        q_streaming_tumbling_replay,
    )

    batch = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in q_events_tumbling(spark, SF_DIR).collect()
        if r["window_start"] is not None
    }
    stream = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in q_streaming_tumbling_replay(spark, SF_DIR).collect()
    }
    assert stream == batch


def test_bpe_learn_merges_hand_computed(spark):
    """Hand-worked corpus: vocab {aaab:3, ab:2}.
    Round 1: (a,a)=6 beats (a,b)=5 → merge "aa"; aaab→[aa,a,b].
    Round 2: (a,b)=5 beats (aa,a)=3 → merge "ab"; aaab→[aa,ab], ab→[ab].
    Round 3: only (aa,ab)=3 remains."""
    from pyspark.sql import functions as F

    from us_flight_bigdata_dashboard_spark.operators.text import (
        _bpe_adjacent_pairs,
        _bpe_apply_merge,
        _bpe_top_pair,
    )

    vocab = spark.createDataFrame([("aaab", 3), ("ab", 2)], ["word", "freq"])
    seg = vocab.select(
        "word",
        "freq",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i.cast("int"), F.lit(1)),
        ).alias("syms"),
    )
    expected = [("a", "a", 6), ("a", "b", 5), ("aa", "ab", 3)]
    for pa, pb, cnt in expected:
        top = _bpe_top_pair(_bpe_adjacent_pairs(seg))
        row = top.collect()[0]
        assert (row["a"], row["b"], row["pair_count"]) == (pa, pb, cnt)
        seg = _bpe_apply_merge(seg, top)
    # final segmentation after all three merges
    final = {r["word"]: r["syms"] for r in seg.collect()}
    assert final == {"aaab": ["aaab"], "ab": ["ab"]}


def test_chunk_window_formula_property():
    """Pure formula property (no Spark): for any token count n ≥ 0 the
    window-start sequence tiles the document — starts begin at 1, step by
    the stride, the last window reaches token n, and no window starts
    beyond max(n − window + 1, 1)."""
    from us_flight_bigdata_dashboard_spark.operators.text import (
        RAG_CHUNK_STRIDE,
        RAG_CHUNK_TOKENS,
    )

    for n in range(0, 300):
        stop = max(n - RAG_CHUNK_TOKENS + RAG_CHUNK_STRIDE, 1)
        starts = list(range(1, stop + 1, RAG_CHUNK_STRIDE))
        assert starts[0] == 1
        assert all(b - a == RAG_CHUNK_STRIDE for a, b in zip(starts, starts[1:]))
        if n > 0:
            # last window covers the final token (the property that caught
            # the original stop-bound dropping up to stride-1 tail tokens)
            assert starts[-1] + RAG_CHUNK_TOKENS - 1 >= n
        # no window is entirely past the end
        assert all(s <= max(n, 1) for s in starts)
        # no fully-redundant window: each window past the first must cover
        # at least one token its predecessor did not
        assert all(s + RAG_CHUNK_TOKENS - 1 > p + RAG_CHUNK_TOKENS - 1 or s <= n
                   for p, s in zip(starts, starts[1:]))


def test_zero_length_inputs_produce_zero_chunks(spark):
    """Spark's sequence(0, -1) yields a DESCENDING [0, -1], not the empty
    list DuckDB's generate_series gives — chunkers must guard it so empty
    inputs produce zero output rows on both engines (latent in the shipped
    testdata, which has no empty documents)."""
    import pandas as pd

    from us_flight_bigdata_dashboard_spark.operators.multimodal import (
        AUDIO_CHUNK_SAMPLES as CHUNK,
    )

    # crafted frame with one empty and one real payload, through the same
    # expressions the operators use
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 0), (2, CHUNK + 1)], ["media_id", "n_bytes"])
    n_seg = F.ceil(F.col("n_bytes") / CHUNK).cast("int")
    segs = F.when(n_seg > 0, F.sequence(F.lit(0), n_seg - 1)).otherwise(
        F.array().cast("array<int>")
    )
    out = df.select("media_id", F.explode(segs).alias("seg_idx")).collect()
    got = {(r["media_id"], r["seg_idx"]) for r in out}
    assert got == {(2, 0), (2, 1)}  # media 1 (empty) yields nothing


def test_pca_power_unit_norm_and_dominance(spark):
    """The returned principal direction must be unit-norm, and applying the
    Gram operator to it must scale it by ~the reported operator norm
    (the fixed-point property two iterations should already approximate
    on a spectrum with any decay)."""
    import math

    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        q_embedding_pca_power,
    )

    rows = q_embedding_pca_power(spark, SF_DIR).collect()
    assert len(rows) == 64
    comp = {r["dim"]: r["component"] for r in rows}
    nrm2 = sum(v * v for v in comp.values())
    # the normalizer quantizes w² at decimal scale 6 (exactness for the
    # cross-engine gate), so unit norm holds to ~1e-6 relative, not ulp
    assert abs(nrm2 - 1.0) < 1e-5
    lam = rows[0]["operator_norm_est"]
    assert lam > 0
    # eigen-residual: ||C v - lam v|| / lam should be small once the top
    # eigenvalue dominates; compute C v in python from the raw embeddings
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    embs = [
        r["embedding"]
        for r in load_table(spark, SF_DIR, "embeddings").select("embedding").collect()
    ]
    d = len(embs[0])
    cv = [0.0] * d
    for e in embs:
        s = sum(float(e[j]) * comp[j] for j in range(d))
        for j in range(d):
            cv[j] += float(e[j]) * s
    resid = math.sqrt(sum((cv[j] - lam * comp[j]) ** 2 for j in range(d))) / lam
    assert resid < 0.5  # loose: 2 iterations on a random spectrum

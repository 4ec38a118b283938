"""Inter-frame-PREDICTED video codec (key frame + per-block motion) — the
delta-compression rung above MJPEG, stdlib+numpy only.

``operators/mjpeg_codec.py`` closed the compressed-video gap at the
intra-frame level: every AVI frame is an independent JPEG. What that
deliberately lacks — and what this module adds — is the thing that makes
real video codecs (H.26x/VP9/AV1) 10-100× smaller than a JPEG sequence:
TEMPORAL prediction. The "SGV1" format here is the minimal genuine form of
that architecture:

  * frame 0 is an I-frame: the full plane, zero-predicted, entropy-coded;
  * frames 1..F-1 are P-frames: per 8×8 block, a MOTION VECTOR into the
    previous DECODED frame (full-search SAD over all torus shifts — the
    same translational block-matching loop real encoders run, just
    exhaustive instead of pruned) plus the RESIDUAL (current − motion-
    compensated prediction, mod 256), entropy-coded;
  * entropy coding is zero-run RLE (token ``t``: high bit set → literal
    run of ``(t&0x7f)+1`` bytes follow; else zero-run of ``t+1``) — the
    correct shape for residual streams, which are mostly zero wherever
    prediction works.

The synthesized scene makes the prediction REAL, not decorative: the
background scrolls torically by a per-media (dx, dy) each frame while a
4×4 sprite stays fixed, so background blocks compress to a bare motion
vector (zero residual — the encoder must actually FIND the shift for
that to happen) and sprite-crossing blocks carry genuine nonzero
residuals. ``tests/test_pframe_codec.py`` pins both effects (P-frame
coded size ≪ I-frame size; scroll-only content ⇒ all-zero residuals and
the exact expected motion vector, which is SAD-unique for this plane).

The oracle is the scene's closed form (scrolled base plane + sprite
overlay, folded per media/frame/pixel) aggregated to a per-frame sum and
a position-weighted checksum — so header parsing, RLE, motion
compensation with toroidal wrap, and residual reconstruction must all be
byte-correct for the hash to match. The position-weighted checksum is
what makes the gate SHIFT-sensitive: a torus scroll preserves the plain
pixel sum, so ``frame_sum`` alone could not see a wrong motion vector.

Scale shape: identical to the other seven codecs — media ids fan out by
repartition, encode+decode run as Arrow-batched ``mapInPandas`` (one
Python invocation per record batch), per-media state is a 16×16 plane.
Reference: none (north-star scope beyond the pandas dashboard; VERDICT
r7 ask #5).

Pickling note: workers are NESTED closures returned by factories, so
cloudpickle serializes them by value — Spark's Python workers never
import this package (see multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

SGV_W, SGV_H = 16, 16      # frame dims
SGV_B = 8                  # block side → 2×2 = 4 blocks/frame
SGV_FRAMES = 4             # 1 I-frame + 3 P-frames
SGV_BLOCKS = (SGV_W // SGV_B) * (SGV_H // SGV_B)
SGV_MAGIC = b"SGV1"

# Scene closed form (mirrored EXACTLY by the SQL oracle):
#   dx(m) = m%7 + 1, dy(m) = m%5 + 2          — per-media scroll velocity
#   base(m,u,v) = (m*3 + u*5 + v*11) % 200    — background plane (< 200)
#   sprite: 4×4 at (m%12, (m*2)%12), value 200 + m%56 (≥ 200: disjoint
#   from base values, so sprite pixels are unambiguous in both engines)
#   frame f pixel (x,y) = sprite-value if inside the (fixed) sprite rect
#     else base(m, (x + f*dx) % 16, (y + f*dy) % 16)
SGV_SPRITE = 4


def make_scene_planes():
    """Builder returning the scene-plane closure (NESTED so cloudpickle
    serializes it by value inside the encoder worker; also imported by
    tests as the ground-truth plane generator)."""

    def scene_planes(m: int, np):
        dx, dy = m % 7 + 1, m % 5 + 2
        x0, y0 = m % 12, (m * 2) % 12
        sv = 200 + m % 56
        u = np.arange(SGV_W, dtype=np.int64)
        v = np.arange(SGV_H, dtype=np.int64)
        frames = np.empty((SGV_FRAMES, SGV_H, SGV_W), dtype=np.uint8)
        for f in range(SGV_FRAMES):
            uu = (u[None, :] + f * dx) % SGV_W  # x varies along axis 1
            vv = (v[:, None] + f * dy) % SGV_H  # y varies along axis 0
            plane = (m * 3 + uu * 5 + vv * 11) % 200
            plane[y0 : y0 + SGV_SPRITE, x0 : x0 + SGV_SPRITE] = sv
            frames[f] = plane.astype(np.uint8)
        return frames

    return scene_planes


def make_rle():
    """Builder returning the (encode, decode) RLE closure pair. Token
    ``t`` < 0x80 → ``t+1`` zeros; ``t`` ≥ 0x80 → ``(t&0x7f)+1`` literal
    bytes follow."""

    def rle_encode(vals, np) -> bytes:
        # Vectorized run detection (r15): find the zero/nonzero run
        # boundaries with one diff over the whole value array, then emit
        # each run in the SAME greedy ≤128 chunking as the scalar loop —
        # byte-identical output, no per-value Python iteration.
        vals = np.asarray(vals)
        n = len(vals)
        if n == 0:
            return b""
        z = vals == 0
        change = np.flatnonzero(z[1:] != z[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [n]))
        out = bytearray()
        for s, e in zip(starts.tolist(), ends.tolist()):
            if z[s]:
                left = e - s
                while left > 128:
                    out.append(127)
                    left -= 128
                out.append(left - 1)
            else:
                for k in range(s, e, 128):
                    chunk = vals[k : min(k + 128, e)]
                    out.append(0x80 | (len(chunk) - 1))
                    out += chunk.astype(np.uint8).tobytes()
        return bytes(out)

    def rle_decode(buf: bytes, pos: int, count: int, np):
        # decode exactly ``count`` values; ValueError on malformed input
        out = np.empty(count, dtype=np.uint8)
        k = 0
        while k < count:
            if pos >= len(buf):
                raise ValueError("RLE stream truncated")
            t = buf[pos]
            pos += 1
            if t & 0x80:
                run = (t & 0x7F) + 1
                if pos + run > len(buf) or k + run > count:
                    raise ValueError("RLE literal run overflows stream")
                out[k : k + run] = np.frombuffer(
                    buf[pos : pos + run], dtype=np.uint8
                )
                if np.any(out[k : k + run] == 0):
                    raise ValueError("zero byte inside literal run")
                pos += run
            else:
                run = t + 1
                if k + run > count:
                    raise ValueError("RLE zero run overflows frame")
                out[k : k + run] = 0
            k += run
        return out, pos

    return rle_encode, rle_decode


def make_sgv_encoder():
    """mapInPandas worker: (media_id) → (media_id, payload) with payload a
    complete SGV1 stream (I-frame + motion-compensated P-frames). The
    scene/RLE helpers are closure cells built by nested-closure factories,
    so the whole worker pickles by value (see module docstring)."""
    _scene_planes = make_scene_planes()
    _rle_encode, _ = make_rle()

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        def encode_media(m: int) -> bytes:
            frames = _scene_planes(m, _np)
            out = bytearray(SGV_MAGIC)
            out += bytes((SGV_W, SGV_H, SGV_B, SGV_FRAMES))
            prev = None
            for f in range(SGV_FRAMES):
                cur = frames[f].astype(_np.int64)
                if prev is None:
                    body = _rle_encode(cur.ravel(), _np)
                    ftype = 0
                else:
                    # full-search block matching over ALL torus shifts of
                    # the previous decoded frame (lossless ⇒ prev decoded
                    # == prev original); first minimal (dy, dx) wins.
                    # r15 vectorization: cand[sy,sx] == 2×2-tiled prev's
                    # window at (sy, sx) — a zero-copy strided VIEW
                    # (replaces 256 np.roll allocations per frame), and
                    # the per-pixel |cand − cur| tensor is computed once
                    # for the whole frame; every block's SAD map is a
                    # reshape-sum of it. argmin stays row-major, so the
                    # first-minimal (sy, sx) tie-break is unchanged.
                    tiled = _np.tile(prev.astype(_np.int16), (2, 2))
                    s0, s1 = tiled.strides
                    cand = _np.lib.stride_tricks.as_strided(
                        tiled,
                        shape=(SGV_H, SGV_W, SGV_H, SGV_W),
                        strides=(s0, s1, s0, s1),
                    )
                    dpix = _np.abs(cand - cur.astype(_np.int16))
                    # (H, W, nbh, B, nbw, B) → per-shift per-block SADs
                    sads = dpix.reshape(
                        SGV_H, SGV_W, SGV_H // SGV_B, SGV_B, SGV_W // SGV_B, SGV_B
                    ).sum(axis=(3, 5))
                    mvs, residuals = [], []
                    for bi in range(SGV_BLOCKS):
                        byi, bxi = divmod(bi, SGV_W // SGV_B)
                        by, bx = byi * SGV_B, bxi * SGV_B
                        cb = cur[by : by + SGV_B, bx : bx + SGV_B]
                        best = int(sads[:, :, byi, bxi].argmin())  # row-major: first minimal (sy, sx)
                        sy, sx = divmod(best, SGV_W)
                        pred = cand[sy, sx, by : by + SGV_B, bx : bx + SGV_B].astype(
                            _np.int64
                        )
                        residuals.append(((cb - pred) % 256).ravel())
                        mvs.append((sx, sy))
                    body = b"".join(bytes(mv) for mv in mvs) + _rle_encode(
                        _np.concatenate(residuals), _np
                    )
                    ftype = 1
                out += bytes((ftype,)) + _struct.pack("<H", len(body)) + body
                prev = cur
            return bytes(out)

        for pdf in batches:
            mids = [int(m) for m in pdf["media_id"]]
            yield _pd.DataFrame(
                {"media_id": mids, "payload": [encode_media(m) for m in mids]}
            )

    return encode


def make_sgv_decoder():
    """mapInPandas worker: (media_id, payload) → one row per DECODED frame.
    Pure byte-stream reconstruction: header parse, I-frame RLE, then per
    P-frame motion compensation (toroidal) + residual add mod 256. Never
    sees the scene formula. Corrupt input surfaces as ValueError."""
    _, _rle_decode = make_rle()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        wgt = (
            1
            + _np.arange(SGV_W, dtype=_np.int64)[None, :]
            + SGV_W * _np.arange(SGV_H, dtype=_np.int64)[:, None]
        )

        def decode_media(b: bytes):
            if b[:4] != SGV_MAGIC:
                raise ValueError("bad SGV1 magic")
            if len(b) < 8:
                raise ValueError("SGV1 header truncated")
            w, h, bs, nf = b[4], b[5], b[6], b[7]
            if (w, h, bs, nf) != (SGV_W, SGV_H, SGV_B, SGV_FRAMES):
                raise ValueError(f"unsupported SGV1 geometry {(w, h, bs, nf)}")
            pos = 8
            prev = None
            frames = []
            for f in range(nf):
                if pos + 3 > len(b):
                    raise ValueError("frame header truncated")
                ftype = b[pos]
                (blen,) = _struct.unpack("<H", b[pos + 1 : pos + 3])
                pos += 3
                end = pos + blen
                if end > len(b):
                    raise ValueError("frame body truncated")
                if ftype == 0:
                    if f != 0:
                        raise ValueError("I-frame after frame 0")
                    vals, pos = _rle_decode(b, pos, w * h, _np)
                    cur = vals.reshape(h, w).astype(_np.int64)
                else:
                    if prev is None:
                        raise ValueError("P-frame without key frame")
                    n_blocks = (w // bs) * (h // bs)
                    if pos + 2 * n_blocks > end:
                        raise ValueError("motion vectors truncated")
                    mvs = [
                        (b[pos + 2 * i], b[pos + 2 * i + 1]) for i in range(n_blocks)
                    ]
                    if any(sx >= w or sy >= h for sx, sy in mvs):
                        raise ValueError("motion vector out of range")
                    pos += 2 * n_blocks
                    res, pos = _rle_decode(b, pos, n_blocks * bs * bs, _np)
                    res = res.reshape(n_blocks, bs, bs).astype(_np.int64)
                    cur = _np.empty((h, w), dtype=_np.int64)
                    for bi in range(n_blocks):
                        by = (bi // (w // bs)) * bs
                        bx = (bi % (w // bs)) * bs
                        sx, sy = mvs[bi]
                        pred = _np.roll(prev, (-sy, -sx), axis=(0, 1))[
                            by : by + bs, bx : bx + bs
                        ]
                        cur[by : by + bs, bx : bx + bs] = (pred + res[bi]) % 256
                if pos != end:
                    raise ValueError("frame body has trailing bytes")
                frames.append(cur)
                prev = cur
            if pos != len(b):
                raise ValueError("payload has trailing bytes")
            return frames

        for pdf in batches:
            mid_out, fi_out, fsum, psum = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = decode_media(bytes(payload))
                except ValueError:
                    raise
                except (IndexError, KeyError, TypeError, _struct.error) as e:
                    raise ValueError(
                        f"corrupt SGV1 payload: {type(e).__name__}: {e}"
                    ) from e
                for fi, plane in enumerate(frames):
                    mid_out.append(int(mid))
                    fi_out.append(fi)
                    fsum.append(int(plane.sum()))
                    psum.append(int((plane * wgt).sum()))
            if not mid_out:
                continue
            yield _pd.DataFrame(
                {
                    "media_id": mid_out,
                    "frame_idx": fi_out,
                    "width": SGV_W,
                    "height": SGV_H,
                    "n_blocks": SGV_BLOCKS,
                    "frame_sum": fsum,
                    "pos_sum": psum,
                }
            )

    return decode


SGV_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

SGV_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("frame_sum", T.LongType()),
        T.StructField("pos_sum", T.LongType()),
    ]
)


def q_multimodal_pframe_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicted-frame video under the exact gate: each document id becomes
    a real SGV1 stream (key frame + motion-compensated P-frames), decoded
    back frame by frame purely from bytes. One output row per frame; the
    position-weighted checksum makes wrong motion vectors visible (a
    torus scroll preserves the plain sum)."""
    media = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    streams = media.mapInPandas(make_sgv_encoder(), SGV_WRITE_SCHEMA)
    return streams.mapInPandas(make_sgv_decoder(), SGV_DECODE_SCHEMA)


def _sql_pframe_decode() -> str:
    return f"""
WITH px AS (
  SELECT doc_id AS media_id, f.f AS frame_idx, x.x AS x, y.y AS y,
         CASE WHEN x.x >= doc_id % 12 AND x.x < doc_id % 12 + {SGV_SPRITE}
               AND y.y >= (doc_id * 2) % 12
               AND y.y < (doc_id * 2) % 12 + {SGV_SPRITE}
           THEN 200 + doc_id % 56
           ELSE (doc_id * 3
                 + ((x.x + f.f * (doc_id % 7 + 1)) % {SGV_W}) * 5
                 + ((y.y + f.f * (doc_id % 5 + 2)) % {SGV_H}) * 11) % 200
         END AS pix
  FROM documents,
       range(0, {SGV_FRAMES}) AS f(f),
       range(0, {SGV_W}) AS x(x),
       range(0, {SGV_H}) AS y(y)
)
SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       {SGV_W} AS width, {SGV_H} AS height, {SGV_BLOCKS} AS n_blocks,
       CAST(SUM(pix) AS BIGINT) AS frame_sum,
       CAST(SUM((x + {SGV_W} * y + 1) * pix) AS BIGINT) AS pos_sum
FROM px
GROUP BY media_id, frame_idx
"""


QUERIES = {
    "multimodal_pframe_decode": q_multimodal_pframe_decode,
}

ORACLE = {
    "multimodal_pframe_decode": _sql_pframe_decode(),
}

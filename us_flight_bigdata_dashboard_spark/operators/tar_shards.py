"""WebDataset-style tar shards — the LLM-training container, on real bytes.

Large-scale training loaders (WebDataset and its descendants) consume tar
archives of sample files where each sample is a basename-grouped run of
members (``000042.txt`` + ``000042.json`` back to back) and shards are
read sequentially — tar, not zip, precisely because sequential reads of
object storage need no central directory. ``shard_manifest`` plans this
layout; this operator MATERIALIZES and re-ingests it:

- writer (``applyInPandas`` per shard): packs each shard's documents —
  ordered by doc_id, ``.txt`` payload + ``.json`` metadata member per
  document — into a genuine POSIX ustar stream: 512-byte headers with
  octal size fields, the header CHECKSUM computed over the
  spaces-substituted field, 512-padded payloads, two-zero-block
  terminator.
- reader (``mapInPandas`` per shard): a real ustar parser — checksum
  VERIFICATION per header, octal field decode, padding walk, adjacency
  check of the ``.txt``/``.json`` pairing, JSON metadata cross-check
  against the member name — emitting one row per document with the
  extracted text's length and md5 digest.

The oracle computes the same digest directly from the documents table, so
header packing, checksum arithmetic, member ordering, payload padding,
and UTF-8 handling must all round-trip for the hash to match. Scale
shape: one shuffle to co-locate each shard's documents, then
embarrassingly parallel pack/parse per shard — the exact production
write path; at 100 TB only shard count grows.

Worker helpers are NESTED closures (pickled by value; see multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_hex_to_int
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

TAR_SHARDS = 8

TAR_PACK_SCHEMA = "shard bigint, payload binary, n_members bigint"
TAR_READ_SCHEMA = (
    "doc_id bigint, shard bigint, n_chars bigint, digest bigint, meta_ok boolean"
)


def make_tar_packer():
    """applyInPandas worker: one shard's documents → one ustar archive."""

    def pack(pdf):
        import pandas as pd

        def header(name: str, size: int) -> bytes:
            h = bytearray(512)
            nb = name.encode()
            h[0 : len(nb)] = nb  # name
            h[100:108] = b"0000644\x00"  # mode
            h[108:116] = b"0000000\x00"  # uid
            h[116:124] = b"0000000\x00"  # gid
            h[124:136] = f"{size:011o}\x00".encode()  # size, octal
            h[136:148] = b"00000000000\x00"  # mtime (epoch — deterministic)
            h[148:156] = b" " * 8  # chksum field = spaces while summing
            h[156] = 0x30  # typeflag '0' regular file
            h[257:263] = b"ustar\x00"  # magic
            h[263:265] = b"00"  # version
            chk = sum(h)
            h[148:156] = f"{chk:06o}\x00 ".encode()
            return bytes(h)

        def member(name: str, payload: bytes) -> bytes:
            pad = (512 - len(payload) % 512) % 512
            return header(name, len(payload)) + payload + b"\x00" * pad

        import json as _json

        pdf = pdf.sort_values("doc_id")
        shard = int(pdf["shard"].iloc[0])
        out = bytearray()
        for _, r in pdf.iterrows():
            base = f"{int(r.doc_id):09d}"
            txt = (r.text or "").encode("utf-8")
            meta = _json.dumps(
                {"doc_id": int(r.doc_id), "lang": r.lang, "source": r.source},
                separators=(",", ":"),
            ).encode()
            out += member(base + ".txt", txt)
            out += member(base + ".json", meta)
        out += b"\x00" * 1024  # end-of-archive
        return pd.DataFrame(
            {
                "shard": [shard],
                "payload": [bytes(out)],
                "n_members": [2 * len(pdf)],
            }
        )

    return pack


def make_tar_reader():
    """mapInPandas worker: ustar parse + checksum verify + pairing check."""

    def read(batches):
        import hashlib as _hashlib
        import json as _json

        import pandas as pd

        def parse(b: bytes):
            pos, members = 0, []
            while pos + 512 <= len(b):
                h = b[pos : pos + 512]
                if h == b"\x00" * 512:
                    break
                name = h[0:100].split(b"\x00", 1)[0].decode()
                size = int(h[124:136].split(b"\x00", 1)[0] or b"0", 8)
                stored_chk = int(h[148:156].split(b"\x00", 1)[0] or b"0", 8)
                calc = sum(h[:148]) + 8 * 0x20 + sum(h[156:])
                if calc != stored_chk:
                    raise ValueError(f"ustar checksum mismatch for {name!r}")
                if h[257:262] != b"ustar":
                    raise ValueError("missing ustar magic")
                payload = b[pos + 512 : pos + 512 + size]
                if len(payload) != size:
                    raise ValueError("truncated member payload")
                members.append((name, payload))
                pos += 512 + size + ((512 - size % 512) % 512)
            return members

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "shard", "n_chars", "digest", "meta_ok",
            )}
            for shard, payload in zip(pdf["shard"], pdf["payload"]):
                members = parse(bytes(payload))
                if len(members) % 2:
                    raise ValueError("odd member count: broken pairing")
                for i in range(0, len(members), 2):
                    tname, tbody = members[i]
                    jname, jbody = members[i + 1]
                    if not (tname.endswith(".txt") and jname.endswith(".json")):
                        raise ValueError(f"pairing broken at {tname!r}/{jname!r}")
                    if tname[:-4] != jname[:-5]:
                        raise ValueError("txt/json basenames disagree")
                    doc_id = int(tname[:-4])
                    text = tbody.decode("utf-8")
                    meta = _json.loads(jbody)
                    out["doc_id"].append(doc_id)
                    out["shard"].append(int(shard))
                    out["n_chars"].append(len(text))
                    out["digest"].append(
                        int(_hashlib.md5(tbody).hexdigest()[:15], 16)
                    )
                    out["meta_ok"].append(meta.get("doc_id") == doc_id)
            yield pd.DataFrame(out)

    return read


def q_webdataset_tar_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-shard container end-to-end: documents → real ustar tar
    shards (one per doc_id mod {TAR_SHARDS}) → full parse back with
    checksum/pairing/metadata verification. The oracle derives every row
    straight from the documents table (char length + md5 digest of the
    UTF-8 text), so both tar directions must be byte-correct."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source",
        (F.col("doc_id") % TAR_SHARDS).alias("shard"),
    )
    tars = docs.groupBy("shard").applyInPandas(make_tar_packer(), TAR_PACK_SCHEMA)
    return tars.mapInPandas(make_tar_reader(), TAR_READ_SCHEMA)


def _sql_webdataset_tar() -> str:
    return f"""
SELECT doc_id,
       doc_id % {TAR_SHARDS} AS shard,
       CAST(length(text) AS BIGINT) AS n_chars,
       {_sql_hex_to_int("md5(text)", 1, 15)} AS digest,
       TRUE AS meta_ok
FROM documents
"""


CURATE_MIN_CHARS, CURATE_MAX_CHARS = 200, 20000
_DIGSUM_MOD = 2**62


def q_curation_to_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed export pipeline, end-to-end THROUGH the container:
    quality filter (size band) → exact dedup (min doc_id per md5(text))
    → shard assignment → REAL tar packing → full parse-back → per-shard
    receipt (doc count, char total, order-insensitive digest sum). This
    is the artifact a training run actually consumes, verified as one
    chain: a document dropped/duplicated/corrupted at ANY stage — filter,
    dedup window, shard routing, tar packing, or tar parsing — flips the
    receipt, and the oracle recomputes it from the raw table alone.

    Plan: one scan + one md5-keyed window (dedup) + one shard shuffle for
    packing; the parse-back is per-shard parallel; the receipt is a tiny
    agg. The digest sum accumulates 60-bit member digests exactly in
    DECIMAL(38,0) and reduces mod 2^62 into BIGINT (the driver-safe
    digest pattern — see operators/relational._rt_digest)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(
        (F.col("n_chars") >= CURATE_MIN_CHARS)
        & (F.col("n_chars") <= CURATE_MAX_CHARS)
    )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    deduped = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id", "text", "lang", "source",
            (F.col("doc_id") % TAR_SHARDS).alias("shard"),
        )
    )
    tars = deduped.groupBy("shard").applyInPandas(make_tar_packer(), TAR_PACK_SCHEMA)
    perdoc = tars.mapInPandas(make_tar_reader(), TAR_READ_SCHEMA)
    digsum = (
        F.sum(F.col("digest").cast("decimal(38,0)"))
        % F.lit(_DIGSUM_MOD).cast("decimal(38,0)")
    ).cast("bigint")
    return (
        perdoc.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            digsum.alias("digest_sum"),
        )
        .orderBy("shard")
    )


def _sql_curation_to_shards() -> str:
    return f"""
WITH kept AS (
  SELECT doc_id, text
  FROM documents
  WHERE n_chars BETWEEN {CURATE_MIN_CHARS} AND {CURATE_MAX_CHARS}
), deduped AS (
  SELECT doc_id, text
  FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
)
SELECT doc_id % {TAR_SHARDS} AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM({_sql_hex_to_int("md5(text)", 1, 15)}) % {_DIGSUM_MOD} AS BIGINT)
         AS digest_sum
FROM deduped
GROUP BY 1
ORDER BY 1
"""


QUERIES = {
    "webdataset_tar_roundtrip": q_webdataset_tar_roundtrip,
    "curation_to_shards": q_curation_to_shards,
}

ORACLE = {
    "webdataset_tar_roundtrip": _sql_webdataset_tar(),
    "curation_to_shards": _sql_curation_to_shards(),
}

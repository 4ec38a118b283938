"""ZIP archive ingestion — central-directory container on real bytes.

The other half of bulk-archive ingestion next to the tar shards
(operators/tar_shards.py): tar is the sequential-read training-shard
format; ZIP is the random-access delivery format real document dumps
arrive in (a central directory at the END indexes every member, so a
reader can extract one file without scanning the archive). This operator
writes and re-ingests genuine ZIP bytes:

- writer (``applyInPandas`` per bundle): one member per document, the
  classic method choice (raw-DEFLATE via zlib wbits=-15 when it shrinks,
  STORED otherwise — both paths exercised by construction: the documents
  corpus has compressible text, and the member-name entropy test uses
  incompressible payloads), correct CRC-32 and sizes in each local
  header, then the central directory and end-of-central-directory
  records with offsets/counts that must all agree.
- reader (``mapInPandas``): locates EOCD by backward scan, walks the
  CENTRAL DIRECTORY (not the local headers — the spec's source of truth),
  seeks each member's local header, cross-checks names/method/sizes,
  inflates, and VERIFIES CRC-32 and declared sizes before emitting the
  per-document digest row.

The oracle derives every row from the documents table directly, and
stdlib ``zipfile`` interop is pinned in both directions by tests. All
integer/byte-level logic; the only float anywhere is none.

Worker helpers are NESTED closures (pickled by value; see multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_hex_to_int
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

ZIP_BUNDLES = 4

ZIP_PACK_SCHEMA = "bundle bigint, payload binary, n_members bigint"
ZIP_READ_SCHEMA = (
    "doc_id bigint, bundle bigint, n_chars bigint, digest bigint, crc_ok boolean"
)


def make_zip_packer():
    """applyInPandas worker: one bundle's documents → one ZIP archive."""

    def pack(pdf):
        import struct as _struct
        import zlib as _zlib

        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        bundle = int(pdf["bundle"].iloc[0])
        out = bytearray()
        central = bytearray()
        n = 0
        for _, r in pdf.iterrows():
            name = f"{int(r.doc_id):09d}.txt".encode()
            raw = (r.text or "").encode("utf-8")
            co = _zlib.compressobj(9, _zlib.DEFLATED, -15)
            comp = co.compress(raw) + co.flush()
            method, body = (8, comp) if len(comp) < len(raw) else (0, raw)
            crc = _zlib.crc32(raw) & 0xFFFFFFFF
            offset = len(out)
            local = (
                b"PK\x03\x04"
                + _struct.pack(
                    "<HHHHHIII", 20, 0, method, 0, 0x21, crc, len(body), len(raw)
                )
                + _struct.pack("<HH", len(name), 0)
                + name
            )
            out += local + body
            central += (
                b"PK\x01\x02"
                + _struct.pack(
                    "<HHHHHHIIIHHHHHII",
                    20, 20, 0, method, 0, 0x21, crc, len(body), len(raw),
                    len(name), 0, 0, 0, 0, 0, offset,
                )
                + name
            )
            n += 1
        cd_offset = len(out)
        out += central
        out += b"PK\x05\x06" + _struct.pack(
            "<HHHHIIH", 0, 0, n, n, len(central), cd_offset, 0
        )
        return pd.DataFrame(
            {"bundle": [bundle], "payload": [bytes(out)], "n_members": [n]}
        )

    return pack


def make_zip_reader():
    """mapInPandas worker: EOCD scan → central-directory walk → per-member
    extract + CRC-32/size verification."""

    def read(batches):
        import hashlib as _hashlib
        import struct as _struct
        import zlib as _zlib

        import pandas as pd

        def parse(b: bytes):
            tail = b[-(65536 + 22):]
            k = tail.rfind(b"PK\x05\x06")
            if k < 0:
                raise ValueError("no end-of-central-directory record")
            eocd = tail[k:]
            _d, _cd, n_here, n_total, cd_size, cd_off, _cl = _struct.unpack(
                "<HHHHIIH", eocd[4:22]
            )
            if n_here != n_total:
                raise ValueError("multi-disk archives not produced here")
            pos, seen = cd_off, 0
            members = []
            while seen < n_total:
                if b[pos : pos + 4] != b"PK\x01\x02":
                    raise ValueError("central directory entry signature missing")
                (
                    _vm, _vn, _fl, method, _t, _dt, crc, csize, usize,
                    nlen, elen, clen, _disk, _ia, _ea, offset,
                ) = _struct.unpack("<HHHHHHIIIHHHHHII", b[pos + 4 : pos + 46])
                name = b[pos + 46 : pos + 46 + nlen].decode()
                pos += 46 + nlen + elen + clen
                seen += 1
                # seek the LOCAL header and cross-check
                if b[offset : offset + 4] != b"PK\x03\x04":
                    raise ValueError(f"local header signature missing for {name}")
                (_lv, _lf, lmethod, _lt, _ld, lcrc, lcsize, lusize) = _struct.unpack(
                    "<HHHHHIII", b[offset + 4 : offset + 26]
                )
                (lnlen, lelen) = _struct.unpack("<HH", b[offset + 26 : offset + 30])
                lname = b[offset + 30 : offset + 30 + lnlen].decode()
                if lname != name or lmethod != method or (lcrc, lcsize, lusize) != (crc, csize, usize):
                    raise ValueError(f"central/local header disagreement for {name}")
                data_at = offset + 30 + lnlen + lelen
                body = b[data_at : data_at + csize]
                if method == 8:
                    raw = _zlib.decompress(body, -15)
                elif method == 0:
                    raw = body
                else:
                    raise ValueError(f"unsupported method {method}")
                if len(raw) != usize:
                    raise ValueError(f"size mismatch for {name}")
                crc_ok = (_zlib.crc32(raw) & 0xFFFFFFFF) == crc
                members.append((name, raw, crc_ok))
            if len(members) != n_total:
                raise ValueError("central directory count disagrees")
            return members

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "bundle", "n_chars", "digest", "crc_ok")}
            for bundle, payload in zip(pdf["bundle"], pdf["payload"]):
                # decode error boundary (fuzz-enforced): zlib.error on a
                # corrupt DEFLATE stream, struct.error on a truncated
                # header, etc. all normalize to diagnosable ValueErrors
                try:
                    members = parse(bytes(payload))
                except ValueError:
                    raise
                except (
                    IndexError, KeyError, TypeError, OverflowError,
                    _struct.error, _zlib.error, UnicodeDecodeError,
                ) as e:
                    raise ValueError(
                        f"corrupt ZIP payload: {type(e).__name__}: {e}"
                    ) from e
                for name, raw, crc_ok in members:
                    out["doc_id"].append(int(name[:-4]))
                    out["bundle"].append(int(bundle))
                    # errors="replace": a CRC-failed member may not be valid
                    # UTF-8 — crc_ok already flags it, don't crash the scan
                    out["n_chars"].append(len(raw.decode("utf-8", errors="replace")))
                    out["digest"].append(
                        int(_hashlib.md5(raw).hexdigest()[:15], 16)
                    )
                    out["crc_ok"].append(bool(crc_ok))
            yield pd.DataFrame(out)

    return read


def q_zip_archive_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk ZIP delivery end-to-end: documents → real ZIP bundles (one per
    doc_id mod {ZIP_BUNDLES}, mixed STORED/DEFLATE members, full central
    directory) → central-directory-driven extraction with CRC-32 and
    header cross-verification. Oracle = the documents table directly."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % ZIP_BUNDLES).alias("bundle")
    )
    zips = docs.groupBy("bundle").applyInPandas(make_zip_packer(), ZIP_PACK_SCHEMA)
    return zips.mapInPandas(make_zip_reader(), ZIP_READ_SCHEMA)


def _sql_zip_archive() -> str:
    return f"""
SELECT doc_id,
       doc_id % {ZIP_BUNDLES} AS bundle,
       CAST(length(text) AS BIGINT) AS n_chars,
       {_sql_hex_to_int("md5(text)", 1, 15)} AS digest,
       TRUE AS crc_ok
FROM documents
"""


QUERIES = {
    "zip_archive_roundtrip": q_zip_archive_roundtrip,
}

ORACLE = {
    "zip_archive_roundtrip": _sql_zip_archive(),
}

"""Multimodal (binary) column handling — north-star extension surface.

Design: media payloads are opaque ``binary`` columns travelling next to
typed metadata (mime, source id, …), exactly how a 100 TB training
pipeline carries images/audio in parquet.  Feature extraction / decode /
resize run as **Arrow-batched ``mapInPandas``** — one Python process per
task, whole column batches, never per-row UDF round-trips.

The container has no image/audio codec libraries, so decoding is a
PLUGGABLE seam: ``decode_media`` dispatches to a per-mode codec
registry (:func:`register_codec`) and raises ``NotImplementedError``
when no codec is registered; :func:`extract_features` computes a
**deterministic byte-level feature** (normalized 8-bin byte histogram
+ moments) so the Spark-side plumbing — schema, batching, partitioning
— is real and fully tested.  On a real cluster, register a PIL/
torchaudio codec; nothing else changes.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_BINS = 8

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def to_binary_table(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Model a media table: (doc_id, payload binary, meta struct).
    Test data has no real media, so the payload is the utf-8 bytes of
    the text column — byte-identical across runs."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(F.lit("text/plain").alias("mime"),
                 F.octet_length(F.col(text_col)).alias("orig_bytes")).alias("meta"))


# ---------------------------------------------------------------------
# Pluggable decode: a registry of per-mode codecs.  A codec is a plain
# callable ``payload: bytes | None -> dict`` plus the DDL of the columns
# it produces; ``decode_media`` runs it Arrow-batched (``mapInPandas``)
# next to the passthrough doc_id — identical plumbing (schema, batch
# shape, partitioning) whether the codec is a test fake or PIL/av on a
# real cluster.  No codec registered → loud NotImplementedError, the
# honest seam this container requires (no image/audio libs installed).
# ---------------------------------------------------------------------

_CODEC_REGISTRY: dict[str, tuple[str, object]] = {}


def register_codec(mode: str, out_schema_ddl: str, fn) -> None:
    """Register ``fn(payload: bytes | None) -> dict`` as the decoder
    for ``mode``; ``out_schema_ddl`` declares the columns the dict
    carries (e.g. ``"width int, height int, px_mean double"``).  The
    callable must be picklable (module-level function) — it ships to
    executors inside the mapInPandas closure."""
    if not out_schema_ddl.strip():
        raise ValueError("codec needs a non-empty output schema")
    # validate NOW (not executor-side at run time) and let Spark's own
    # DDL parser handle parameterized/nested types — a naive comma
    # split would shred "struct<w:int,h:int>" / "decimal(10,2)"
    T.StructType.fromDDL(out_schema_ddl)
    _CODEC_REGISTRY[mode] = (out_schema_ddl, fn)


def unregister_codec(mode: str) -> None:
    _CODEC_REGISTRY.pop(mode, None)


def decode_media(df: DataFrame, mode: str,
                 id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """Decode the binary payload column with the codec registered for
    ``mode``: returns ``(id_col, <codec columns>)``, one row per input
    row, Arrow-batched.  Raises ``NotImplementedError`` when no codec
    is registered — image/audio/video libraries are not available in
    this environment, so real modes stay an explicit plug point
    (:func:`register_codec`)."""
    reg = _CODEC_REGISTRY.get(mode)
    if reg is None:
        raise NotImplementedError(
            f"decode_media(mode={mode!r}): no codec registered and media "
            "codec libraries are not installed in this container; "
            "register_codec() a PIL/av decoder, or use "
            "extract_features() for the deterministic byte-level path.")
    ddl, fn = reg
    id_field = df.schema[id_col]
    cols = T.StructType.fromDDL(ddl).fieldNames()
    if id_field.name in cols:
        # the passthrough id and a codec column with the same name
        # would produce a duplicate-field schema and silently mislabel
        # (or fail) the worker's pandas->Arrow conversion (r14 review)
        raise ValueError(
            f"codec for mode {mode!r} declares output column "
            f"{id_field.name!r}, which collides with the passthrough "
            f"id column — rename one of them")
    out_schema = f"{id_field.name} {id_field.dataType.simpleString()}, {ddl}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fn(p) for p in pdf[payload_col]]
            out = {id_field.name: pdf[id_col]}
            for c in cols:
                out[c] = [d[c] for d in decoded]
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def _r6(x: float) -> float:
    # floor(x*1e6+0.5)/1e6, NOT round(): Python rounds half-even, DuckDB
    # half-away — floor on identical IEEE doubles is bit-reproducible
    # across both engines (same trick as functions/text.quality_score)
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _byte_features(payload: bytes | None) -> tuple[int, list[float]]:
    # NULL payload folds to the empty-payload feature row instead of
    # killing the task (np.frombuffer(None) raises)
    arr = np.frombuffer(payload or b"", dtype=np.uint8)
    n = int(arr.size)
    if n == 0:
        return 0, [0.0] * (N_BINS + 2)
    # moments from exact integer sums (< 2^53) so the double math below
    # is the *same sequence of IEEE ops* the DuckDB oracle runs — any
    # accumulation-order difference (numpy pairwise vs SQL streaming)
    # would break bit-equality at the 6th decimal
    a = arr.astype(np.int64)
    s, ss, nf = float(int(a.sum())), float(int((a * a).sum())), float(n)
    hist = np.bincount(arr >> 5, minlength=N_BINS).astype("float64") / nf
    mean = s / nf / 255.0
    std = math.sqrt(max((ss - s * s / nf) / nf, 0.0)) / 255.0
    return n, [_r6(float(x)) for x in (*hist, mean, std)]


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    Returns (doc_id, n_bytes, features: array<double>).  The batch shape
    (``mapInPandas`` over whole Arrow record batches) is exactly what a
    real decoder would use; only ``_byte_features`` is a stand-in.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_byte_features(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                # no astype: a NULL id must pass through as null, not
                # raise IntCastingNaNError in the worker
                "doc_id": pdf["doc_id"],
                "n_bytes": [f[0] for f in feats],
                "features": [f[1] for f in feats],
            })

    return binary_df.mapInPandas(run, FEATURE_SCHEMA)


def feature_rows(binary_df: DataFrame) -> DataFrame:
    """:func:`extract_features` in long form: one (doc_id, n_bytes,
    feat_idx, feat_value) row per feature element.

    The exploded shape is what a feature store / SQL consumer wants
    (arrays are opaque to most engines' sort/hash machinery — the
    driver's own canonicalizer can't hash ``array<double>``), and the
    explode is a narrow JVM-side op over the already-batched extractor
    output.
    """
    f = extract_features(binary_df)
    return f.select("doc_id", F.col("n_bytes").cast("long").alias("n_bytes"),
                    F.posexplode("features").alias("feat_idx", "feat_value")) \
            .select("doc_id", "n_bytes",
                    F.col("feat_idx").cast("long").alias("feat_idx"),
                    "feat_value")


def frame_sample(binary_df: DataFrame, every_n: int = 1024,
                 frame_bytes: int = 16) -> DataFrame:
    """'Frame sampling' stand-in: slice fixed-size windows every
    ``every_n`` bytes of the payload (a video sampler would emit decoded
    frames with the same explode shape).  JVM-side only."""
    n_frames = F.floor(F.octet_length("payload") / every_n).cast("int")
    idx = F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))))
    return (binary_df.select("doc_id", F.col("payload"), idx.alias("frame_idx"))
            .select("doc_id", "frame_idx",
                    F.substring(F.col("payload"),
                                F.col("frame_idx") * every_n + 1,
                                frame_bytes).alias("frame")))


RESIZE_TARGET = 64


def resize_media(binary_df: DataFrame,
                 target: int = RESIZE_TARGET) -> DataFrame:
    """Fixed-size byte "thumbnail" of every payload: sample byte
    ``1 + ⌊k·n/target⌋`` for ``k = 0..target−1`` — the nearest-neighbor
    resampling rule, applied in the byte domain.

    A real image/audio resize needs the codec libraries this container
    lacks (see :func:`decode_media`); the deliverable here is the
    Spark-side plumbing — schema, per-payload deterministic sampling,
    distribution — with a byte-domain stand-in for pixel resampling
    that is exactly checkable cross-engine.  Payloads shorter than
    ``target`` upsample by index repetition (nearest-neighbor again),
    so the output length is always ``target``.

    Returns ``(doc_id, n_bytes, resized_md5)`` where ``resized_md5``
    is the md5 of the hex-encoded sampled bytes (hex-string form keeps
    the oracle comparison text-typed).  Entirely ROW-LOCAL: one
    ``transform`` over a ``sequence`` per payload — no explode, no
    re-assembly shuffle (the previous explode + collect_list shape
    paid a corpus shuffle at (doc × target) grain for values every row
    can compute by itself).  Positions derive from the payload's OWN
    ``octet_length`` — not from metadata that may disagree with the
    actual bytes once a real decoder is plugged in.
    """
    # LONG multiply: octet_length is int32 and the sequence elements
    # are int32, so k * n_bytes overflowed (ANSI ARITHMETIC_OVERFLOW)
    # for payloads past ~34 MB at the top k — real media sizes (r14
    # review); the DuckDB twin already multiplies against a BIGINT
    # strlen
    n_bytes = F.octet_length("payload").cast("long")
    samples = F.transform(
        F.sequence(F.lit(0), F.lit(target - 1)),
        lambda k: F.hex(F.expr("payload").substr(
            (F.lit(1) + F.floor(k.cast("long") * n_bytes
                                / F.lit(float(target))))
            .cast("int"), F.lit(1))))
    return binary_df.select(
        "doc_id", n_bytes.cast("long").alias("n_bytes"),
        F.md5(F.array_join(samples, "")).alias("resized_md5"))


#: magic-byte hex prefixes → mime (checked in order; longest first
#: where prefixes could overlap)
MAGIC_MIME = [
    ("89504E470D0A1A0A", "image/png"),
    ("255044462D", "application/pdf"),      # %PDF-
    ("FFD8FF", "image/jpeg"),
    ("504B0304", "application/zip"),
    ("1F8B", "application/gzip"),
]


def sniff_mime(binary_df: DataFrame) -> DataFrame:
    """Magic-byte MIME detection over binary payloads — the ingest-time
    classification step that routes raw assets to the right decoder
    (the honest part of the decode pipeline that needs no codec libs).
    Compares the hex of the first 8 payload bytes against the standard
    magic numbers, falling back to ``text/plain``.  One codegen CASE
    per row, zero shuffles.  Returns ``(doc_id, mime, n_bytes)``.
    """
    h = F.hex(F.expr("substring(payload, 1, 8)"))
    mime = None
    for prefix, m in MAGIC_MIME:
        cond = h.startswith(prefix)
        mime = F.when(cond, m) if mime is None else mime.when(cond, m)
    # a NULL payload is UNCLASSIFIABLE, not text: every startswith
    # condition above is NULL for it, so the bare otherwise() routed
    # missing assets to the text decoder (r14 review) — gate the
    # fallback on payload presence so NULL payloads yield NULL mime
    return binary_df.select(
        "doc_id",
        F.when(F.col("payload").isNotNull(),
               mime.otherwise("text/plain")).alias("mime"),
        F.octet_length("payload").cast("long").alias("n_bytes"))


def tar_shards(df: DataFrame, id_col: str, payload_col: str,
               n_shards: int = 8, ext: str = "txt") -> DataFrame:
    """WebDataset-style shard packing: rows hash to ``n_shards`` shards
    (portable md5 draw) and each shard's members pack into ONE
    in-memory ustar archive — the standard random-access training-data
    container (one sequential read per shard, per-member offsets for
    indexed access).

    Deterministic bytes: members sorted by id, ``mtime=0``, fixed
    mode/uid/gid, ustar format — identical input gives identical
    archives.  DUPLICATE ids are rejected loudly: two rows with the
    same id would produce two members with the same name, and tar
    extraction silently keeps only the last one — data loss (r14
    review).  Member names longer than ustar's 100-byte limit are
    rejected up front with the offending id named.  Returns ``(shard, n_members, tar_bytes)``;
    at scale each row lands as one ``.tar`` object via the binary
    sink.  Size ``n_shards`` so corpus/n_shards fits one Python
    worker: the packer holds a full shard's payloads plus the archive
    in memory (real WebDataset shards cap at ~100 MB–1 GB — thousands
    of shards at corpus scale, never the demo default).  The
    tar layout is exactly computable (header 512 B + data rounded up
    to 512 B per member), which is what :func:`tar_members` — and the
    driver key's SQL oracle — verify offset-for-offset.
    """
    import io
    import tarfile

    from .sampling import hash_unit

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        dups = pdf["_id"][pdf["_id"].duplicated()]
        if len(dups):
            raise ValueError(
                f"tar_shards: duplicate id(s) {sorted(set(dups))[:5]!r}"
                " in shard — members would share a name and tar"
                " extraction silently keeps only one payload;"
                " de-duplicate or suffix the ids first")
        pdf = pdf.sort_values("_id")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tf:
            for _id, payload in zip(pdf["_id"], pdf["_p"]):
                data = bytes(payload)
                name = f"{_id}.{ext}"
                if len(name.encode("utf-8")) > 100:
                    raise ValueError(
                        f"tar_shards: member name {name!r} exceeds "
                        "ustar's 100-byte limit — shorten the id or "
                        "extension")
                ti = tarfile.TarInfo(name=name)
                ti.size = len(data)
                ti.mtime = 0
                ti.mode = 0o644
                ti.uid = ti.gid = 0
                ti.uname = ti.gname = ""
                tf.addfile(ti, io.BytesIO(data))
        return pd.DataFrame({"shard": [int(key[0])],
                             "n_members": [len(pdf)],
                             "tar_bytes": [buf.getvalue()]})

    # NULL ids have no member name (and hash to a NULL shard) — drop
    # them; NULL payloads become empty members (header-only entries).
    # The shard id clamps at n_shards-1: hash_unit documents its draw
    # can round to exactly 1.0 (~6e-17 per key), and floor(u·n)
    # without the clamp would emit shard == n_shards — outside the
    # layout (r14 review; the documented hash_unit consumer contract)
    base = (df.where(F.col(id_col).isNotNull())
            .select(
        F.col(id_col).alias("_id"),
        F.coalesce(F.col(payload_col), F.lit(b"")).alias("_p"),
        F.least(F.floor(hash_unit(F.col(id_col)) * n_shards),
                F.lit(n_shards - 1)).cast("long")
        .alias("_shard")))
    return base.groupBy("_shard").applyInPandas(
        pack, "shard long, n_members long, tar_bytes binary")


def tar_members(shards: DataFrame) -> DataFrame:
    """Parse :func:`tar_shards` output back into the member catalog:
    ``(shard, name, size, data_offset, payload_md5)`` with ``data_offset`` the
    member's data start inside the archive — the index a random-access
    loader seeks by.  One Arrow pass; the md5 re-hashes the extracted
    payload, so a packing corruption cannot hash-match the source."""
    import hashlib
    import io
    import tarfile

    def unpack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"shard": [], "name": [], "size": [],
                    "data_offset": [], "payload_md5": []}
            for shard, blob in zip(pdf["shard"], pdf["tar_bytes"]):
                if blob is None:
                    # bytes(None) raises a bare TypeError mid-stage;
                    # name the bad shard instead (r14 review)
                    raise ValueError(
                        f"tar_members: shard {shard} has NULL "
                        "tar_bytes — corrupt or unwritten shard row")
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for m in tf.getmembers():
                        rows["shard"].append(int(shard))
                        rows["name"].append(m.name)
                        rows["size"].append(m.size)
                        rows["data_offset"].append(m.offset_data)
                        rows["payload_md5"].append(hashlib.md5(
                            tf.extractfile(m).read()).hexdigest())
            yield pd.DataFrame(rows)

    return shards.mapInPandas(
        unpack,
        "shard long, name string, size long, data_offset long, "
        "payload_md5 string")


def binary_dup_groups(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload",
                      head_bytes: int = 64,
                      strict: bool = True) -> DataFrame:
    """Duplicate-group pre-screen over raw binary payloads — the cheap
    first pass a media-dedup pipeline runs BEFORE any decode-dependent
    perceptual hash (which plugs in at :func:`decode_media`).

    ``strict=True`` groups by (size, head md5, tail md5): identical
    payloads always collide (no false negatives for exact duplicates)
    and false groups need agreement on size + both edges.
    ``strict=False`` groups by the head edge alone — the wider
    shared-prefix screen (same file re-encoded, same header + altered
    tail) whose candidates the downstream byte-exact or perceptual
    verify resolves.  Everything is codegen (hex / substring / md5 /
    one hash aggregate); payload bytes never shuffle — only the
    fingerprint and id do.
    """
    # NULL payloads carry no bytes to fingerprint: without the filter
    # they all share the (NULL, NULL, NULL) group key and surface as a
    # bogus "duplicate group" with NULL fingerprints (r14 review)
    df = df.where(F.col(payload_col).isNotNull())
    # substring the BINARY first, hex the 64-byte edge — hexing the
    # whole payload to slice 128 chars would cost O(payload) per edge
    # on multi-MB media rows; hex is per-byte, so
    # hex(substring(p, 1, n)) ≡ substring(hex(p), 1, 2n) byte-for-byte
    # (the DuckDB twin keeps the hex-string form: no BLOB substring)
    fp = df.select(
        F.col(id_col),
        F.octet_length(payload_col).alias("n_bytes"),
        F.md5(F.hex(F.expr(
            f"substring({payload_col}, 1, {head_bytes})")))
        .alias("head_md5"),
        F.md5(F.hex(F.expr(
            f"substring({payload_col}, "
            f"greatest(octet_length({payload_col}) - {head_bytes - 1}, "
            f"1), {head_bytes})"))).alias("tail_md5"))
    if strict:
        grouped = fp.groupBy("head_md5", "tail_md5",
                             F.col("n_bytes").alias("min_bytes"))
        out = grouped.agg(F.count(F.lit(1)).alias("n_members"),
                          F.min(id_col).alias("rep_id"))
        out = out.select("head_md5", "tail_md5", "min_bytes",
                         F.col("min_bytes").alias("max_bytes"),
                         "n_members", "rep_id")
    else:
        out = (fp.groupBy("head_md5")
               .agg(F.lit(None).cast("string").alias("tail_md5"),
                    F.min("n_bytes").alias("min_bytes"),
                    F.max("n_bytes").alias("max_bytes"),
                    F.count(F.lit(1)).alias("n_members"),
                    F.min(id_col).alias("rep_id")))
    return out.where(F.col("n_members") > 1)

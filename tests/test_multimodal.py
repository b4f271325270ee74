from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamic_partitioner_spark.operators.multimodal import (
    decode_media,
    extract_features,
    feature_rows,
    frame_sample,
    to_binary_table,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_binary_table_schema(spark):
    bt = to_binary_table(spark.read.parquet(DOCS))
    assert dict(bt.dtypes)["payload"] == "binary"
    row = bt.where(F.col("doc_id") == 0).collect()[0]
    assert row.meta.mime == "text/plain"
    assert len(row.payload) == row.meta.orig_bytes


def test_extract_features_deterministic(spark):
    bt = to_binary_table(spark.read.parquet(DOCS).limit(50))
    a = sorted(map(tuple, extract_features(bt).collect()))
    b = sorted(map(tuple, extract_features(bt).collect()))
    assert a == b
    doc_id, n_bytes, feats = a[0]
    assert n_bytes > 0
    assert len(feats) == 10                       # 8 hist bins + mean + std
    assert abs(sum(feats[:8]) - 1.0) < 1e-6       # histogram normalized


def test_extract_features_matches_python(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    row = extract_features(to_binary_table(df)).collect()[0]
    assert row.n_bytes == 3
    # 'a','b','c' = 97,98,99 → all in bin 3 (97>>5)
    assert row.features[3] == 1.0
    assert row.features[8] == pytest.approx(98 / 255.0, abs=1e-6)


def test_feature_rows_long_form(spark):
    """Exploded form: 10 scalar rows per doc, values equal to the array
    form element-wise (and every column hashable — driver-canonicalizer
    requirement)."""
    df = spark.createDataFrame([(1, "abc"), (2, "abab")],
                               "doc_id long, text string")
    rows = feature_rows(to_binary_table(df)).collect()
    assert len(rows) == 20
    assert dict((f.name, f.dataType.simpleString())
                for f in feature_rows(to_binary_table(df)).schema.fields) == {
        "doc_id": "bigint", "n_bytes": "bigint",
        "feat_idx": "bigint", "feat_value": "double"}
    arr = {r.doc_id: r.features
           for r in extract_features(to_binary_table(df)).collect()}
    for r in rows:
        assert r.feat_value == arr[r.doc_id][r.feat_idx]


def test_frame_sample_shapes(spark):
    df = spark.createDataFrame([(1, "x" * 5000)], "doc_id long, text string")
    frames = frame_sample(to_binary_table(df), every_n=1024, frame_bytes=16).collect()
    assert len(frames) == 4          # floor(5000/1024) frames
    assert all(len(f.frame) == 16 for f in frames)
    assert [f.frame_idx for f in frames] == [0, 1, 2, 3]


def test_decode_media_is_explicit_stub(spark):
    bt = to_binary_table(spark.read.parquet(DOCS).limit(1))
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(bt, mode="image")


def test_decode_media_with_registered_codec(spark):
    """The decode_media plug point exercised end-to-end: a registered
    codec runs Arrow-batched over the payload column and its columns
    come back typed — the exact composition a real PIL/av codec uses."""
    from dynamic_partitioner_spark.operators.multimodal import (
        register_codec, unregister_codec)

    def _fake_image_codec(payload):
        # deterministic stand-in for a real PIL decode: 'dimensions'
        # from the byte length, 'pixel mean' from the byte mean —
        # nested def so cloudpickle ships it by VALUE (the test module
        # is not importable on executors; a real codec would live in an
        # installed package and pickle by reference)
        data = payload or b""
        n = len(data)
        return {"width": n % 64, "height": n // 64,
                "px_mean": (sum(data) / n) if n else 0.0}
    df = spark.createDataFrame([(1, "abc"), (2, ""), (3, None)],
                               "doc_id long, text string")
    bt = to_binary_table(df.where(F.col("text").isNotNull()))
    register_codec("image", "width int, height int, px_mean double",
                   _fake_image_codec)
    try:
        out = decode_media(bt, "image")
        assert dict(out.dtypes) == {"doc_id": "bigint", "width": "int",
                                    "height": "int", "px_mean": "double"}
        got = {r.doc_id: (r.width, r.height, r.px_mean)
               for r in out.collect()}
        assert got[1] == (3, 0, pytest.approx(98.0))
        assert got[2] == (0, 0, 0.0)
        # composes with the byte-feature path on the same binary table
        feats = {r.doc_id: r.n_bytes for r in extract_features(bt).collect()}
        assert feats.keys() == got.keys()
    finally:
        unregister_codec("image")
    # after unregistering, the honest stub is back
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(bt, mode="image")


def test_resize_media_shapes_and_determinism(spark):
    """Byte thumbnail: short payloads upsample by repetition, empty
    payloads hash consistently, output is 1 row per doc."""
    from dynamic_partitioner_spark.operators.multimodal import (
        resize_media, to_binary_table)

    docs = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "x" * 500)], "doc_id long, text string")
    out = {r.doc_id: r for r in
           resize_media(to_binary_table(docs)).collect()}
    assert len(out) == 3
    assert out[1].n_bytes == 2 and out[3].n_bytes == 500
    again = {r.doc_id: r.resized_md5 for r in
             resize_media(to_binary_table(docs)).collect()}
    assert {k: v.resized_md5 for k, v in out.items()} == again
    # empty payload → md5 of empty string, same as hashing no bytes
    import hashlib
    assert out[2].resized_md5 == hashlib.md5(b"").hexdigest()


def test_sniff_mime_magic_bytes(spark):
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.multimodal import sniff_mime

    rows = [
        (1, bytes.fromhex("89504E470D0A1A0A") + b"rest", "image/png"),
        (2, b"%PDF-1.7 x", "application/pdf"),
        (3, bytes.fromhex("FFD8FFE1") + b"exif", "image/jpeg"),
        (4, bytes.fromhex("1F8B08") + b"z", "application/gzip"),
        (5, b"PK\x03\x04zipzip", "application/zip"),
        (6, b"just plain text", "text/plain"),
        (7, b"", "text/plain"),
        # PK alone (not PK\x03\x04) must NOT classify as zip
        (8, b"PKX not a zip", "text/plain"),
    ]
    df = spark.createDataFrame([(i, p) for i, p, _ in rows],
                               "doc_id long, payload binary")
    got = {r.doc_id: r.mime for r in sniff_mime(df).collect()}
    assert got == {i: m for i, _, m in rows}


def test_documents_corpus_ascii_and_magic_free(spark):
    """Fence for the mm_resize / mm_mime_sniff oracle assumptions: the
    byte-indexed Spark side and the character-indexed DuckDB substring
    oracle only agree while the documents text is pure ASCII, and the
    mime ground truth only holds while no document text ITSELF starts
    with a magic string.  If generated data ever violates either, this
    fails loudly instead of a silent hash mismatch."""
    for sf in ("0.001", "0.01"):
        docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        non_ascii = docs.where(
            F.length(F.col("text"))
            != F.length(F.encode(F.col("text"), "utf-8"))).count()
        assert non_ascii == 0, f"sf{sf}: non-ASCII text rows: {non_ascii}"
        magic = docs.where(
            F.col("text").startswith("\x89PNG")
            | F.col("text").startswith("%PDF-")
            | F.col("text").startswith("PK\x03\x04")).count()
        assert magic == 0, f"sf{sf}: magic-prefixed text rows: {magic}"


def test_tar_shards_roundtrip_and_determinism(spark):
    """Pack → parse: every member comes back with its exact payload
    (md5), empty payloads survive, and archives are byte-deterministic
    across runs."""
    import hashlib

    from dynamic_partitioner_spark.operators.multimodal import (
        tar_members, tar_shards)

    rows = [(1, b"hello world"), (2, b""), (3, b"x" * 1000),
            (4, b"\x00\xffbinary")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    shards = tar_shards(df, "doc_id", "payload", n_shards=2)
    blobs1 = {r.shard: bytes(r.tar_bytes) for r in shards.collect()}
    blobs2 = {r.shard: bytes(r.tar_bytes) for r in
              tar_shards(df, "doc_id", "payload", n_shards=2).collect()}
    assert blobs1 == blobs2                       # byte-deterministic
    got = {r.name: (r.size, r.payload_md5)
           for r in tar_members(shards).collect()}
    for i, p in rows:
        assert got[f"{i}.txt"] == (len(p), hashlib.md5(p).hexdigest())


def test_multimodal_null_payload_tolerance(spark):
    """NULL payloads fold to the empty-payload path in feature
    extraction and become header-only tar members; NULL ids are
    dropped from shards (no member name)."""
    from dynamic_partitioner_spark.operators.multimodal import (
        extract_features, tar_members, tar_shards)

    df = spark.createDataFrame(
        [(1, None), (2, b"xy"), (None, b"zz")],
        "doc_id long, payload binary")
    feats = {r.doc_id: r.n_bytes for r in extract_features(df).collect()}
    assert feats[1] == 0 and feats[2] == 2
    members = {r.name: r.size for r in
               tar_members(tar_shards(df, "doc_id", "payload")).collect()}
    assert members == {"1.txt": 0, "2.txt": 2}     # null id dropped


def test_binary_dup_groups_strict_and_head_modes(spark):
    from dynamic_partitioner_spark.operators.multimodal import (
        binary_dup_groups)
    rows = [(1, b"A" * 200), (2, b"A" * 200),            # exact dup pair
            (3, b"A" * 100 + b"B" * 100),                # same head, diff tail
            (4, b"zzz")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    strict = binary_dup_groups(df, head_bytes=16).collect()
    assert len(strict) == 1
    assert strict[0].n_members == 2 and strict[0].rep_id == 1
    head = {r.rep_id: r.n_members for r in
            binary_dup_groups(df, head_bytes=16, strict=False).collect()}
    # head-only screen also pulls in doc 3 (shared 16-byte prefix)
    assert head == {1: 3}


def test_codec_registry_handles_nested_types_and_bad_ddl(spark):
    """code-review r6: parameterized/nested codec schemas must parse
    with Spark's DDL parser (a comma split would shred them), and a
    bad DDL fails at register time, not executor-side."""
    from dynamic_partitioner_spark.operators.multimodal import (
        register_codec, unregister_codec)

    def codec(payload):
        n = len(payload or b"")
        return {"dims": {"w": n, "h": n + 1}, "scale": None}

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    bt = to_binary_table(df)
    register_codec("nested", "dims struct<w:int,h:int>, scale decimal(10,2)",
                   codec)
    try:
        row = decode_media(bt, "nested").collect()[0]
        assert (row.dims.w, row.dims.h) == (3, 4)
        assert row.scale is None
    finally:
        unregister_codec("nested")
    with pytest.raises(Exception):
        register_codec("broken", "width int, oops", codec)


def test_mm_r14_hardening(spark):
    """r14 multimodal review pins: (1) NULL payloads sniff to NULL
    mime, not text/plain; (2) NULL payloads never form a bogus
    duplicate group; (3) duplicate-id tar members pack in a
    deterministic (id, payload) order regardless of input order;
    (4) over-limit member names and NULL shard blobs raise named
    errors; (5) a codec column colliding with the id column is
    rejected at decode_media."""
    import pytest
    from pyspark.sql import functions as F

    import dynamic_partitioner_spark.operators.multimodal as MM

    # (1) NULL payload -> NULL mime
    b = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\x0a")), (2, None)],
        "doc_id long, payload binary")
    got = {r.doc_id: r.mime for r in MM.sniff_mime(b).collect()}
    assert got[1] == "image/png" and got[2] is None

    # (2) NULL payloads form no duplicate group
    nn = spark.createDataFrame(
        [(1, None), (2, None), (3, bytearray(b"x")),
         (4, bytearray(b"x"))],
        "doc_id long, payload binary")
    groups = MM.binary_dup_groups(nn).collect()
    assert len(groups) == 1 and groups[0]["rep_id"] == 3

    # (3) duplicate ids are rejected loudly: two members would share a
    # name and tar extraction silently keeps only one payload (the
    # whole-diff review upgraded the original sort-tiebreaker fix —
    # deterministic bytes still silently lost a payload)
    rows = [(7, bytearray(b"bbb")), (7, bytearray(b"aaa")),
            (8, bytearray(b"c"))]
    with pytest.raises(Exception, match="duplicate id"):
        MM.tar_shards(spark.createDataFrame(
            rows, "doc_id long, payload binary"), "doc_id", "payload",
            n_shards=1).collect()

    # (4a) member name over ustar's 100-byte limit raises with the id
    long_id = spark.createDataFrame(
        [("x" * 120, bytearray(b"p"))], "doc_id string, payload binary")
    with pytest.raises(Exception, match="100-byte"):
        MM.tar_shards(long_id, "doc_id", "payload", n_shards=1).collect()

    # (4b) NULL tar_bytes raises a named error, not bytes(None)
    bad = spark.createDataFrame([(0, None)],
                                "shard long, tar_bytes binary")
    with pytest.raises(Exception, match="NULL tar_bytes"):
        MM.tar_members(bad).collect()

    # (5) codec column colliding with the id column rejected
    MM.register_codec("collide", "doc_id int, w int",
                      lambda p: {"doc_id": 0, "w": 1})
    try:
        with pytest.raises(ValueError, match="collides"):
            MM.decode_media(b, "collide")
    finally:
        MM.unregister_codec("collide")


def test_resize_media_long_payload_no_overflow(spark):
    """r14 review: k * octet_length was 32-bit math — k=63 on a
    ~35 MB payload overflowed int32 (ANSI ARITHMETIC_OVERFLOW).  The
    multiply is LONG now; the sampled positions stay in-range."""
    import dynamic_partitioner_spark.operators.multimodal as MM
    from pyspark.sql import functions as F

    big = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.expr("cast(repeat('a', 35000000) as binary)").alias("payload"))
    row = MM.resize_media(big).collect()[0]
    assert row["n_bytes"] == 35_000_000
    assert row["resized_md5"] is not None

"""Config/validation unit tests — mirrors the reference's
``DynamicPartitionFileSetSinkConfigTest`` cases (SURVEY.md §5, FIXTURES.md F2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dynamic_partitioner_spark import CODECS, SinkSpec, SpecError

SALES = T.StructType([
    T.StructField("product", T.StringType(), True),
    T.StructField("buyer", T.StringType(), True),
    T.StructField("price", T.DoubleType(), True),
])
#: declared schema with a non-nullable contract on the partition fields
SALES_DECLARED = T.StructType([
    T.StructField("product", T.StringType(), False),
    T.StructField("buyer", T.StringType(), False),
    T.StructField("price", T.DoubleType(), False),
])


def test_single_partition_field_ok():
    SinkSpec(name="s", field_names=["price"], schema=SALES_DECLARED).validate(SALES)


def test_multi_partition_field_ok():
    # reference: multi `price,buyer` (ConfigTest :52-68)
    SinkSpec(name="s", field_names=["price", "buyer"],
             schema=SALES_DECLARED).validate(SALES)


def test_nonexistent_partition_field_fails():
    # reference: misspelled `prooduct` must throw (ConfigTest :70-109)
    with pytest.raises(SpecError, match="must exist"):
        SinkSpec(name="s", field_names=["prooduct"]).validate(SALES)


def test_nullable_partition_field_fails():
    # reference: nullable `buyer` must throw (ConfigTest :111-144)
    declared = T.StructType([
        T.StructField("product", T.StringType(), False),
        T.StructField("buyer", T.StringType(), True),
        T.StructField("price", T.DoubleType(), False),
    ])
    with pytest.raises(SpecError, match="non-nullable"):
        SinkSpec(name="s", field_names=["buyer"], schema=declared).validate(SALES)


def test_no_partition_fields_fails():
    with pytest.raises(SpecError, match="at least one"):
        SinkSpec(name="s", field_names=[]).validate(SALES)


def test_orc_knobs_required_when_codec_set():
    # reference: codec requires chunk/stripe/stride/index (ConfigTest :146-177)
    spec = SinkSpec(name="s", field_names=["price"], fmt="orc",
                    compression_codec="snappy")
    with pytest.raises(SpecError, match="required"):
        spec.validate(SALES)


def test_orc_index_stride_minimum():
    # reference: indexStride >= 1000 (ORCDynamicPartitionedDatasetSink.java:176-181)
    spec = SinkSpec(name="s", field_names=["price"], fmt="orc",
                    compression_codec="snappy", compression_chunk_size=262144,
                    stripe_size=67108864, index_stride=999, create_index=True)
    with pytest.raises(SpecError, match=">= 1000"):
        spec.validate(SALES)


def test_unknown_codec_fails():
    with pytest.raises(SpecError, match="not supported"):
        SinkSpec(name="s", field_names=["price"],
                 compression_codec="brotli9000").validate(SALES)


def test_codec_maps_match_reference_surface():
    # FileSetUtil.java:224-246 (avro), :262-286 (parquet); zstd is our ext
    assert {"snappy", "deflate"} <= set(CODECS["avro"])
    assert {"snappy", "gzip", "lzo"} <= set(CODECS["parquet"])
    assert {"snappy", "zlib"} <= set(CODECS["orc"])


def test_orc_writer_options_fixed_mapping():
    # the reference wrote stripeSize into orc.compress.size and indexStride
    # into orc.create.index (bugs, SURVEY.md §4) — ours maps each correctly
    spec = SinkSpec(name="s", field_names=["price"], fmt="orc",
                    compression_codec="snappy", compression_chunk_size=262144,
                    stripe_size=67108864, index_stride=10000, create_index=True)
    opts = spec.writer_options()
    assert opts["orc.compress"] == "SNAPPY"
    assert opts["orc.compress.size"] == "262144"
    assert opts["orc.stripe.size"] == "67108864"
    assert opts["orc.row.index.stride"] == "10000"
    assert opts["orc.create.index"] == "true"


def test_append_mode_semantics():
    # AvroDynamicPartitionedDatasetSink.java:70-73: null or "No" → CREATE
    assert not SinkSpec(name="s", field_names=["x"]).mode_is_append
    assert not SinkSpec(name="s", field_names=["x"],
                        append_to_partition="No").mode_is_append
    assert SinkSpec(name="s", field_names=["x"],
                    append_to_partition="Yes").mode_is_append
    assert SinkSpec(name="s", field_names=["x"],
                    append_to_partition="CREATE_OR_APPEND").mode_is_append


AVRO_SALES = """{
  "type": "record", "name": "sales", "fields": [
    {"name": "product", "type": "string"},
    {"name": "buyer", "type": "string"},
    {"name": "price", "type": "double"}
  ]
}"""


def test_avro_json_declared_schema_ok():
    """The reference's native schema input format (Avro record JSON,
    PartitionedFileSetSinkConfig.java:82-88) is accepted directly."""
    spec = SinkSpec(name="s", field_names=["product"], schema=AVRO_SALES)
    declared = spec.declared_schema()
    assert [f.name for f in declared.fields] == ["product", "buyer", "price"]
    assert declared["price"].dataType == T.DoubleType()
    assert not declared["product"].nullable
    spec.validate(SALES)


def test_avro_json_nullable_union_partition_field_fails():
    """["null", T] union partition field == nullable == rejected,
    matching Schema.isNullable in getPartitioning (:140-144)."""
    schema = ('{"type": "record", "name": "s", "fields": ['
              '{"name": "product", "type": ["null", "string"]},'
              '{"name": "price", "type": "double"}]}')
    spec = SinkSpec(name="s", field_names=["product"], schema=schema)
    assert spec.declared_schema()["product"].nullable
    with pytest.raises(SpecError, match="non-nullable"):
        spec.validate(SALES)


def test_avro_json_payload_nullable_union_ok():
    """Nullable unions are fine on non-partition payload fields."""
    schema = ('{"type": "record", "name": "s", "fields": ['
              '{"name": "product", "type": "string"},'
              '{"name": "price", "type": ["null", "double"]}]}')
    SinkSpec(name="s", field_names=["product"], schema=schema).validate(SALES)


def test_bad_schema_string_fails():
    # reference wording: "Unable to parse schema" (:85-87)
    with pytest.raises(SpecError, match="Unable to parse schema"):
        SinkSpec(name="s", field_names=["product"],
                 schema='{"type": "record", "oops": true}').declared_schema()
    with pytest.raises(SpecError, match="Unable to parse schema"):
        SinkSpec(name="s", field_names=["product"],
                 schema="not ( a ddl").declared_schema()


def test_l_diversity_redacts_homogeneous_groups(spark):
    """Groups with < l distinct sensitive values redact even when
    large (the k-anonymity blind spot); NULL QI values group
    null-safely."""
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.privacy import l_diversify

    rows = ([(i, "US", "A", 1) for i in range(5)]          # homogeneous
            + [(10 + i, "US", "B", i % 3) for i in range(6)]  # diverse
            + [(20 + i, None, "C", i) for i in range(2)])     # NULL QI
    df = spark.createDataFrame(
        rows, "id long, nation string, segment string, sens long")
    out = {r.id: r for r in
           l_diversify(df, ["nation", "segment"], "sens", l=2).collect()}
    assert out[0].nation == "*" and out[0].segment == "*"
    assert out[0].sens_diversity == 1
    assert out[10].nation == "US" and out[10].sens_diversity == 3
    assert out[20].sens_diversity == 2 and out[20].nation is None
    assert len(out) == 13


def test_dp_noisy_counts_distribution_and_determinism(spark):
    """Seeded Laplace noise: deterministic across runs, mean |noise|
    near 1/eps, and epsilon scales the magnitude down."""
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([(i, f"g{i % 40}") for i in range(4000)],
                               "id long, g string")
    a = dp_noisy_counts(df, ["g"], epsilon=1.0)
    b = dp_noisy_counts(df, ["g"], epsilon=1.0)
    ra = {(r.g, r.true_count, r.noisy_count) for r in a.collect()}
    assert ra == {(r.g, r.true_count, r.noisy_count) for r in b.collect()}
    noise = a.select(F.abs(F.col("noisy_count")
                           - F.col("true_count")).alias("n")).collect()
    mean_abs = sum(r.n for r in noise) / len(noise)
    assert 0.3 < mean_abs < 3.0                    # Laplace b=1 scale
    tight = dp_noisy_counts(df, ["g"], epsilon=10.0)
    tn = tight.select(F.abs(F.col("noisy_count")
                            - F.col("true_count")).alias("n")).collect()
    assert (sum(r.n for r in tn) / len(tn)) < mean_abs


def test_dp_noisy_counts_null_groups_get_distinct_noise(spark):
    """Multi-column groups differing only in WHICH column is NULL must
    seed different noise (concat_ws would silently skip the NULL and
    collapse them), and the Spark form must match the DuckDB twin on
    NULL-bearing groups."""
    import duckdb

    from dynamic_partitioner_spark.operators.privacy import (
        dp_noisy_counts, dp_noisy_counts_sql)

    rows = [("a", None)] * 5 + [(None, "a")] * 7 + [("a", "b")] * 3
    df = spark.createDataFrame(rows, "x string, y string")
    got = {(r.x, r.y): (r.true_count, r.noisy_count)
           for r in dp_noisy_counts(df, ["x", "y"], epsilon=1.0).collect()}
    assert len(got) == 3
    na, an = got[("a", None)], got[(None, "a")]
    assert na[1] - na[0] != an[1] - an[0]          # distinct noise draws
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x VARCHAR, y VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = dp_noisy_counts_sql(["x", "y"], epsilon=1.0, from_table="t")
    duck = {(x, y): (tc, nc) for x, y, tc, nc in con.sql(sql).fetchall()}
    assert duck == got


def test_dp_noisy_sums_clipping_and_determinism(spark):
    """Contributions clip to [0, clip] before the exact sum; seeded
    noise is deterministic across runs and bounded in practice."""
    import pytest as _pytest

    from dynamic_partitioner_spark.operators.privacy import dp_noisy_sums

    rows = [("a", 10.0), ("a", 100.0),     # 100 clips to 50
            ("a", -5.0),                    # clips to 0
            ("b", 25.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in
           dp_noisy_sums(df, ["g"], "v", clip=50.0, epsilon=1.0).collect()}
    assert out["a"].true_sum == 60.0       # 10 + 50 + 0
    assert out["b"].true_sum == 25.0
    again = {r.g: r.noisy_sum for r in
             dp_noisy_sums(df, ["g"], "v", clip=50.0,
                           epsilon=1.0).collect()}
    assert {g: r.noisy_sum for g, r in out.items()} == again
    for r in out.values():                  # Laplace(50) tail sanity
        assert abs(r.noisy_sum - r.true_sum) < 50.0 * 15

    with _pytest.raises(ValueError):
        dp_noisy_sums(df, ["g"], "v", clip=0.0, epsilon=1.0)


def test_randomized_response_debiasing(spark):
    """The debiased estimate lands near the true prevalence on a
    deterministic coin; the coin flips row-wise (both outcomes occur);
    missing _rr_key and out-of-range p raise."""
    import pytest as _pytest

    from dynamic_partitioner_spark.operators.privacy import (
        randomized_response)

    rows = [("g", i % 5 == 0, str(i)) for i in range(2000)]  # 20% true
    df = spark.createDataFrame(rows, "g string, bit boolean, _rr_key string")
    r = randomized_response(df, ["g"], "bit", p_truth=0.75).collect()[0]
    assert r.n_rows == 2000
    assert r.true_prevalence == 0.2
    assert abs(r.est_prevalence - 0.2) < 0.06      # debiased, ±noise
    # raw reported rate is biased toward 0.5 — debiasing moved it
    assert abs(r.n_reported / 2000 - 0.35) < 0.05  # 0.2·0.75+0.8·0.25

    with _pytest.raises(ValueError):
        randomized_response(df.drop("_rr_key"), ["g"], "bit")
    with _pytest.raises(ValueError):
        randomized_response(df, ["g"], "bit", p_truth=0.4)


def test_privacy_r14_hardening(spark):
    """r14 privacy review pins: (1) the Laplace magnitude clamps at
    the hash edge so u→{0,1} draws a bounded tail instead of ln(0)
    (NULL in Spark, a hard error in DuckDB); (2) NaN measurements are
    EXCLUDED from dp_noisy_sums instead of silently contributing the
    full clip value; (3) a NULL _rr_key aborts randomized_response
    loudly instead of deterministically flipping the row; (4) a float
    _rr_key is rejected like float dp group keys; (5) the SQL twins
    reject the same bad parameters their Spark halves do; (6) the
    seed sentinel cannot collide with a value spelling it; (7) a
    quoted salt renders into a valid oracle literal."""
    import duckdb
    import pytest
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators import privacy as P
    from dynamic_partitioner_spark.operators.sampling import (
        hash_unit_sql)

    # (1) magnitude floor: ln argument never reaches 0 on either side
    assert "greatest" in P._laplace_noise_sql("0.5", 1.0)
    assert duckdb.sql(
        "SELECT " + P._laplace_noise_sql("1.0", 1.0)).fetchone()[0] \
        is not None

    # (2) NaN rows excluded from the dp sum on both sides
    df = spark.createDataFrame(
        [("a", 1.0), ("a", float("nan")), ("a", None)],
        "g string, v double")
    got = P.dp_noisy_sums(df, ["g"], "v", clip=5.0,
                          epsilon=1.0).collect()[0]
    assert got["n_rows"] == 1 and got["true_sum"] == 1.0
    rel = duckdb.sql(
        P.dp_noisy_sums_sql(["g"], "v", 5.0, 1.0,
                            from_table="(VALUES ('a', 1.0), "
                            "('a', CAST('nan' AS DOUBLE)), "
                            "('a', NULL)) t(g, v)")).fetchone()
    assert rel[1] == 1                     # n_rows matches

    # (3) NULL coin seed aborts loudly; (4) float seed rejected
    rr = spark.createDataFrame(
        [(1, "x", True), (None, "x", False)],
        "_rr_key long, g string, b boolean")
    with pytest.raises(Exception, match="NULL _rr_key"):
        P.randomized_response(rr, ["g"], "b").collect()
    rr_f = spark.createDataFrame(
        [(1.0, "x", True)], "_rr_key double, g string, b boolean")
    with pytest.raises(ValueError, match="floating-point"):
        P.randomized_response(rr_f, ["g"], "b")

    # (5) twin parameter validation mirrors the Spark side
    with pytest.raises(ValueError):
        P.randomized_response_sql(["g"], "b", "k", p_truth=0.5)
    with pytest.raises(ValueError):
        P.dp_noisy_sums_sql(["g"], "v", clip=-1.0, epsilon=1.0)
    with pytest.raises(ValueError):
        P.dp_noisy_counts_sql(["g"], epsilon=0.0)

    # (6) a value spelling the old sentinel no longer shares the NULL
    # group's seed (both get DIFFERENT noise)
    col = spark.createDataFrame(
        [("\x1eNULL", 1), (None, 1)], "g string, x int")
    noisy = {r["g"]: r["noisy_count"]
             for r in P.dp_noisy_counts(col, ["g"], 1.0).collect()}
    assert noisy["\x1eNULL"] != noisy[None]

    # (7) quoted salt renders a parseable literal
    duckdb.sql("SELECT " + hash_unit_sql("'k'", salt="o'brien"))


def test_t_closeness_closed_form_matches_grid_semantics(spark):
    """r14 review: the (class x domain) grid was replaced by the
    closed-form absent-cell contribution n_c*(n_g - sum of present
    g_i) — same exact BIGINT numerator.  Hand-checked: classes A
    (values x,x,y) and B (z) against global counts x:2, y:1, z:1,
    n_g=4."""
    from dynamic_partitioner_spark.operators import privacy as P

    df = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("A", "y"), ("B", "z")],
        "q string, s string")
    got = {r["q"]: (r["n_class"], r["tvd"])
           for r in P.t_closeness(df, ["q"], "s").collect()}
    # A: |2*4-2*3| + |1*4-1*3| + absent z: 1*3 = 2+1+3 = 6
    #    tvd = 6 / (2*3*4) = 0.25
    # B: |1*4-1*1| + absent x: 2*1, absent y: 1*1 = 3+2+1 = 6
    #    tvd = 6 / (2*1*4) = 0.75
    assert got["A"] == (3, 0.25)
    assert got["B"] == (1, 0.75)

from __future__ import annotations

import os
import shutil

from dynamic_partitioner_spark import SinkSpec, read_partitioned
from dynamic_partitioner_spark.streaming.write import (
    run_stream_to_completion,
    stream_from_files,
    stream_write_partitioned,
)


def test_streaming_partitioned_write_golden_layout(spark, purchase_df, tmp_out):
    src = f"{tmp_out}/src"
    out = f"{tmp_out}/out"
    ckpt = f"{tmp_out}/ckpt"
    shutil.rmtree(tmp_out, ignore_errors=True)
    purchase_df.write.parquet(src)

    sdf = stream_from_files(spark, src)
    spec = SinkSpec(name="p", field_names=["purchase_date"],
                    append_to_partition="CREATE_OR_APPEND")
    run_stream_to_completion(stream_write_partitioned(sdf, spec, out, ckpt))

    dirs = sorted(d for d in os.listdir(out) if d.startswith("purchase_date="))
    assert dirs == ["purchase_date=2009-01-01", "purchase_date=2009-01-02",
                    "purchase_date=2009-01-03"]
    back = read_partitioned(spark, out)
    assert back.count() == 6
    assert dict(back.dtypes)["purchase_date"] == "string"


def test_streaming_incremental_second_batch(spark, purchase_df, tmp_out):
    """New files landing in the source are picked up by a later run with
    the same checkpoint — and ONLY the new rows are appended."""
    src = f"{tmp_out}/src"
    out = f"{tmp_out}/out"
    ckpt = f"{tmp_out}/ckpt"
    shutil.rmtree(tmp_out, ignore_errors=True)
    purchase_df.limit(3).write.parquet(src)

    spec = SinkSpec(name="p", field_names=["purchase_date"],
                    append_to_partition="CREATE_OR_APPEND")
    sdf = stream_from_files(spark, src)
    run_stream_to_completion(stream_write_partitioned(sdf, spec, out, ckpt))
    n_first = read_partitioned(spark, out).count()
    assert n_first == 3

    purchase_df.write.mode("append").parquet(src)   # 6 more rows land
    sdf2 = stream_from_files(spark, src)
    run_stream_to_completion(stream_write_partitioned(sdf2, spec, out, ckpt))
    assert read_partitioned(spark, out).count() == 9

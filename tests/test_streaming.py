"""Streaming ≡ batch: every streaming operator, drained with an
availableNow trigger over a multi-file copy of the events fixture, must
reproduce the batch result of the *same function* on the same rows."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from auto_ts_spark.io.sources import load_table
from auto_ts_spark.streaming import (
    read_event_stream,
    session_agg,
    stateful_rolling_forecast,
    tumbling_agg,
)
from auto_ts_spark.streaming.ops import run_to_completion

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """events rewritten as 4 µs-timestamp parquet files (the file
    stream replays them as micro-batches)."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF_DIR, "events").repartitionByRange(4, "ts").write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _drain(spark, stream_df, name, tmp_path):
    run_to_completion(stream_df, sink_table=name, checkpoint_dir=str(tmp_path / name))
    return spark.table(name)


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf[sorted(pdf.columns)].sort_values(sorted(pdf.columns)).reset_index(
        drop=True
    )


def test_tumbling_agg_matches_batch(spark, event_dir, tmp_path):
    stream = tumbling_agg(read_event_stream(spark, event_dir))
    got = _drain(spark, stream, "t_tumbling", tmp_path)
    want = tumbling_agg(spark.read.parquet(event_dir))  # same fn, batch plan
    pd.testing.assert_frame_equal(_sorted_pdf(got), _sorted_pdf(want))
    assert got.count() > 0


def test_session_agg_matches_batch(spark, event_dir, tmp_path):
    stream = session_agg(read_event_stream(spark, event_dir), gap="5 minutes")
    got = _drain(spark, stream, "t_session", tmp_path)
    want = session_agg(spark.read.parquet(event_dir), gap="5 minutes")
    pd.testing.assert_frame_equal(_sorted_pdf(got), _sorted_pdf(want))


def test_stateful_rolling_forecast_final_state(spark, event_dir, tmp_path):
    stream = stateful_rolling_forecast(
        read_event_stream(spark, event_dir, max_files_per_trigger=1)
    )
    got = _drain(spark, stream, "t_state", tmp_path).toPandas()
    # several rows per key (one per micro-batch); the final state row
    # must equal the batch count/mean
    final = got.sort_values("running_n").groupby("series_id").last().reset_index()
    want = (
        spark.read.parquet(event_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("mean"),
        )
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    final = final.sort_values("series_id").reset_index(drop=True)
    assert list(final["series_id"]) == list(want["event_type"])
    assert list(final["running_n"]) == list(want["n"])
    assert [round(m, 5) for m in final["running_mean"]] == [
        round(m, 5) for m in want["mean"]
    ]
    # micro-batched incremental processing actually happened
    assert (got.groupby("series_id").size() > 1).all()


def test_ewma_deterministic_across_runs(spark, event_dir, tmp_path):
    runs = []
    for i in range(2):
        stream = stateful_rolling_forecast(
            read_event_stream(spark, event_dir, max_files_per_trigger=1)
        )
        got = _drain(spark, stream, f"t_ewma_{i}", tmp_path).toPandas()
        runs.append(
            got.sort_values(["series_id", "running_n"]).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(runs[0], runs[1])


def test_dedup_stream_drops_redeliveries(spark, event_dir, tmp_path):
    from auto_ts_spark.streaming import dedup_stream

    # a source directory where every file is delivered twice
    import shutil, os

    dup_dir = str(tmp_path / "dup_events")
    os.makedirs(dup_dir)
    for i, f in enumerate(sorted(os.listdir(event_dir))):
        if f.endswith(".parquet"):
            shutil.copy(f"{event_dir}/{f}", f"{dup_dir}/a{i}.parquet")
            shutil.copy(f"{event_dir}/{f}", f"{dup_dir}/b{i}.parquet")
    stream = dedup_stream(read_event_stream(spark, dup_dir))
    got = _drain(spark, stream, "t_dedup", tmp_path)
    n_unique = spark.read.parquet(event_dir).select("event_id").distinct().count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_nanos_directory_source(spark, tmp_path):
    """A DIRECTORY of TIMESTAMP(NANOS) parquet must stream correctly:
    the schema probe has to look inside the directory (pq.read_schema
    rejects directory paths), else the nano column is misread and the
    stream fails with PARQUET_TYPE_ILLEGAL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from auto_ts_spark.streaming.ops import read_event_stream_nanos

    src = tmp_path / "nanos_dir"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    for i in range(2):
        pdf = pd.DataFrame(
            {
                "event_id": [i * 2, i * 2 + 1],
                "ts": [base + pd.Timedelta(minutes=i * 2), base + pd.Timedelta(minutes=i * 2 + 1)],
                "user_id": [1, 2],
                "event_type": ["a", "b"],
                "value": [1.0, 2.0],
                "props": ["{}", "{}"],
            }
        )
        table = pa.Table.from_pandas(pdf).set_column(
            1, "ts", pa.Array.from_pandas(pdf["ts"]).cast(pa.timestamp("ns"))
        )
        pq.write_table(table, src / f"part-{i}.parquet", use_deprecated_int96_timestamps=False,
                       coerce_timestamps=None)
    # a PARTITIONED layout (files only under key=val/ subdirs, no
    # top-level *.parquet) must also probe as nanos — the glob is
    # recursive; a shallow glob would silently fall back to the
    # native-timestamp path and the stream would fail
    from auto_ts_spark.streaming.ops import ts_field_is_nanos

    part = tmp_path / "nanos_part" / "day=0"
    part.mkdir(parents=True)
    (part / "part-0.parquet").write_bytes((src / "part-0.parquet").read_bytes())
    assert ts_field_is_nanos(str(tmp_path / "nanos_part")) is True
    assert ts_field_is_nanos(str(src)) is True
    assert ts_field_is_nanos(str(tmp_path / "does_not_exist")) is False

    stream = read_event_stream_nanos(spark, str(src))
    got = _drain(spark, stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"),
                 F.max("ts").alias("max_ts")), "t_nanos_dir", tmp_path)
    pdf = got.toPandas().sort_values("event_type").reset_index(drop=True)
    assert list(pdf["n"]) == [2, 2]
    assert pdf["max_ts"].max() == base + pd.Timedelta(minutes=3)


def test_streaming_heavy_hitters_equals_batch_and_bounds_state(spark, tmp_path):
    """Term-sharded streaming Misra-Gries: with ample capacity the
    drained summaries equal the exact batch counts (defl 0 on every
    shard); with adversarial capacity the error certificate holds and
    state stays bounded at capacity x n_shards."""
    import pandas as pd
    from pyspark.sql import functions as F

    from auto_ts_spark.functions import text as TX
    from auto_ts_spark.streaming import ops as ST

    batch = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i % 7} alpha beta",) for i in range(200)],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "docs")
    batch.write.parquet(src)
    exact = {
        r["term"]: r["count"]
        for r in batch.select(F.explode(TX.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .count()
        .collect()
    }

    def drain(capacity):
        docs = spark.readStream.schema(batch.schema).parquet(src)
        hh = ST.streaming_heavy_hitters(
            docs, capacity=capacity, n_shards=4, ngram=1
        )
        sink = f"hh_{capacity}_{abs(hash(src)) % 10_000}"
        ST.run_to_completion(
            hh, sink_table=sink, checkpoint_dir=str(tmp_path / f"ckpt{capacity}")
        )
        pdf = spark.table(sink).toPandas()
        final = pdf[pdf.groupby("shard")["seq"].transform("max") == pdf["seq"]]
        return final

    # ample capacity: exact everywhere
    final = drain(1024)
    assert (final["defl"] == 0).all()
    got = dict(zip(final["term"], final["est"]))
    assert got == exact
    # adversarial capacity: bounded state + certificate
    final = drain(2)
    assert len(final) <= 2 * 4 + 4  # capacity x shards (+1 slack per shard)
    for row in final.itertuples(index=False):
        true = exact[row.term]
        assert row.est <= true <= row.est + row.defl, (row, true)

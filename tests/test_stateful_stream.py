"""Cross-trigger politeness state (streaming/stateful.py):

one host's fetch schedule must stay spaced >= delay ACROSS microbatch
triggers, with seq_in_host continuing — the property the per-batch window
operator cannot provide and the reason the stateful operator exists."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jirlbot_spark.streaming.stateful import politeness_stream

SCHEMA = "host_hash long, url_hash long, priority double"


def _write_batch(spark, path, rows, part):
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    df.write.mode("append").parquet(path)
    _ = part


def _run_trigger(spark, indir, outdir, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(indir)
    out = politeness_stream(stream, min_delay_s=1.0)
    q = (
        out.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_politeness_state_across_triggers(spark, tmp_path):
    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(indir, exist_ok=True)

    # trigger 1: host 1 gets urls 30,10,20 (priority asc, key asc order)
    _write_batch(
        spark,
        indir,
        [(1, 30, 0.0), (1, 10, 0.0), (1, 20, 1.0), (2, 5, 0.0)],
        1,
    )
    _run_trigger(spark, indir, outdir, ckpt)

    # trigger 2: more urls for host 1 — schedule must continue, not reset
    _write_batch(spark, indir, [(1, 40, 0.0), (1, 50, 2.0)], 2)
    _run_trigger(spark, indir, outdir, ckpt)

    got = (
        spark.read.parquet(outdir)
        .filter(F.col("host_hash") == 1)
        .orderBy("seq_in_host")
        .collect()
    )
    assert [r.seq_in_host for r in got] == [1, 2, 3, 4, 5]
    # trigger-1 order: priority asc then key asc -> 10, 30, 20
    assert [r.url_hash for r in got[:3]] == [10, 30, 20]
    # trigger-2 order continues: 40, 50
    assert [r.url_hash for r in got[3:]] == [40, 50]
    planned = [r.planned_at_s for r in got]
    # spacing >= delay everywhere, INCLUDING the trigger boundary (3->4)
    for a, b in zip(planned, planned[1:]):
        assert b - a >= 1.0 - 1e-9, planned
    # deterministic absolute schedule: first fetch at 0.0, then 1.0, ...
    assert planned == [0.0, 1.0, 2.0, 3.0, 4.0]

    other = (
        spark.read.parquet(outdir)
        .filter(F.col("host_hash") == 2)
        .collect()
    )
    assert len(other) == 1 and other[0].planned_at_s == 0.0


def test_politeness_stream_batch_mode(spark):
    """The operator degrades to the single-batch schedule on a plain
    DataFrame (empty initial state), matching the batch operator's
    spacing semantics."""
    df = spark.createDataFrame(
        [(7, 1, 0.0), (7, 2, 0.0), (7, 3, 0.0), (8, 9, 0.0)], SCHEMA
    )
    try:
        got = politeness_stream(df, min_delay_s=2.0).collect()
    except Exception as e:
        # Pinned gate (r4 verdict #7): Spark 4.1.2 hard-refuses the
        # batch path with UnsupportedOperationException
        # "applyInPandasWithState is unsupported in batch query. Use
        # applyInPandas instead." — verified in this sandbox. Skip ONLY
        # on that exact refusal; anything else is a real bug and must
        # fail the test. Unskip when a Spark version accepts the batch
        # path again (3.4.x did).
        if "unsupported in batch query" in str(e):
            pytest.skip(
                "applyInPandasWithState is streaming-only in Spark "
                f"{spark.version} (UnsupportedOperationException: "
                "'applyInPandasWithState is unsupported in batch query')"
            )
        raise
    h7 = sorted(
        [r for r in got if r.host_hash == 7], key=lambda r: r.seq_in_host
    )
    assert [r.planned_at_s for r in h7] == [0.0, 2.0, 4.0]


def test_group_spanning_multiple_arrow_chunks(spark, tmp_path):
    """A host whose trigger volume exceeds one Arrow batch must still get
    ONE (priority, url_hash)-sorted sequence per trigger — the state API
    hands such groups to the operator as several pandas chunks, and
    per-chunk sorting would silently reorder (the sf0.1-scale bug this
    pins)."""
    import pandas as pd

    from jirlbot_spark.streaming.stateful import politeness_stream

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "40")
    try:
        # one host, 500 rows, descending url_hash so chunk order fights
        # the required global order
        rows = [(1, 10_000 - i, float(i % 3)) for i in range(500)]
        indir = str(tmp_path / "in")
        outdir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(
            rows, "host_hash long, url_hash long, priority double"
        ).coalesce(1).write.parquet(indir)
        stream = spark.readStream.schema(
            "host_hash long, url_hash long, priority double"
        ).parquet(indir)
        q = (
            politeness_stream(stream, min_delay_s=1.0)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        out = (
            spark.read.parquet(outdir)
            .toPandas()
            .sort_values("seq_in_host")
            .reset_index(drop=True)
        )
        assert len(out) == 500
        expected = pd.DataFrame(rows, columns=["h", "url_hash", "prio"])
        expected = expected.sort_values(
            ["prio", "url_hash"], kind="mergesort"
        ).reset_index(drop=True)
        assert out["url_hash"].tolist() == expected["url_hash"].tolist()
        assert out["planned_at_s"].tolist() == [float(i) for i in range(500)]
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )

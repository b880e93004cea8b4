"""Custom stateful streaming operator: per-domain token-bucket admission
whose state spans micro-batches AND restarts — pinned on BOTH stateful APIs
(classic applyInPandasWithState and Spark 4 transformWithStateInPandas,
which share the _admit_pdf core)."""

import contextlib
import os

import pytest

from etherscan_contract_crawler_spark.streaming.ratelimit import stateful_admission

ROWS_DDL = "domain string, url_sha1 string, batch_ts long"

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

import importlib.util

_HAS_PROTOBUF = (
    importlib.util.find_spec("google") is not None
    and importlib.util.find_spec("google.protobuf") is not None
)
#: tws is real code against the public Spark 4 API, but its state-server
#: protocol is protobuf-over-socket and this sandbox ships no protobuf —
#: the same environmental gate as the Iceberg jars (BASELINE.md §env-gates)
_API_PARAMS = [
    "classic",
    pytest.param(
        "tws",
        marks=pytest.mark.skipif(
            not _HAS_PROTOBUF,
            reason="transformWithStateInPandas needs google.protobuf "
            "(state-server protocol); not shipped in this sandbox",
        ),
    ),
]


@contextlib.contextmanager
def _provider_for(spark, api):
    """transformWithState is RocksDB-only; the classic path keeps the
    default HDFS-backed provider. Conf is read at query start, so scope it."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    if api == "tws":
        spark.conf.set(key, ROCKSDB)
    try:
        yield
    finally:
        if api == "tws":
            spark.conf.unset(key) if old is None else spark.conf.set(key, old)


def _run(spark, in_dir, ckpt, out_dir, max_calls=3, period_s=1000, api="classic"):
    stream = spark.readStream.schema(ROWS_DDL).parquet(in_dir)
    with _provider_for(spark, api):
        annotated = stateful_admission(
            stream, max_calls=max_calls, period_s=period_s, api=api
        )
        q = (
            annotated.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)


@pytest.mark.parametrize("api", _API_PARAMS)
@pytest.mark.slow
def test_token_bucket_across_batches_and_restart(spark, tmp_path, api):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir)
    # batch 1: 5 urls on d1, 2 on d2 — budget 3 per window
    b1 = [("d1", f"u{i}", 100) for i in range(5)] + [("d2", f"v{i}", 100) for i in range(2)]
    spark.createDataFrame(b1, ROWS_DDL).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir, api=api)
    got = {
        (r.domain, r.url_sha1): r.admitted for r in spark.read.parquet(out_dir).collect()
    }
    assert sum(1 for (d, _), a in got.items() if d == "d1" and a) == 3
    assert sum(1 for (d, _), a in got.items() if d == "d1" and not a) == 2
    assert all(a for (d, _), a in got.items() if d == "d2")

    # batch 2 AFTER RESTART, same window: d1's bucket is already full from
    # batch 1 — only checkpointed state can know that
    b2 = [("d1", f"w{i}", 200) for i in range(2)] + [("d2", "v9", 200)]
    spark.createDataFrame(b2, ROWS_DDL).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir, api=api)
    got2 = {
        (r.domain, r.url_sha1): r.admitted for r in spark.read.parquet(out_dir).collect()
    }
    assert not got2[("d1", "w0")] and not got2[("d1", "w1")]  # bucket exhausted
    assert got2[("d2", "v9")]  # d2 had 2/3 used -> one token left

    # batch 3: a later window resets every bucket
    b3 = [("d1", f"x{i}", 2200) for i in range(2)]
    spark.createDataFrame(b3, ROWS_DDL).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir, api=api)
    got3 = {
        (r.domain, r.url_sha1): r.admitted for r in spark.read.parquet(out_dir).collect()
    }
    assert got3[("d1", "x0")] and got3[("d1", "x1")]


@pytest.mark.parametrize("api", _API_PARAMS)
def test_late_rows_do_not_reopen_stale_window(spark, tmp_path, api):
    """r2 ADVICE: a batch carrying an OLDER batch_ts must not reset the
    bucket for its stale window (that over-admits: fresh tokens for the
    stale window, then fresh tokens again when the current window resumes).
    Late rows draw from the CURRENT window's remaining budget instead."""
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir)
    # window 0: use 2 of 3 tokens
    b1 = [("d1", f"u{i}", 100) for i in range(2)]
    spark.createDataFrame(b1, ROWS_DDL).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir, api=api)
    # window 2 (ts 2200): resets, use 2 of 3
    b2 = [("d1", f"x{i}", 2200) for i in range(2)]
    spark.createDataFrame(b2, ROWS_DDL).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir, api=api)
    # LATE rows with ts back in window 0: no reset — one token left in the
    # current window, so exactly one of the two late rows is admitted
    b3 = [("d1", "late0", 200), ("d1", "late1", 201)]
    spark.createDataFrame(b3, ROWS_DDL).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir, api=api)
    got = {
        r.url_sha1: r.admitted for r in spark.read.parquet(out_dir).collect()
    }
    assert got["x0"] and got["x1"]
    assert got["late0"] and not got["late1"], (
        "late rows must draw from the current window's bucket, not a fresh one"
    )

"""Custom stateful streaming operator (applyInPandasWithState): per-domain
token-bucket admission whose state spans micro-batches AND restarts."""

import os

from etherscan_contract_crawler_spark.streaming.ratelimit import stateful_admission

ROWS_DDL = "domain string, url_sha1 string, batch_ts long"


def _run(spark, in_dir, ckpt, out_dir, max_calls=3, period_s=1000):
    stream = spark.readStream.schema(ROWS_DDL).parquet(in_dir)
    annotated = stateful_admission(stream, max_calls=max_calls, period_s=period_s)
    q = (
        annotated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_token_bucket_across_batches_and_restart(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir)
    # batch 1: 5 urls on d1, 2 on d2 — budget 3 per window
    b1 = [("d1", f"u{i}", 100) for i in range(5)] + [("d2", f"v{i}", 100) for i in range(2)]
    spark.createDataFrame(b1, ROWS_DDL).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir)
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
    _run(spark, in_dir, ckpt, out_dir)
    got2 = {
        (r.domain, r.url_sha1): r.admitted for r in spark.read.parquet(out_dir).collect()
    }
    assert not got2[("d1", "w0")] and not got2[("d1", "w1")]  # bucket exhausted
    assert got2[("d2", "v9")]  # d2 had 2/3 used -> one token left

    # batch 3: a later window resets every bucket
    b3 = [("d1", f"x{i}", 2200) for i in range(2)]
    spark.createDataFrame(b3, ROWS_DDL).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir)
    got3 = {
        (r.domain, r.url_sha1): r.admitted for r in spark.read.parquet(out_dir).collect()
    }
    assert got3[("d1", "x0")] and got3[("d1", "x1")]


def test_late_rows_do_not_reopen_stale_window(spark, tmp_path):
    """r2 ADVICE: a batch carrying an OLDER batch_ts must not reset the
    bucket for its stale window (that over-admits: fresh tokens for the
    stale window, then fresh tokens again when the current window resumes).
    Late rows draw from the CURRENT window's remaining budget instead."""
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir)
    # window 0: use 2 of 3 tokens
    b1 = [("d1", f"u{i}", 100) for i in range(2)]
    spark.createDataFrame(b1, ROWS_DDL).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir)
    # window 2 (ts 2200): resets, use 2 of 3
    b2 = [("d1", f"x{i}", 2200) for i in range(2)]
    spark.createDataFrame(b2, ROWS_DDL).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir)
    # LATE rows with ts back in window 0: no reset — one token left in the
    # current window, so exactly one of the two late rows is admitted
    b3 = [("d1", "late0", 200), ("d1", "late1", 201)]
    spark.createDataFrame(b3, ROWS_DDL).coalesce(1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, ckpt, out_dir)
    got = {
        r.url_sha1: r.admitted for r in spark.read.parquet(out_dir).collect()
    }
    assert got["x0"] and got["x1"]
    assert got["late0"] and not got["late1"], (
        "late rows must draw from the current window's bucket, not a fresh one"
    )

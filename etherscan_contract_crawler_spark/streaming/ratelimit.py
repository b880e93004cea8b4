"""Stateful per-domain admission control on the stream face —
``applyInPandasWithState`` (SURVEY.md §2.8's custom-stateful slot).

The batch engine enforces politeness by *planning* fetch slots inside an
epoch (operators/politeness.py — pure window functions). On the continuous
face there is no epoch to plan within: admission has to be a running count
per domain that survives micro-batch boundaries and restarts. That is
exactly Structured Streaming's arbitrary-stateful-operator contract:

    state key   = domain
    state value = (tokens_used, window_epoch)  — a token bucket over wall
                  windows of ``period_s`` seconds
    output      = input rows annotated admitted=true/false (deferred rows
                  are re-emitted by the caller into the frontier, not lost —
                  mirroring the batch engine's retry-as-data W3)

Reference analog: the *intended* ``@limits(calls=5, period=1)`` rate limiter
(contract_crawler.py:372-375, dead code — SURVEY.md §8 B1); here it finally
runs, as state, not sleeps.

Scale shape: state size = O(active domains), independent of URL count; the
per-group pandas hook touches only that group's rows in the batch. State is
checkpointed by the streaming engine (restart-safe, verified in
tests/test_streaming_state.py).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

OUTPUT_DDL = (
    "domain string, url_sha1 string, batch_ts long, admitted boolean, used_in_window int"
)
STATE_DDL = "tokens_used int, window_epoch long"


def _admit_group(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: Any,
    max_calls: int,
    period_s: int,
) -> Iterator[pd.DataFrame]:
    """Grouped stateful hook. ``batch_ts`` (event/processing seconds) drives
    the token window: a new window resets the bucket; within a window each
    admitted row consumes one token."""
    (domain,) = key
    if state.exists:
        tokens_used, window_epoch = state.get
    else:
        tokens_used, window_epoch = 0, -1
    for pdf in pdfs:
        pdf = pdf.sort_values(["batch_ts", "url_sha1"], kind="stable")
        admitted = []
        used_col = []
        for ts in pdf["batch_ts"]:
            epoch = int(ts) // period_s
            # reset only on a NEWER window: a late/out-of-order row carrying
            # an older batch_ts must NOT re-open its stale window — that
            # would grant a fresh bucket for the stale window and another
            # when the current one resumes, over-admitting past max_calls
            # (r2 ADVICE). Late rows draw from the current window's bucket
            # instead (conservative: never admits more than budgeted).
            if epoch > window_epoch:
                window_epoch, tokens_used = epoch, 0
            if tokens_used < max_calls:
                tokens_used += 1
                admitted.append(True)
            else:
                admitted.append(False)
            used_col.append(tokens_used)
        out = pdf[["domain", "url_sha1", "batch_ts"]].copy()
        out["admitted"] = admitted
        out["used_in_window"] = used_col
        yield out
    state.update((tokens_used, window_epoch))


def stateful_admission(
    stream_df,
    max_calls: int = 5,
    period_s: int = 1,
):
    """Apply the per-domain token bucket to a streaming DataFrame with
    columns (domain, url_sha1, batch_ts long seconds). Returns the annotated
    stream; pair with ``writeStream.foreachBatch`` to route admitted rows to
    the fetch stage and deferred rows back to the frontier."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        return _admit_group(key, pdfs, state, max_calls, period_s)

    return stream_df.groupBy("domain").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

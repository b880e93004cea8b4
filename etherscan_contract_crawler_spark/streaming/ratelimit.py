"""Stateful per-domain admission control on the stream face — one token
bucket behind BOTH arbitrary-state APIs (SURVEY.md §2.8's custom-stateful
slot): classic ``applyInPandasWithState`` and Spark 4's
``transformWithStateInPandas`` (StatefulProcessor + RocksDB provider), plus
a batch ``applyInPandas`` replay used by the driver's SQL oracle. All three
run the identical ``_admit_pdf`` core, so admission decisions are
API-independent.

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


def _admit_pdf(
    pdf: pd.DataFrame,
    tokens_used: int,
    window_epoch: int,
    max_calls: int,
    period_s: int,
) -> Tuple[pd.DataFrame, int, int]:
    """The token-bucket core, shared by BOTH stateful APIs (and the batch
    replay). ``batch_ts`` (event/processing seconds) drives the window: a
    new window resets the bucket; within a window each admitted row consumes
    one token. Reset only on a NEWER window: a late/out-of-order row
    carrying an older batch_ts must NOT re-open its stale window — that
    would grant a fresh bucket for the stale window and another when the
    current one resumes, over-admitting past max_calls (r2 ADVICE). Late
    rows draw from the current window's bucket instead (conservative: never
    admits more than budgeted)."""
    pdf = pdf.sort_values(["batch_ts", "url_sha1"], kind="stable")
    admitted = []
    used_col = []
    for ts in pdf["batch_ts"]:
        epoch = int(ts) // period_s
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
    return out, tokens_used, window_epoch


def _admit_group(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: Any,
    max_calls: int,
    period_s: int,
) -> Iterator[pd.DataFrame]:
    """Grouped stateful hook (applyInPandasWithState face)."""
    if state.exists:
        tokens_used, window_epoch = state.get
    else:
        tokens_used, window_epoch = 0, -1
    for pdf in pdfs:
        out, tokens_used, window_epoch = _admit_pdf(
            pdf, tokens_used, window_epoch, max_calls, period_s
        )
        yield out
    state.update((tokens_used, window_epoch))


class _BatchState:
    """Minimal GroupState stand-in for replaying ``_admit_group`` in batch:
    one micro-batch per group, fresh state. Lets the driver's SQL oracle
    (``admission_window``) exercise the SAME admission code path the
    streaming operator runs — not a parallel reimplementation."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = v, True


def admission_replay(df, max_calls: int = 5, period_s: int = 1):
    """Batch replay of the token bucket: the whole input is one micro-batch
    per domain (rows sorted by (batch_ts, url_sha1) inside ``_admit_group``,
    so windows arrive in order and the late-row branch is a no-op). Grouped
    ``applyInPandas`` — state is O(1) per group, rows never leave the group's
    Arrow batch. SQL-equivalent: per-(domain, batch_ts//period) row_number
    capped at max_calls, which is exactly what the driver oracle checks."""
    import pandas as pd

    def fn(key, pdf):
        state = _BatchState()
        return pd.concat(
            list(_admit_group(tuple(key), iter([pdf]), state, max_calls, period_s)),
            ignore_index=True,
        )

    return df.groupBy("domain").applyInPandas(fn, schema=OUTPUT_DDL)


def _admission_tws(stream_df, max_calls: int, period_s: int):
    """Spark 4 ``transformWithStateInPandas`` face (r2 VERDICT #8): same
    bucket, expressed as a StatefulProcessor over a named ValueState.
    Requires the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — transformWithState is
    RocksDB-only in Spark 4.1."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class AdmissionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._bucket = handle.getValueState("bucket", STATE_DDL)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            if self._bucket.exists():
                tokens_used, window_epoch = self._bucket.get()
            else:
                tokens_used, window_epoch = 0, -1
            for pdf in rows:
                out, tokens_used, window_epoch = _admit_pdf(
                    pdf, tokens_used, window_epoch, max_calls, period_s
                )
                yield out
            self._bucket.update((tokens_used, window_epoch))

        def close(self) -> None:
            pass

    return stream_df.groupBy("domain").transformWithStateInPandas(
        statefulProcessor=AdmissionProcessor(),
        outputStructType=OUTPUT_DDL,
        outputMode="Append",
        timeMode="None",
    )


def stateful_admission(
    stream_df,
    max_calls: int = 5,
    period_s: int = 1,
    api: str = "auto",
):
    """Apply the per-domain token bucket to a streaming DataFrame with
    columns (domain, url_sha1, batch_ts long seconds). Returns the annotated
    stream; pair with ``writeStream.foreachBatch`` to route admitted rows to
    the fetch stage and deferred rows back to the frontier.

    ``api``: ``"tws"`` = transformWithStateInPandas (Spark 4 arbitrary-state
    API, RocksDB provider required), ``"classic"`` = applyInPandasWithState
    (HDFS-backed provider works), ``"auto"`` = tws when both the API and the
    RocksDB provider conf are present, else classic. Both faces run the
    identical ``_admit_pdf`` core, so admission decisions are
    API-independent (pinned by tests/test_streaming_state.py on both)."""
    if api not in ("auto", "tws", "classic"):
        raise ValueError(f"unknown admission api: {api!r}")
    if api in ("auto", "tws"):
        # the TWS state-server protocol is protobuf-over-socket: without
        # google.protobuf the DRIVER worker crashes at query start (the
        # stateful_processor import itself succeeds), so probe the real
        # runtime dependency, not the API surface
        import importlib.util

        tws_runnable = (
            importlib.util.find_spec("google") is not None
            and importlib.util.find_spec("google.protobuf") is not None
        )
        if api == "tws" and not tws_runnable:
            raise ImportError(
                "transformWithStateInPandas needs the protobuf runtime "
                "(google.protobuf) for its state-server protocol; install "
                "protobuf or use api='classic'"
            )
        rocksdb_on = "RocksDB" in (
            stream_df.sparkSession.conf.get(
                "spark.sql.streaming.stateStore.providerClass", ""
            )
            or ""
        )
        if tws_runnable and (api == "tws" or rocksdb_on):
            return _admission_tws(stream_df, max_calls, period_s)
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

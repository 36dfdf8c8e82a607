"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only cross-run state is the landed-keys catalog (ST2);
the engine's extended surface adds arbitrary per-key streaming state —
the Spark-native replacement for any "remember what I saw for this key"
loop. State lives in the state store (checkpointed, partitioned by key),
so a 1000-executor cluster shards it horizontally.
"""

from __future__ import annotations

import contextlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

COUNTS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"

TWS_OUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, "
    "min_value double, max_value double"
)
TWS_STATE_SCHEMA = "n bigint, total double, vmin double, vmax double"

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """transformWithStateInPandas talks to the JVM over a protobuf state
    protocol — its Python runner hard-imports google.protobuf, which
    this container does not ship as a pip package. compat.pbruntime
    probes for a pure-Python runtime vendored by host tooling and
    bootstraps it (driver side here; worker side via enable_tws_workers)
    — so the gate now opens wherever either a real install or a
    vendored runtime exists."""
    from kommunedata_data_pipeline_spark.compat import ensure_protobuf

    return ensure_protobuf()


def enable_tws_workers(spark) -> bool:
    """Arrange for Spark Python workers to see the same protobuf runtime
    as the driver. Must be called BEFORE defining a transformWithState
    query: PySpark snapshots ``SparkContext.environment`` into each new
    PythonFunction, and the worker factory both merges its PYTHONPATH
    and exports the rest into the spawned worker process — which makes
    compat/pbshim/sitecustomize.py run at worker interpreter startup,
    ahead of the runner's google.protobuf import. Mutating
    ``sc.environment`` changes the worker-pool key, so already-running
    workers for other queries are untouched. Returns False (and changes
    nothing) when no usable runtime was found."""
    from kommunedata_data_pipeline_spark.compat import worker_env_for_protobuf

    sc = spark.sparkContext
    env = worker_env_for_protobuf(sc.environment.get("PYTHONPATH", ""))
    if env is None:
        return False
    sc.environment.update(env)
    return True


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running event count + value total across micro-batches.

    Each batch updates the per-key state and emits the new running
    totals — the canonical applyInPandasWithState shape (per-key
    accumulator with explicit state schema). Over a single batch the
    emitted rows equal a plain groupBy aggregate, which gives this
    streaming-stateful operator an exact SQL oracle.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    # prune before the stateful op: column pruning does NOT push through
    # a Python stateful operator, and every retained column rides the
    # key shuffle AND the Arrow transfer into the worker
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=COUNTS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class UserValueStatsProcessor(StatefulProcessor):
    """transformWithStateInPandas processor (Spark 4's successor to
    applyInPandasWithState): per-user running count / total / min / max
    in a typed ValueState variable. The new API gives named, individually
    typed state variables (value/list/map) plus timers, instead of one
    positional state tuple — this is the shape new stateful operators
    should take."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState("stats", TWS_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        # one get() instead of exists()+get(): every ValueState call is a
        # synchronous round trip to the JVM state server, paid per key
        # per batch — get() already encodes absence as None
        prev = self._stats.get()
        n, total, vmin, vmax = prev if prev is not None else (0, 0.0, None, None)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            nonnull = pdf["value"].dropna()
            if len(nonnull):
                bmin, bmax = float(nonnull.min()), float(nonnull.max())
                vmin = bmin if vmin is None else min(vmin, bmin)
                vmax = bmax if vmax is None else max(vmax, bmax)
        self._stats.update((n, total, vmin, vmax))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "min_value": [vmin],
                "max_value": [vmax],
            }
        )

    def close(self) -> None:
        pass


def user_value_stats_tws(events: DataFrame) -> DataFrame:
    """Per-user running value stats via ``transformWithStateInPandas``.

    Same single-batch-equals-groupBy oracle property as
    ``user_running_totals``; across batches the ValueState carries the
    accumulator. Requires the RocksDB state store provider (see
    ``rocksdb_state_store``) — the HDFS-backed default doesn't implement
    the transformWithState column families.

    The processor class is module-level, which cloudpickle serializes
    by reference — requiring this package importable inside the worker.
    Workers only inherit the driver's cwd on sys.path by accident of
    local mode, so pin by-value pickling for this module instead (the
    same choice a user submitting to a real cluster without --py-files
    would need)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    # same pre-stateful pruning as user_running_totals: only the key and
    # the aggregated column cross the shuffle + Arrow boundary
    return events.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserValueStatsProcessor(),
        outputStructType=TWS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


TWS_TOPK_OUT_SCHEMA = "user_id bigint, rnk int, value double, event_id bigint"
TWS_TOPK_STATE_SCHEMA = "value double, event_id bigint"


class UserTopKProcessor(StatefulProcessor):
    """transformWithState ListState demo: per-user running top-k events
    by value (event_id tiebreak). ListState holds the current top-k
    tuples — the typed collection-state API (vs ValueState's single
    tuple); each batch merges its rows, re-ranks, truncates to k, and
    emits the new standings. Bounded merge: state never exceeds k rows
    per key regardless of stream length."""

    def __init__(self, k: int = 3) -> None:
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._top = handle.getListState("topk", TWS_TOPK_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        cur = [(float(v), int(e)) for v, e in self._top.get()]
        for pdf in rows:
            sub = pdf[["value", "event_id"]].dropna(subset=["value"])
            cur.extend(
                (float(v), int(e))
                for v, e in zip(sub["value"], sub["event_id"])
            )
        cur.sort(key=lambda t: (-t[0], t[1]))
        cur = cur[: self._k]
        self._top.put([(v, e) for v, e in cur])
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(cur),
                "rnk": list(range(1, len(cur) + 1)),
                "value": [v for v, _ in cur],
                "event_id": [e for _, e in cur],
            }
        )

    def close(self) -> None:
        pass


def user_topk_tws(events: DataFrame, k: int = 3) -> DataFrame:
    """Per-user running top-k via transformWithState ListState. Over a
    single batch the emitted standings equal the batch window top-k,
    giving an exact SQL oracle; across batches the ListState carries the
    standings with at most k rows per key."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    return (
        events.select("user_id", "value", "event_id")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserTopKProcessor(k),
            outputStructType=TWS_TOPK_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


TWS_TYPECOUNT_OUT_SCHEMA = "user_id bigint, event_type string, n bigint"


class UserTypeCountsProcessor(StatefulProcessor):
    """transformWithState MapState demo — the third typed state variable
    (ValueState: user_value_stats_tws; ListState: user_topk_tws): per
    user, a map event_type → running count. MapState gives per-subkey
    point updates (only the types seen THIS batch are read/written),
    which is the right state shape when the per-key domain is sparse and
    large — a ValueState holding the whole dict would rewrite every
    subkey every batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState("counts", "event_type string", "n bigint")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        batch: dict[str, int] = {}
        for pdf in rows:
            for t, c in pdf["event_type"].dropna().value_counts().items():
                batch[str(t)] = batch.get(str(t), 0) + int(c)
        out_t, out_n = [], []
        for t, c in sorted(batch.items()):
            # getValue encodes absence as None — one round trip, not the
            # containsKey+getValue pair
            prev = self._counts.getValue((t,))
            n = (prev[0] if prev is not None else 0) + c
            self._counts.updateValue((t,), (n,))
            out_t.append(t)
            out_n.append(n)
        yield pd.DataFrame(
            {"user_id": [key[0]] * len(out_t), "event_type": out_t, "n": out_n}
        )

    def close(self) -> None:
        pass


def user_type_counts_tws(events: DataFrame) -> DataFrame:
    """Per-(user, event_type) running counts in a MapState — emits only
    the types touched by each batch (the point-update contract). Over a
    single batch the emissions equal a plain groupBy(user_id,
    event_type) count."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserTypeCountsProcessor(),
            outputStructType=TWS_TYPECOUNT_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


TWS_SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, n_events bigint"
)
TWS_SESSION_STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"


class SessionCloseProcessor(StatefulProcessor):
    """transformWithState EVENT-TIME TIMER demo — the capability neither
    applyInPandasWithState nor window aggregations expose directly:
    per-key callbacks when the watermark passes a registered instant.

    True gap-session semantics (upgraded r5 — the r4 version merged a
    whole micro-batch into one activity window, splitting sessions only
    across batch boundaries; it now matches ``session_window``, see
    q_stream_session_parity): each batch merges the key's timestamps
    with the open session by gap-interval sweep. Sessions PROVABLY
    closed — a later event of the same key more than ``gap`` after
    their end proves, in event time, that the gap elapsed — are emitted
    immediately; the trailing open session stays in state with ONE
    timer re-armed at end + gap. When the event-time watermark passes
    it (the key has been silent for the gap, as judged by stream time,
    not wall clock), ``handleExpiredTimer`` emits the closed session
    exactly once and clears the state — the "emit on inactivity"
    pattern (session close, abandoned-cart, SLA breach) without any
    per-batch polling of the whole keyspace: Spark fires only the keys
    whose timers expired.

    Late-data caveat: an evidence-closed session is final; a late event
    older than the proving gap cannot reopen it (the built-in
    ``session_window`` buffers until the watermark instead). With the
    watermark delay sized to the actual disorder bound the two emit
    identical session sets."""

    def __init__(self, gap_ms: int = 600_000) -> None:
        # state + output carry MICROSECONDS (the event-time precision of
        # the input — session_window keeps it, so parity requires it);
        # only timers are registered in ms (the timer API's unit)
        self._gap_us = gap_ms * 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._sess = handle.getValueState("sess", TWS_SESSION_STATE_SCHEMA)
        self._handle = handle

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        ts_us: list[int] = []
        for pdf in rows:
            ts_us.extend((pdf["ts"].astype("int64") // 1_000).tolist())
        if not ts_us:
            return iter([])
        prev = self._sess.get()
        intervals = [tuple(prev)] if prev is not None else []
        intervals.extend((t, t, 1) for t in ts_us)
        intervals.sort()
        merged: list[tuple[int, int, int]] = []
        for s, e, c in intervals:
            if merged and s - merged[-1][1] <= self._gap_us:
                ls, le, lc = merged[-1]
                merged[-1] = (ls, max(le, e), lc + c)
            else:
                merged.append((s, e, c))
        closed, open_ = merged[:-1], merged[-1]
        self._sess.update(open_)
        # one live timer per key: re-arm at the new end-of-activity
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        # ceil to ms: firing a fraction of a ms early would emit a
        # session whose gap has not fully elapsed
        self._handle.registerTimer(-((open_[1] + self._gap_us) // -1000))
        if not closed:
            return iter([])
        return iter(
            [
                pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(closed),
                        "session_start_us": [s for s, _, _ in closed],
                        "session_end_us": [e for _, e, _ in closed],
                        "n_events": [c for _, _, c in closed],
                    }
                )
            ]
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        cur = self._sess.get()
        if cur is None:
            return iter([])
        self._sess.clear()
        return iter(
            [
                pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "session_start_us": [cur[0]],
                        "session_end_us": [cur[1]],
                        "n_events": [cur[2]],
                    }
                )
            ]
        )

    def close(self) -> None:
        pass


def session_close_tws(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "0 seconds"
) -> DataFrame:
    """Sessions emitted ONLY on inactivity (event-time timers). The input
    must carry a ``ts`` timestamp column; the watermark is what drives
    timer expiry, so a bounded replay emits exactly the sessions whose
    gap elapsed before the final watermark."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    gap_ms = int(gap.split()[0]) * {"minutes": 60_000, "minute": 60_000, "seconds": 1_000, "second": 1_000}[gap.split()[1]]
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionCloseProcessor(gap_ms),
            outputStructType=TWS_SESSION_OUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


@contextlib.contextmanager
def rocksdb_state_store(spark):
    """Scoped switch to the RocksDB state store provider (required by
    transformWithState; read at query START, so scoping the conf to the
    start call is safe for concurrently-defined queries)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, _ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

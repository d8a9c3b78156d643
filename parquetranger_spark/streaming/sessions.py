"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §2.4 X6 — the streaming twin of
operators/events.py::session_stats).

The reference has no streaming surface at all (SURVEY §2.4: "no streaming
watermarks/windows" — verified absence in /root/reference/parquetranger/);
this is part of the driver-mandated extension tier. Spark's built-in
``session_window`` covers windowed aggregates, but per-user *running*
session counts need custom state: one state row per user holding
``(last_ts, n_sessions, n_events)``, updated per micro-batch.

Scale shape: state is hash-partitioned by the grouping key across
executors (RocksDB/HDFS-backed state store on a real cluster); each
micro-batch shuffles only that batch's rows, and the per-group pandas
update is O(batch rows log batch rows) for the sort. No driver-side state,
no full-history reprocessing.

Caveat (documented, same as any gap sessionizer without reorder buffering):
events arriving in a later micro-batch with timestamps older than the
user's ``last_ts`` are counted into the running totals but cannot re-split
earlier sessions. Feed batches in event-time order (or pre-sort with a
watermark) for exact parity with the batch operator.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.events import NS_PER_SEC


def streaming_session_stats(
    stream_df: DataFrame,
    ts_ns_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-user running (n_sessions, n_events) over an event stream.

    Emits one updated row per user per micro-batch (update output mode);
    counts are monotone, so the latest row per user is the current truth.
    With all data in (event-time-ordered) batches the final rows equal the
    batch ``session_stats`` exactly.
    """
    gap_ns = gap_seconds * NS_PER_SEC
    key_t = stream_df.schema[user_col].dataType.simpleString()

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ts_chunks = [pdf[ts_ns_col] for pdf in pdfs]
        ts = pd.concat(ts_chunks).sort_values() if ts_chunks else pd.Series([], dtype="int64")
        # defense in depth: nulls are filtered STREAM-SIDE before this
        # operator (one NaN widens the whole pandas chunk to float64,
        # rounding epoch-nanos above 2^53 by up to ~256 ns — enough to
        # split/merge a borderline session differently from the batch
        # twin); this dropna only covers a caller bypassing the filter
        ts = ts.dropna()
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for t in ts:
            t = int(t)
            if last_ts is None or t - last_ts > gap_ns:
                n_sessions += 1
            n_events += 1
            last_ts = t
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {user_col: [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    # null-ts filter BEFORE the stateful op: one NULL widens a pandas
    # chunk to float64 and silently rounds every epoch-nano in it (see
    # the in-UDF note); a null ts never opens or extends a session anyway
    stream_df = stream_df.where(F.col(ts_ns_col).isNotNull())
    return stream_df.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=f"{user_col} {key_t}, n_sessions long, n_events long",
        stateStructType="last_ts long, n_sessions long, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_running_agg(
    stream_df: DataFrame,
    key_col: str = "user_id",
    val_col: str = "value",
) -> DataFrame:
    """Per-key running (max, count) over an event stream — the minimal
    custom stateful shape: one scalar state row per key, updated per
    micro-batch, emitted in update mode. Both outputs are monotone, so
    the per-key maximum over everything emitted equals the final truth —
    which is what lets an exact SQL oracle check the streaming run.

    Same scale posture as streaming_session_stats: state hash-partitioned
    by key, each micro-batch shuffles only its own rows, O(1) state per
    key."""
    key_t = stream_df.schema[key_col].dataType.simpleString()

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur_max, cur_n = state.get
        else:
            cur_max, cur_n = None, 0
        for pdf in pdfs:
            # an all-NULL chunk's .max() is NaN, and max(NaN, x) is NaN in
            # Python (NaN comparisons are False) — one bad chunk would
            # poison the key's running_max FOREVER; count every row but
            # only fold non-null values into the max
            vals = pdf[val_col].dropna()
            if len(vals):
                m = float(vals.max())
                cur_max = m if cur_max is None else max(cur_max, m)
            cur_n += int(len(pdf))
        state.update((cur_max, cur_n))
        yield pd.DataFrame(
            {key_col: [key[0]], "running_max": [cur_max], "running_n": [cur_n]}
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_t}, running_max double, running_n long",
        stateStructType="cur_max double, cur_n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_profile_tws(
    stream_df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-key activity profile via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-state processor API (the successor to
    ``applyInPandasWithState``), exercised with MULTIPLE typed state
    variables per key: a ValueState scalar (event count) and a MapState
    (per-event-type counts, of which the emitted distinct-type count is
    the size). Both emitted outputs are monotone non-decreasing across
    micro-batches, so the per-key last emission equals the batch truth —
    the same exactness device as streaming_running_agg.

    Scale posture: state is hash-partitioned by key in the state store;
    each micro-batch shuffles only its own rows; per-key state is O(1) +
    O(distinct types) — bounded by the type vocabulary, not the stream.
    TTL is available per state var (``ttlDurationMs``) for keys that
    must age out; not enabled here because the oracle is a full-history
    aggregate.

    The processor class is defined inside this function so cloudpickle
    serializes it BY VALUE — executors never need this package on their
    sys.path (same rule as the ingestor's shred closure).

    Dependency fallback: transformWithStateInPandas speaks a protobuf
    protocol to the JVM state server; where ``google.protobuf`` is not
    installed (this container), the SAME per-key profile state machine
    runs through ``applyInPandasWithState`` instead — the ValueState +
    MapState pair degrades to one state row holding (count, json type
    map); output schema, update-mode semantics, and monotonicity are
    identical, so callers and oracles see the same contract either way."""
    key_t = stream_df.schema[key_col].dataType.simpleString()
    import importlib.util

    try:
        _has_pb = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        _has_pb = False
    if not _has_pb:
        return _profile_apply_in_pandas(stream_df, key_col, type_col, key_t)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n bigint")
            self._types = handle.getMapState("types", "t string", "c bigint")

        def handleInputRows(self, key, rows, timer_values):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                if not len(pdf):
                    continue
                n += int(len(pdf))
                for t, c in pdf[type_col].value_counts().items():
                    prev = (
                        self._types.getValue((t,))[0]
                        if self._types.containsKey((t,))
                        else 0
                    )
                    self._types.updateValue((t,), (prev + int(c),))
            self._n.update((n,))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {key_col: [key[0]], "n_events": [n], "n_types": [n_types]}
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_Profile(),
        outputStructType=f"{key_col} {key_t}, n_events long, n_types long",
        outputMode="Update",
        timeMode="None",
    )


def _profile_apply_in_pandas(
    stream_df: DataFrame, key_col: str, type_col: str, key_t: str
) -> DataFrame:
    """applyInPandasWithState twin of the TWS profile processor (see
    streaming_profile_tws): per-key state = (event count, per-type count
    map as JSON — GroupState rows are flat, so the MapState degrades to
    one string column). Emissions are monotone, matching the TWS path."""

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import json as _json

        if state.exists:
            n, tmap_s = state.get
            tmap = _json.loads(tmap_s)
        else:
            n, tmap = 0, {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += int(len(pdf))
            for t, c in pdf[type_col].value_counts().items():
                tmap[t] = tmap.get(t, 0) + int(c)
        state.update((n, _json.dumps(tmap, sort_keys=True)))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "n_types": [len(tmap)]}
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_t}, n_events long, n_types long",
        stateStructType="n bigint, tmap string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Custom stateful streaming operators via ``applyInPandasWithState``.

The batch engine's dedup family has a streaming twin here: seen-key
streaming deduplication with explicit, bounded state and event-time
timeout — the shape any custom stateful operator takes in this engine
(state schema declared, timeout wired to the watermark, Arrow-batched).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    events: DataFrame,
    key_col: str = "event_type",
    id_col: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit only the first occurrence of each ``id`` within a key group.

    State per key = the set of seen ids (bounded by the watermark
    timeout: groups idle past it are dropped, so state can't grow
    unboundedly — the difference between a demo and an operator that
    survives an unbounded stream).
    """

    out_schema = f"{key_col} string, {id_col} long, ts timestamp"
    state_schema = "seen array<long>"

    def dedup(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (seen,) = state.get if state.exists else ([],)
        seen_set = set(seen)
        batch_max_ms = 0
        for pdf in pdfs:
            if len(pdf):
                batch_max_ms = max(
                    batch_max_ms, int(pdf["ts"].astype("int64").max() // 1_000_000)
                )
            fresh = pdf[~pdf[id_col].isin(seen_set)].drop_duplicates(subset=[id_col])
            seen_set.update(fresh[id_col].tolist())
            if len(fresh):
                yield fresh[[key_col, id_col, "ts"]]
        state.update((list(seen_set),))
        # anchor the timeout on the LATER of the watermark and this
        # batch's own event times: on a key's first batch the watermark
        # is still epoch-0, and watermark+horizon would expire the state
        # the moment the watermark initializes to real event time.
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), batch_max_ms) + 3_600_000
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            dedup,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``operators/funnel.funnel`` — the greedy
    earliest-completion stage automaton run incrementally per user.

    State per user = the array of bound step timestamps (≤ k longs —
    O(1), unlike buffering approaches); each micro-batch's events are
    sorted by event time and folded through the same automaton the
    batch operator uses. Emits the user's updated ``(stage, t1…tk)``
    row whenever a batch advances their funnel (append mode → the
    sink sees a progression log; latest row per user = current state).

    Equivalence contract (tested): if each user's events arrive in
    event-time order ACROSS batches (any disorder WITHIN a batch is
    sorted away), the final emitted state per user equals the batch
    funnel. A late event older than an already-bound step cannot
    rebind it — the automaton is monotone, which is what makes O(k)
    state sufficient; replay-from-checkpoint reconverges because the
    fold is deterministic. Idle users drop off via the event-time
    timeout tied to the watermark.
    """
    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")
    within_us = None if within_seconds is None else within_seconds * 1_000_000
    out_schema = (
        f"{user_col} long, stage int, "
        + ", ".join(f"t{i} long" for i in range(1, k + 1))
    )
    state_schema = "path array<long>"

    def advance(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (path,) = state.get if state.exists else ([],)
        path = list(path)
        before = len(path)
        batch = pd.concat(list(pdfs), ignore_index=True)
        us = (batch[ts_col].astype("int64") // 1000).to_numpy()
        types = batch[type_col].to_numpy()
        for i in us.argsort(kind="stable"):
            if len(path) >= k:
                break
            if types[i] != steps[len(path)]:
                continue
            if path and not (
                us[i] > path[-1]
                and (within_us is None or us[i] <= path[-1] + within_us)
            ):
                continue
            path.append(int(us[i]))
        if len(path) > before or not state.exists:
            row = {user_col: [key[0]], "stage": [len(path)]}
            for i in range(1, k + 1):
                row[f"t{i}"] = [path[i - 1] if i <= len(path) else None]
            yield pd.DataFrame(row)
        state.update((path,))
        # same anchoring as streaming_dedup: epoch-0 watermark on a
        # key's first batch must not schedule an immediate expiry.
        batch_max_ms = int(us.max() // 1000) if len(us) else 0
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), batch_max_ms) + 3_600_000
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            advance,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

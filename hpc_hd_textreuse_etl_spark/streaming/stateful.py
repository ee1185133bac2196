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
        for pdf in pdfs:
            fresh = pdf[~pdf[id_col].isin(seen_set)].drop_duplicates(subset=[id_col])
            seen_set.update(fresh[id_col].tolist())
            if len(fresh):
                yield fresh[[key_col, id_col, "ts"]]
        state.update((list(seen_set),))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3_600_000)

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

"""Streaming joins: stream-static enrichment and stream-stream
interval joins.

The batch engine's dim-enrichment joins (plans/serving.py
``reception_detail``) and its reception fan-out (operators/reception)
have streaming twins here. State design is the whole game:

- stream-static: the static side is re-broadcast per micro-batch; no
  streaming state at all. The right shape for metadata dims.
- stream-stream: both sides buffer in state; the join time-bound plus
  the watermark is what lets Spark evict buffered rows. An unbounded
  condition would grow state forever — every operator here REQUIRES the
  bound (enforced, not documented-only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich streaming facts with a (small) static
    dimension. The dim is broadcast so each micro-batch plans a
    BroadcastHashJoin — no shuffle of the stream, no state. Spark
    re-resolves the static side per batch, so a view over a parquet dir
    picks up snapshot refreshes between batches."""
    if isinstance(keys, str):
        keys = [keys]
    return stream.join(F.broadcast(dim), keys, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    extra_cond: Column | None = None,
) -> DataFrame:
    """Stream-stream inner join: right-side events within
    ``(left_ts, left_ts + max_delay]`` of a left event with the same
    key — the streaming form of the reception edge (earliest event →
    later events in its group, time-bounded).

    Both sides get the watermark and the range condition references both
    event-time columns; together they bound the join state Spark
    buffers: left rows are evicted once the right watermark passes
    ``left_ts + max_delay``, right rows once the left watermark passes
    ``right_ts``. Without the range bound the state is unbounded —
    that's why ``max_delay`` is a required parameter, not an option.

    Column naming: the left side's columns come out prefixed ``l_``,
    the right side's ``r_`` (both sides usually share a schema)."""
    l = left.withWatermark(left_ts, watermark).select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    r = right.withWatermark(right_ts, watermark).select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    lts, rts = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    cond = (
        (F.col(f"l_{key_col}") == F.col(f"r_{key_col}"))
        & (rts > lts)
        & (rts <= lts + F.expr(f"INTERVAL {max_delay}"))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return l.join(r, cond)

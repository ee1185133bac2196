"""Temporal operators: scalable as-of (nearest-event) joins.

The reference joins point-in-time facts with equality keys only; an
as-of join — "for each left row, the latest right row at or before its
timestamp" — is the canonical temporal operator Spark lacks natively
(SPARK-22947 was never merged). The naive formulations both fail at
100 TB:

- range join (``l.key = r.key AND r.t <= l.t``) explodes to O(|l|·|r|)
  per key before the per-row argmax prunes it;
- per-left-row subquery is not expressible as one shuffle.

This implementation is the **union + ordered carry-forward** plan:

1. tag right rows 0 / left rows 1, union them with one shared time
   column, right payload packed into a single struct column;
2. one shuffle on the equality keys, one sort on
   ``(time, tag, payload)``;
3. ``last(payload, ignorenulls=True)`` over
   ``ROWS UNBOUNDED PRECEDING`` carries the most recent right payload
   onto every left row;
4. keep the left rows, optionally null the match outside ``tolerance``.

Cost: exactly one exchange + one spillable sort over |l| + |r| rows —
the same shape as a sort-merge join, with per-key memory O(1). Skewed
keys behave like any window (AQE cannot split a window partition; for a
pathological key, pre-bucket time ranges — see SCALE.md).

Determinism: among right rows sharing (keys, time), the one with the
greatest payload struct (ordered by time column first, then
``right_cols`` in the given order) wins — ties are resolved by value,
never by partition layout.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_T = "__asof_t"
_TAG = "__asof_is_left"
_RV = "__asof_rv"
_CARRY = "__asof_carry"
_BIN = "__iv_bin"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the ``right_cols`` of
    the nearest ``right`` row per ``by`` group — the latest with
    ``right_on <= left_on`` (``direction="backward"``, inclusive) or the
    earliest with ``right_on >= left_on`` (``"forward"``). No match (or
    match farther than ``tolerance``, when given) → NULL columns, like a
    left outer join.

    ``tolerance`` is compared against the time difference in the join
    direction; pass ``F.expr("INTERVAL 30 DAYS")`` for timestamps or a
    numeric literal for numeric time columns. Attached columns keep
    their right-side names plus ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(by)
    if right_cols is None:
        skip = set(keys) | {right_on}
        right_cols = [c for c in right.columns if c not in skip]
    right_cols = list(right_cols)
    out_names = [c + suffix for c in right_cols]
    clash = set(out_names) & set(left.columns)
    if clash:
        raise ValueError(f"attached columns collide with left columns: {sorted(clash)}; pass suffix=")

    rv = F.struct(
        F.col(right_on).alias("__rt"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = (
        right.where(F.col(right_on).isNotNull())
        .select(*keys, F.col(right_on).alias(_T), rv.alias(_RV))
        .withColumn(_TAG, F.lit(0))
    )
    l = left.withColumn(_T, F.col(left_on)).withColumn(_TAG, F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    t_order = F.col(_T).asc_nulls_first() if direction == "backward" else F.col(_T).desc_nulls_last()
    # Payload ascends in BOTH directions: among right rows at the same
    # time, last-seen (= the carry) is then the greatest payload struct.
    order = [t_order, F.col(_TAG).asc(), F.col(_RV).asc_nulls_first()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(_CARRY, F.last(_RV, ignorenulls=True).over(w))

    # A left row with NULL time never matches (under the forward sort it
    # would otherwise sit past every right row and pick up a stale carry).
    matched = F.when(F.col(_T).isNotNull(), F.col(_CARRY))
    if tolerance is not None:
        diff = (
            F.col(_T) - matched["__rt"]
            if direction == "backward"
            else matched["__rt"] - F.col(_T)
        )
        matched = F.when(diff <= tolerance, matched)

    out = carried.where(F.col(_TAG) == 1).select(
        *left.columns,
        *[matched[c].alias(n) for c, n in zip(right_cols, out_names)],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: Sequence[str] = (),
    bin_width: int = 3600,
    suffixes: tuple[str, str] = ("_l", "_r"),
    max_bins_per_row: int = 4096,
) -> DataFrame:
    """Interval **overlap** join: all (left, right) pairs whose half-open
    intervals ``[start, end)`` intersect, with optional equality keys
    ``by`` — the range-join operator Spark lacks natively (and the
    other classic temporal join next to :func:`asof_join`).

    The naive spellings are both 100 TB scale-killers: a θ-join on
    ``l.s < r.e AND r.s < l.e`` plans as BroadcastNestedLoopJoin /
    CartesianProduct (O(|l|·|r|) comparisons), and a per-key range join
    still explodes on hot keys. This is the **binned equi-join** plan:

    1. each interval explodes to the fixed-width bins it touches
       (fan-out = len/bin_width + 1, guarded by ``max_bins_per_row`` —
       a runtime ``raise_error`` rather than a silent blow-up);
    2. one shuffle equi-join on ``(*by, bin)`` — hash-joinable,
       AQE-splittable, never a nested loop;
    3. a pair that shares k bins would surface k times, so candidates
       are kept only in their **anchor bin** — the bin containing
       ``greatest(l.start, r.start)``. The anchor lies inside both
       intervals of every truly-overlapping pair (it is < both ends and
       ≥ both starts) and there is exactly one such bin, so emission is
       exactly-once *without a distinct* (no second shuffle).
       ``floor(x / w)`` is monotone in x even under double rounding, so
       the anchor provably falls within both exploded ranges.
    4. the exact overlap predicate re-verifies on the original values
       (bins only generate candidates; they never decide membership).

    Start/end columns must be numeric (cast timestamps with
    ``F.unix_micros`` first); ``bin_width`` should approximate the
    typical interval length — shorter bins mean more fan-out rows,
    longer bins mean more false candidates per bin.

    All non-``by`` columns are suffixed (left/right) so self-joins work
    unambiguously.
    """
    lsfx, rsfx = suffixes
    by = list(by)
    lt = left.select(
        *by, *[F.col(c).alias(c + lsfx) for c in left.columns if c not in by]
    )
    rt = right.select(
        *by, *[F.col(c).alias(c + rsfx) for c in right.columns if c not in by]
    )
    ls, le = F.col(left_start + lsfx), F.col(left_end + lsfx)
    rs, re_ = F.col(right_start + rsfx), F.col(right_end + rsfx)
    w = F.lit(bin_width)

    def binned(df: DataFrame, s: Column, e: Column) -> DataFrame:
        lo, hi = F.floor(s / w), F.floor((e - F.lit(1)) / w)
        hi_guarded = F.when(
            hi - lo < F.lit(max_bins_per_row), hi
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_join: interval spans more than "
                        f"{max_bins_per_row} bins of width {bin_width} "
                        "(start="
                    ),
                    s.cast("string"),
                    F.lit(", end="),
                    e.cast("string"),
                    F.lit("); raise bin_width or max_bins_per_row"),
                )
            ).cast("bigint")
        )
        return df.withColumn(_BIN, F.explode(F.sequence(lo, hi_guarded)))

    joined = binned(lt, ls, le).join(binned(rt, rs, re_), [*by, _BIN])
    anchor = F.floor(F.greatest(ls, rs) / w)
    return joined.filter(
        (ls < re_) & (rs < le) & (F.col(_BIN) == anchor)
    ).drop(_BIN)


#: refuse dense grids beyond this many estimated cells unless the
#: caller opts in — same footgun contract as dedup.embedding_near_duplicates.
MAX_GAPFILL_CELLS = 50_000_000


#: strict ANSI interval-literal shape for the gap-fill ``step`` — the
#: string is interpolated into SQL text (``sequence(lo, hi, {step})``),
#: so anything outside unsigned unit terms is refused before it reaches
#: the parser: no expressions, no negatives, no quotes, no semicolons.
_STEP_PATTERN = re.compile(
    r"^\s*interval(\s+\d+\s+(?:year|month|week|day|hour|minute|second"
    r"|millisecond|microsecond)s?)+\s*$",
    re.IGNORECASE,
)


def _validated_step_micros(df: DataFrame, step: str) -> int:
    """Validate the gap-fill ``step`` and return its width in µs.

    Runs UNCONDITIONALLY (also under ``allow_dense_grid=True``): the
    pattern gate stops SQL injection/typos, the width probe (a one-row
    SQL evaluation, no data scan; month-based steps use their January
    width) stops the zero-width ``interval 0 day`` degenerate case.
    """
    if not _STEP_PATTERN.match(step):
        raise ValueError(
            f"gap-fill step must be a plain interval literal like "
            f"'interval 1 day' or 'interval 2 hours 30 minutes', got {step!r}"
        )
    step_us = df.sparkSession.sql(
        f"SELECT unix_micros(timestamp'2000-01-01 00:00:00' + ({step}))"
        " - unix_micros(timestamp'2000-01-01 00:00:00') AS us"
    ).first()["us"]
    if step_us <= 0:
        raise ValueError(f"gap-fill step must be positive, got {step!r}")
    return step_us


def _estimated_grid_cells(
    df: DataFrame, bucket_col: str, group_cols: Sequence[str], step_us: int
) -> int:
    """One-scan estimate of |buckets| × |groups| for the gap-fill grid:
    min/max span + approx_count_distinct(groups) in a single aggregate
    (an estimate is all the guard needs)."""
    probe = df.agg(
        F.unix_micros(F.min(bucket_col).cast("timestamp")).alias("lo_us"),
        F.unix_micros(F.max(bucket_col).cast("timestamp")).alias("hi_us"),
        F.approx_count_distinct(F.struct(*group_cols)).alias("n_groups"),
    ).first()
    if probe["lo_us"] is None:
        return 0
    n_buckets = (probe["hi_us"] - probe["lo_us"]) // step_us + 1
    # approx_count_distinct is ±~2%; pad so the guard errs toward refusal
    return int(n_buckets * max(probe["n_groups"], 1) * 1.05)


def gapfill_buckets(
    df: DataFrame,
    bucket_col: str,
    group_cols: Sequence[str],
    value_cols: dict[str, Column],
    step: str = "interval 1 day",
    fill: dict[str, object] | None = None,
    *,
    allow_dense_grid: bool = False,
    max_grid_cells: int = MAX_GAPFILL_CELLS,
) -> DataFrame:
    """Dense time-series re-grid: one row for EVERY (group, bucket) in
    the span, empty buckets filled — the hypertable ``time_bucket_gapfill``
    / gap-filling rollup. ``bucket_col`` must already be truncated
    (``F.date_trunc``); ``value_cols`` are the aggregates per cell.

    Scale shape: the aggregation is the only pass over the data (one
    map-side-combined shuffle). The dense grid is built from two *dims*
    — the global bucket span (driver-held min/max, exploded ``sequence``)
    cross-joined with distinct groups — so the cross join is
    |buckets| × |groups| rows regardless of input size, then a
    broadcast-able left join attaches the sparse aggregates.

    Grids too big to enumerate (microsecond buckets × 10^9 groups) are
    not a gap-fill use case, and the operator REFUSES them: unless
    ``allow_dense_grid=True``, a one-scan probe estimates
    |buckets| × |groups| and raises past ``max_grid_cells`` instead of
    materializing an unbounded cross join. Opting in also skips the
    probe scan for callers who know their grid is small — but the
    ``step`` literal itself is pattern-validated and positivity-checked
    in BOTH modes (it is interpolated into SQL text).
    """
    step_us = _validated_step_micros(df, step)
    if not allow_dense_grid:
        cells = _estimated_grid_cells(df, bucket_col, group_cols, step_us)
        if cells > max_grid_cells:
            raise ValueError(
                f"gap-fill grid would materialize ~{cells:,} cells "
                f"(> {max_grid_cells:,}); pass allow_dense_grid=True to "
                "proceed anyway, or coarsen `step` / pre-filter groups"
            )
    agged = df.groupBy(*group_cols, bucket_col).agg(
        *[c.alias(n) for n, c in value_cols.items()]
    )
    span = df.select(
        F.min(bucket_col).alias("lo"), F.max(bucket_col).alias("hi")
    )
    buckets = span.select(
        F.explode(F.expr(f"sequence(lo, hi, {step})")).alias(bucket_col)
    )
    groups = df.select(*group_cols).distinct()
    grid = buckets.crossJoin(groups)
    out = grid.join(agged, [*group_cols, bucket_col], "left")
    fills = fill or {}
    return out.select(
        *group_cols,
        bucket_col,
        *[
            F.coalesce(F.col(n), F.lit(fills[n])).alias(n)
            if n in fills
            else F.col(n)
            for n in value_cols
        ],
    )


def half_life_weight(
    ts_col: Column,
    as_of: Column,
    half_life_micros: int,
    max_half_lives: int = 40,
) -> Column:
    """Cross-engine-exact time-decay weight ``2^-d`` with
    ``d = floor(age / half_life)`` clamped to ``[0, max_half_lives]``.

    Decayed counters ("recent activity counts more") are usually written
    as ``exp(-λ·age)`` — a libm call whose last ulp differs between
    engines and platforms, which poisons any value-equality check and
    makes retried partitions non-reproducible bit-for-bit. Stepping the
    decay per *whole half-life elapsed* keeps the weight an exact power
    of two: ``pow(2, -d)`` is exactly representable in an IEEE double
    for d ≤ 1022, so the weight — and the per-row product with it — is
    bit-identical everywhere. The clamp bounds the exponent (and
    truncates ancient rows to a floor weight rather than denormals).

    Rows with ``ts > as_of`` (future relative to the snapshot) get
    d = 0, i.e. full weight; filter them out beforehand if the snapshot
    must exclude them."""
    age = F.unix_micros(as_of) - F.unix_micros(ts_col)
    # floor, not cast: double→bigint casts truncate in Spark but round
    # in some ANSI engines; floor is unambiguous everywhere.
    d = F.greatest(
        F.lit(0),
        F.least(F.lit(max_half_lives), F.floor(age / F.lit(half_life_micros))),
    )
    return F.pow(F.lit(2.0), -d.cast("double"))


def decayed_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    ts_col: str,
    as_of: str,
    half_life: str = "365 days",
    max_half_lives: int = 20,
    value_scale: int = 2,
    out_col: str = "decayed_value",
) -> DataFrame:
    """Per-key decayed counter at snapshot ``as_of``: the production
    primitive behind "recency-weighted customer value" / trending-score
    tables, as ONE map-side-combined aggregation — no window, no self
    join, no per-key state beyond the accumulator.

    Exactness: a double contribution ``value · 2^-d`` rounded into a
    decimal accumulator hits the shortest-repr-vs-binary-expansion
    midpoint hazard (module docstring — Spark HALF_UPs "x.xxxxxx5",
    DuckDB rounds the binary value below it). So the decay is computed
    ENTIRELY in scaled integers: ``units = value·10^value_scale`` (exact
    for money-style inputs) times ``2^(K − d)`` with K = max_half_lives
    — a bigint product summed as bigint, associative and engine-exact.
    The human-readable double is ONE division of the final sum by
    ``10^value_scale · 2^K`` — bigint→double (exact below 2^53) then a
    round-to-nearest IEEE division, identical everywhere, so even the
    double is hash-gateable.

    Overflow headroom: |sum| < 2^63 needs Σ units < 2^(63−K); with the
    default K=20 that is ~9e12 value-units per key — raise
    ``value_scale`` down / K down for pathological keys. Rows older
    than K half-lives keep the floor weight 2^-K instead of vanishing.
    ``half_life`` is ``"<n> days|hours|minutes|seconds"`` (parsed
    driver-side into microseconds — a constant, not a query)."""
    count, unit = half_life.split()
    per = {"days": 86_400, "hours": 3_600, "minutes": 60, "seconds": 1}
    hl_micros = int(count) * per[unit.rstrip("s") + "s"] * 1_000_000
    age = F.unix_micros(F.lit(as_of).cast("timestamp")) - F.unix_micros(
        F.col(ts_col)
    )
    d = F.greatest(
        F.lit(0),
        F.least(F.lit(max_half_lives), F.floor(age / F.lit(hl_micros))),
    )
    units = (
        F.col(value_col).cast(f"decimal(30,{value_scale})")
        * F.lit(10**value_scale)
    ).cast("bigint")
    # shiftleft keeps the weight in integer space end to end (pow would
    # round-trip through a double); expr() because the Python shiftleft
    # binding only takes a literal bit count
    staged = df.withColumn("__dc_units", units).withColumn(
        "__dc_d", d.cast("int")
    )
    scaled = F.expr(
        f"__dc_units * shiftleft(cast(1 as bigint), {max_half_lives} - __dc_d)"
    )
    denom = float(10**value_scale * (1 << max_half_lives))
    out = staged.groupBy(*key_cols).agg(
        F.sum(scaled).cast("bigint").alias(f"{out_col}_scaled"),
        F.count(F.lit(1)).cast("bigint").alias(f"{out_col}_n"),
    )
    return out.withColumn(
        out_col, F.col(f"{out_col}_scaled").cast("double") / F.lit(denom)
    )


def sliding_distinct_count(
    df: DataFrame,
    ts_col: str,
    entity_col: str,
    window_days: int = 7,
    out_col: str = "active_entities",
) -> DataFrame:
    """Trailing-window distinct count per day — the WAU/MAU "7-day
    active users" metric, EXACTLY (no sketch), at scale.

    Spark has no ``COUNT(DISTINCT) OVER (RANGE ...)``, and the obvious
    per-day range join (``report_day BETWEEN day AND day+w-1``) plans a
    nested loop. The scale shape (round 11): ONE corpus-scale shuffle.
    Raw events collapse map-side into per-entity day SETS (collect_set
    partials — same shuffle bytes as the old distinct-pairs exchange),
    then each entity's sorted day array is swept once with a
    higher-order transform that emits only the NEW report days each
    activity day contributes (``[max(d_i, d_{i-1}+w), d_i+w-1]`` — the
    interval-union telescoped onto rows). Because the union is disjoint
    per entity, every (entity, report_day) pair is emitted EXACTLY once,
    so the final per-day count is a plain partial-aggregable SUM: the
    old second exchange — the full count-distinct shuffle of the
    exploded set, ``window_days`` × the distinct-pairs volume — is
    replaced by ≤ #days count rows per map partition. Report days are
    clipped to the observed [min, max] day span via a broadcast 1-row
    aggregate over the raw scan (min/max need no dedup), never a driver
    action. NULL entities mirror COUNT(DISTINCT)'s treatment exactly:
    their covered days surface with weight 0, so a day reached only by
    NULL-entity windows still reports 0 (as the old formulation did).

    Swap the exact count for the KMV/HLL sketches in
    operators/sketches.py when even the per-entity day sets are too hot
    — same plan shape, mergeable partials.
    """
    ud = df.select(
        F.col(entity_col).alias("__ent"),
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("__day"),
    )
    # min/max over raw rows == min/max over the distinct pairs; partial
    # aggregation makes this branch a near-free second pass of the scan
    span = ud.agg(F.min("__day").alias("__lo"), F.max("__day").alias("__hi"))
    sets = ud.groupBy("__ent").agg(
        F.sort_array(F.collect_set("__day")).alias("__days")
    )
    w = int(window_days)
    # element_at is 1-based: element_at(__days, i) at 0-based position i
    # IS the previous element. First interval opens at d itself; later
    # intervals open past the previous day's coverage (prev + w). Always
    # non-empty: prev <= d-1  =>  prev + w <= d + w - 1.
    contrib = F.explode(
        F.expr(
            f"""transform(__days, (d, i) -> named_struct(
                    'lo', CASE WHEN i = 0 THEN d
                          ELSE greatest(d, date_add(element_at(__days, i), {w})) END,
                    'hi', date_add(d, {w - 1})))"""
        )
    ).alias("__iv")
    days = sets.select(
        F.when(F.col("__ent").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("__w"),
        contrib,
    ).select("__w", F.explode(F.sequence("__iv.lo", "__iv.hi")).alias("report_day"))
    return (
        days.crossJoin(F.broadcast(span))
        .where(F.col("report_day").between(F.col("__lo"), F.col("__hi")))
        .groupBy("report_day")
        .agg(F.sum("__w").cast("bigint").alias(out_col))
    )

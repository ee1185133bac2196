"""Multi-dimensional data layout: z-order (Morton) clustering keys.

Partition pruning on ONE sort column is free in any parquet scan
(min/max footer stats); queries filtering on a *second* dimension read
everything. Interleaving the bits of d columns into a single Morton key
and range-sorting by it gives every file a tight bounding box in ALL d
dimensions at once — each dimension's per-file span shrinks to roughly
``range / N^(1/d)`` instead of one dimension at ``range / N`` and the
rest at full range. That is the Delta/Iceberg ``ZORDER BY`` idea,
expressed here as a pure Catalyst column (42 shift-and-mask terms for
two 21-bit dims — whole-stage-codegen'd, no UDF) plus a
``repartitionByRange`` writer, so it works on any Spark and its value
is verifiable cross-engine (the key is exact integer arithmetic).

Scale notes: ``repartitionByRange`` samples the key distribution, so
skewed dimensions still yield balanced files; the z-key never needs to
be stored — recompute it when re-clustering. Bits beyond ``bits`` per
dimension are ignored by design (columns must be pre-quantized; the
guard raises rather than silently folding distant values together).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Z = "__zkey"


def zorder_key(cols: Sequence[Column | str], bits: int = 21) -> Column:
    """Morton-interleave ``bits`` low bits of each (non-negative
    integer) column into one bigint: bit ``b`` of column ``j`` lands at
    position ``b * d + j``. ``bits * len(cols)`` must fit 63 bits.
    Out-of-range inputs (negative, or ≥ 2^bits) raise at runtime — a
    clamped key would silently destroy locality instead."""
    d = len(cols)
    if d < 2:
        raise ValueError("zorder_key needs at least two columns")
    if bits * d > 63:
        raise ValueError(f"bits*dims = {bits * d} exceeds 63")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    lim = 1 << bits
    guarded = [
        F.when((c >= 0) & (c < lim), c).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"zorder_key: column {j} value "),
                    c.cast("string"),
                    F.lit(f" outside [0, {lim}) — quantize first"),
                )
            ).cast("bigint")
        )
        for j, c in enumerate(cs)
    ]
    terms = []
    for b in range(bits):
        for j, c in enumerate(guarded):
            terms.append(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * d + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def write_zordered(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int,
    bits: int = 21,
    fmt: str = "parquet",
) -> None:
    """Cluster ``df`` into ``n_files`` range-partitions of the z-key
    (sampled boundaries → balanced files even under skew), sort within
    each, drop the key, write. Every emitted file then carries tight
    min/max footer stats on ALL ``cols``."""
    keyed = df.withColumn(_Z, zorder_key(list(cols), bits=bits))
    (
        keyed.repartitionByRange(n_files, F.col(_Z))
        .sortWithinPartitions(_Z)
        .drop(_Z)
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )

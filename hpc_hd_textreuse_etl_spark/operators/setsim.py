"""Exact set-similarity join via prefix filtering (All-Pairs / PPJoin
family: Bayardo et al., WWW'07; Chaudhuri et al., ICDE'06 — public
algorithms).

Finds ALL pairs with Jaccard(a, b) >= t without comparing all pairs:

1. order every record's elements by global rarity (frequency asc,
   element asc — a total order shared by all records);
2. a record with n elements keeps only its first
   ``p = n - ceil(t*n) + 1`` elements as its *prefix*;
3. any qualifying pair must collide on at least one prefix element
   (pigeonhole: J >= t forces |intersection| >= ceil(t*n); if the two
   prefixes were disjoint, all shared elements would sit in the
   suffixes, which hold only ceil(t*n) - 1 elements each);
4. candidates = equi-join on prefix elements; exact Jaccard verify.

Unlike MinHash/LSH (probabilistic recall) this is EXACT — the
candidate set provably contains every qualifying pair — which is why
it complements the sketch-based dedups rather than duplicating them.

All threshold arithmetic is integer (thousandths): ``p`` uses
``ceil(t_milli*n / 1000)`` in exact integer math and the verify
predicate is ``1000*|∩| >= t_milli*|∪|`` — no IEEE boundary anywhere,
so both engines agree bit-for-bit even when Jaccard equals the
threshold exactly.

Scale shape: the element-frequency table is the vocabulary (≪ corpus,
broadcastable); prefixes hold each record's RAREST elements, so
prefix-join buckets are small by construction — the frequent elements
that would blow up an all-token join never enter a prefix unless a
record is so large its prefix reaches them, and then the length filter
t·n bounds how many such records exist. Element sets shuffle once (to
order by rarity); the verify join moves only candidate id pairs plus
their two element arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def jaccard_threshold_pairs(
    df: DataFrame,
    id_col: str,
    elements: Column,
    threshold: float,
) -> DataFrame:
    """All pairs with Jaccard similarity >= ``threshold`` over the
    per-row element sets (``elements`` is an array column expression;
    duplicates are dropped). Output: ``(id_a, id_b, n_intersect,
    n_union, jaccard)`` with ``id_a < id_b``.

    ``threshold`` is taken at thousandth precision (0.5 → 500/1000);
    the comparison is exact rational arithmetic, inclusive (>=).
    """
    t_milli = int(round(threshold * 1000))
    if not 0 < t_milli <= 1000:
        raise ValueError(
            f"threshold must be in (0, 1] at thousandth precision, got {threshold}"
        )
    sets = (
        df.select(F.col(id_col).alias("id"), F.array_distinct(elements).alias("els"))
        .where(F.size("els") > 0)
    )
    # The element arrays feed four consumers (frequency count, the
    # rarity ordering, and both verify sides); without a persist Spark
    # recomputes the (expensive) element expression for each.
    sets = sets.persist()

    flat = sets.select("id", F.explode("els").alias("el"))
    freq = flat.groupBy("el").agg(F.count(F.lit(1)).alias("freq"))
    # rarity-ordered element list per record; (freq, el) is a shared
    # total order so every record sorts its elements identically.
    ordered = (
        flat.join(freq, "el")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("freq", "el"))).alias("fe"))
    )
    n = F.size("fe")
    # ceil(t*n) in exact integer math: (t_milli*n + 999) div 1000.
    # The double division is exact here: the numerator is an integer
    # < 2^53 and an integer-valued quotient is always representable.
    ceil_tn = F.floor((F.lit(t_milli) * n + F.lit(999)) / F.lit(1000)).cast("int")
    prefix = F.slice(
        F.transform("fe", lambda x: x["el"]), F.lit(1), n - ceil_tn + F.lit(1)
    )
    # posexplode: the position inside the prefix IS the position inside
    # the full rarity-ordered list, which the positional filter needs.
    # persisted: the self-join's two sides would otherwise each rebuild
    # the whole explode → frequency-join → sort pipeline.
    pref = ordered.select(
        "id", n.alias("n"), F.posexplode(prefix).alias("pos", "el")
    ).persist()

    a, b = pref.alias("a"), pref.alias("b")
    an, bn = F.col("a.n"), F.col("b.n")
    # Length filter: J >= t forces |∩| >= t·max(na, nb) and |∩| <= min,
    # so t·max <= min — in thousandths, both ways.
    length_ok = (F.lit(1000) * an >= F.lit(t_milli) * bn) & (
        F.lit(1000) * bn >= F.lit(t_milli) * an
    )
    # Positional filter (PPJoin): a qualifying pair's FIRST common
    # element sits inside both prefixes (shared elements occupy α*
    # positions, so the earliest is at index <= n - α* + 1 <= prefix
    # length), and at that match every shared element lies at-or-after
    # (i, j) — so 1 + min(na - i, nb - j) bounds the overlap, which
    # must reach α = ceil(t(na+nb)/(1+t)):
    # (1000 + t_milli)·capacity >= t_milli·(na + nb), integer-exact.
    cap = F.lit(1) + F.least(
        an - (F.col("a.pos") + 1), bn - (F.col("b.pos") + 1)
    )
    pos_ok = F.lit(1000 + t_milli) * cap >= F.lit(t_milli) * (an + bn)
    cand = (
        a.join(
            b,
            (F.col("a.el") == F.col("b.el"))
            & (F.col("a.id") < F.col("b.id"))
            & length_ok
            & pos_ok,
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    sa = sets.select(F.col("id").alias("id_a"), F.col("els").alias("els_a"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("els").alias("els_b"))
    inter = F.size(F.array_intersect("els_a", "els_b"))
    union = F.size("els_a") + F.size("els_b") - inter
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_intersect", inter.cast("bigint"))
        .withColumn("n_union", union.cast("bigint"))
        .where(F.lit(1000) * F.col("n_intersect") >= F.lit(t_milli) * F.col("n_union"))
        .select(
            "id_a", "id_b", "n_intersect", "n_union",
            (F.col("n_intersect").cast("double") / F.col("n_union")).alias("jaccard"),
        )
    )


def containment_threshold_pairs(
    df: DataFrame,
    id_col: str,
    elements: Column,
    threshold: float,
) -> DataFrame:
    """All ORDERED pairs where ``|A ∩ B| >= t·|B|`` — B (the contained
    side) is mostly inside A (the container). Containment is the
    text-reuse relation proper: a quote keeps a high fraction of ITS
    shingles inside the quoting document regardless of how much bigger
    that document is, which symmetric Jaccard dilutes away.

    Prefix filtering asymmetricizes cleanly: containment ≥ t forces
    |∩| ≥ ceil(t·nb), so by the usual pigeonhole B must share one of
    its first ``nb − ceil(t·nb) + 1`` rarity-ordered elements; the
    CONTAINER side cannot be prefix-pruned (a bigger A only helps), so
    A contributes its full element list as the inverted index. The
    length filter also collapses to one direction (nb bounded only
    when t·nb ≤ na).

    Scale note vs the Jaccard join: the index side is the full corpus
    posting list, so hot elements cost candidates proportional to
    their document frequency times the number of B-prefixes touching
    them — B prefixes hold each record's RAREST elements, which is
    what keeps that product down. If the element universe has no rare
    tail (tiny vocabulary), containment search degenerates — use
    shingles, not raw tokens, as the element domain.

    Output: ``(container_id, contained_id, n_intersect, n_contained,
    containment)`` — integer-exact gate (``1000·|∩| >= t_milli·nb``,
    inclusive), the division only in the reported float.
    """
    t_milli = int(round(threshold * 1000))
    if not 0 < t_milli <= 1000:
        raise ValueError(
            f"threshold must be in (0, 1] at thousandth precision, got {threshold}"
        )
    sets = (
        df.select(F.col(id_col).alias("id"), F.array_distinct(elements).alias("els"))
        .where(F.size("els") > 0)
        .persist()
    )
    flat = sets.select("id", F.explode("els").alias("el"))
    freq = flat.groupBy("el").agg(F.count(F.lit(1)).alias("freq"))
    ordered = (
        flat.join(freq, "el")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("freq", "el"))).alias("fe"))
    )
    nb = F.size("fe")
    ceil_tn = F.floor((F.lit(t_milli) * nb + F.lit(999)) / F.lit(1000)).cast("int")
    prefix = F.slice(
        F.transform("fe", lambda x: x["el"]), F.lit(1), nb - ceil_tn + F.lit(1)
    )
    probe = ordered.select(
        F.col("id").alias("contained_id"),
        nb.alias("nb"),
        F.explode(prefix).alias("el"),
    )
    index = flat.select(F.col("id").alias("container_id"), "el")
    cand = (
        index.join(
            probe,
            (index["el"] == probe["el"])
            & (F.col("container_id") != F.col("contained_id")),
        )
        .select("container_id", "contained_id", "nb")
        .distinct()
    )
    sa = sets.select(F.col("id").alias("container_id"), F.col("els").alias("els_a"))
    sb = sets.select(F.col("id").alias("contained_id"), F.col("els").alias("els_b"))
    inter = F.size(F.array_intersect("els_a", "els_b"))
    return (
        cand.join(sa, "container_id")
        .join(sb, "contained_id")
        .withColumn("n_intersect", inter.cast("bigint"))
        .withColumn("n_contained", F.col("nb").cast("bigint"))
        .where(
            F.lit(1000) * F.col("n_intersect") >= F.lit(t_milli) * F.col("nb")
        )
        .select(
            "container_id",
            "contained_id",
            "n_intersect",
            "n_contained",
            (F.col("n_intersect").cast("double") / F.col("n_contained")).alias(
                "containment"
            ),
        )
    )

"""Bibliographic metadata layer: the four-level entity model
TRS → manifestation → edition → work (+ actors/authors, dates, titles).

Re-expresses the reference's metadata assets in the DataFrame API:

- ``manifestation_ids``            ← assets/ids_and_mappings.py:17-42
- ``edition_ids`` / ``edition_mapping``  ← :60-108 (placeholder rules:
  ECCO → its ESTC id; EEBO → ESTC id, falling back to the EEBO-TCP id
  when no ESTC mapping exists; newspapers → every article is its own
  edition)
- ``work_ids`` / ``work_mapping``  ← :110-156 (work falls back to the
  manifestation id when ESTC has no work)
- ``textreuse_{manifestation,edition,work}_mapping`` ← :159-225
- ``actor_ids`` / ``edition_authors``   ← assets/actors_and_authors.py:11-55
  (only links with ``actor_role_author = 1`` qualify; editions without
  authors keep a NULL actor row)
- ``manifestation_publication_date``    ← assets/publication_date.py:135-215
  (per-collection CASE chains, multiple-ESTC-mapping MIN-group)
- ``edition_publication_date`` / ``work_earliest_publication_date``
  ← assets/publication_date.py:15-106 (min-aggregation up the hierarchy)
- ``manifestation_title``          ← assets/titles.py:10-34 (MAX() dedup
  of multi-mapped titles)

The date chains live in ``functions/dates.py`` so each messy-format
branch is unit-tested in isolation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.functions.dates import (
    ecco_date_valid,
    parse_ecco_date,
    parse_eebo_date,
)
from hpc_hd_textreuse_etl_spark.functions.ids import dense_ids


def manifestation_ids(
    ecco_core: DataFrame, eebo_core: DataFrame, newspapers_core: DataFrame
) -> DataFrame:
    """Dense ids over the union of all collections' document ids."""
    ids = (
        ecco_core.select(F.col("ecco_id").alias("manifestation_id")).distinct()
        .unionAll(
            eebo_core.filter(F.col("eebo_tcp_id").isNotNull())
            .select(F.col("eebo_tcp_id").alias("manifestation_id"))
            .distinct()
        )
        .unionAll(
            newspapers_core.select(F.col("article_id").alias("manifestation_id")).distinct()
        )
    )
    return dense_ids(ids, ["manifestation_id"], "manifestation_id_i")


def edition_ids_and_mapping(
    ecco_core: DataFrame,
    eebo_core: DataFrame,
    newspapers_core: DataFrame,
    mids: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(edition_ids, edition_mapping)``; mapping carries
    ``(manifestation_id_i, edition_id_i)``."""
    # NOTE: the reference's SQL uses ecco.estc_id directly, so a NULL
    # ESTC id silently drops the manifestation from the mapping at the
    # id-assignment inner join — contradicting its own comment
    # (ids_and_mappings.py:47-49: "the ECCO id is used as placeholder
    # edition"). We implement the documented intent.
    ecco = (
        ecco_core.join(mids, ecco_core.ecco_id == mids.manifestation_id)
        .select(
            "manifestation_id_i",
            F.coalesce(F.col("estc_id"), F.col("ecco_id")).alias("edition_id"),
        )
        .distinct()
    )
    eebo = (
        eebo_core.join(mids, eebo_core.eebo_tcp_id == mids.manifestation_id)
        .select(
            "manifestation_id_i",
            F.coalesce(F.col("estc_id"), F.col("eebo_tcp_id")).alias("edition_id"),
        )
        .distinct()
    )
    news = newspapers_core.join(
        mids, newspapers_core.article_id == mids.manifestation_id
    ).select("manifestation_id_i", F.col("article_id").alias("edition_id"))
    mapping_raw = ecco.unionAll(eebo).unionAll(news)
    edition_ids = dense_ids(
        mapping_raw.select("edition_id").distinct(), ["edition_id"], "edition_id_i"
    )
    mapping = mapping_raw.join(edition_ids, "edition_id").select(
        "manifestation_id_i", "edition_id_i"
    )
    return edition_ids, mapping


def work_ids_and_mapping(
    estc_core: DataFrame,
    mids: DataFrame,
    edition_ids: DataFrame,
    edition_mapping: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Work id falls back to the manifestation id where ESTC has none."""
    raw = (
        edition_mapping.join(mids, "manifestation_id_i")
        .join(edition_ids, "edition_id_i")
        .join(
            estc_core.select("estc_id", "work_id"),
            F.col("edition_id") == F.col("estc_id"),
            "left",
        )
        .select(
            "manifestation_id_i",
            F.coalesce(F.col("work_id"), F.col("manifestation_id")).alias("work_id"),
        )
        .distinct()
    )
    work_ids = dense_ids(
        raw.select("work_id").distinct(), ["work_id"], "work_id_i"
    )
    mapping = raw.join(work_ids, "work_id").select("manifestation_id_i", "work_id_i")
    return work_ids, mapping


def textreuse_metadata_mappings(
    trs_ids: DataFrame,
    mids: DataFrame,
    edition_mapping: DataFrame,
    work_mapping: DataFrame,
) -> dict[str, DataFrame]:
    """trs → manifestation / edition / work link tables."""
    base = trs_ids.join(mids, "manifestation_id")
    return {
        "textreuse_manifestation_mapping": base.select(
            "trs_id", "manifestation_id_i"
        ).distinct(),
        "textreuse_edition_mapping": base.join(edition_mapping, "manifestation_id_i")
        .select("trs_id", "edition_id_i")
        .distinct(),
        "textreuse_work_mapping": base.join(work_mapping, "manifestation_id_i")
        .select("trs_id", "work_id_i")
        .distinct(),
    }


def actor_ids(estc_actors: DataFrame) -> DataFrame:
    return dense_ids(
        estc_actors.select("actor_id", "name_unified").distinct(),
        ["actor_id", "name_unified"],
        "actor_id_i",
    )


def edition_authors(
    edition_ids: DataFrame, estc_actor_links: DataFrame, actors: DataFrame
) -> DataFrame:
    """Author actors per edition; the role filter lives in the join
    condition (left joins keep author-less editions with NULL)."""
    links = estc_actor_links
    return (
        edition_ids.join(
            links,
            (F.col("edition_id") == links.estc_id)
            & (links.actor_role_author == 1),
            "left",
        )
        .join(actors.select("actor_id", "actor_id_i"), "actor_id", "left")
        .select("edition_id_i", "actor_id_i")
    )


def manifestation_publication_date(
    ecco_core: DataFrame,
    eebo_core: DataFrame,
    newspapers_core: DataFrame,
    estc_core: DataFrame,
    mids: DataFrame,
    edition_ids: DataFrame,
    edition_mapping: DataFrame,
) -> DataFrame:
    """Per-collection earliest publication date (CASE fallback chains;
    multi-ESTC manifestations MIN-grouped)."""
    # the collection cores carry their own estc_id column; rename the
    # ESTC-side key to keep the join unambiguous
    estc = estc_core.select(
        F.col("estc_id").alias("estc_key"), "publication_year"
    )
    estc_year_date = F.try_to_date(
        F.concat(F.col("publication_year").cast("int").cast("string"), F.lit("-01-01")),
        "yyyy-MM-dd",
    )

    eebo = (
        eebo_core.join(mids, eebo_core.eebo_tcp_id == mids.manifestation_id)
        .join(edition_mapping, "manifestation_id_i")
        .join(edition_ids, "edition_id_i")
        .join(estc, F.col("edition_id") == F.col("estc_key"), "left")
        .select(
            "manifestation_id_i",
            F.when(
                F.col("eebo_tls_publication_date").isNull(), estc_year_date
            ).otherwise(parse_eebo_date("eebo_tls_publication_date")).alias(
                "publication_date"
            ),
        )
        .groupBy("manifestation_id_i")
        .agg(F.min("publication_date").alias("publication_date"))
    )

    ecco = (
        ecco_core.join(mids, ecco_core.ecco_id == mids.manifestation_id)
        .join(edition_mapping, "manifestation_id_i")
        .join(edition_ids, "edition_id_i")
        .join(estc, F.col("edition_id") == F.col("estc_key"), "left")
        .select(
            "manifestation_id_i",
            # reference CASE: a *valid* ECCO date wins even if its parse
            # comes out NULL; only invalid/sentinel dates fall back to ESTC
            F.when(
                ecco_date_valid("ecco_date_start"),
                parse_ecco_date("ecco_date_start"),
            )
            .otherwise(estc_year_date)
            .alias("publication_date"),
        )
        .groupBy("manifestation_id_i")
        .agg(F.min("publication_date").alias("publication_date"))
    )

    news = newspapers_core.join(
        mids, newspapers_core.article_id == mids.manifestation_id
    ).select("manifestation_id_i", F.col("issue_start_date").alias("publication_date"))

    return eebo.unionByName(ecco).unionByName(news)


def edition_publication_date(
    manifestation_dates: DataFrame, edition_mapping: DataFrame
) -> DataFrame:
    return (
        manifestation_dates.join(edition_mapping, "manifestation_id_i")
        .groupBy("edition_id_i")
        .agg(F.min("publication_date").alias("publication_date"))
    )


def work_earliest_publication_date(
    edition_dates: DataFrame, edition_mapping: DataFrame, work_mapping: DataFrame
) -> DataFrame:
    return (
        edition_dates.join(edition_mapping, "edition_id_i")
        .join(work_mapping, "manifestation_id_i")
        .groupBy("work_id_i")
        .agg(F.min("publication_date").alias("publication_date"))
    )


def manifestation_title(
    ecco_core: DataFrame, eebo_core: DataFrame, newspapers_core: DataFrame, mids: DataFrame
) -> DataFrame:
    """One title per manifestation; multi-mapped rows deduped with MAX
    (reference titles.py:26-28)."""
    titles = (
        ecco_core.select(
            F.col("ecco_id").alias("manifestation_id"),
            F.col("ecco_full_title").alias("title"),
        )
        .unionAll(
            eebo_core.filter(F.col("eebo_tcp_id").isNotNull()).select(
                F.col("eebo_tcp_id").alias("manifestation_id"),
                F.col("eebo_tls_title").alias("title"),
            )
        )
        .unionAll(
            newspapers_core.select(
                F.col("article_id").alias("manifestation_id"),
                F.col("newspaper_title").alias("title"),
            )
        )
    )
    return (
        titles.join(mids, "manifestation_id")
        .groupBy("manifestation_id_i")
        .agg(F.max("title").alias("title"))
    )


@dataclass
class MetadataLayer:
    manifestation_ids: DataFrame
    edition_ids: DataFrame
    edition_mapping: DataFrame
    work_ids: DataFrame
    work_mapping: DataFrame
    trs_mappings: dict[str, DataFrame]
    actor_ids: DataFrame
    edition_authors: DataFrame
    manifestation_publication_date: DataFrame
    edition_publication_date: DataFrame
    work_earliest_publication_date: DataFrame
    manifestation_title: DataFrame


def build_metadata(
    trs_ids: DataFrame,
    ecco_core: DataFrame,
    eebo_core: DataFrame,
    newspapers_core: DataFrame,
    estc_core: DataFrame,
    estc_actors: DataFrame,
    estc_actor_links: DataFrame,
) -> MetadataLayer:
    mids = manifestation_ids(ecco_core, eebo_core, newspapers_core)
    eids, emap = edition_ids_and_mapping(ecco_core, eebo_core, newspapers_core, mids)
    wids, wmap = work_ids_and_mapping(estc_core, mids, eids, emap)
    acts = actor_ids(estc_actors)
    mdates = manifestation_publication_date(
        ecco_core, eebo_core, newspapers_core, estc_core, mids, eids, emap
    )
    edates = edition_publication_date(mdates, emap)
    return MetadataLayer(
        manifestation_ids=mids,
        edition_ids=eids,
        edition_mapping=emap,
        work_ids=wids,
        work_mapping=wmap,
        trs_mappings=textreuse_metadata_mappings(trs_ids, mids, emap, wmap),
        actor_ids=acts,
        edition_authors=edition_authors(eids, estc_actor_links, acts),
        manifestation_publication_date=mdates,
        edition_publication_date=edates,
        work_earliest_publication_date=work_earliest_publication_date(
            edates, emap, wmap
        ),
        manifestation_title=manifestation_title(
            ecco_core, eebo_core, newspapers_core, mids
        ),
    )

"""Physical serving-layer design: per-table DDL + covering-index specs.

The reference ships concrete MariaDB DDL and index sets for every
serving table it bulk-loads (``database_assets/*.py`` — e.g. coverages
indexed on both ids and both coverage ratios,
``database_assets/coverages.py:48-67``; dense-id PKs + covering
string→id lookup indexes, ``database_assets/ids_and_mappings.py:14-26``).
That physical design IS the serving contract: the companion paper's
reception / top-quote queries are only fast because each table carries
exactly these access paths.

Here the design is encoded as *data* (:class:`ServingTableSpec`) rather
than SQL strings inside pipeline functions, so:

- :func:`load_serving_table` resolves a spec and drives the generic
  ``load_table`` contract (``jdbc_sink.py``) with generated statements
  — every reference ``db_*`` asset has a named counterpart in
  :data:`SERVING_TABLES`;
- the DDL generator is dialect-parameterized (engine clause injectable)
  instead of hard-coding Aria, and statements can be inspected/tested
  without a database;
- indexes are declared with intent (primary key / unique / covering),
  and are emitted AFTER the bulk load, the only sane order for
  index-build cost at scale.

Column physical types follow the reference's choices (unsigned ints for
dense ids, ``bigint`` for piece ids whose count exceeds 2^32, ``date``
for publication dates, ``text`` for unbounded strings) — those widths
are the serving design being mirrored, not incidental.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from hpc_hd_textreuse_etl_spark.sources.jdbc_sink import (
    DEFAULT_BATCH_SIZE,
    JdbcTarget,
    load_table,
)

#: the reference's storage clause (Aria, no page checksums, bulk-load
#: friendly); swap for InnoDB/other targets via ``engine_clause=``.
DEFAULT_ENGINE_CLAUSE = "ENGINE=Aria PAGE_CHECKSUM=0 TRANSACTIONAL=0"


@dataclass(frozen=True)
class Column:
    name: str
    sql_type: str
    nullable: bool = True

    def ddl(self) -> str:
        null = "DEFAULT NULL" if self.nullable else "NOT NULL"
        return f"`{self.name}` {self.sql_type} {null}"


@dataclass(frozen=True)
class Index:
    name: str
    columns: tuple[str, ...]
    unique: bool = False

    def ddl(self, table: str) -> str:
        cols = ", ".join(f"`{c}`" for c in self.columns)
        kind = "UNIQUE KEY" if self.unique else "INDEX IF NOT EXISTS"
        return f"ALTER TABLE `{table}` ADD {kind} `{self.name}` ({cols})"


@dataclass(frozen=True)
class ServingTableSpec:
    name: str
    columns: tuple[Column, ...]
    primary_key: tuple[str, ...] = ()
    indexes: tuple[Index, ...] = ()
    reference: str = ""  # database_assets file:line the spec mirrors

    def create_sql(self, engine_clause: str = DEFAULT_ENGINE_CLAUSE) -> str:
        body = ",\n  ".join(c.ddl() for c in self.columns)
        return (
            f"CREATE TABLE IF NOT EXISTS `{self.name}` (\n  {body}\n)"
            f" {engine_clause}"
        )

    def index_sql(self) -> list[str]:
        out: list[str] = []
        if self.primary_key:
            cols = ", ".join(f"`{c}`" for c in self.primary_key)
            out.append(f"ALTER TABLE `{self.name}` ADD PRIMARY KEY ({cols})")
        out.extend(ix.ddl(self.name) for ix in self.indexes)
        return out


def _id(name: str) -> Column:
    return Column(name, "int(11) unsigned", nullable=False)


def _opt_int(name: str) -> Column:
    return Column(name, "int(11) unsigned")


def _spec(
    name: str,
    columns: tuple[Column, ...],
    pk: tuple[str, ...] = (),
    indexes: tuple[Index, ...] = (),
    ref: str = "",
) -> ServingTableSpec:
    return ServingTableSpec(name, columns, pk, indexes, ref)


#: every bulk-load site in the reference's database_assets/, by table.
SERVING_TABLES: dict[str, ServingTableSpec] = {
    s.name: s
    for s in [
        # --- ids_and_mappings.py ------------------------------------
        _spec(
            "textreuse_ids",
            (
                _id("trs_id"),
                Column("text_name", "varchar(100)"),
                Column("manifestation_id", "varchar(100)"),
                Column("structure_name", "varchar(100)"),
            ),
            pk=("trs_id",),
            indexes=(
                Index("manifestation_trs_composite", ("manifestation_id", "trs_id")),
            ),
            ref="database_assets/ids_and_mappings.py:14-26",
        ),
        _spec(
            "manifestation_ids",
            (_id("manifestation_id_i"), Column("manifestation_id", "varchar(100)")),
            pk=("manifestation_id_i",),
            indexes=(
                Index(
                    "manifestation_covering",
                    ("manifestation_id", "manifestation_id_i"),
                ),
            ),
            ref="database_assets/ids_and_mappings.py:38-49",
        ),
        _spec(
            "edition_ids",
            (_id("edition_id_i"), Column("edition_id", "varchar(100)")),
            pk=("edition_id_i",),
            indexes=(Index("edition_covering", ("edition_id", "edition_id_i")),),
            ref="database_assets/ids_and_mappings.py:61-72",
        ),
        _spec(
            "work_ids",
            (_id("work_id_i"), Column("work_id", "varchar(2858)")),
            pk=("work_id_i",),
            ref="database_assets/ids_and_mappings.py:84-93",
        ),
        _spec(
            "textreuse_manifestation_mapping",
            (_id("trs_id"), _id("manifestation_id_i")),
            indexes=(
                Index("trs_id", ("trs_id",)),
                Index("manifestation_id_i", ("manifestation_id_i",)),
            ),
            ref="database_assets/ids_and_mappings.py:104-113",
        ),
        _spec(
            "textreuse_work_mapping",
            (_id("trs_id"), _id("work_id_i")),
            indexes=(
                Index("trs_id", ("trs_id",)),
                Index("work_id_i", ("work_id_i",)),
            ),
            ref="database_assets/ids_and_mappings.py:125-134",
        ),
        _spec(
            "textreuse_edition_mapping",
            (_id("trs_id"), _id("edition_id_i")),
            indexes=(
                Index("trs_id", ("trs_id",)),
                Index("edition_id_i", ("edition_id_i",)),
            ),
            ref="database_assets/ids_and_mappings.py:146-155",
        ),
        _spec(
            "edition_mapping",
            (_id("manifestation_id_i"), _id("edition_id_i")),
            indexes=(
                Index("manifestation_id_i", ("manifestation_id_i",)),
                Index("edition_id_i", ("edition_id_i",)),
            ),
            ref="database_assets/ids_and_mappings.py:167-176",
        ),
        _spec(
            "work_mapping",
            (_id("manifestation_id_i"), _id("work_id_i")),
            indexes=(
                Index("manifestation_id_i", ("manifestation_id_i",)),
                Index("work_id_i", ("work_id_i",)),
            ),
            ref="database_assets/ids_and_mappings.py:188-197",
        ),
        # --- downstream_metadata.py ---------------------------------
        _spec(
            "manifestation_publication_date",
            (_id("manifestation_id_i"), Column("publication_date", "date")),
            pk=("manifestation_id_i",),
            ref="database_assets/downstream_metadata.py:11-24",
        ),
        _spec(
            "edition_publication_date",
            (_id("edition_id_i"), Column("publication_date", "date")),
            # no PK: editions can carry several candidate dates; the
            # covering index serves the (id → date) lookup instead
            indexes=(
                Index("edition_covering", ("edition_id_i", "publication_date")),
            ),
            ref="database_assets/downstream_metadata.py:31-45",
        ),
        _spec(
            "work_earliest_publication_date",
            (_id("work_id_i"), Column("publication_date", "date")),
            pk=("work_id_i",),
            ref="database_assets/downstream_metadata.py:52-66",
        ),
        _spec(
            "manifestation_title",
            (_id("manifestation_id_i"), Column("title", "text")),
            pk=("manifestation_id_i",),
            ref="database_assets/downstream_metadata.py:73-86",
        ),
        _spec(
            "actor_ids",
            (
                _id("actor_id_i"),
                Column("actor_id", "varchar(100)"),
                Column("name_unified", "text"),
            ),
            pk=("actor_id_i",),
            indexes=(Index("actor_composite", ("actor_id", "actor_id_i")),),
            ref="database_assets/downstream_metadata.py:93-108",
        ),
        _spec(
            "edition_authors",
            (_id("edition_id_i"), _opt_int("actor_id_i")),
            indexes=(
                Index("edition_id_i", ("edition_id_i",)),
                Index("actor_id_i", ("actor_id_i",)),
            ),
            ref="database_assets/downstream_metadata.py:115-129",
        ),
        _spec(
            "textreuse_source_lengths",
            (_id("trs_id"), _opt_int("text_length")),
            pk=("trs_id",),
            ref="database_assets/downstream_metadata.py:136-151",
        ),
        # --- downstream_clusters.py ---------------------------------
        _spec(
            "clustered_defrag_pieces",
            (
                Column("piece_id", "bigint(20) unsigned", nullable=False),
                _id("cluster_id"),
            ),
            pk=("piece_id",),
            indexes=(Index("cluster_covering", ("cluster_id", "piece_id")),),
            ref="database_assets/downstream_clusters.py:9-29",
        ),
        _spec(
            "earliest_manifestation_and_pieces_by_cluster",
            (
                _id("cluster_id"),
                _id("manifestation_id_i"),
                Column("piece_id", "bigint(20) unsigned", nullable=False),
            ),
            indexes=(
                Index("cluster_id", ("cluster_id",)),
                Index("manifestation_id_i", ("manifestation_id_i",)),
                Index("piece_id", ("piece_id",)),
            ),
            ref="database_assets/downstream_clusters.py:31-53",
        ),
        # --- reception.py -------------------------------------------
        _spec(
            "reception_edges_denorm",
            (
                _id("src_trs_id"),
                Column("src_trs_start", "int(11) unsigned", nullable=False),
                Column("src_trs_end", "int(11) unsigned", nullable=False),
                _id("dst_trs_id"),
                Column("dst_trs_start", "int(11) unsigned", nullable=False),
                Column("dst_trs_end", "int(11) unsigned", nullable=False),
            ),
            indexes=(
                Index("src_trs_id", ("src_trs_id",)),
                Index("dst_trs_id", ("dst_trs_id",)),
            ),
            ref="database_assets/reception.py:7-28",
        ),
        _spec(
            "non_source_pieces",
            (
                _id("cluster_id"),
                Column("piece_id", "bigint(20) unsigned", nullable=False),
            ),
            # both directions covered, both unique: (cluster → pieces)
            # for reception expansion, (piece → cluster) for membership
            indexes=(
                Index("cluster_covering", ("cluster_id", "piece_id"), unique=True),
                Index("piece_covering", ("piece_id", "cluster_id"), unique=True),
            ),
            ref="database_assets/reception.py:30-52",
        ),
        # --- coverages.py -------------------------------------------
        _spec(
            "coverages",
            (
                _id("trs1_id"),
                _opt_int("t1_reuses"),
                _opt_int("reuse_t1_t2"),
                _opt_int("t1_length"),
                Column("coverage_t1_t2", "double unsigned"),
                _id("trs2_id"),
                _opt_int("t2_reuses"),
                _opt_int("reuse_t2_t1"),
                _opt_int("t2_length"),
                Column("coverage_t2_t1", "double unsigned"),
            ),
            indexes=(
                Index("trs1_id", ("trs1_id",)),
                Index("coverage_t1_t2", ("coverage_t1_t2",)),
                Index("trs2_id", ("trs2_id",)),
                Index("coverage_t2_t1", ("coverage_t2_t1",)),
            ),
            ref="database_assets/coverages.py:40-67",
        ),
        _spec(
            "reception_inception_coverages",
            (
                _id("src_trs_id"),
                _opt_int("num_reuses_src"),
                _opt_int("reuses_src_in_dst"),
                _opt_int("src_length"),
                Column("coverage_src_in_dst", "double unsigned"),
                _id("dst_trs_id"),
                _opt_int("num_reuses_dst"),
                _opt_int("reuses_dst_in_src"),
                _opt_int("dst_length"),
                Column("coverage_dst_in_src", "double unsigned"),
            ),
            indexes=(
                Index("src_trs_id", ("src_trs_id",)),
                Index("reception", ("coverage_src_in_dst",)),
                Index("dst_trs_id", ("dst_trs_id",)),
                Index("inception", ("coverage_dst_in_src",)),
            ),
            ref="database_assets/coverages.py:6-37",
        ),
        # --- additional_assets/book_based.py -------------------------
        # The book-based serving trio ("additional_assets_for_ville"):
        # same analytics as the manifestation-level tables but restricted
        # to book-typed sources (plans/textreuse.py restricted_reception
        # and the book inception coverages produce the data).
        _spec(
            "earliest_book_and_pieces_by_cluster",
            (
                _id("cluster_id"),
                _id("manifestation_id_i"),
                Column("piece_id", "bigint(20) unsigned", nullable=False),
            ),
            indexes=(
                Index("cluster_id", ("cluster_id",)),
                Index("manifestation_id_i", ("manifestation_id_i",)),
                Index("piece_id", ("piece_id",)),
            ),
            ref="additional_assets/book_based.py:293-311",
        ),
        _spec(
            "reception_edges_between_books_denorm",
            (
                _id("src_trs_id"),
                _id("src_trs_start"),
                _id("src_trs_end"),
                _id("dst_trs_id"),
                _id("dst_trs_start"),
                _id("dst_trs_end"),
            ),
            indexes=(
                Index("src_trs_id", ("src_trs_id",)),
                Index("dst_trs_id", ("dst_trs_id",)),
            ),
            ref="additional_assets/book_based.py:317-338",
        ),
        _spec(
            "reception_inception_between_book_coverages",
            (
                _id("src_trs_id"),
                _opt_int("num_reuses_src"),
                _opt_int("reuses_src_in_dst"),
                _opt_int("src_length"),
                Column("coverage_src_in_dst", "double unsigned"),
                _id("dst_trs_id"),
                _opt_int("num_reuses_dst"),
                _opt_int("reuses_dst_in_src"),
                _opt_int("dst_length"),
                Column("coverage_dst_in_src", "double unsigned"),
            ),
            indexes=(
                Index("src_trs_id", ("src_trs_id",)),
                Index("reception", ("coverage_src_in_dst",)),
                Index("dst_trs_id", ("dst_trs_id",)),
                Index("inception", ("coverage_dst_in_src",)),
            ),
            ref="additional_assets/book_based.py:344-375",
        ),
    ]
}


def load_serving_table(
    df: DataFrame,
    target: JdbcTarget,
    name: str,
    execute_sql: Callable[[str], object] | None = None,
    fetch_count: Callable[[str], int] | None = None,
    engine_clause: str = DEFAULT_ENGINE_CLAUSE,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> dict[str, object]:
    """Bulk-load ``df`` into serving table ``name`` with its declared
    physical design: generated CREATE TABLE first, indexes built AFTER
    the load (jdbc_sink.load_table enforces the ordering + row-count
    assert). Raises ``KeyError`` for tables without a spec — serving
    tables must be declared, not improvised."""
    spec = SERVING_TABLES[name]
    missing = [c.name for c in spec.columns if c.name not in df.columns]
    if missing:
        raise ValueError(
            f"{name}: DataFrame lacks declared serving columns {missing}"
        )
    return load_table(
        df.select(*[c.name for c in spec.columns]),  # declared order
        target,
        name,
        ddl=spec.create_sql(engine_clause),
        indexes=spec.index_sql(),
        execute_sql=execute_sql,
        fetch_count=fetch_count,
        batch_size=batch_size,
    )

"""Zip-of-JSONL distributed scan.

The reference ingests BLAST hits as a zip archive of JSONL members
streamed from object storage: the driver lists members, parallelizes the
member list, and every task re-opens the archive and parses its members
(``etl_textreuse/assets/raw_textreuses.py:43-68,80-133``; reused for raw
texts at ``assets/raw_texts.py:26-73``). Same architecture here — it is
the right Spark pattern for an archive format Hadoop can't split — with
two generalizations:

- the opener is pluggable (local file by default; anything fsspec-like,
  e.g. smart_open for s3://, can be injected), gated behind import-try
  so no extra dependency is required;
- rows cross the Python→JVM boundary through ``createDataFrame`` with an
  explicit schema (never inference), and member→partition assignment
  carries no meaning downstream (ids are assigned by sorted dense-id
  steps later), which keeps ingestion replayable at any parallelism.
"""

from __future__ import annotations

import io
import json
import zipfile
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _default_opener(path: str) -> io.BufferedIOBase:
    """Open the archive for random access. Local filesystem by default;
    s3:// and friends via smart_open when available."""
    if "://" in path and not path.startswith("file://"):
        try:
            from smart_open import open as s_open  # type: ignore

            return s_open(path, "rb")
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                f"reading {path} needs smart_open; not installed"
            ) from e
    return open(path.removeprefix("file://"), "rb")


def list_members(path: str, opener: Callable = _default_opener) -> list[str]:
    with opener(path) as fh, zipfile.ZipFile(fh) as zf:
        return [i.filename for i in zf.infolist() if not i.is_dir()]


def read_zip_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    num_partitions: int = 200,
    opener: Callable = _default_opener,
    member_filter: Callable[[str], bool] | None = None,
) -> DataFrame:
    """Parse every JSONL member of a zip archive into a DataFrame.

    Each task opens its own handle (executors never share file objects)
    and yields parsed dicts; malformed lines raise — ingestion is the
    one place where failing loudly beats silent row loss.
    """
    members = list_members(path, opener)
    if member_filter:
        members = [m for m in members if member_filter(m)]
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    field_names = [f.name for f in schema.fields]

    def process_partition(member_names: Iterator[str]) -> Iterator[tuple]:
        names = list(member_names)
        if not names:
            return
        with opener(path) as fh, zipfile.ZipFile(fh) as zf:
            for name in names:
                with zf.open(name) as member:
                    for line in io.TextIOWrapper(member, encoding="utf-8"):
                        line = line.strip()
                        if not line:
                            continue
                        obj = json.loads(line)
                        yield tuple(obj.get(k) for k in field_names)

    n = max(1, min(num_partitions, len(members)))
    rdd = spark.sparkContext.parallelize(members, n).mapPartitions(process_partition)
    return spark.createDataFrame(rdd, schema)


def read_jsonl_files(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """JSONL already exploded to plain files: the fully JVM-side path
    (``spark.read.text`` + ``from_json`` with an explicit schema — no
    Python parsing at all). Prefer this whenever the archive can be
    pre-exploded; the zip scan above exists for archives that can't be."""
    from pyspark.sql import functions as F

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    lines = spark.read.text(path).filter(F.trim("value") != "")
    return lines.select(
        F.from_json(F.col("value"), schema).alias("j")
    ).select("j.*")

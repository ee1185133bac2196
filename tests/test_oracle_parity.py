"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (fast local gate; the driver re-runs the same contract at sf0.01)."""

from __future__ import annotations

import pytest

from hpc_hd_textreuse_etl_spark.plans.queries import QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare_spark_duckdb, duckdb_connection

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)

#: Parameterizations costing >30 s EACH at sf0.001 (iterative
#: trainer / CW / composed-curation chains — the cost is their pinned
#: iteration counts, not the data). Default-off via the `slow` marker
#: so the driver's pytest window completes (round-12); their value is
#: re-proven every round by the external driver's own DuckDB gate and
#: the builder's full-registry replica at sf0.01 (examples/
#: correctness.py), which run the SAME comparison at a larger SF.
_SLOW = {
    "cw_intra_edge_fraction",
    "curated_corpus",
    "semantic_dedup_verdicts",
    "cw_component_invariant",
    "minhash_delta_near_duplicates",
    "chinese_whispers_clusters",
}


def _params(names):
    return [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW else n
        for n in names
    ]


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_SMOKE)
    yield con
    con.close()


def _assert_no_raw_timestamps(name, df):
    """Contract rule: collected TIMESTAMP columns render in the PROCESS
    timezone (not the session conf), so a raw timestamp output breaks
    the value gate in any non-UTC driver environment. Emit epoch-µs
    bigints (unix_micros / epoch_us) instead."""
    ts = [f.name for f in df.schema.fields if "timestamp" in f.dataType.simpleString()]
    assert not ts, f"{name}: raw timestamp output columns {ts} — emit unix_micros"


@pytest.mark.parametrize("name", _params(ORACLE_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    df = spec.builder(spark, SF_SMOKE)
    _assert_no_raw_timestamps(name, df)
    ok, msg = compare_spark_duckdb(df, duck, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _params(sorted(set(QUERIES) - set(ORACLE_QUERIES))))
def test_query_runs(spark, name):
    """Non-SQL-expressible operators: rows-only smoke (driver parity)."""
    df = QUERIES[name].builder(spark, SF_SMOKE)
    _assert_no_raw_timestamps(name, df)
    assert df.count() >= 0

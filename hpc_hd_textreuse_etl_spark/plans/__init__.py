"""Query/materialization plan registry."""

from hpc_hd_textreuse_etl_spark.plans.queries import QUERIES, QuerySpec  # noqa: F401

"""Loaders for the harness star schema (see repo:TESTDATA.md, repo:FIXTURES.md §1).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always be broadcast in joins.
SMALL_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan. Catalyst prunes columns / pushes filters into this."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for the spark.sql() surface."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)

"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: full KG construction (extract -> dedup ->
               link -> canonicalize) over the deterministic synthetic
               source corpus at sf0.001 scale.
queries()    — one entry per implemented operator family from
               SURVEY.md §2 (+ the training-data-pipeline suite).
oracle_sql() — DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: recognizer-to-triple extraction + entity linking +
    canonicalization on a deterministic synthetic corpus."""
    from octofludb_spark.plans.driver_queries import kg_canonical_triples

    return kg_canonical_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from octofludb_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from octofludb_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)

"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship token-mention KG-construction query
(extract -> link -> dedup-aggregate) on sf0.001; ``queries`` exposes
one entry per implemented operator family from SURVEY.md §2 (plus the
training-data operators); ``oracle_sql`` gives the DuckDB-equivalent
SQL for every SQL-expressible one (see surfactant_spark/queries.py for
the cross-engine determinism rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from surfactant_spark.queries import ORACLE_SQL, QUERIES, q_kg_edges


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents -> (subj, Uses, obj) edge table with
    evidence counts, at sf0.001."""
    return q_kg_edges(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # the link-family oracles SELECT from staged fixture parquets;
    # staging is idempotent and cheap, so ensure it here in case the
    # oracle side runs before the Spark side
    from surfactant_spark.fixtures import stage_link_fixtures

    stage_link_fixtures()
    return dict(ORACLE_SQL)

"""Query registry: the driver-facing inventory of implemented operators.

Each operator module registers ``QuerySpec``s; ``__spark_entry__.py``
aggregates them into ``queries()`` / ``oracle_sql()``. A spec pairs a
Spark plan builder with the equivalent ANSI SQL a DuckDB oracle runs
over the same parquet views (None → driver does a rows-only check,
for ops whose semantics aren't SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def collect_all() -> dict[str, QuerySpec]:
    """Import every operator module and merge their registries."""
    from .operators import relational, scalar, stateful
    from .functions import lorawan_queries
    from .llm import curate, dedup, multimodal, pipeline, similarity, text
    from .streaming import pipeline_queries

    merged: dict[str, QuerySpec] = {}
    for mod in (
        scalar,
        relational,
        stateful,
        dedup,
        similarity,
        text,
        multimodal,
        pipeline,
        curate,
        lorawan_queries,
        pipeline_queries,
    ):
        for spec in mod.QUERIES:
            if spec.name in merged:
                raise ValueError(f"duplicate query name: {spec.name}")
            merged[spec.name] = spec
    return merged

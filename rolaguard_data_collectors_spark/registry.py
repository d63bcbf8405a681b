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


def _bootstrapped(build: Callable) -> Callable:
    """Run the executor-pythonpath bootstrap BEFORE any build code.

    Spark snapshots ``sc._python_includes`` into each Python UDF
    wrapper at plan-construction time — a build that creates a UDF
    (e.g. a local-relation golden leg) before its first load_table
    call captures an EMPTY include list, and in a fresh session
    launched from a foreign CWD its tasks then die with
    ModuleNotFoundError on the workers. Bootstrapping at the top of
    every registered build makes query build order irrelevant."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .bootstrap import ensure_executor_pythonpath

        ensure_executor_pythonpath(spark)
        return build(spark, sf_dir)

    run.__wrapped__ = build
    run.__name__ = getattr(build, "__name__", "build")
    run.__module__ = getattr(build, "__module__", run.__module__)
    run.__doc__ = build.__doc__
    return run


def collect_all() -> dict[str, QuerySpec]:
    """Import every operator module and merge their registries."""
    from .operators import relational, scalar, stateful
    from .functions import lorawan_queries
    from .llm import (
        components,
        curate,
        dedup,
        multimodal,
        pipeline,
        similarity,
        text,
    )
    from .streaming import pipeline_queries

    merged: dict[str, QuerySpec] = {}
    for mod in (
        scalar,
        relational,
        stateful,
        dedup,
        components,
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
            merged[spec.name] = QuerySpec(
                spec.name, _bootstrapped(spec.build), spec.oracle, spec.doc
            )
    return merged

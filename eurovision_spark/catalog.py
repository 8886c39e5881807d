"""Query catalog: the engine's public query surface.

Every operator from SURVEY §2 (and the beyond-reference training-data
ops) is registered here as a ``QuerySpec``: a Spark DataFrame builder
plus, when SQL-expressible, a DuckDB-runnable oracle SQL string with
IDENTICAL output column names. ``__spark_entry__.py`` exposes this
registry to the driver.

Conventions that keep the two engines hash-identical:
- alias every computed column, same name both sides;
- avoid raw timestamps in outputs (format to 'yyyy-MM-dd' strings);
- round any float that went through re-associated arithmetic (sums,
  averages, dot products); pass-through floats are exact;
- cast counts/sums of integers to BIGINT on the DuckDB side (DuckDB
  widens to INT128 where Spark stays at LONG);
- deterministic collections: sort arrays before joining to strings;
  deterministic top-k: always a unique tie-break key in the ORDER BY.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    # DuckDB SQL; None => rows-only check (non-SQL op). A callable
    # (sf_dir -> SQL) builds the oracle at check time for queries whose
    # oracle embeds data-derived constants (e.g. cosine_ivf's k-means
    # codebook literals) — resolve via ``resolve_oracle``.
    oracle: str | Callable[[str], str] | None
    doc: str = ""
    # The driver's correctness harness runs at most 50 catalog entries,
    # so the driver-facing surface (``__spark_entry__.queries()``) is a
    # consolidated set of exactly 50: closely-related operators are
    # certified together through one merged query (e.g. ``doc_profile``
    # carries token_stats + lang_guess + quality_score + fingerprint +
    # bpe_token_count column-for-column). Entries with ``driver=False``
    # stay first-class catalog queries — runnable, benchable, verified
    # by tools/verify_local.py and pytest — but are subsumed by a
    # driver-facing twin for the hard CORRECTNESS gate.
    driver: bool = True


_REGISTRY: dict[str, QuerySpec] = {}


def resolve_oracle(spec: "QuerySpec", sf_dir: str) -> str | None:
    """The oracle SQL for ``spec`` against the tables under ``sf_dir``
    (static string passthrough; callables are invoked with sf_dir)."""
    if spec.oracle is None:
        return None
    return spec.oracle(sf_dir) if callable(spec.oracle) else spec.oracle


def register(
    name: str,
    oracle: str | Callable[[str], str] | None,
    doc: str = "",
    driver: bool = True,
):
    """Decorator: add a (spark_fn, oracle_sql) pair to the catalog."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc, driver)
        return fn

    return wrap


def registry() -> dict[str, QuerySpec]:
    """All registered queries (importing the op modules populates it)."""
    # imports are deferred so `import eurovision_spark` stays light
    from eurovision_spark.plans import olap  # noqa: F401
    from eurovision_spark.plans import relational  # noqa: F401
    from eurovision_spark.operators import analytics  # noqa: F401
    from eurovision_spark.operators import dedup  # noqa: F401
    from eurovision_spark.operators import entity  # noqa: F401
    from eurovision_spark.operators import imp_dedup  # noqa: F401
    from eurovision_spark.operators import multimodal  # noqa: F401
    from eurovision_spark.operators import pipeline  # noqa: F401
    from eurovision_spark.operators import similarity  # noqa: F401
    from eurovision_spark.operators import temporal  # noqa: F401
    from eurovision_spark.operators import textstats  # noqa: F401

    return dict(_REGISTRY)

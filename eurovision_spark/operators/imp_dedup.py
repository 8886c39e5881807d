"""Fuzzy any-key-equal dedup — the reference's IMP merge, generalized.

Reference semantics (scan.py:135-188, README.md:27): within one trial,
IMP entries merge when ANY of {trade, product, code} is non-empty and
exactly equal; merged entries keep the SHORTER non-empty trade/product
and fill remaining blanks. The pass structure makes merging effectively
transitive, so the order-insensitive formalization is **connected
components over the "shares a non-empty key value" graph** per group
(SURVEY §2.4 A7, §7 hard item 4 — fixtures pin the CC answer).

Implementation: iterative min-label propagation with DataFrame
self-joins — no GraphFrames dependency, no Python in the loop body.
Each round: per (group, key-value) compute the min component label and
broadcast it back to members; repeat until a fixpoint. Rounds needed =
graph diameter in "key hops", which for entity-dedup graphs is tiny
(IMP lists are < 10 entries). Every round is two shuffles on
(group, key) / (group, entry) — scalable; intermediate results are
persisted and lineage is cut so plans don't snowball.

Survivor policy (deterministic, order-insensitive):
- trade / product: shortest non-empty value, ties -> lexicographic min
  (scan.py:168-174 "take the shorter name");
- code: non-empty value of the lowest entry id (scan.py:176-179
  blank-fill keeps the earliest surviving value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eurovision_spark.functions import nullif_empty


def connected_components_any_key(
    entries: DataFrame,
    group_col: str,
    entry_col: str,
    key_cols: list[str],
    max_iter: int = 20,
) -> DataFrame:
    """Label each row with ``comp`` = min ``entry_col`` reachable through
    chains of shared non-null key values within ``group_col``.

    ``entry_col`` must be unique within a group and orderable.
    """
    df = entries.withColumn("comp", F.col(entry_col)).persist()
    # labels only ever decrease, so the label sum strictly decreases
    # until fixpoint — an O(1)-row aggregate replaces a diff self-join;
    # each round reuses the previous round's sum (one agg per round)
    prev_sum = df.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter):
        new_df = df
        for k in key_cols:
            mins = (
                new_df.filter(F.col(k).isNotNull())
                .groupBy(group_col, k)
                .agg(F.min("comp").alias(f"_min_{k}"))
            )
            new_df = new_df.join(mins, [group_col, k], "left").withColumn(
                "comp", F.least(F.col("comp"), F.coalesce(F.col(f"_min_{k}"), F.col("comp")))
            ).drop(f"_min_{k}")
        new_df = new_df.persist()
        new_sum = new_df.agg(F.sum("comp")).collect()[0][0]
        df.unpersist()
        df = new_df
        if prev_sum == new_sum:
            break
        prev_sum = new_sum
    return df


def cc_within_groups(
    entries: DataFrame,
    group_col: str,
    entry_col: str,
    key_cols: list[str],
) -> DataFrame:
    """Bounded-group connected components: union-find per group inside
    ``applyInPandas`` — ONE shuffle on the group key, zero iterations.

    Same closure as :func:`connected_components_any_key` (comp = min
    entry id reachable via shared non-null key values), chosen when
    components cannot outgrow a group and groups fit in memory — true
    by construction for IMP lists (< 10 entries per trial,
    README.md:27). The iterative-join variant remains the fallback for
    unbounded components; this one replaces a 10-20 job loop with a
    single Arrow-batched pass (measured ~20s -> <2s on an 868k-line
    parse).
    """
    import pandas as pd
    from pyspark.sql import types as T

    # NB: StructType.add mutates in place — never call it on a live
    # DataFrame's schema object
    out_schema = T.StructType(
        list(entries.schema.fields)
        + [T.StructField("comp", entries.schema[entry_col].dataType)]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        parent = list(range(n))

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for k in key_cols:
            first: dict = {}
            for i, v in enumerate(pdf[k]):
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                if v in first:
                    ra, rb = find(first[v]), find(i)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
                else:
                    first[v] = i
        entry = list(pdf[entry_col])
        comp_min: dict[int, object] = {}
        for i in range(n):
            r = find(i)
            if r not in comp_min or entry[i] < comp_min[r]:
                comp_min[r] = entry[i]
        pdf = pdf.copy()
        pdf["comp"] = [comp_min[find(i)] for i in range(n)]
        return pdf

    return entries.groupBy(group_col).applyInPandas(fn, out_schema)


def _shortest_non_empty(col: Column) -> Column:
    c = nullif_empty(col)
    return F.min(F.when(c.isNotNull(), F.struct(F.length(c).alias("l"), c.alias("v"))))["v"]


def _earliest_non_empty(col: Column, order: Column) -> Column:
    c = nullif_empty(col)
    return F.min(F.when(c.isNotNull(), F.struct(order.alias("o"), c.alias("v"))))["v"]


def dedup_imps(imps: DataFrame, entry_col: str = "entry_id") -> DataFrame:
    """Merge IMP entries per trial (reference scan.py:148-188).

    Input columns: eudract_id, ``entry_col``, trade, product, code
    ('' or NULL = missing). Output: one row per merged IMP with the
    survivor fields, reference's '' -for-missing convention restored.
    """
    norm = imps.select(
        "eudract_id",
        F.col(entry_col).alias("entry_id"),
        nullif_empty(F.col("trade")).alias("trade"),
        nullif_empty(F.col("product")).alias("product"),
        nullif_empty(F.col("code")).alias("code"),
    )
    # bounded groups by construction (IMP lists < 10 entries/trial) ->
    # the single-pass per-group union-find, not the iterative join loop
    labeled = cc_within_groups(
        norm, "eudract_id", "entry_id", ["trade", "product", "code"]
    )
    merged = labeled.groupBy("eudract_id", "comp").agg(
        _shortest_non_empty(F.col("trade")).alias("trade"),
        _shortest_non_empty(F.col("product")).alias("product"),
        _earliest_non_empty(F.col("code"), F.col("entry_id")).alias("code"),
    )
    return merged.select(
        "eudract_id",
        F.coalesce("trade", F.lit("")).alias("trade"),
        F.coalesce("product", F.lit("")).alias("product"),
        F.coalesce("code", F.lit("")).alias("code"),
    )


# ---------------------------------------------------------------------------
# Catalog registration: the generalized A7 on the star schema, with a
# recursive-CTE oracle (label propagation is expressible in DuckDB SQL,
# so even this "non-relational" operator gets a full correctness gate).
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession, Window as W  # noqa: E402

from eurovision_spark.catalog import register  # noqa: E402
from eurovision_spark.sources import load_table  # noqa: E402

FUZZY_CC_ORACLE = """
WITH RECURSIVE
base AS (
    SELECT l_orderkey, l_partkey, l_suppkey,
           row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice)
               AS entry_id
    FROM lineitem),
edges AS (
    SELECT a.l_orderkey, a.entry_id AS src, b.entry_id AS dst
    FROM base a JOIN base b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey = b.l_partkey
         AND a.entry_id <> b.entry_id
    UNION
    SELECT a.l_orderkey, a.entry_id, b.entry_id
    FROM base a JOIN base b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey = b.l_suppkey
         AND a.entry_id <> b.entry_id),
lbl AS (
    SELECT l_orderkey, entry_id AS node, entry_id AS comp FROM base
    UNION
    SELECT e.l_orderkey, e.dst, l.comp
    FROM lbl l JOIN edges e
      ON e.l_orderkey = l.l_orderkey AND e.src = l.node
    WHERE l.comp < e.dst)
SELECT l_orderkey, CAST(node AS BIGINT) AS entry_id, CAST(min(comp) AS BIGINT) AS comp
FROM lbl GROUP BY l_orderkey, node
"""


@register(
    "fuzzy_cc_dedup",
    FUZZY_CC_ORACLE,
    "scan.py:135-188 any-key-equal fuzzy merge generalized: connected "
    "components per group (keys: l_partkey, l_suppkey) via iterative "
    "min-label propagation. Oracle: recursive-CTE label propagation in "
    "DuckDB — full hash gate even for the graph operator.",
)
def fuzzy_cc_dedup(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    base = li.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.row_number().over(w).cast("bigint").alias("entry_id"),
    )
    labeled = connected_components_any_key(
        base, "l_orderkey", "entry_id", ["l_partkey", "l_suppkey"]
    )
    return labeled.select("l_orderkey", "entry_id", F.col("comp").cast("bigint").alias("comp"))

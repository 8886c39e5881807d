"""Entity-resolution string-similarity join.

The reference merges "fuzzy IMP" duplicates by shared (trade, code)
keys (scan.py:455-497 — exact keys, transitive closure); the general
entity-resolution problem also needs NEAR-identical key detection:
identifiers that differ by one typo'd character. All-pairs Levenshtein
is O(n²) and dead at scale, so the engine ships the lossless blocked
formulation instead.

Blocking scheme (equal-width identifiers, edit distance ≤ 1): for
strings of EQUAL length, levenshtein(a, b) <= 1 is exactly "at most one
substituted position" (an insert or delete would change the length).
Partition the character positions into two sets — here the odd and the
even positions, extracted with one regexp each — and a pair with at
most one mismatching position must agree EXACTLY on at least one of the
two projections (the mismatch lies in only one set). So the candidate
set is the union of two equi-joins on (length, projection) keys:
provably lossless, never all-pairs. Position-interleaved keys (rather
than contiguous halves) keep both keys high-entropy when identifiers
share a constant prefix — "Customer#0000..." would make a prefix-half
key degenerate into a cross join.

At 100 TB: two shuffles on short (length, key) strings, candidate
volume ∝ within-block collisions, and the Levenshtein verify runs only
on candidates — the same candidates-then-verify shape as the MinHash
LSH tier (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eurovision_spark.catalog import register
from eurovision_spark.sources import load_table

# keep the 1st, 3rd, 5th... characters / the 2nd, 4th, 6th... ones —
# the two position-parity projections (group 2 is optional so odd-length
# strings keep their trailing character in the even projection)
_EVEN_RE = "(.)(.?)"


@register(
    "id_typo_pairs",
    r"""
    WITH c AS (
        SELECT c_custkey, c_name, length(c_name) AS ln,
               regexp_replace(c_name, '(.)(.?)', '\1', 'g') AS k_even,
               regexp_replace(c_name, '(.)(.?)', '\2', 'g') AS k_odd
        FROM customer),
    cand AS (
        SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
               a.c_name AS name_a, b.c_name AS name_b
        FROM c a JOIN c b
          ON a.ln = b.ln AND a.k_even = b.k_even
         AND a.c_custkey < b.c_custkey
        UNION
        SELECT a.c_custkey, b.c_custkey, a.c_name, b.c_name
        FROM c a JOIN c b
          ON a.ln = b.ln AND a.k_odd = b.k_odd
         AND a.c_custkey < b.c_custkey)
    SELECT custkey_a, custkey_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS edit_dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 1
    """,
    "identifier-typo similarity join (entity resolution): customer-name "
    "pairs within edit distance 1. Equal-length strings bound "
    "levenshtein<=1 to a single substituted position, so partitioning "
    "the positions by parity gives two projection keys of which a true "
    "pair must match at least one EXACTLY — the candidate set is a "
    "union of two equi-joins (lossless by pigeonhole), then the exact "
    "Levenshtein verifies candidates only. Interleaved positions keep "
    "both keys high-entropy under the shared 'Customer#' prefix where "
    "a contiguous-half key would degenerate to a cross join. Same "
    "candidates-then-verify shape as the MinHash LSH tier; at corpus "
    "scale rows move only through equi-key shuffles.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01/0.1 (verify)
)
def id_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.length("c_name").alias("ln"),
        F.regexp_replace(F.col("c_name"), _EVEN_RE, "$1").alias("k_even"),
        F.regexp_replace(F.col("c_name"), _EVEN_RE, "$2").alias("k_odd"),
    )

    def block(key: str) -> DataFrame:
        a = c.select(
            F.col("ln").alias("ln_a"),
            F.col(key).alias("k_a"),
            F.col("c_custkey").alias("custkey_a"),
            F.col("c_name").alias("name_a"),
        )
        b = c.select(
            F.col("ln").alias("ln_b"),
            F.col(key).alias("k_b"),
            F.col("c_custkey").alias("custkey_b"),
            F.col("c_name").alias("name_b"),
        )
        return a.join(
            b,
            (a.ln_a == b.ln_b)
            & (a.k_a == b.k_b)
            & (a.custkey_a < b.custkey_b),
        ).select("custkey_a", "custkey_b", "name_a", "name_b")

    cand = block("k_even").unionByName(block("k_odd")).dropDuplicates(
        ["custkey_a", "custkey_b"]
    )
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.filter(lev <= 1).select(
        "custkey_a",
        "custkey_b",
        "name_a",
        "name_b",
        lev.cast("int").alias("edit_dist"),
    )

"""Entity-resolution string-similarity join.

The reference merges "fuzzy IMP" duplicates by shared (trade, code)
keys (scan.py:455-497 — exact keys, transitive closure); the general
entity-resolution problem also needs NEAR-identical key detection:
identifiers that differ by one typo. All-pairs Levenshtein is O(n²) and
dead at scale, so the engine ships the lossless blocked formulation
instead.

Blocking scheme (edit distance <= 1, ALL three edit kinds):

- SUBSTITUTION (equal lengths): levenshtein(a, b) <= 1 over equal-
  length strings is exactly "at most one substituted position".
  Partition the character positions into two sets — the odd and the
  even positions, extracted with one regexp each — and a pair with at
  most one mismatching position must agree EXACTLY on at least one of
  the two projections (the mismatch lies in only one set). Candidates
  are a union of two equi-joins on (length, projection) keys: lossless
  by pigeonhole, never all-pairs. Position-interleaved keys (rather
  than contiguous halves) keep both keys high-entropy when identifiers
  share a constant prefix — "Customer#0000..." would make a
  prefix-half key degenerate into a cross join.

- INSERTION / DELETION (lengths differ by 1): a distance-1 pair with
  |b| = |a| + 1 means b is a with one character inserted, i.e. ``a``
  is IN b's one-character-DELETION neighborhood. Each string emits its
  |s| deletion variants (hashed to 60-bit longs so only ids + 8-byte
  keys shuffle, never the variant strings); candidates are one
  equi-join of full-name hashes against deletion-variant hashes with a
  length-difference guard. Lossless for the same reason; hash
  collisions can only ADD candidates, and the exact Levenshtein verify
  removes them.

Both candidate families are verified by exact levenshtein <= 1 — the
same candidates-then-verify shape as the MinHash LSH tier
(operators/dedup.py). At 100 TB: equi-key shuffles of short keys only;
the deletion fan-out is |s| rows per identifier (ids + hashes), the
price of covering the most common real-world typo class the
equal-length blocking structurally missed (r05 review item #3 —
closed, with insert AND delete variants pinned on a planted fixture in
tests/test_analytics_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eurovision_spark.catalog import register
from eurovision_spark.operators.textstats import md5_long, md5_long_sql
from eurovision_spark.sources import load_table

# keep the 1st, 3rd, 5th... characters / the 2nd, 4th, 6th... ones —
# the two position-parity projections (group 2 is optional so odd-length
# strings keep their trailing character in the even projection)
_EVEN_RE = "(.)(.?)"

_ORACLE_C = r"""
        SELECT c_custkey, c_name, length(c_name) AS ln,
               regexp_replace(c_name, '(.)(.?)', '\1', 'g') AS k_even,
               regexp_replace(c_name, '(.)(.?)', '\2', 'g') AS k_odd
        FROM customer"""


@register(
    "id_typo_pairs",
    rf"""
    WITH c AS ({_ORACLE_C}),
    dv AS (
        SELECT c_custkey, c_name, ln,
               unnest(list_transform(
                   generate_series(1, ln),
                   i -> {md5_long_sql(
                       "concat(substr(c_name, 1, i - 1), substr(c_name, i + 1))"
                   )})) AS dk
        FROM c),
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
         AND a.c_custkey < b.c_custkey
        UNION
        SELECT least(s.c_custkey, l.c_custkey),
               greatest(s.c_custkey, l.c_custkey),
               CASE WHEN s.c_custkey < l.c_custkey THEN s.c_name ELSE l.c_name END,
               CASE WHEN s.c_custkey < l.c_custkey THEN l.c_name ELSE s.c_name END
        FROM c s JOIN dv l
          ON s.ln + 1 = l.ln AND {md5_long_sql("s.c_name")} = l.dk)
    SELECT custkey_a, custkey_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS edit_dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 1
    """,
    "identifier-typo similarity join (entity resolution): customer-name "
    "pairs within edit distance 1, covering ALL three edit kinds. "
    "Equal-length pairs (substitutions) block on two position-parity "
    "projection keys (lossless by pigeonhole; interleaved positions "
    "stay high-entropy under the shared 'Customer#' prefix). "
    "Length±1 pairs (insertions/deletions — the r05-flagged gap) block "
    "on the one-character-DELETION neighborhood: each name emits its "
    "|s| deletion variants as 60-bit hashes, and a distance-1 unequal-"
    "length pair MUST collide on (shorter's full-name hash = longer's "
    "variant hash). Exact Levenshtein verifies candidates only — hash "
    "collisions add candidates, never results. Same candidates-then-"
    "verify shape as the MinHash LSH tier; rows move only through "
    "equi-key shuffles of ids + short keys.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01/0.1 (verify)
)
def id_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return typo_pair_candidates(c).filter(F.col("edit_dist") <= 1)


def typo_pair_candidates(c: DataFrame) -> DataFrame:
    """(custkey_a < custkey_b, name_a, name_b, edit_dist) candidate
    pairs from a (c_custkey, c_name) frame, blocked losslessly for
    edit distance <= 1 (module docstring) — split from the registered
    query so the planted indel fixture can drive the blocking core
    directly. ``edit_dist`` is UNFILTERED here; the caller applies the
    <= 1 gate (candidates at larger distance are block collisions).

    The projected key frame is persisted: the three blocking branches
    reference it five times, and without the materialization each
    branch re-scans the source and recomputes the regexp projections
    (r05 advice — the tiny (id, name, ln, 2 short keys) frame is the
    right thing to hold, not recompute)."""
    keyed = c.select(
        "c_custkey",
        "c_name",
        F.length("c_name").alias("ln"),
        F.regexp_replace(F.col("c_name"), _EVEN_RE, "$1").alias("k_even"),
        F.regexp_replace(F.col("c_name"), _EVEN_RE, "$2").alias("k_odd"),
    ).persist()

    def block(key: str) -> DataFrame:
        a = keyed.select(
            F.col("ln").alias("ln_a"),
            F.col(key).alias("k_a"),
            F.col("c_custkey").alias("custkey_a"),
            F.col("c_name").alias("name_a"),
        )
        b = keyed.select(
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

    # len±1: deletion-variant hashes of the longer side vs full-name
    # hashes of the shorter — ids + 8-byte keys through the shuffle
    dvar = F.transform(
        F.sequence(F.lit(1), F.col("ln")),
        lambda i: md5_long(
            F.concat(
                F.substring(F.col("c_name"), F.lit(1), i - 1),
                F.substring(F.col("c_name"), i + 1, F.col("ln")),
            )
        ),
    )
    longer = keyed.select(
        F.col("c_custkey").alias("ck_l"),
        F.col("c_name").alias("nm_l"),
        F.col("ln").alias("ln_l"),
        F.explode(dvar).alias("dk"),
    )
    shorter = keyed.select(
        F.col("c_custkey").alias("ck_s"),
        F.col("c_name").alias("nm_s"),
        F.col("ln").alias("ln_s"),
        md5_long(F.col("c_name")).alias("nk"),
    )
    a_first = F.col("ck_s") < F.col("ck_l")
    indel = (
        shorter.join(
            longer,
            (F.col("ln_s") + 1 == F.col("ln_l")) & (F.col("nk") == F.col("dk")),
        )
        .select(
            F.least("ck_s", "ck_l").alias("custkey_a"),
            F.greatest("ck_s", "ck_l").alias("custkey_b"),
            F.when(a_first, F.col("nm_s")).otherwise(F.col("nm_l")).alias("name_a"),
            F.when(a_first, F.col("nm_l")).otherwise(F.col("nm_s")).alias("name_b"),
        )
    )
    cand = (
        block("k_even")
        .unionByName(block("k_odd"))
        .unionByName(indel)
        .dropDuplicates(["custkey_a", "custkey_b"])
    )
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.select(
        "custkey_a",
        "custkey_b",
        "name_a",
        "name_b",
        lev.cast("int").alias("edit_dist"),
    )

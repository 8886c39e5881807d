"""Entity-resolution string-similarity join.

The reference merges "fuzzy IMP" duplicates by shared (trade, code)
keys (scan.py:455-497 — exact keys, transitive closure); the general
entity-resolution problem also needs NEAR-identical key detection:
identifiers that differ by one typo. All-pairs Levenshtein is O(n²) and
dead at scale, so the engine ships the lossless blocked formulation
instead.

Blocking scheme — the one-character EDIT NEIGHBORHOOD, covering all
three edit kinds with candidate volume proportional to TRUE pairs:

- SUBSTITUTION (equal lengths): a distance-1 pair differing at
  position i agrees EXACTLY on "the name with position i masked".
  Each name emits |s| masked-position keys (position baked into the
  key, hashed to a 60-bit long); candidates are one self equi-join on
  the key. Lossless, and — unlike projection blocking — robust to
  LOW-ENTROPY identifiers: a masked key carries all but one character,
  so two names collide only when they really are within one
  substitution (or a 2^-61 hash collision, removed by the verify).
  The r05 parity-projection scheme was lossless too but degenerated on
  zero-padded numeric ids: with 'Customer#000...' names the two
  interleaved projections retain only a few discriminating digits, and
  the x10 scaling probe measured the resulting block blow-up at 248x
  time over 1000x data — the masked-key formulation replaced it on
  that measurement, not on taste.

- INSERTION / DELETION (lengths differ by 1): ``a`` shorter, ``b``
  longer, distance 1 means ``a`` IS one of b's one-character-DELETION
  variants. Each name emits its |s| deletion-variant keys; candidates
  are one equi-join of full-name hashes against variant hashes.

Both families verify with exact levenshtein <= 1 — the same
candidates-then-verify shape as the MinHash LSH tier
(operators/dedup.py). At 100 TB: the explode is |s| (id, 8-byte hash)
rows per identifier, every shuffle is an equi-key shuffle of those
rows, and candidate count tracks the true-duplicate density — the
property the scaling probe's x10 tier gates (planted substitution,
insert, AND delete fixtures pinned against brute force in
tests/test_analytics_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eurovision_spark.catalog import register
from eurovision_spark.operators.textstats import md5_long, md5_long_sql
from eurovision_spark.sources import load_table

# masked-position substitution keys: position ':' name-with-char-i-masked
_SUB_KEY_SQL = md5_long_sql(
    "concat(CAST(i AS VARCHAR), ':', substr(c_name, 1, i - 1), chr(1), "
    "substr(c_name, i + 1))"
)
# deletion-variant keys for the length±1 (indel) family
_DEL_KEY_SQL = md5_long_sql(
    "concat(substr(c_name, 1, i - 1), substr(c_name, i + 1))"
)


@register(
    "id_typo_pairs",
    rf"""
    WITH c AS (SELECT c_custkey, c_name, length(c_name) AS ln FROM customer),
    sub AS (
        SELECT c_custkey, c_name,
               unnest(list_transform(generate_series(1, ln),
                                     i -> {_SUB_KEY_SQL})) AS sk
        FROM c),
    dv AS (
        SELECT c_custkey, c_name, ln,
               unnest(list_transform(generate_series(1, ln),
                                     i -> {_DEL_KEY_SQL})) AS dk
        FROM c),
    cand AS (
        SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
               a.c_name AS name_a, b.c_name AS name_b
        FROM sub a JOIN sub b
          ON a.sk = b.sk AND a.c_custkey < b.c_custkey
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
    "pairs within edit distance 1, covering ALL three edit kinds via "
    "one-character edit-neighborhood blocking. Substitutions: each name "
    "emits |s| masked-position keys (position + name-with-that-char-"
    "masked, as 60-bit hashes), so equal-length distance-1 pairs "
    "collide on exactly one key and candidate volume tracks TRUE pair "
    "density even on low-entropy zero-padded ids (the parity-projection "
    "scheme this replaced measured 248x-over-1000x on the x10 tier; "
    "this one is output-bound). Insertions/deletions: shorter names' "
    "full-name hashes equi-join longer names' deletion-variant hashes. "
    "Exact Levenshtein verifies candidates only — hash collisions add "
    "candidates, never results. Same candidates-then-verify shape as "
    "the MinHash LSH tier; every shuffle moves (id, 8-byte key) rows.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01/0.1 (verify)
)
def id_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return typo_pair_candidates(c).filter(F.col("edit_dist") <= 1)


def typo_pair_candidates(c: DataFrame) -> DataFrame:
    """(custkey_a < custkey_b, name_a, name_b, edit_dist) candidate
    pairs from a (c_custkey, c_name) frame, blocked losslessly for
    edit distance <= 1 (module docstring) — split from the registered
    query so the planted indel/substitution fixtures can drive the
    blocking core directly. ``edit_dist`` is UNFILTERED here; the
    caller applies the <= 1 gate (candidates at larger distance are
    hash-collision noise).

    The keyed frame is persisted once: the substitution self-join and
    both indel sides read it (r05 advice — hold the tiny projected
    frame, don't recompute it per branch)."""
    keyed = c.select(
        "c_custkey", "c_name", F.length("c_name").alias("ln")
    ).persist()
    n = F.col("ln")

    def masked(i):
        # name with character i replaced by a placeholder outside the
        # identifier alphabet, position baked in — the substitution key
        return md5_long(
            F.concat(
                i.cast("string"),
                F.lit(":"),
                F.substring(F.col("c_name"), F.lit(1), i - 1),
                F.lit("\x01"),
                F.substring(F.col("c_name"), i + 1, n),
            )
        )

    def deleted(i):
        return md5_long(
            F.concat(
                F.substring(F.col("c_name"), F.lit(1), i - 1),
                F.substring(F.col("c_name"), i + 1, n),
            )
        )

    sub = keyed.select(
        "c_custkey",
        "c_name",
        F.explode(F.transform(F.sequence(F.lit(1), n), masked)).alias("sk"),
    )
    a_sub = sub.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        "sk",
    )
    b_sub = sub.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        F.col("sk").alias("sk_b"),
    )
    subs = a_sub.join(
        b_sub,
        (F.col("sk") == F.col("sk_b")) & (F.col("custkey_a") < F.col("custkey_b")),
    ).select("custkey_a", "custkey_b", "name_a", "name_b")

    # len±1: deletion-variant hashes of the longer side vs full-name
    # hashes of the shorter
    longer = keyed.select(
        F.col("c_custkey").alias("ck_l"),
        F.col("c_name").alias("nm_l"),
        F.col("ln").alias("ln_l"),
        F.explode(F.transform(F.sequence(F.lit(1), n), deleted)).alias("dk"),
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
    cand = subs.unionByName(indel).dropDuplicates(["custkey_a", "custkey_b"])
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.select(
        "custkey_a",
        "custkey_b",
        "name_a",
        "name_b",
        lev.cast("int").alias("edit_dist"),
    )

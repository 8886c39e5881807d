"""Similarity search over the ``embeddings`` table (array<float> column).

Two tiers (BASELINE.json north star):

- brute-force cosine top-k: the exactness baseline. Probe set joined
  against the full corpus; dot products via ``F.aggregate``/``zip_with``
  — JVM-side higher-order functions, no Python. At cluster scale the
  corpus side stays partitioned and the (small) probe side broadcasts,
  so cost is one pass over the corpus per batch of probes — the right
  shape for 100 TB (probes batch; corpus never re-shuffles).

- LSH-bucketed cosine (random hyperplanes): the scale path. Signs of
  dot(v, plane_j) build a bucket id; neighbor search becomes an
  equi-join on bucket, cutting the candidate set by ~2^n_planes.
  Hyperplane components derive from md5 so the DuckDB oracle builds
  bit-identical planes.

Floats: embeddings are float32, cast to double before any arithmetic in
BOTH engines; similarity values are rounded to 6 decimals for the
cross-engine hash, ordering uses the raw double (distinct neighbors'
gaps are astronomically larger than 1-ulp reassociation noise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from eurovision_spark.catalog import register
from eurovision_spark.sources import load_table

TOP_K = 5
PROBE_MOD = 50  # vec_id % 50 == 0 -> probe set
N_PLANES = 8


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


COSINE_SQL = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "cosine_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id % {PROBE_MOD} = 0),
    scored AS (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               {COSINE_SQL.format(a='p.pv', b='e.v')} AS cos,
               row_number() OVER (
                   PARTITION BY p.probe_id
                   ORDER BY {COSINE_SQL.format(a='p.pv', b='e.v')} DESC, e.vec_id) AS rn
        FROM probes p CROSS JOIN e
        WHERE e.vec_id <> p.probe_id)
    SELECT probe_id, neighbor_id, round(cos, 6) AS cosine_sim
    FROM scored WHERE rn <= {TOP_K}
    """,
    "brute-force cosine top-k (exact ANN baseline): broadcast probe set x "
    "partitioned corpus, JVM higher-order-function dot products, "
    "row_number top-k per probe.",
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Norms are per-VECTOR, not per-pair: materialize them once on each
    # side before the join so the pair loop does one dot + one divide
    # (the naive formulation recomputes both norms per candidate — 3x
    # the flops). Same expression tree dot/(np*nv) -> bit-identical
    # doubles vs the oracle. Repartition spreads the corpus across
    # cores when the source arrives as one coarse split.
    e = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .withColumn("nv", l2norm(F.col("v")))
    )
    probes = e.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("nv").alias("np"),
    )
    scored = (
        e.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("pv"), F.col("v")) / (F.col("np") * F.col("nv"))).alias("cos"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("probe_id", "neighbor_id", F.round("cos", 6).alias("cosine_sim"))
    )


# --- LSH-bucketed variant ---------------------------------------------------
# plane[j][d] = (md5int(concat('plane-', j, '-', d)) % 2001 - 1000) / 1000.0

PLANE_SQL = f"""
    SELECT j, list_transform(
        generate_series(1, 64),
        d -> (CAST(CAST(concat('0x', substr(md5(concat('plane-', j, '-', d)), 1, 15))
                   AS UBIGINT) AS BIGINT) % 2001 - 1000) / 1000.0) AS plane
    FROM (SELECT unnest(generate_series(0, {N_PLANES - 1})) AS j)
"""


def _planes(spark: SparkSession, dim: int) -> DataFrame:
    """Deterministic pseudo-random hyperplanes (same formula as the SQL)."""
    j = spark.range(N_PLANES).select(F.col("id").cast("int").alias("j"))
    plane = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda d: (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("plane-"), F.col("j"), F.lit("-"), d)), 1, 15),
                16,
                10,
            ).cast("bigint")
            % 2001
            - 1000
        )
        / 1000.0,
    )
    return j.select("j", plane.alias("plane"))


def _plane_expr(j: Column | int, dim: int) -> Column:
    """One hyperplane as an inline array<double> expression (same md5
    formula as :func:`_planes` / PLANE_SQL) — all-literal, so Catalyst
    constant-folds it to a value once at plan time."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda d: (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("plane-"), F.lit(j).cast("int"), F.lit("-"), d)),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 2001
            - 1000
        )
        / 1000.0,
    )



@register(
    "cosine_lsh_bucketed",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    planes AS ({PLANE_SQL}),
    sigs AS (
        SELECT e.vec_id, e.v,
               CAST(sum(CASE WHEN list_dot_product(e.v, p.plane) >= 0
                        THEN 1 << p.j ELSE 0 END) AS BIGINT) AS bucket
        FROM e CROSS JOIN planes p GROUP BY e.vec_id, e.v),
    probes AS (SELECT vec_id AS probe_id, v AS pv, bucket FROM sigs
               WHERE vec_id % {PROBE_MOD} = 0),
    cand AS (
        SELECT p.probe_id, s.vec_id AS neighbor_id,
               {COSINE_SQL.format(a='p.pv', b='s.v')} AS cos,
               row_number() OVER (
                   PARTITION BY p.probe_id
                   ORDER BY {COSINE_SQL.format(a='p.pv', b='s.v')} DESC, s.vec_id) AS rn
        FROM probes p JOIN sigs s ON s.bucket = p.bucket AND s.vec_id <> p.probe_id)
    SELECT probe_id, neighbor_id, round(cos, 6) AS cosine_sim
    FROM cand WHERE rn <= {TOP_K}
    """,
    "LSH-bucketed approximate cosine search: 8 deterministic random "
    "hyperplanes -> sign-bit bucket -> equi-join on bucket only. The "
    "candidate set shrinks ~2^8; at 100 TB the bucket join replaces the "
    "full cross product (multi-probe = also join neighboring buckets).",
)
def cosine_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
    )
    # Bucket id is a pure per-row map: sign(dot(v, plane_j)) packed into
    # bit j, with the 8 planes inlined as constant-foldable literals —
    # no plane join, no groupBy-on-vector shuffle. The ONLY shuffle in
    # the whole query is the window's partition-by-probe exchange.
    bucket = sum(
        [
            F.when(dot(F.col("v"), _plane_expr(j, 64)) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(N_PLANES)
        ],
        F.lit(0),
    ).cast("bigint")
    sigs = e.select("vec_id", "v", bucket.alias("bucket"), l2norm(F.col("v")).alias("nv"))
    probes = sigs.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("bucket"),
        F.col("nv").alias("np"),
    )
    cand = (
        sigs.join(
            F.broadcast(probes),
            (sigs.bucket == probes.bucket) & (F.col("vec_id") != F.col("probe_id")),
        )
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("pv"), F.col("v")) / (F.col("np") * F.col("nv"))).alias("cos"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("probe_id", "neighbor_id", F.round("cos", 6).alias("cosine_sim"))
    )


# --- embedding-cosine near-duplicate pairs ----------------------------------


NEAR_DUP_THRESHOLD = 0.999

VECS_WITH_COPIES_SQL = """
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id,
           list_transform(embedding::DOUBLE[], x -> x * 2.0) AS v
    FROM embeddings
"""

BUCKET_SQL = f"""
    SELECT e.vec_id, e.v,
           CAST(sum(CASE WHEN list_dot_product(e.v, p.plane) >= 0
                    THEN 1 << p.j ELSE 0 END) AS BIGINT) AS bucket,
           sqrt(list_dot_product(e.v, e.v)) AS nv
    FROM e CROSS JOIN planes p GROUP BY e.vec_id, e.v
"""


@register(
    "embedding_near_dup",
    f"""
    WITH e AS ({VECS_WITH_COPIES_SQL}),
    planes AS ({PLANE_SQL}),
    sigs AS ({BUCKET_SQL}),
    pairs AS (
        SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
               list_dot_product(a.v, b.v) / (a.nv * b.nv) AS cos
        FROM sigs a JOIN sigs b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT vec_id_1, vec_id_2, round(cos, 6) AS cosine_sim
    FROM pairs WHERE cos >= {NEAR_DUP_THRESHOLD}
    """,
    "embedding-cosine near-dup detection: every vector gets a planted "
    "scaled copy (same direction -> cosine 1.0); LSH sign-buckets narrow "
    "candidates (a positive-scaled copy provably lands in the SAME "
    "bucket), cosine >= 0.999 confirms. Pair generation happens inside "
    "each bucket's collected array after ONE shuffle — candidate cost "
    "tracks duplicate density, not n². The corpus-dedup twin of "
    "minhash_lsh_pairs for the modality where 'text' is a vector.",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    orig = e.select("vec_id", as_double(F.col("embedding")).alias("v"))
    copy = e.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(as_double(F.col("embedding")), lambda x: x * 2.0).alias("v"),
    )
    vecs = orig.unionByName(copy)
    bucket = sum(
        [
            F.when(dot(F.col("v"), _plane_expr(j, 64)) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(N_PLANES)
        ],
        F.lit(0),
    ).cast("bigint")
    sigs = vecs.select(
        "vec_id", "v", bucket.alias("bucket"), l2norm(F.col("v")).alias("nv")
    )
    buckets = (
        sigs.groupBy("bucket")
        .agg(F.array_sort(F.collect_list(F.struct("vec_id", "v", "nv"))).alias("items"))
        .filter(F.size("items") > 1)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("items"),
            lambda a, i: F.transform(
                F.slice(F.col("items"), i + 2, F.size(F.col("items"))),
                lambda b: F.struct(
                    a.vec_id.alias("vec_id_1"),
                    b.vec_id.alias("vec_id_2"),
                    (dot(a.v, b.v) / (a.nv * b.nv)).alias("cos"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.vec_id_1", "p.vec_id_2", "p.cos")
        .filter(F.col("cos") >= NEAR_DUP_THRESHOLD)
        .select("vec_id_1", "vec_id_2", F.round("cos", 6).alias("cosine_sim"))
    )


# --- IVF (inverted-file) ANN --------------------------------------------------

N_CENTROID_MOD = 100  # vec_id % 100 == 7 -> centroid "codebook"
CENTROID_REM = 7


@register(
    "cosine_ivf",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nv
               FROM embeddings),
    cents AS (SELECT vec_id AS cent_id, v AS cv, nv AS ncv FROM e
              WHERE vec_id % {N_CENTROID_MOD} = {CENTROID_REM}),
    assigned AS (
        SELECT e.vec_id, e.v, e.nv, c.cent_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(e.v, c.cv) / (e.nv * c.ncv) DESC,
                            c.cent_id) AS rn
        FROM e CROSS JOIN cents c),
    cells AS (SELECT vec_id, v, nv, cent_id FROM assigned WHERE rn = 1),
    probes AS (SELECT vec_id AS probe_id, v AS pv, nv AS np, cent_id
               FROM cells WHERE vec_id % {PROBE_MOD} = 0),
    cand AS (
        SELECT p.probe_id, s.vec_id AS neighbor_id,
               list_dot_product(p.pv, s.v) / (p.np * s.nv) AS cos,
               row_number() OVER (
                   PARTITION BY p.probe_id
                   ORDER BY list_dot_product(p.pv, s.v) / (p.np * s.nv) DESC,
                            s.vec_id) AS rn
        FROM probes p JOIN cells s
          ON s.cent_id = p.cent_id AND s.vec_id <> p.probe_id)
    SELECT probe_id, neighbor_id, round(cos, 6) AS cosine_sim
    FROM cand WHERE rn <= {TOP_K}
    """,
    "IVF (inverted-file) approximate nearest neighbor, nprobe=1: a "
    "deterministic centroid codebook (every 100th vector) is collected "
    "to the driver and inlined as literals — the canonical IVF shape "
    "where the codebook fits in memory and ships with the task. Cell "
    "assignment is then a per-row argmax over the codebook (NO shuffle, "
    "no cross join); search joins the probe's cell only, cutting "
    "candidates by ~n_centroids. At 100 TB the codebook comes from "
    "k-means on a sample and cells become partition keys for the "
    "inverted lists.",
)
def cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    # codebook: tiny by construction (1% of corpus), exact doubles.
    # Collected from the UN-repartitioned scan — shuffling the whole
    # corpus to filter out 1% would be a wasted exchange.
    cents = (
        raw.filter(F.col("vec_id") % N_CENTROID_MOD == CENTROID_REM)
        .withColumn("nv", l2norm(F.col("v")))
        .collect()
    )
    e = (
        raw.repartition(spark.sparkContext.defaultParallelism)
        .withColumn("nv", l2norm(F.col("v")))
    )
    best = F.greatest(
        *[
            F.struct(
                (dot(F.col("v"), F.array(*[F.lit(x) for x in c["v"]])) / (F.col("nv") * c["nv"]))
                .alias("sim"),
                F.lit(-c["vec_id"]).alias("neg_cent"),
            )
            for c in cents
        ]
    )
    # greatest(struct(sim, -cent_id)) == row_number()=1 under
    # (sim DESC, cent_id ASC): max sim, ties -> smallest centroid id.
    # NB: probes derive from `cells` — the probe filter pushes below
    # this projection, so the broadcast side only assigns the 2% probe
    # rows; materializing a second assignment expression for the probe
    # side doubles the codegen size for nothing (measured).
    cells = e.select("vec_id", "v", "nv", (-best["neg_cent"]).cast("bigint").alias("cent_id"))
    probes = cells.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("nv").alias("np"),
        F.col("cent_id"),
    )
    cand = (
        cells.join(
            F.broadcast(probes),
            (cells.cent_id == probes.cent_id) & (F.col("vec_id") != F.col("probe_id")),
        )
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("pv"), F.col("v")) / (F.col("np") * F.col("nv"))).alias("cos"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("probe_id", "neighbor_id", F.round("cos", 6).alias("cosine_sim"))
    )

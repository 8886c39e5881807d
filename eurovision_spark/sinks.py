"""Edge sinks: parquet (native), CSV/Excel (export edge), JDBC (parity).

The engine's native store is parquet (SURVEY §7 guiding decisions);
xlsx/CSV are driver-side edges applied to already-small query RESULTS
(toexcel.py:124-162 semantics) — all heavy lifting stays in Spark.
The reference's SQLite sink (scan.py:121-132) maps to ``write_jdbc``;
its PK-duplicate swallow becomes an explicit dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Native sink. At scale, pass partition_by for partition pruning on
    later reads; writers coalesce via AQE."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC interchange sink — the other splittable columnar format a
    warehouse exchange meets; same pushdown/pruning properties as the
    parquet native store (Spark's ORC reader is vectorized too)."""
    df.write.mode("overwrite").orc(path)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV export edge: header row + empty-string-for-missing, matching
    the reference's worksheet shape (toexcel.py:129-131)."""
    df.na.fill("").write.mode("overwrite").option("header", True).csv(path)


def write_excel(df: DataFrame, path: str, sheet: str = "Test Record") -> None:
    """xlsx sink for (small) result sets — the reference's Workbook
    append loop (toexcel.py:126-162). Gated on openpyxl; falls back to
    CSV when the engine is deployed without it."""
    pdf = df.toPandas()
    try:
        import openpyxl  # noqa: F401

        pdf.to_excel(path, sheet_name=sheet, index=False, engine="openpyxl")
    except ImportError:
        pdf.to_csv(path + ".csv", index=False)


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", **options: str
) -> None:
    """JDBC parity sink (reference SQLite INSERTs, scan.py:121-132,
    199-217). Duplicate-PK tolerance (scan.py:129-132) is made explicit:
    dedupe on the key BEFORE the write instead of swallowing conflicts.
    Requires the matching JDBC driver jar on the classpath."""
    df.write.mode(mode).format("jdbc").option("url", url).option("dbtable", table).options(
        **options
    ).save()


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 64, path: str | None = None
) -> None:
    """Bucketed parquet table: pre-shuffled on the join/agg key at write
    time so every later equi-join or groupBy on ``key`` runs with NO
    exchange (the 100 TB replacement for the reference's B-tree indexes
    on eudract_id, scan.py:71-73 / SURVEY §4). Readers must come through
    ``spark.table`` for the catalog to expose the bucketing spec;
    tests/test_plans.py proves the join plan is exchange-free."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key).sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def upsert_parquet(
    df: DataFrame, path: str, keys: list[str], keep: str = "existing"
) -> None:
    """Keyed merge into a parquet directory — the engine's MERGE edge.

    ``keep="existing"``: first writer wins per key; only rows whose key
    is absent are appended (the reference's swallowed duplicate-PK
    INSERT, scan.py:129-132, made explicit). ``keep="updates"``:
    last writer wins; incoming rows replace same-key rows. Keys must be
    unique within ``df`` (pre-aggregate upstream; this op does not pick
    among duplicate incoming rows).

    Mechanics: the survivor set is existing ∪/⊖ updates via ONE
    anti-join on the key columns, materialized to ``path + "_next"``
    and swapped in (parquet can't be read and overwritten in the same
    job). Honest scale note: plain parquet has no transactional MERGE,
    so this rewrites the table; at 100 TB you partition the store and
    rewrite only affected partitions, or use a table format with a real
    MERGE (Delta/Iceberg) — the anti-join shape carries over unchanged.
    """
    import os

    spark = df.sparkSession
    # fresh-target detection is an EXPLICIT existence check, never a
    # swallowed read error: treating a corrupt/transient-IO read as
    # "target absent" would overwrite the accumulated store with one
    # incoming batch. A real read failure on an existing path must
    # surface to the operator, who still has path_next from the last
    # completed merge to recover from.
    if not os.path.exists(path):
        df.write.mode("overwrite").parquet(path)
        return
    existing = spark.read.parquet(path)

    def anti(left: DataFrame, right: DataFrame) -> DataFrame:
        # NULL-SAFE key match: the plain `left_anti` on column names
        # compares with `=`, under which NULL never equals NULL — a row
        # with any null key (child tables key on the WHOLE row, and
        # never-captured fields are null) would re-append on every
        # replay, breaking the exactly-once idempotency the streaming
        # ingest's at-least-once retries rely on.
        l, r = left.alias("l"), right.select(*keys).alias("r")
        cond = None
        for k in keys:
            c = F.col(f"l.{k}").eqNullSafe(F.col(f"r.{k}"))
            cond = c if cond is None else cond & c
        return l.join(r, cond, "left_anti")

    if keep == "existing":
        merged = existing.unionByName(anti(df, existing))
    elif keep == "updates":
        merged = df.unionByName(anti(existing, df))
    else:  # pragma: no cover - guarded API
        raise ValueError(f"keep must be 'existing' or 'updates', got {keep!r}")
    merged.write.mode("overwrite").parquet(path + "_next")
    spark.read.parquet(path + "_next").write.mode("overwrite").parquet(path)


def delete_keys(spark, path: str, key: str, victims: DataFrame) -> None:
    """Keyed DELETE from a parquet directory — the retirement edge of
    the incremental stores (refresh_corpus): rewrite ``path`` without
    the rows whose ``key`` appears in ``victims``. One left-anti join,
    same staging-swap mechanics (and the same honest scale note) as
    :func:`upsert_parquet`; a missing store or an empty victim set is a
    no-op."""
    import os

    if not os.path.exists(path):
        return
    existing = spark.read.parquet(path)
    # a USING-column join (anti included) moves the join key to the
    # front of the output — re-select the original order so repeated
    # deletes on different keys never reorder the store's columns
    kept = existing.join(victims.select(key), key, "left_anti").select(
        *existing.columns
    )
    kept.write.mode("overwrite").parquet(path + "_next")
    spark.read.parquet(path + "_next").write.mode("overwrite").parquet(path)


def write_sqlite(tables: dict[str, DataFrame], db_path: str) -> None:
    """Reference-format SQLite sink — full S5 parity (scan.py:46-132).

    Emits the exact shape the reference produces: sorted column order,
    ``eudract_id`` primary key on trial, ``eudract_id`` indexes on the
    child tables, TEXT/INTEGER NOT NULL columns — and re-emits typed
    NULLs as ``''`` at this edge (SURVEY §7 hard item 5: the reference
    has no NULLs; '' means missing, and SQLite's type looseness lets
    INTEGER columns hold '' for never-captured flags). Driver-side
    write sized for the reference's data scale (tens of thousands of
    rows); at engine scale the native store is parquet and this is an
    export edge like xlsx.
    """
    import sqlite3

    from pyspark.sql import types as T

    con = sqlite3.connect(db_path)
    try:
        for name, df in tables.items():
            defs = []
            for f in df.schema.fields:
                sql_t = "INTEGER" if isinstance(f.dataType, (T.IntegerType, T.LongType)) else "TEXT"
                pk = " PRIMARY KEY" if name == "trial" and f.name == "eudract_id" else ""
                defs.append(f"{f.name} {sql_t} NOT NULL{pk}")
            con.execute(f"CREATE TABLE {name}(\n" + ",\n".join(defs) + "\n)")
            placeholders = ",".join("?" * len(df.columns))
            ins = f"INSERT INTO {name} VALUES({placeholders})"
            batch = []
            for row in df.toLocalIterator():
                batch.append(tuple("" if v is None else v for v in row))
                if len(batch) >= 10000:
                    con.executemany(ins, batch)
                    batch = []
            if batch:
                con.executemany(ins, batch)
            if name != "trial" and "eudract_id" in df.columns:
                con.execute(f"CREATE INDEX idx_{name} ON {name} (eudract_id)")
        con.commit()
    finally:
        con.close()


def write_clustered(
    df: DataFrame, path: str, cols: list[str], files: int | None = None
) -> None:
    """Range-clustered parquet: repartitionByRange + sortWithinPartitions
    on ``cols`` before writing, so each output file (and each row group
    inside it) covers a narrow, near-disjoint key range. Later reads
    with a pushed predicate on ``cols`` then skip whole row groups via
    parquet min/max stats — the poor-man's clustered index / Z-order
    for the single-dimension case, and the layout step that makes a
    100 TB table selectively readable without a table format.
    ``files`` bounds the output file count (range partitioner sampling
    picks balanced split points; skew lands in adjacent files, never
    one hot file)."""
    n = files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files and return the new file count.

    Streaming/incremental writers (micro-batches, per-task outputs)
    leave thousands of KB-sized files; at scale every later scan pays
    one task + one footer read per file, and the namenode pays the
    metadata. Compaction is the periodic maintenance pass that
    restores ~128 MB scan units. Round-robin repartition (not
    coalesce: coalesce merges by locality and can leave skewed
    outputs), staged to ``_next`` then swapped in with a directory
    rename — parquet can't be read and overwritten in one job, and a
    Spark rewrite of the staged copy would re-split it by input
    splits, losing the file-count contract. The rename swap is the
    local-FS stand-in for an object-store manifest flip (table
    formats make this step transactional)."""
    import math
    import os
    import shutil

    total = 0
    for root, _dirs, names in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in names
            if f.endswith(".parquet")
        )
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(path + "_next")
    # swap order matters: rename the live copy ASIDE, rename the new one
    # in, THEN delete — at no instant is there zero live copies (rm-first
    # would destroy the dataset if the process died before the rename)
    os.rename(path, path + "_old")
    os.rename(path + "_next", path)
    shutil.rmtree(path + "_old")
    return n


def write_training_shards(
    manifest: DataFrame, docs: DataFrame, out_dir: str
) -> int:
    """Materialize a ``corpus_build`` manifest as ORDERED training
    shard files — the last physical step of the pipeline, closing the
    loop from shard_plan's (shard, pos) assignment to the files a
    trainer actually streams: kept rows join back to their text (an
    id-keyed join — the manifest never carried text, so this is the
    single place the kept documents move), and land under
    ``out_dir/split=<s>/shard=<k>/`` with rows in ``pos`` order.

    Physical plan = exactly the price shard_plan's docstring promises:
    ONE exchange keyed on (split, shard) + an in-partition external
    sort on (split, shard, pos) — hash collisions may co-locate two
    shards in one task, which ``partitionBy`` then fans into their own
    directories with row order preserved per directory. Reproducible
    BY CONTENT: (shard, pos) come from shard_plan's two md5 hashes, so
    re-running the whole pipeline yields the same rows in the same
    order per shard directory (file NAMES carry fresh task uuids —
    content identity is the audit property, pinned in
    tests/test_file_sources.py along with per-shard pos density).

    Returns the number of kept documents written."""
    kept = manifest.filter(F.col("keep") == 1).select(
        "doc_id", "split", "shard", "pos"
    )
    rows = kept.join(docs.select("doc_id", "text"), "doc_id")
    (
        rows.repartition(F.col("split"), F.col("shard"))
        .sortWithinPartitions("split", "shard", "pos")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(out_dir)
    )
    return rows.sparkSession.read.parquet(out_dir).count()


def rewrite_dirty_shards(
    manifest_old: DataFrame, manifest_new: DataFrame, docs: DataFrame, out_dir: str
) -> tuple[int, int]:
    """Incremental twin of :func:`write_training_shards` — the sink
    side of shard_invalidation's promise: when a recrawl produces a
    new corpus_build manifest, rewrite ONLY the (split, shard)
    directories whose kept membership/order changed and leave every
    clean directory's files physically untouched (name-identical, the
    byte-stability write_training_shards pins).

    Dirty detection is manifest-only: each side's kept rows fold to
    one 60-bit bit_xor digest per (split, shard) over md5(doc_id:pos)
    — order-insensitive by construction yet order-sensitive in effect
    (pos IS the order, and pos values are unique per directory) — then
    a tiny full-outer digest join names the dirty directories. Text
    moves only for dirty rows, through the same one-exchange sorted
    write, committed with Spark's DYNAMIC partition-overwrite mode so
    only the written directories are replaced. Directories whose
    entire membership vanished in the new manifest are deleted
    driver-side (the bounded dir list, not data).

    Returns (n_dirty_dirs, n_rows_written)."""
    import shutil

    def digests(m: DataFrame) -> DataFrame:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("pos").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        return (
            m.filter(F.col("keep") == 1)
            .select("split", "shard", h.alias("h"))
            .groupBy("split", "shard")
            .agg(F.expr("bit_xor(h)").alias("dig"))
        )

    old_d = digests(manifest_old).withColumnRenamed("dig", "old_dig")
    new_d = digests(manifest_new).withColumnRenamed("dig", "new_dig")
    delta = (
        old_d.join(new_d, ["split", "shard"], "full_outer")
        .filter(
            F.col("old_dig").isNull()
            | F.col("new_dig").isNull()
            | (F.col("old_dig") != F.col("new_dig"))
        )
        .select("split", "shard", F.col("new_dig").isNull().alias("gone"))
        .collect()  # bounded: one row per dirty directory
    )
    dirty = [(r.split, r.shard) for r in delta if not r.gone]
    for r in delta:
        if r.gone:
            shutil.rmtree(
                f"{out_dir}/split={r.split}/shard={r.shard}", ignore_errors=True
            )
    if not dirty:
        return len(delta), 0
    spark = manifest_new.sparkSession
    dirty_df = spark.createDataFrame(dirty, "split string, shard int")
    rows = (
        manifest_new.filter(F.col("keep") == 1)
        .select("doc_id", "split", "shard", "pos")
        .join(F.broadcast(dirty_df), ["split", "shard"], "left_semi")
        .join(docs.select("doc_id", "text"), "doc_id")
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            rows.repartition(F.col("split"), F.col("shard"))
            .sortWithinPartitions("split", "shard", "pos")
            .write.mode("overwrite")
            .partitionBy("split", "shard")
            .parquet(out_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    n_rows = sum(
        spark.read.parquet(f"{out_dir}/split={s}/shard={k}").count() for s, k in dirty
    )
    return len(delta), n_rows

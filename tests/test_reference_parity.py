"""Row-level parity against the reference implementation itself.

Runs the actual reference parser (/root/reference/scan.py, executed
as-is, never imported or copied) on a small generated registry dump and
diffs its SQLite output against this engine's tables. See PARITY.md for
the full-size run and the documented deltas:

- uncaptured bool fields: SQLite stores '' inside INTEGER columns; a
  typed store holds NULL — compared as equivalent here;
- the reference's imp table swaps trade<->code (its add_imp_to_list
  appends [trade, product, code], its INSERT lists sorted columns
  [code, product, trade]) — the reference side is un-swapped before
  comparison.
"""

from __future__ import annotations

import sqlite3
import subprocess
import sys
from pathlib import Path

import pytest

REF = Path("/root/reference/scan.py")
N_TRIALS = 500


@pytest.fixture(scope="module")
def parity_dirs(tmp_path_factory):
    if not REF.exists():
        pytest.skip("reference not available")
    base = tmp_path_factory.mktemp("parity")
    dump = base / "dump.txt"
    db = base / "ref.db"
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from gen_registry import write_registry

    write_registry(str(dump), N_TRIALS)
    p = subprocess.run(
        [sys.executable, str(REF)],
        input=f"{dump}\n{db}\n",
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert p.returncode == 0, p.stderr[-500:]
    return dump, db, base / "tables"


def _ref_rows(db: Path, sql: str) -> list[tuple]:
    con = sqlite3.connect(str(db))
    try:
        return sorted(tuple(str(x) for x in r) for r in con.execute(sql).fetchall())
    finally:
        con.close()


def _our_rows(spark, path: Path, cols: list[str], blank_nulls: bool = False) -> list[tuple]:
    df = spark.read.parquet(str(path)).select(*cols)
    if blank_nulls:
        df = df.na.fill("")  # typed-store NULL == reference '' convention
    return sorted(
        tuple("" if v is None else str(v) for v in r) for r in df.collect()
    )


def test_reference_parity_all_tables(spark, parity_dirs):
    from eurovision_spark.operators.parse import parse_registry
    from eurovision_spark.sinks import write_parquet

    dump, db, out = parity_dirs
    tables = parse_registry(spark, str(dump))
    for name, df in tables.items():
        write_parquet(df, str(out / name))

    # trial: every column; uncaptured bools are ''(ref)/NULL(ours)
    con = sqlite3.connect(str(db))
    cols = sorted(r[1] for r in con.execute("PRAGMA table_info(trial)").fetchall())
    con.close()
    ref_t = _ref_rows(db, f"SELECT {', '.join(cols)} FROM trial")
    our_t = _our_rows(spark, out / "trial", cols)
    assert our_t == ref_t

    # imp: un-swap the reference's trade<->code misalignment
    ref_imp = _ref_rows(db, "SELECT eudract_id, code, product, trade FROM imp")
    our_imp = _our_rows(spark, out / "imp", ["eudract_id", "trade", "product", "code"])
    assert our_imp == ref_imp

    ref_sp = _ref_rows(db, "SELECT eudract_id, name, org, contact, email FROM sponsor")
    our_sp = _our_rows(spark, out / "sponsor", ["eudract_id", "name", "org", "contact", "email"])
    assert our_sp == ref_sp

    ref_loc = _ref_rows(db, "SELECT eudract_id, location FROM location")
    our_loc = _our_rows(spark, out / "location", ["eudract_id", "location"])
    assert our_loc == ref_loc


def test_sqlite_edge_sink_closes_null_delta(spark, parity_dirs, tmp_path):
    """write_sqlite re-emits '' for typed NULLs — our SQLite output is
    then fully identical to the reference's trial table, including the
    ''-in-INTEGER quirk for never-captured flags."""
    from eurovision_spark.operators.parse import parse_registry
    from eurovision_spark.sinks import write_sqlite

    dump, ref_db, _ = parity_dirs
    ours_db = tmp_path / "ours.db"
    write_sqlite(parse_registry(spark, str(dump)), str(ours_db))

    con = sqlite3.connect(str(ref_db))
    cols = sorted(r[1] for r in con.execute("PRAGMA table_info(trial)").fetchall())
    con.close()
    sel = f"SELECT {', '.join(cols)} FROM trial"
    assert _ref_rows(ours_db, sel) == _ref_rows(ref_db, sel)


def test_search_semantics_match_reference_keyset_intersection(spark, parity_dirs):
    """toexcel.py's search (per-table WHERE -> eudract_id set ->
    intersection, toexcel.py:15-33/108-115) replayed on the reference's
    own database must select the same trials as our search_trials on
    our tables. Predicates chosen to exercise trial, imp, and location
    constraints together (imp predicate on `product`, the one imp
    column the reference's swap defect leaves aligned)."""
    from eurovision_spark.operators.parse import parse_registry

    dump, ref_db, _ = parity_dirs
    con = sqlite3.connect(str(ref_db))
    try:
        sets = []
        for table, where in (
            ("trial", "placebo = 1"),
            ("imp", "product <> ''"),
            ("location", "location = 'France'"),
        ):
            sets.append(
                {r[0] for r in con.execute(f"SELECT eudract_id FROM {table} WHERE {where}")}
            )
        ref_ids = set.intersection(*sets)
    finally:
        con.close()

    from eurovision_spark.plans.search import search_trials

    tables = parse_registry(spark, str(dump))
    ours = search_trials(
        tables,
        trial_where="placebo = 1",
        imp_where="product <> ''",
        location_where="location = 'France'",
    )
    our_ids = {r.eudract_id for r in ours.select("eudract_id").collect()}
    assert our_ids == ref_ids
    assert ref_ids  # non-degenerate: the predicates select something

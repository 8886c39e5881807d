"""Scalar column helpers shared across operators.

These encode the reference's value conventions (SURVEY §2.8):
empty string = missing (reference scan.py:19, 302), yes/no booleans
(scan.py:115-119), whitespace normalization (scan.py:320), priority
coalesce for display names (toexcel.py:143-149). All are built-in
column expressions — JVM-side, codegen'd, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nullif_empty(col: Column | str) -> Column:
    """'' -> NULL at the ingest edge (SURVEY §7 hard item 5)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(""))


def empty_if_null(col: Column | str) -> Column:
    """NULL -> '' at the export edge (reference parity: all NOT NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(""))


def norm_ws(col: Column | str) -> Column:
    """Collapse whitespace runs + trim — the exact twin of the
    reference's ``' '.join(line.split())`` (scan.py:320): collapse
    FIRST (so edge tabs don't survive trim, which strips only spaces),
    with ``(?U)`` so the class covers unicode whitespace (NBSP in
    scraped text) like Python's ``str.split`` does."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"(?U)\s+", " "))


def yes_no_to_int(col: Column | str) -> Column:
    """'yes'->1, 'no'->0, else NULL (reference scan.py:115-119)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "yes", F.lit(1)).when(c == "no", F.lit(0)).cast("int")


def priority_coalesce(*cols: Column) -> Column:
    """First non-empty value in priority order (reference toexcel.py:143-149)."""
    return F.coalesce(*[nullif_empty(c) for c in cols])


def labeled_priority_coalesce(labeled: list[tuple[str, Column]]) -> Column:
    """Reference IMP display-name rule: pick the first non-empty field in
    priority order and emit "label:value" (toexcel.py:143-149)."""
    out = F.lit(None).cast("string")
    for label, col in reversed(labeled):
        c = nullif_empty(col)
        out = F.when(c.isNotNull(), F.concat(F.lit(label + ":"), c)).otherwise(out)
    return out

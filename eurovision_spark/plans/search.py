"""Predicate search + denormalized export — the engine's public query API.

Rebuilds toexcel.py's interactive loop (toexcel.py:100-162) as plan
construction: the user supplies an optional predicate per table; each
supplied predicate contributes ONE left-semi join against the trial set
(conditional join pruning, toexcel.py:110-115 / SURVEY §4); the final
set is re-assembled into the reference's denormalized sheet shape in the
same single query — group-concat IMP display names ("; "), sorted
locations (", "), first sponsor name.

Predicates are Spark SQL boolean expressions evaluated with
``F.expr`` against registered views — replacing the reference's raw
string interpolation (SQL injection by design, toexcel.py:29) with
parsed, analyzed expressions.

Scale: child aggregates shuffle once on eudract_id; the (filtered)
trial set joins them sort-merge on that same key — or broadcast when
the search is selective, which AQE decides at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eurovision_spark.functions import labeled_priority_coalesce

DISPLAY_TRIAL = [
    # fixed 46-column projection, reference toexcel.py:46-92
    "eudract_id", "official_title", "condition", "enrollment", "overall_status",
    "phase1", "phase2", "phase3", "phase4", "meddra_version", "meddra_level",
    "meddra_classification", "meddra_term", "meddra_soc", "nct_id", "who_utrn_id",
    "isrctn_id", "sponsor_id", "study_first_submitted_date", "completion_date",
    "therapy", "diagnosis", "prophylaxis", "safety", "efficacy", "pk", "pd",
    "randomised", "placebo", "open_design", "single_blind", "double_blind",
    "crossover", "rare", "fih", "bioequivalence", "age_in_utero", "age_preterm",
    "age_newborn", "age_under2", "age_2to11", "age12to17", "age18to64",
    "age_65plus", "female", "male", "network",
]


def search_trials(
    tables: dict[str, DataFrame],
    trial_where: str | None = None,
    imp_where: str | None = None,
    location_where: str | None = None,
    sponsor_where: str | None = None,
) -> DataFrame:
    """Key-set search: trials matching every supplied predicate.

    Missing predicate => that table does not constrain the search
    (toexcel.py:24-28: empty trial predicate means match-all; empty
    child predicate means skip the intersection).
    """
    hits = tables["trial"]
    if trial_where:
        hits = hits.filter(F.expr(trial_where))
    for df, where in (
        (tables["imp"], imp_where),
        (tables["location"], location_where),
        (tables["sponsor"], sponsor_where),
    ):
        if where:
            hits = hits.join(
                df.filter(F.expr(where)).select("eudract_id"), "eudract_id", "left_semi"
            )
    return hits


def denormalized_export(tables: dict[str, DataFrame], hits: DataFrame) -> DataFrame:
    """One row per selected trial: the 46 trial columns + "imp",
    "location", "sponsor" summary columns (toexcel.py:124-162), sorted
    by eudract_id (toexcel.py:133).
    """
    # IMP display name: product > trade > code, "field:value" form
    # (toexcel.py:143-149); reference joins in child-row order — we sort
    # for determinism (documented deviation; set is tiny per trial)
    imp_named = tables["imp"].select(
        "eudract_id",
        labeled_priority_coalesce(
            [
                ("product", F.col("product")),
                ("trade", F.col("trade")),
                ("code", F.col("code")),
            ]
        ).alias("imp_name"),
    )
    imp_agg = (
        imp_named.filter(F.col("imp_name").isNotNull())
        .groupBy("eudract_id")
        .agg(F.array_join(F.array_sort(F.collect_list("imp_name")), "; ").alias("imp"))
    )
    loc_agg = tables["location"].groupBy("eudract_id").agg(
        F.array_join(F.array_sort(F.collect_set("location")), ", ").alias("location")
    )
    # first sponsor row's name (toexcel.py:155-157) — deterministic via
    # min over the sponsor tuple
    sponsor_first = tables["sponsor"].groupBy("eudract_id").agg(
        F.min_by("name", F.struct("name", "org", "contact", "email")).alias("sponsor")
    )
    return (
        hits.select(*DISPLAY_TRIAL)
        .join(imp_agg, "eudract_id", "left")
        .join(loc_agg, "eudract_id", "left")
        .join(sponsor_first, "eudract_id", "left")
        .select(
            *DISPLAY_TRIAL,
            F.coalesce("imp", F.lit("")).alias("imp"),
            F.coalesce("location", F.lit("")).alias("location"),
            F.coalesce("sponsor", F.lit("")).alias("sponsor"),
        )
        .orderBy("eudract_id")
    )


def search_and_export(tables: dict[str, DataFrame], **predicates: str | None) -> DataFrame:
    """The full toexcel lifecycle as one composable query."""
    return denormalized_export(tables, search_trials(tables, **predicates))

"""The driver-twin certification contract, made structural.

COVERAGE.md claims each consolidated driver-facing twin certifies its
subsumed registry entries. For grouping_family / set_ops /
corpus_select that is true BY CONSTRUCTION (the twin calls the subsumed
query functions). For the twins that re-state expressions in one fused
scan (doc_profile, media_profile) or re-derive them (session_stats over
sessionize), these tests join twin against subsumed on the row key and
assert column equality — so an edit that drifts one side fails HERE,
not silently behind two independently-green oracles.

window_suite is certified more loosely on purpose: moving_avg_price /
order_gaps run on coarser custkey filters (%50 ⊇ %100), so parity is
asserted on the overlap; ntile_quartiles is a different table and is
certified as the OPERATOR (ntile shape), not the expressions —
COVERAGE.md says so.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eurovision_spark.catalog import registry

SF_DIR = "/root/testdata/sf0.001"


def _df(spark, name):
    return registry()[name].fn(spark, SF_DIR)


def _assert_no_diff(joined, pairs, key_cols):
    """pairs = [(twin_col, subsumed_col)]; assert equality per row."""
    conds = [
        ~(F.col(a).eqNullSafe(F.col(b))) for a, b in pairs
    ]
    bad = joined.filter(conds[0] if len(conds) == 1 else F.greatest(*[c.cast("int") for c in conds]) == 1)
    rows = bad.select(*key_cols, *[c for ab in pairs for c in ab]).take(5)
    assert not rows, rows


def test_doc_profile_certifies_each_subsumed_query(spark):
    prof = _df(spark, "doc_profile").alias("p")
    checks = {
        "token_stats": [("n_tokens", "n_tokens"), ("n_distinct", "n_distinct"), ("avg_token_len", "avg_token_len")],
        "lang_guess": [("en_hits", "en_hits"), ("tech_hits", "tech_hits"), ("guess", "guess")],
        "quality_score": [("diversity", "diversity"), ("stopword_ratio", "stopword_ratio")],
        "fingerprint": [("content_md5", "content_md5"), ("rolling_hash", "rolling_hash")],
        "bpe_token_count": [("n_bpe_tokens", "n_bpe_tokens"), ("fertility", "fertility")],
    }
    for name, cols in checks.items():
        sub = _df(spark, name).alias("s")
        joined = prof.join(sub, F.col("p.doc_id") == F.col("s.doc_id"), "full_outer")
        _assert_no_diff(
            joined,
            [(f"p.{a}", f"s.{b}") for a, b in cols],
            ["p.doc_id"],
        )


def test_media_profile_certifies_each_subsumed_query(spark):
    prof = _df(spark, "media_profile").alias("p")
    feat = _df(spark, "media_features").alias("s")
    j = prof.join(feat, F.col("p.doc_id") == F.col("s.doc_id"), "full_outer")
    _assert_no_diff(
        j,
        [("p.n_bytes", "s.n_bytes"), ("p.content_md5", "s.content_md5"),
         ("p.width", "s.width"), ("p.height", "s.height")],
        ["p.doc_id"],
    )
    rez = _df(spark, "media_resize").alias("s")
    j = prof.join(rez, F.col("p.doc_id") == F.col("s.doc_id"), "full_outer")
    # resize reports CLAMPED input dims (max(w,1)); the profile reports
    # the raw decode like media_features — geometry columns must agree
    j = j.withColumn("p_cw", F.greatest(F.col("p.width"), F.lit(1))).withColumn(
        "p_ch", F.greatest(F.col("p.height"), F.lit(1))
    )
    _assert_no_diff(
        j,
        [("p_cw", "s.width"), ("p_ch", "s.height"),
         ("p.out_width", "s.out_width"), ("p.out_height", "s.out_height"),
         ("p.scale", "s.scale"), ("p.out_bytes", "s.out_bytes")],
        ["p.doc_id"],
    )
    frames = (
        _df(spark, "media_frame_sample")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(",", F.transform(F.array_sort(F.collect_list(F.struct("frame_idx", "frame_offset"))), lambda x: x.frame_offset.cast("string"))).alias("offs"),
            F.concat_ws(",", F.transform(F.array_sort(F.collect_list(F.struct("frame_idx", "frame_md5"))), lambda x: x.frame_md5)).alias("md5s"),
        )
        .alias("s")
    )
    j = prof.join(frames, F.col("p.doc_id") == F.col("s.doc_id"), "full_outer")
    _assert_no_diff(
        j, [("p.frame_offsets", "s.offs"), ("p.frame_md5s", "s.md5s")], ["p.doc_id"]
    )


def test_session_stats_certifies_sessionize(spark):
    """Aggregating sessionize's per-event assignment must reproduce
    session_stats' n_events exactly (same window, independent code)."""
    sess = (
        _df(spark, "sessionize")
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .alias("s")
    )
    stats = _df(spark, "session_stats").alias("p")
    j = stats.join(
        sess,
        (F.col("p.user_id") == F.col("s.user_id"))
        & (F.col("p.session_id") == F.col("s.session_id")),
        "full_outer",
    )
    _assert_no_diff(j, [("p.n_events", "s.n_events")], ["p.user_id", "p.session_id"])


def test_window_suite_certifies_subsumed_on_overlap(spark):
    suite = _df(spark, "window_suite").alias("p")
    # moving_avg_price: same %50 filter — full parity on ma3
    ma = _df(spark, "moving_avg_price").alias("s")
    j = suite.join(ma, F.col("p.o_orderkey") == F.col("s.o_orderkey"), "full_outer")
    _assert_no_diff(j, [("p.ma3", "s.ma3")], ["p.o_orderkey"])
    # order_gaps runs on %100 ⊆ %50: parity on the overlap (windows are
    # per-customer, so the coarser filter cannot change per-row values)
    og = _df(spark, "order_gaps").alias("s")
    j = suite.join(og, F.col("p.o_orderkey") == F.col("s.o_orderkey"), "inner")
    _assert_no_diff(
        j,
        [("p.order_rank", "s.order_rank"), ("p.days_since_prev", "s.days_since_prev"),
         ("p.next_order_date", "s.next_order_date")],
        ["p.o_orderkey"],
    )
    assert j.count() > 0
    # above_customer_avg: all-orders query restricted to %50 == the
    # suite's flag (per-customer window is filter-invariant)
    above = _df(spark, "above_customer_avg").select("o_orderkey").alias("s")
    flagged = suite.filter(F.col("above_cust_avg") == 1).select("p.o_orderkey")
    sub = above.join(
        suite.select("o_orderkey").alias("k"), "o_orderkey", "left_semi"
    )
    assert {r[0] for r in flagged.collect()} == {r[0] for r in sub.collect()}


def test_minhash_lsh_jaccard_pairs_match_minhash_lsh_pairs(spark):
    """The twin's candidate set IS minhash_lsh_pairs (shared helper) and
    its jaccard values must match ngram_jaccard's formula on the docs
    both queries share."""
    twin = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in _df(spark, "minhash_lsh_jaccard").collect()
    }
    pairs = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in _df(spark, "minhash_lsh_pairs").collect()
    }
    assert set(twin) == pairs
    # planted copies (d, d+1e6) must score the expected (n-3)/n-ish
    # high jaccard, never 0 — pins that the join-back wiring is right
    from eurovision_spark.operators.dedup import NEAR_COPY_OFFSET

    planted = [v for (a, b), v in twin.items() if b == a + NEAR_COPY_OFFSET]
    assert planted and min(planted) > 0.5


def test_simhash_pairs_vote_kernel_certifies_against_simhash(spark):
    """simhash_pairs is registry-gated (the 50-entry driver cap, with
    `simhash` round-1-pinned on the surface), so its certification is
    made STRUCTURAL here (r06 item #6): its feature frame IS
    copies_shingle_sets — the frame behind the driver-certified
    minhash_lsh_jaccard — and its band-bucket join is pairs_in_buckets,
    the machinery behind the driver-certified minhash candidates. The
    remaining private piece is the 60-bit single-fold vote kernel; this
    test instantiates the SAME kernel at width 16 over the
    driver-certified `simhash` op's own token-hash features and pins
    bit-identical signatures, so the kernel is certified through the
    driver surface."""
    from eurovision_spark.operators.dedup import _simhash_vote_expr
    from eurovision_spark.operators.textstats import md5_long, tokens
    from eurovision_spark.sources import load_table

    d = load_table(spark, SF_DIR, "documents").filter(F.col("n_chars") > 0)
    hashed = d.select(
        "doc_id",
        F.transform(
            F.array_distinct(tokens(F.lower(F.col("text")))), lambda t: md5_long(t)
        ).alias("hs"),
    )
    fold16 = hashed.select(
        "doc_id", F.expr(_simhash_vote_expr(16)).alias("sig")
    ).alias("k")
    base = _df(spark, "simhash").alias("s")
    joined = fold16.join(base, F.col("k.doc_id") == F.col("s.doc_id"), "full_outer")
    _assert_no_diff(joined, [("k.sig", "s.simhash16")], ["k.doc_id"])

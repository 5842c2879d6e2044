"""Incremental cross-run near-dup dedup (operators/incremental_dedup).

The contract: classify a delta against PERSISTED corpus fingerprints
(exact via bloom+anti-join, near via the banded MinHash index + exact
Jaccard verify) without re-scanning the corpus, and fold new docs back
into the artifacts so the next run sees them."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.incremental_dedup import (
    build_dedup_state,
    incremental_neardup_dedup,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "pack my box with five dozen liquor jugs for the annual county fair"),
    (3, "sphinx of black quartz judge my vow said the museum curator today"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _state(spark, tmp_path, rows=CORPUS, **kw):
    return build_dedup_state(
        spark, _docs(spark, rows), "doc_id", "text",
        str(tmp_path / "fp"), str(tmp_path / "bands"), **kw
    )


def test_classification_exact_near_new(spark, tmp_path):
    state = _state(spark, tmp_path)
    delta = _docs(spark, [
        (101, CORPUS[0][1]),                      # raw-identical → exact
        (102, CORPUS[1][1].replace(" ", "  ")),   # ws-jitter → near (J=1)
        (103, "completely unrelated text about spark physical plans"),
    ])
    got = {r["id"]: r["status"] for r in incremental_neardup_dedup(
        state, delta, _docs(spark, CORPUS), "doc_id", "text"
    ).collect()}
    assert got == {101: "exact_dup", 102: "near_dup", 103: "new"}


def test_state_accumulates_across_runs(spark, tmp_path):
    state = _state(spark, tmp_path)
    v0 = state.fingerprints.current_version()
    new_text = "brand new document that the corpus has never seen before at all"
    d1 = _docs(spark, [(201, new_text)])
    r1 = incremental_neardup_dedup(
        state, d1, _docs(spark, CORPUS), "doc_id", "text"
    ).collect()
    assert r1 == [type(r1[0])(id=201, status="new")]
    assert state.fingerprints.current_version() == v0 + 1
    # run 2: the same text again → exact dup against RUN-1 state, not corpus
    d2 = _docs(spark, [(301, new_text), (302, new_text.replace(" ", "   "))])
    lookup = _docs(spark, CORPUS + [(201, new_text)])
    got = {r["id"]: r["status"] for r in incremental_neardup_dedup(
        state, d2, lookup, "doc_id", "text"
    ).collect()}
    assert got == {301: "exact_dup", 302: "near_dup"}


def test_append_new_false_leaves_state_untouched(spark, tmp_path):
    state = _state(spark, tmp_path)
    vf = state.fingerprints.current_version()
    vb = state.bands.current_version()
    d = _docs(spark, [(401, "some fresh text never fingerprinted anywhere yet")])
    out = incremental_neardup_dedup(
        state, d, _docs(spark, CORPUS), "doc_id", "text", append_new=False
    ).collect()
    assert [(r["id"], r["status"]) for r in out] == [(401, "new")]
    assert state.fingerprints.current_version() == vf
    assert state.bands.current_version() == vb


def test_build_cap_reports_drops(spark, tmp_path):
    # 5 identical docs share every bucket; cap=2 keeps the 2 lowest ids
    # per (band,bucket) and reports 16 bands x 3 dropped docs = 48 drops
    rows = [(i, "same exact text in every single one of these documents") for i in range(5)]
    state = _state(spark, tmp_path, rows=rows, max_bucket=2)
    assert state.capped_drops == 16 * 3
    assert state.bands.read().count() == 16 * 2


def test_delta_only_cost_no_corpus_rescan(spark, tmp_path):
    """The near stage must re-shingle only candidate partners: a delta
    with NO band hits must produce an empty partner set (pinned by the
    pruned-lookup join being empty, not by scanning all corpus text)."""
    state = _state(spark, tmp_path)
    d = _docs(spark, [(501, "zxqv wvut plmk okij uhyg tgrf")])
    out = incremental_neardup_dedup(
        state, d, _docs(spark, CORPUS), "doc_id", "text", append_new=False
    ).collect()
    assert [(r["id"], r["status"]) for r in out] == [(501, "new")]


def test_semantic_incremental_dedup(spark, tmp_path):
    """Embedding modality: exact copies dup, fresh vectors new, appended
    vectors found by the NEXT run (state accumulation)."""
    from iceberg_evaluation_spark.operators.incremental_dedup import (
        build_semantic_state,
        incremental_semantic_dedup,
    )

    def vec(seed):
        return [float(((seed * 31 + i * 7) % 13) - 6) for i in range(64)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(4)], "vec_id bigint, embedding array<double>"
    )
    state = build_semantic_state(spark, corpus, str(tmp_path / "b"))
    v0 = state.bands.current_version()
    delta = spark.createDataFrame(
        [(101, vec(2)), (102, vec(97))], "vec_id bigint, embedding array<double>"
    )
    got = {r["id"]: r["status"] for r in incremental_semantic_dedup(
        state, delta, corpus
    ).collect()}
    assert got == {101: "dup", 102: "new"}
    assert state.bands.current_version() == v0 + 1  # 102's bands appended
    # run 2: 102's vector re-sent under a new id → dup against run-1 state
    d2 = spark.createDataFrame(
        [(201, vec(97))], "vec_id bigint, embedding array<double>"
    )
    lookup = corpus.unionByName(delta)
    got2 = {r["id"]: r["status"] for r in incremental_semantic_dedup(
        state, d2, lookup, append_new=False
    ).collect()}
    assert got2 == {201: "dup"}
    assert state.bands.current_version() == v0 + 1  # append_new=False: untouched


def test_all_dup_delta_commits_no_empty_versions(spark, tmp_path):
    """An all-dup (or empty) delta must leave the artifact tables at
    their current versions — no no-op snapshot growth in a daily loop."""
    state = _state(spark, tmp_path)
    vf, vb = state.fingerprints.current_version(), state.bands.current_version()
    dup_only = _docs(spark, [(601, CORPUS[0][1])])
    out = incremental_neardup_dedup(
        state, dup_only, _docs(spark, CORPUS), "doc_id", "text"
    ).collect()
    assert [(r["id"], r["status"]) for r in out] == [(601, "exact_dup")]
    assert state.fingerprints.current_version() == vf
    assert state.bands.current_version() == vb
    empty = _docs(spark, []).filter("doc_id > 0")
    assert incremental_neardup_dedup(
        state, empty, _docs(spark, CORPUS), "doc_id", "text"
    ).count() == 0
    assert state.fingerprints.current_version() == vf


def test_missing_lookup_partner_raises(spark, tmp_path):
    """ADVICE r4: a band candidate whose partner text is absent from
    corpus_lookup must raise loudly, not silently classify 'new'."""
    import pytest

    state = _state(spark, tmp_path)
    # near-dup of corpus doc 2, but the lookup omits doc 2
    delta = _docs(spark, [(401, CORPUS[1][1].replace(" ", "  "))])
    short_lookup = _docs(spark, [CORPUS[0], CORPUS[2]])
    with pytest.raises(ValueError, match="corpus_lookup is missing"):
        incremental_neardup_dedup(
            state, delta, short_lookup, "doc_id", "text"
        ).collect()
    # the opt-out keeps the old (documented-lossy) behavior
    got = {r["id"]: r["status"] for r in incremental_neardup_dedup(
        state, delta, short_lookup, "doc_id", "text",
        check_lookup=False, append_new=False,
    ).collect()}
    assert got == {401: "new"}


def test_appends_respect_bucket_cap(spark, tmp_path):
    """ADVICE r4: appended band rows must be capped against STANDING
    bucket occupancy, so a standing (band, bucket) cannot grow without
    bound across deltas."""
    state = _state(spark, tmp_path, max_bucket=3)
    base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # fold three identical-text docs in (independently classified 'new'
    # within one delta is out of scope — use three successive deltas,
    # each with an up-to-date lookup)
    lookup_rows = list(CORPUS)
    for i, doc_id in enumerate([501, 502, 503, 504, 505]):
        delta = _docs(spark, [(doc_id, base_text)])
        incremental_neardup_dedup(
            state, delta, _docs(spark, lookup_rows), "doc_id", "text"
        ).collect()
        lookup_rows.append((doc_id, base_text))
        # identical text → identical 16 band rows; after the first doc
        # lands, the rest are exact dups and append nothing
    occ = (
        state.bands.read().groupBy("band", "bucket").count()
        .agg(F.max("count").alias("m")).collect()[0]["m"]
    )
    assert occ <= 3
    # now force NON-exact near-identical docs (distinct texts, shared
    # shingles → same buckets) via suffix jitter that keeps most bands
    for j, doc_id in enumerate([601, 602, 603, 604, 605, 606]):
        txt = base_text + f" tail{j}"
        delta = _docs(spark, [(doc_id, txt)])
        incremental_neardup_dedup(
            state, delta, _docs(spark, lookup_rows), "doc_id", "text",
            threshold=1.1,  # never verifies → always 'new' → always appends
        ).collect()
        lookup_rows.append((doc_id, txt))
    occ2 = (
        state.bands.read().groupBy("band", "bucket").count()
        .agg(F.max("count").alias("m")).collect()[0]["m"]
    )
    assert occ2 <= 3, f"bucket grew past the cap: {occ2}"


def test_append_drop_count_is_observable(spark, tmp_path):
    """ADVICE r5: recall loss from append-time capping must be visible —
    state.append_drops accumulates the band rows the cap removed across
    deltas (0 while buckets have headroom)."""
    state = _state(spark, tmp_path, max_bucket=3)
    assert state.append_drops == 0
    base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    lookup_rows = list(CORPUS)
    drops_seen = [0]
    for j, doc_id in enumerate([701, 702, 703, 704, 705, 706]):
        txt = base_text + f" tail{j}"
        incremental_neardup_dedup(
            state, _docs(spark, [(doc_id, txt)]),
            _docs(spark, lookup_rows), "doc_id", "text",
            threshold=1.1,  # never verifies → always 'new' → always appends
        ).collect()
        lookup_rows.append((doc_id, txt))
        assert state.append_drops >= drops_seen[0]  # monotone
        drops_seen[0] = state.append_drops
    # 6 near-identical docs share most buckets; cap 3 must have dropped
    assert state.append_drops > 0


def test_semantic_state_carries_cap_and_srp_params(spark, tmp_path):
    """ADVICE r5: the semantic cap/geometry travel WITH the state — a
    caller can no longer pass a mismatched max_bucket or SRP kwargs."""
    from iceberg_evaluation_spark.operators.incremental_dedup import (
        SemanticState,
        build_semantic_state,
        incremental_semantic_dedup,
    )

    def vec(seed):
        return [float(((seed * 31 + i * 7) % 13) - 6) for i in range(64)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(4)], "vec_id bigint, embedding array<double>"
    )
    state = build_semantic_state(
        spark, corpus, str(tmp_path / "sem"), max_bucket=7
    )
    assert isinstance(state, SemanticState)
    assert state.max_bucket == 7 and state.append_drops == 0
    # delta probed with the state's own geometry: exact copy still dup
    delta = spark.createDataFrame(
        [(50, vec(1))], "vec_id bigint, embedding array<double>"
    )
    got = {r["id"]: r["status"] for r in incremental_semantic_dedup(
        state, delta, corpus, append_new=False
    ).collect()}
    assert got == {50: "dup"}

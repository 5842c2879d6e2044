"""Property-based invariants of the incremental cross-run dedup family:
for ANY corpus and delta drawn from a small token universe, the
classification must satisfy the operator's contract —

- precision: every 'exact_dup' has a raw-equal fingerprinted partner;
  every 'near_dup' has a word-3-gram-Jaccard ≥ threshold partner among
  the fingerprinted docs (verified here against an exact Python
  recomputation, an independent implementation path);
- guaranteed recall: a delta doc whose NORMALIZED text equals some
  fingerprinted doc's can never be 'new' (identical shingles → identical
  MinHash signature → identical band buckets → candidate → J = 1);
- partition: every delta row gets exactly one status;
- accumulation: replaying the same delta after the fold-back yields
  nothing 'new'.

Banding recall for 0.7 ≤ J < 1 pairs is probabilistic by design, so the
properties deliberately avoid asserting it — the contract is precision
plus norm-identical recall, the same guarantees the registered oracles
pin (q104/q106)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_evaluation_spark.operators.incremental_dedup import (
    build_dedup_state,
    incremental_neardup_dedup,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta"]

text_st = st.lists(
    st.sampled_from(WORDS), min_size=1, max_size=8
).map(" ".join)
corpus_st = st.lists(text_st, min_size=1, max_size=5)
delta_st = st.lists(text_st, min_size=1, max_size=4)


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.lower()).strip()


def _shingles(t: str) -> frozenset:
    toks = _norm(t).split(" ")
    if len(toks) <= 3:
        return frozenset({" ".join(toks)})
    return frozenset(
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    )


def _jaccard(a: frozenset, b: frozenset) -> float:
    if not a | b:
        return 0.0
    return len(a & b) / len(a | b)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(corpus=corpus_st, delta=delta_st)
def test_incremental_dedup_contract(spark, tmp_path_factory, corpus, delta):
    tmp = tmp_path_factory.mktemp("incprop")
    corpus_rows = [(i, t) for i, t in enumerate(corpus)]
    delta_rows = [(100 + i, t) for i, t in enumerate(delta)]
    cdf = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    ddf = spark.createDataFrame(delta_rows, "doc_id bigint, text string")
    state = build_dedup_state(
        spark, cdf, "doc_id", "text", str(tmp / "fp"), str(tmp / "bands")
    )
    got = {
        r["id"]: r["status"]
        for r in incremental_neardup_dedup(
            state, ddf, cdf, "doc_id", "text", threshold=0.7
        ).collect()
    }
    # partition: one status per delta row
    assert set(got) == {i for i, _ in delta_rows}

    corpus_texts = [t for _, t in corpus_rows]
    for i, t in delta_rows:
        status = got[i]
        raw_match = t in corpus_texts
        norm_match = any(_norm(t) == _norm(c) for c in corpus_texts)
        jac_match = any(
            _jaccard(_shingles(t), _shingles(c)) >= 0.7 for c in corpus_texts
        )
        if status == "exact_dup":
            assert raw_match, (t, corpus_texts)
        elif status == "near_dup":
            assert not raw_match and jac_match, (t, corpus_texts)
        else:
            # guaranteed recall: norm-identical can never be 'new'
            assert not norm_match, (t, corpus_texts)

    # accumulation: replay the same texts under fresh ids → nothing new
    replay = spark.createDataFrame(
        [(200 + i, t) for i, (_, t) in enumerate(delta_rows)],
        "doc_id bigint, text string",
    )
    lookup = cdf.unionByName(ddf)
    got2 = [
        r["status"]
        for r in incremental_neardup_dedup(
            state, replay, lookup, "doc_id", "text",
            threshold=0.7, append_new=False,
        ).collect()
    ]
    assert "new" not in got2, got2


def test_bucketed_lookup_fetch_is_complete_for_any_id_set(
    spark, tmp_path_factory
):
    """Property: for ANY candidate-id set, a BucketedLookup fetch
    returns every stored row whose id is in the set (the bucket
    superset can include extras, never miss — file pruning is a pure
    optimization). Randomized over id distributions and bucket counts."""
    import random

    from iceberg_evaluation_spark.tables.bucketed_lookup import BucketedLookup

    rnd = random.Random(55)
    base = tmp_path_factory.mktemp("lkprop")
    for trial, n_buckets in enumerate((1, 3, 8)):
        ids = rnd.sample(range(-1000, 100000), k=60)
        df = spark.createDataFrame(
            [(i, f"payload-{i}") for i in ids], "doc_id bigint, text string"
        )
        lk = BucketedLookup.create(
            spark, df, str(base / f"lk{trial}"), "doc_id", "text",
            n_buckets=n_buckets,
        )
        lk.append(
            spark.createDataFrame(
                [(7777777 + trial, "appended")], "doc_id bigint, text string"
            )
        )
        want = set(rnd.sample(ids, k=10)) | {7777777 + trial, -42}  # -42 absent
        probe = spark.createDataFrame(
            [(i,) for i in sorted(want)], "doc_id bigint"
        )
        fetched = {r["doc_id"] for r in lk.fetch(probe).collect()}
        stored = set(ids) | {7777777 + trial}
        assert (want & stored) <= fetched, f"trial {trial} missed ids"
        assert fetched <= stored  # never invents rows

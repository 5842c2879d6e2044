"""Property tests: the round-3 pipeline operators against brute-force
Python models on randomized corpora. The models are written from the
definitions, not from the Spark code, so a shared implementation bug
cannot hide."""

from __future__ import annotations

import math
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_evaluation_spark.operators.lm import unigram_lm_score
from iceberg_evaluation_spark.operators.sampling import stratified_exact_sample
from iceberg_evaluation_spark.operators.span_dedup import duplicated_span_metrics

# small token alphabet → real collisions/overlaps at tiny corpus sizes
_tok = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_doc = st.lists(_tok, min_size=0, max_size=14).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)

K = 3  # window size under test (small so short random docs have windows)


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.lower()).strip()
    return t.split(" ") if t else []


def _model_span_metrics(texts: list[str], k: int) -> dict[int, tuple]:
    """Brute-force: windows as token tuples, dup = in >= 2 distinct docs,
    coverage = size of the union of duplicated [pos, pos+k) intervals."""
    toks = {i: _norm_tokens(t) for i, t in enumerate(texts)}
    wins = {
        i: [tuple(ts[p : p + k]) for p in range(len(ts) - k + 1)]
        for i, ts in toks.items()
    }
    owners: dict[tuple, set[int]] = {}
    for i, ws in wins.items():
        for w in ws:
            owners.setdefault(w, set()).add(i)
    out = {}
    for i, ts in toks.items():
        dup_pos = [p for p, w in enumerate(wins[i]) if len(owners[w]) >= 2]
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + k))
        out[i] = (len(ts), max(len(ts) - k + 1, 0), len(dup_pos), len(covered))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_span_dedup_matches_bruteforce(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_windows"],
            r["n_dup_windows"],
            r["dup_tokens"],
        )
        for r in duplicated_span_metrics(df, k=K).collect()
    }
    assert got == _model_span_metrics(texts, K)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus, vocab_size=st.integers(min_value=1, max_value=6))
def test_unigram_lm_matches_bruteforce(spark, texts, vocab_size):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["nll_bits"])
        for r in unigram_lm_score(df, vocab_size=vocab_size).collect()
    }
    # model: top-V by (count desc, token asc), add-one smoothing
    all_toks = [t for x in texts for t in _norm_tokens(x)]
    counts = Counter(all_toks)
    vocab = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    n, v = len(all_toks), len(vocab)
    expected = {}
    for i, x in enumerate(texts):
        ts = _norm_tokens(x)
        if not ts:
            continue
        lps = [
            math.log2((vocab.get(t, 0) + 1) / (n + v + 1)) for t in ts
        ]
        expected[i] = (
            len(ts),
            sum(1 for t in ts if t not in vocab),
            round(-sum(lps) / len(ts), 4),
        )
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=23), min_size=1, max_size=5),
    frac=st.integers(min_value=0, max_value=1000),
)
def test_stratified_quota_exact_for_any_fraction(spark, sizes, frac):
    rows = [
        (s * 1000 + i, f"s{s}", "en")
        for s, n in enumerate(sizes)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, lang string")
    out = stratified_exact_sample(
        df, ["source", "lang"], frac_permille=frac
    ).collect()
    per = Counter(r["source"] for r in out)
    for s, n in enumerate(sizes):
        assert per[f"s{s}"] == -(-n * frac // 1000)  # ceil(n*frac/1000)
    # every emitted stratum_n reports the true stratum size
    for r in out:
        assert r["stratum_n"] == sizes[int(r["source"][1:])]

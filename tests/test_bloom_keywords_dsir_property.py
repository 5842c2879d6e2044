"""Property tests: Bloom incremental dedup, TF-IDF keywords, and DSIR
importance weights against brute-force Python models on randomized
corpora. Models are written from the definitions, not the Spark code."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_evaluation_spark.operators.bloom_dedup import (
    bloom_prefiltered_anti_join,
)
from iceberg_evaluation_spark.operators.dsir import dsir_importance_weights
from iceberg_evaluation_spark.operators.keywords import tfidf_top_terms

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny alphabets → real collisions at tiny corpus sizes
_fp = st.sampled_from([f"f{i}" for i in range(6)])
_tok = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc = st.lists(_tok, min_size=0, max_size=10).map(" ".join)


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.lower()).strip()
    return t.split(" ") if t else []


@settings(**_SETTINGS)
@given(
    inc=st.lists(_fp, min_size=0, max_size=12),
    ex=st.lists(_fp, min_size=0, max_size=12),
    bits=st.sampled_from([64, 192, 1024]),
)
def test_bloom_matches_anti_join_model(spark, inc, ex, bits):
    # model: anti join keeps every incoming ROW whose fp is absent from
    # existing (multiset-preserving on the incoming side)
    expect = sorted((i, f) for i, f in enumerate(inc) if f not in set(ex))
    incoming = spark.createDataFrame(
        list(enumerate(inc)) or [(None, None)], "id bigint, fp string"
    ).filter("fp IS NOT NULL")
    existing = spark.createDataFrame(
        [(f,) for f in ex] or [(None,)], "fp string"
    ).filter("fp IS NOT NULL")
    for probe in ("literal", "pandas"):
        out = bloom_prefiltered_anti_join(
            incoming, existing, "fp", num_bits=bits, num_hashes=3, probe=probe
        )
        got = sorted((r["id"], r["fp"]) for r in out.collect())
        assert got == expect, f"probe={probe} bits={bits}"


@settings(**_SETTINGS)
@given(docs=st.lists(_doc, min_size=1, max_size=6))
def test_tfidf_matches_bruteforce(spark, docs):
    rows = [(i, f"s{i % 2}", t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = sorted(
        (r["source"], r["term"], r["tf"], r["df"], r["tfidf"], r["term_rank"])
        for r in tfidf_top_terms(df, "text", "doc_id", "source", top_k=3).collect()
    )

    toks = {i: _norm_tokens(t) for i, (_, _, t) in zip(range(len(rows)), rows)}
    n_docs = sum(1 for ts in toks.values() if ts)
    df_cnt = Counter()
    for ts in toks.values():
        for term in set(ts):
            df_cnt[term] += 1
    tf_cnt = Counter()
    for i, ts in toks.items():
        for term in ts:
            tf_cnt[(f"s{i % 2}", term)] += 1
    scored = [
        (src, term, tf, df_cnt[term],
         round(tf * math.log((n_docs + 1) / (df_cnt[term] + 1)), 4))
        for (src, term), tf in tf_cnt.items()
    ]
    expect = []
    for src in {s for s, _ in tf_cnt}:
        rows_s = sorted(
            (x for x in scored if x[0] == src), key=lambda x: (-x[4], x[1])
        )
        expect.extend((*x, rank + 1) for rank, x in enumerate(rows_s[:3]))
    assert got == sorted(expect)


def _bucket(bigram: str, B: int = 1024) -> int:
    return int(hashlib.md5(bigram.encode()).hexdigest()[:8], 16) % B


@settings(**_SETTINGS)
@given(
    docs=st.lists(_doc, min_size=1, max_size=6),
    flags=st.lists(st.booleans(), min_size=6, max_size=6),
)
def test_dsir_matches_bruteforce(spark, docs, flags):
    rows = [(i, bool(flags[i]), t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, tgt boolean, text string")
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_score"])
        for r in dsir_importance_weights(df, "text", "doc_id", "tgt").collect()
    }

    feats = {
        i: [
            f"{ts[p]} {ts[p + 1]}"
            for p in range(len(ts) - 1)
        ]
        for i, (_, _, t) in enumerate(rows)
        if len(ts := _norm_tokens(t)) >= 2
    }
    raw = Counter()
    tgt = Counter()
    for i, fs in feats.items():
        for f_ in fs:
            b = _bucket(f_)
            raw[b] += 1
            if flags[i]:
                tgt[b] += 1
    n_raw, n_tgt = sum(raw.values()), sum(tgt.values())
    assert set(got) == set(feats)
    for i, fs in feats.items():
        lrs = [
            math.log2((tgt[_bucket(f_)] + 1) / (n_tgt + 1024))
            - math.log2((raw[_bucket(f_)] + 1) / (n_raw + 1024))
            for f_ in fs
        ]
        assert got[i][0] == len(fs)
        assert abs(got[i][1] - round(sum(lrs) / len(lrs), 4)) <= 1.01e-4

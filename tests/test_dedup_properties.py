"""Structural guarantees of the approximate dedup family, checked
against exact computations on the real testdata.

- SimHash banding is COMPLETE by pigeonhole: 4×16-bit bands cannot all
  differ when Hamming ≤ 3, so the operator must return exactly the
  pairs with sketch Hamming ≤ max_hamming (no more, no fewer).
- MinHash+LSH output is verified with exact Jaccard, so it must be a
  SUBSET of the exact n-gram-Jaccard pairs at the same threshold and
  shingle size (precision = 1 by construction); its recall on the
  testdata is pinned so a silent banding regression fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.dedup import (
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_frame,
    simhash_near_duplicates,
)
from iceberg_evaluation_spark.sources import load_table


def test_simhash_band_blocking_is_complete(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    sketches = {
        r["_id"]: r["_sh"] for r in simhash_frame(docs, "doc_id", "text", 2).collect()
    }
    ids = sorted(sketches)
    expected = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(((sketches[a] ^ sketches[b]) + (1 << 64)) % (1 << 64)).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_duplicates(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert got == expected


def test_minhash_output_subset_of_exact_jaccard(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, shingle_n=3
        ).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.5, shingle_n=3
        ).collect()
    }
    # precision 1.0: every LSH-surfaced pair is a true pair with the
    # identical exact-Jaccard value
    for pair, j in approx.items():
        assert pair in exact and abs(exact[pair] - j) < 1e-12
    # recall floor on this corpus (banded LSH misses some mid-similarity
    # pairs by design; a drop below this means the banding broke)
    if exact:
        assert len(approx) >= 0.8 * len(exact)


def test_chunking_invariants(spark, sf_smoke):
    # chunk windows must tile every token: starts advance by the stride,
    # ends clamp to n, the last chunk reaches n, and re-splitting each
    # chunk_text yields exactly (tok_end - tok_start) tokens
    from iceberg_evaluation_spark.plans.corpus_text import q58_document_chunks

    chunks = q58_document_chunks(spark, sf_smoke).collect()
    assert chunks
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        n = max(r["tok_end"] for r in rows)
        for j, r in enumerate(rows):
            assert r["chunk_idx"] == j
            assert r["tok_start"] == j * 24
            assert r["tok_end"] == min(j * 24 + 32, n)
            n_toks = len(r["chunk_text"].split(" ")) if r["chunk_text"] else 0
            assert n_toks == r["tok_end"] - r["tok_start"], (doc_id, j)
        assert rows[-1]["tok_end"] == n  # last chunk reaches the end
        if len(rows) > 1:
            assert rows[-2]["tok_end"] - rows[-1]["tok_start"] >= 0  # overlap ≥ 0


def test_jaccard_freq_cap_preserves_pairs_below_cap(spark, sf_smoke):
    """Capped and uncapped paths must agree whenever no shared shingle set
    is entirely above the cap (true on the testdata corpus: max df 25)."""
    from iceberg_evaluation_spark.operators.dedup import ngram_jaccard_pairs
    from iceberg_evaluation_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    uncapped = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    capped = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, max_shingle_df=100
        ).collect()
    }
    assert capped == uncapped


def test_jaccard_freq_cap_recall_edge_is_boilerplate_only(spark):
    """The cap drops only pairs whose EVERY shared shingle is boilerplate;
    values of surviving pairs are untouched."""
    from iceberg_evaluation_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved contact us for details"
    rows = [(i, f"{boiler}") for i in range(10)]  # pure boilerplate docs
    rows += [(100, boiler + " unique alpha beta gamma delta epsilon"),
             (101, boiler + " unique alpha beta gamma delta zeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.3).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.3, max_shingle_df=5
        ).collect()
    }
    # the (100, 101) pair shares rare content shingles → survives the cap
    # with an identical value
    assert (100, 101) in capped
    assert capped[(100, 101)] == uncapped[(100, 101)]
    # every dropped pair involves a pure-boilerplate doc (its shared
    # shingles are all above the cap); the content pair never drops
    dropped = set(uncapped) - set(capped)
    assert dropped and all(a < 100 for a, b in dropped)


def test_ngram_jaccard_require_exact_checks_df_cap(spark):
    """ADVICE r3: the df cap's exactness precondition (no shingle hotter
    than the cap) is scale-dependent — require_exact must CHECK it at
    runtime. Five identical docs make every shingle df=5; with cap=3 the
    capped index generates no candidates at all (every shared shingle is
    hot), which require_exact turns into a loud error instead of a
    silently-empty pair set."""
    import pytest

    from iceberg_evaluation_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(5)],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="exceeds max_shingle_df"):
        ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, max_shingle_df=3,
            require_exact=True,
        ).count()
    # without the check: documented boilerplate-recall contract — the
    # all-hot pairs are simply not generated
    silent = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5, max_shingle_df=3
    )
    assert silent.count() == 0
    # cap above the observed df: exact — all 10 identical pairs, J=1
    ok = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5, max_shingle_df=5,
        require_exact=True,
    )
    assert ok.count() == 10

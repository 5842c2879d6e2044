"""Edge-case tests for the round-3 pipeline operators: substring-span
dedup (q93), unigram-LM scoring (q94), temperature mixture weights
(q95), and stratified exact-quota sampling (q96)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.lm import unigram_lm_score
from iceberg_evaluation_spark.operators.mixture import temperature_mixture_weights
from iceberg_evaluation_spark.operators.sampling import stratified_exact_sample
from iceberg_evaluation_spark.operators.span_dedup import duplicated_span_metrics


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ------------------------------------------------------------- span dedup
def test_span_dedup_planted_shared_span(spark):
    # docs 1 and 2 share one 8-token span embedded at different offsets;
    # doc 3 is disjoint. Exactly the k=8 window inside the span dups.
    span = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = _docs(
        spark,
        [
            (1, f"a1 a2 {span} a3 a4"),
            (2, f"b1 {span}"),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
        ],
    )
    out = {r["doc_id"]: r for r in duplicated_span_metrics(docs, k=8).collect()}
    # doc 1: 12 tokens -> 5 windows; only the window == span duplicates
    assert out[1]["n_windows"] == 5 and out[1]["n_dup_windows"] == 1
    assert out[1]["dup_tokens"] == 8
    assert out[1]["dup_ratio"] == round(8 / 12, 4)
    # doc 2: 9 tokens -> 2 windows, 1 dup
    assert out[2]["n_dup_windows"] == 1 and out[2]["dup_tokens"] == 8
    # doc 3: clean
    assert out[3]["n_dup_windows"] == 0 and out[3]["dup_tokens"] == 0


def test_span_dedup_interval_union_no_double_count(spark):
    # identical 10-token docs: all 3 windows duplicate, but the interval
    # union must cover exactly 10 tokens, not 3*8=24.
    text = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    docs = _docs(spark, [(1, text), (2, text)])
    out = duplicated_span_metrics(docs, k=8).collect()
    for r in out:
        assert r["n_dup_windows"] == 3
        assert r["dup_tokens"] == 10  # union of [0,8) [1,9) [2,10)
        assert r["dup_ratio"] == 1.0


def test_span_dedup_within_doc_repeat_not_cross_doc(spark):
    # a doc repeating its own span (but unique in the corpus) is NOT
    # cross-doc duplicated — that's q83's repetition filter territory.
    span = "r1 r2 r3 r4 r5 r6 r7 r8"
    docs = _docs(spark, [(1, f"{span} mid {span}"), (2, "z1 z2 z3")])
    out = {r["doc_id"]: r for r in duplicated_span_metrics(docs, k=8).collect()}
    assert out[1]["n_dup_windows"] == 0 and out[1]["dup_tokens"] == 0


def test_span_dedup_short_and_empty_docs(spark):
    docs = _docs(spark, [(1, "only three tokens"), (2, ""), (3, "   ")])
    out = {r["doc_id"]: r for r in duplicated_span_metrics(docs, k=8).collect()}
    assert out[1]["n_windows"] == 0 and out[1]["n_tokens"] == 3
    assert out[2]["n_tokens"] == 0 and out[2]["dup_ratio"] == 0.0
    assert out[3]["n_tokens"] == 0


# ------------------------------------------------------------ unigram LM
def test_unigram_lm_closed_form(spark):
    # corpus: 3 docs over tokens {x (4 times), y (2), z (1)}, vocab_size=2
    # -> vocab {x:4, y:2}, N=7, V=2, denom=10
    docs = _docs(spark, [(1, "x x y"), (2, "x x y z"), (3, "")])
    out = {r["doc_id"]: r for r in unigram_lm_score(docs, vocab_size=2).collect()}
    assert set(out) == {1, 2}  # empty doc carries no LM evidence
    px, py, poov = 5 / 10, 3 / 10, 1 / 10
    nll1 = -(2 * math.log2(px) + math.log2(py)) / 3
    nll2 = -(2 * math.log2(px) + math.log2(py) + math.log2(poov)) / 4
    assert out[1]["nll_bits"] == round(nll1, 4)
    assert out[2]["nll_bits"] == round(nll2, 4)
    assert out[1]["n_oov"] == 0 and out[2]["n_oov"] == 1
    assert out[2]["oov_ratio"] == 0.25
    assert out[2]["ppl"] == round(2 ** round(nll2, 4), 2)
    # an all-OOV doc scores strictly worse than an in-vocab doc
    assert out[2]["nll_bits"] > out[1]["nll_bits"]


def test_unigram_lm_vocab_tie_break_deterministic(spark):
    # four tokens all with count 1 and vocab_size=2: selection must take
    # the lexicographically smallest tokens, not an arbitrary pair.
    docs = _docs(spark, [(1, "d c b a")])
    out = unigram_lm_score(docs, vocab_size=2).collect()[0]
    # vocab = {a, b}; c and d are OOV
    assert out["n_oov"] == 2 and out["oov_ratio"] == 0.5


# ----------------------------------------------------- temperature mixture
def test_temperature_weights_closed_form(spark):
    sizes = spark.createDataFrame(
        [("big", 900), ("small", 100)], "source string, n_tokens bigint"
    )
    out = {r["source"]: r for r in temperature_mixture_weights(sizes).collect()}
    ta = math.sqrt(900) + math.sqrt(100)
    assert out["big"]["p_raw"] == 0.9
    assert out["big"]["p_temp"] == round(30 / ta, 6)
    assert out["small"]["p_temp"] == round(10 / ta, 6)
    # flattening: the small source is boosted, the big one damped
    assert out["small"]["boost"] > 1.0 > out["big"]["boost"]
    # probabilities still sum to 1 (within rounding)
    assert abs(out["big"]["p_temp"] + out["small"]["p_temp"] - 1.0) < 1e-5


# ------------------------------------------------------ stratified sample
def test_stratified_sample_exact_quotas(spark):
    rows = [(i, "s%d" % (i % 3), "en") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, lang string")
    out = stratified_exact_sample(
        df, ["source", "lang"], frac_permille=200
    ).toPandas()
    got = out.groupby("source")["doc_id"].count().to_dict()
    # strata sizes: s0=34, s1=33, s2=33 -> ceil(20%) = 7 each
    assert got == {"s0": 7, "s1": 7, "s2": 7}
    assert (out["sample_rank"] <= 7).all()


def test_stratified_sample_deterministic_and_salt_sensitive(spark):
    rows = [(i, "s", "en") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, lang string")
    a1 = sorted(
        r["doc_id"]
        for r in stratified_exact_sample(df, ["source"], frac_permille=100).collect()
    )
    a2 = sorted(
        r["doc_id"]
        for r in stratified_exact_sample(df, ["source"], frac_permille=100).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in stratified_exact_sample(
            df, ["source"], frac_permille=100, salt="other"
        ).collect()
    )
    assert a1 == a2 and len(a1) == 5  # ceil(10% of 50)
    assert a1 != b  # a new salt draws an independent sample


def test_stratified_sample_tiny_stratum_rounds_up(spark):
    # a 1-row stratum at 1% still contributes its ceil quota of 1
    df = spark.createDataFrame(
        [(1, "lonely", "en")], "doc_id bigint, source string, lang string"
    )
    out = stratified_exact_sample(df, ["source", "lang"], frac_permille=10).collect()
    assert len(out) == 1 and out[0]["stratum_n"] == 1


# ------------------------------------------------- budget selection
def test_budget_selection_closed_form(spark):
    from iceberg_evaluation_spark.operators.selection import (
        budget_constrained_selection,
    )

    # two sources, 100 tokens total, budget 50%: ta = sqrt(80)+sqrt(20),
    # quota_a = floor(p_a * 50), filled best-first until the prefix sum
    # would exceed the quota
    rows = [
        # (doc_id, source, n_tokens, quality_score)
        (1, "a", 30, 0.75),
        (2, "a", 30, 0.50),
        (3, "a", 20, 1.00),
        (4, "b", 12, 1.00),
        (5, "b", 8, 0.25),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, n_tokens int, quality_score double"
    )
    out = {r["doc_id"]: r for r in budget_constrained_selection(df).collect()}
    ta = math.sqrt(80) + math.sqrt(20)
    qa = math.floor(round(math.sqrt(80) / ta, 6) * 50)   # 33
    qb = math.floor(round(math.sqrt(20) / ta, 6) * 50)   # 16
    assert qa == 33 and qb == 16
    # source a order: doc3 (q=1.0, cum 20), doc1 (0.75, cum 50 > 33 -> cut)
    assert set(out) == {3, 4}
    assert out[3]["cum_tokens"] == 20 and out[3]["quota"] == 33
    # source b order: doc4 (cum 12 <= 16), doc5 (cum 20 > 16 -> cut)
    assert out[4]["cum_tokens"] == 12 and out[4]["quota"] == 16


def test_budget_selection_full_budget_keeps_everything(spark):
    from iceberg_evaluation_spark.operators.selection import (
        budget_constrained_selection,
    )

    rows = [(i, "s", 10, 0.5) for i in range(5)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, n_tokens int, quality_score double"
    )
    # one source: p_temp = 1.0, budget = all tokens -> nothing cut
    out = budget_constrained_selection(df, budget_frac_permille=1000).collect()
    assert len(out) == 5 and all(r["quota"] == 50 for r in out)


def test_stratified_sample_sharded_hot_stratum(spark):
    # 1000-row hot stratum, 10% at 8 shards: kept count lands in
    # [ceil-quota, quota + shards - 1] and the per-shard samples stay
    # deterministic; shards=1 on the same input is the exact baseline
    rows = [(i, "hot", "en") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, lang string")
    base = stratified_exact_sample(df, ["source", "lang"], frac_permille=100)
    assert base.count() == 100
    shardy = stratified_exact_sample(
        df, ["source", "lang"], frac_permille=100, shards=8
    )
    n = shardy.count()
    assert 100 <= n <= 107
    again = stratified_exact_sample(
        df, ["source", "lang"], frac_permille=100, shards=8
    )
    assert sorted(r["doc_id"] for r in shardy.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # the internal shard key must not leak into the output schema
    assert "_shard" not in shardy.columns


def test_budget_selection_sharded_hot_source(spark):
    """r3 verdict #5: shards>1 splits a hot source into md5 sub-groups
    with floor-divided per-shard quotas. The budget cap must hold EXACTLY
    (shard quotas round DOWN — a hard token ceiling may not round up),
    the window must partition by the shard key (the serialized-hot-source
    pin: a no-op sharding mutation flips this), selection must stay
    deterministic, and the shard key must not leak into the schema."""
    from iceberg_evaluation_spark.operators.selection import (
        budget_constrained_selection,
    )

    rows = [(i, "hot", 10, float((i * 37) % 100) / 100) for i in range(1000)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, n_tokens int, quality_score double"
    )
    # one source: p_temp=1.0, budget = half the tokens → quota = 5000
    base = budget_constrained_selection(df, budget_frac_permille=500)
    base_rows = base.collect()
    assert sum(r["n_tokens"] for r in base_rows) == 5000

    sharded = budget_constrained_selection(
        df, budget_frac_permille=500, shards=8
    )
    got = sharded.collect()
    kept_tokens = sum(r["n_tokens"] for r in got)
    # hard ceiling holds; floor-split loses at most (quota%shards) + per-
    # shard partial-document remainders
    assert kept_tokens <= 5000
    assert kept_tokens >= 5000 - 8 * 10 - (5000 % 8)
    assert all(r["quota"] == 5000 // 8 for r in got)
    assert "_shard" not in sharded.columns
    # determinism
    again = budget_constrained_selection(df, budget_frac_permille=500, shards=8)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in got
    )
    # plan pins: the window partitions by the shard key, and sharding
    # adds NO extra exchange over the unsharded plan
    plan_sharded = sharded._jdf.queryExecution().executedPlan().toString()
    plan_base = base._jdf.queryExecution().executedPlan().toString()
    w_lines = [l for l in plan_sharded.splitlines() if "Window" in l]
    assert any("_shard" in l for l in w_lines), plan_sharded
    assert plan_sharded.count("Exchange") == plan_base.count("Exchange")


def test_epoch_shard_shuffle_contract(spark):
    """Deterministic, balanced, epoch-independent, one exchange."""
    from iceberg_evaluation_spark.operators.shuffle_shards import (
        epoch_shard_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id bigint")
    a = epoch_shard_shuffle(df, n_shards=8, epoch=0)
    rows = a.collect()
    # partition: every doc exactly once, pos is 1..n within each shard
    assert len(rows) == 2000
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # balance: md5 uniformity keeps shards within 2x of each other here
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) < 2 * min(sizes)
    # determinism
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in epoch_shard_shuffle(
        df, n_shards=8, epoch=0).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}
    # epochs draw different permutations
    other = {(r["doc_id"], r["shard"]) for r in epoch_shard_shuffle(
        df, n_shards=8, epoch=1).collect()}
    assert other != {(r["doc_id"], r["shard"]) for r in rows}
    # one exchange: the shard hash-partitioning feeds the window directly
    plan = a._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes the initial plan
    assert final.count("Exchange") == 1, final[:1500]

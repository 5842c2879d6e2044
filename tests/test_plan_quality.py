"""Physical-plan quality gates — the 100 TB design assertions.

A query that is correct but scans all columns, skips pushdown, or
sort-merge-joins a broadcastable dimension is a regression even when the
answer matches; these tests pin the plan shapes that matter at scale
(SURVEY §4: pushdown/pruning built-in, broadcast dims, top-k via
TakeOrderedAndProject)."""

from __future__ import annotations

from iceberg_evaluation_spark.plans import REGISTRY


def _formatted_plan(spark, name: str, sf_dir: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_reaches_parquet(spark, sf_correct):
    plan = _formatted_plan(spark, "q01_pricing_summary", sf_correct)
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate at the scan


def test_column_pruning(spark, sf_correct):
    plan = _formatted_plan(spark, "q01_pricing_summary", sf_correct)
    # lineitem has 11 columns; the scan must read only the 6 used
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_shipdate" in read


def test_dimension_joins_broadcast(spark, sf_correct):
    plan = _formatted_plan(spark, "q02_top_brand_revenue", sf_correct)
    assert plan.count("BroadcastHashJoin") >= 2  # part and supplier
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered(spark, sf_correct):
    plan = _formatted_plan(spark, "q02_top_brand_revenue", sf_correct)
    assert "TakeOrderedAndProject" in plan  # ORDER BY + LIMIT fused, no global sort


def test_semi_anti_joins_planned(spark, sf_correct):
    semi = _formatted_plan(spark, "q14_exists_semi_join", sf_correct)
    anti = _formatted_plan(spark, "q15_not_exists_anti_join", sf_correct)
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_pricing_summary_single_scan_partial_agg(spark, sf_correct):
    plan = _formatted_plan(spark, "q01_pricing_summary", sf_correct)
    # map-side partial aggregation before the shuffle (two HashAggregate levels)
    assert plan.count("HashAggregate") >= 2
    # formatted mode prints each node twice (tree + details) → one scan = 2
    assert plan.count("Scan parquet") == 2


def test_sessionization_single_exchange(spark, sf_correct):
    # the lag window, the running-sum window, and the (user_id, session_idx)
    # groupBy must all reuse ONE hash exchange on user_id: HashPartitioning
    # on user_id satisfies the ClusteredDistribution of the superset key
    plan = _formatted_plan(spark, "q27_event_sessions", sf_correct)
    import re

    # formatted mode prints one "(N) Exchange" detail header per exchange
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}"


def test_rolling_fingerprint_only_fanout_shuffle(spark, sf_correct):
    # per-row fingerprints are narrow; the only permitted Exchange is the
    # ROUND-ROBIN fan-out for under-partitioned single-file inputs —
    # never a hash/range shuffle of payload-sized data
    plan = _formatted_plan(spark, "q39_rolling_fingerprint", sf_correct)
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan


def test_multimodal_metadata_no_shuffle_no_python(spark, sf_correct):
    # metadata census must stay JVM-side (no Python workers) and narrow
    plan = _formatted_plan(spark, "q45_multimodal_metadata", sf_correct)
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_flagship_composite_plan(spark, sf_correct):
    # q52 composes union→joins→rollup→window→limit; the plan must keep
    # the dims broadcast and fuse the final ORDER BY+LIMIT into top-k
    plan = _formatted_plan(spark, "q52_flagship_composite", sf_correct)
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, part
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Expand" in plan  # rollup grouping sets


def test_asof_join_single_exchange(spark, sf_correct):
    # the union+window as-of join must cost ONE shuffle on the key —
    # never a nested-loop/range join over |probes|×|versions|
    import re

    plan = _formatted_plan(spark, "q53_asof_join", sf_correct)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 2  # probe/version branches feed one union shuffle


def test_corpus_wide_plan_lint(spark, sf_smoke):
    """Every registered query's physical plan obeys the engine's scale
    rules: no cartesian product, and no row-at-a-time Python eval —
    Python stages must be Arrow-batched (mapInPandas / ArrowEval)."""
    # intentional scalar-subquery cross joins: 1-row × N, constant cost
    CARTESIAN_OK = {"q18_cross_scalar_ratio"}
    # table-layer/pipeline queries execute side effects at plan-build
    # time; their final read plan is still linted
    problems = []
    for name in sorted(REGISTRY):
        plan = _formatted_plan(spark, name, sf_smoke)
        if "BatchEvalPython" in plan:
            problems.append(f"{name}: row-at-a-time Python UDF in plan")
        if "CartesianProduct" in plan and name not in CARTESIAN_OK:
            problems.append(f"{name}: CartesianProduct join")
    assert not problems, "\n".join(problems)


def test_yoy_cross_channel_is_single_pivot_shuffle(spark, sf_correct):
    """q71 re-expresses the reference's 6-way CTE self-join as ONE
    conditional-pivot aggregation: no self-joins of the year_total CTE,
    customer joined broadcast, top-k fused."""
    plan = _formatted_plan(spark, "q71_yoy_cross_channel", sf_correct)
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "TakeOrderedAndProject" in plan


def test_blocked_neardup_has_no_quadratic_join(spark, sf_correct):
    """q72's blocking must stay an equi-join — any BroadcastNestedLoop /
    cartesian here means the all-pairs anti-pattern crept back."""
    plan = _formatted_plan(spark, "q72_blocked_embedding_neardup", sf_correct)
    assert "BroadcastNestedLoop" not in plan
    assert "Cartesian" not in plan
    # zero Python in the pipeline: signatures are integer built-ins
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_semantic_dedup_stays_blocked(spark, sf_correct):
    """q80 inherits q72's blocking contract: equi-joins only, no
    quadratic fallback, no Python stages."""
    plan = _formatted_plan(spark, "q80_semantic_dedup", sf_correct)
    assert "BroadcastNestedLoop" not in plan
    assert "Cartesian" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_contamination_eval_dict_broadcast(spark, sf_correct):
    """q81's eval-gram dictionary probe must be a broadcast join — a
    shuffled join against a tiny eval set is the wrong plan at any
    corpus scale — and the whole pipeline stays JVM-side."""
    plan = _formatted_plan(spark, "q81_contamination_check", sf_correct)
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_repetition_metrics_all_jvm(spark, sf_correct):
    """q83: explode + hash-agg pipeline, zero Python stages, and the
    mode-style metrics must partial-aggregate map-side."""
    plan = _formatted_plan(spark, "q83_repetition_metrics", sf_correct)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_stratified_sample_single_exchange(spark, sf_correct):
    # row_number and the stratum count share one hash exchange on the
    # strata key (plus the round-robin fan-out for the single-file scan);
    # a second hash/range shuffle would mean the windows stopped sharing
    # their partitioning
    plan = _formatted_plan(spark, "q96_stratified_sample", sf_correct)
    import re

    hash_ex = len(re.findall(r"hashpartitioning", plan))
    assert "rangepartitioning" not in plan
    # both Window nodes list the same hashpartitioning requirement; the
    # plan must contain exactly ONE Exchange detail header for them
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}"
    assert hash_ex >= 1


def test_unigram_lm_model_broadcasts(spark, sf_correct):
    # the fitted vocab must reach the scoring join as a BROADCAST (the
    # model is V rows by contract) and the top-V selection must be a
    # distributed sort+limit, never a single-partition global sort
    plan = _formatted_plan(spark, "q94_unigram_lm_score", sf_correct)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_span_dedup_no_sort_merge_no_python(spark, sf_correct):
    # the window-hash semi join and the doc-level joins stay hash/broadcast
    # (nothing here is pre-sorted, a SortMergeJoin would add two sorts),
    # and the whole operator is JVM-side
    plan = _formatted_plan(spark, "q93_substring_span_dedup", sf_correct)
    assert "InPandas" not in plan and "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_dedup_probe_and_anti_join(spark, sf_correct):
    # the probe output is materialized ONCE (lineage-truncating local
    # checkpoint — the plan reads it back as an ExistingRDD scan for
    # both the definitely-new and candidate branches), and the exact
    # verification plans as a real anti join, not a cartesian
    plan = _formatted_plan(spark, "q98_bloom_incremental_dedup", sf_correct)
    assert "Scan ExistingRDD" in plan  # both branches read the one RDD
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # the checkpoint HIDES the probe from the final plan, so pin the
    # Python discipline on the PRE-checkpoint stage directly: the scale
    # probe must be Arrow-batched, never row-at-a-time
    from iceberg_evaluation_spark.operators.bloom_dedup import (
        bloom_might_tagged,
    )
    from iceberg_evaluation_spark.sources import load_table
    from iceberg_evaluation_spark.functions.text import fingerprint_md5

    inc = load_table(spark, sf_correct, "documents").select(
        fingerprint_md5("text").alias("fp")
    )
    tagged = bloom_might_tagged(inc, [0] * 2048, "fp", 2048 * 64, 4, probe="pandas")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    probe_plan = tagged._jdf.queryExecution().explainString(mode)
    assert "ArrowEvalPython" in probe_plan
    assert "BatchEvalPython" not in probe_plan


def test_tfidf_topk_window_no_python(spark, sf_correct):
    # df/tf join keys on the token (vocabulary-sized — shuffle join is
    # the right shape; broadcasting a 100 TB vocabulary is not), the
    # 1-row N joins broadcast, and everything stays JVM-side
    plan = _formatted_plan(spark, "q99_tfidf_keywords", sf_correct)
    assert "InPandas" not in plan and "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_dsir_model_broadcasts(spark, sf_correct):
    # the fitted bucket model is B rows by contract — it must reach the
    # scoring join as a broadcast, and the operator has no Python stages
    plan = _formatted_plan(spark, "q100_dsir_importance", sf_correct)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "InPandas" not in plan and "EvalPython" not in plan


def test_gated_ingest_model_join_broadcasts(spark, sf_smoke, tmp_path):
    """q115's gate must join the B-row weight vector as a BROADCAST and
    keep the dedup stages free of quadratic joins — the one-pass ingest
    loses its point if the model join shuffles the delta."""
    from pyspark.sql import functions as F

    from iceberg_evaluation_spark.operators.classifier import demo_weight_vector
    from iceberg_evaluation_spark.operators.incremental_dedup import (
        build_dedup_state,
    )
    from iceberg_evaluation_spark.operators.ingest import GatedIngestSession
    from iceberg_evaluation_spark.sources import load_table
    from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    table = SnapshotTable(spark, str(tmp_path / "corpus"))
    table.create_or_replace(docs)
    state = build_dedup_state(
        spark, table.read(), "doc_id", "text",
        str(tmp_path / "fp"), str(tmp_path / "bands"),
    )
    session = GatedIngestSession(
        state, demo_weight_vector(spark, 256), table,
        id_col="doc_id", text_col="text", num_buckets=256,
    )
    delta = docs.limit(20).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"), "text"
    )
    out = session.process_delta(delta, append_new=False)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python

"""Candidate-pruned partner reads (tables/bucketed_lookup) — the r7
fix for the per-delta full-corpus scan in the incremental/gated dedup
loop: the standing corpus lives id-bucketed and a delta's partner fetch
file-prunes to the candidate ids' buckets (IO receipt pinned here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.incremental_dedup import (
    build_dedup_state,
    build_semantic_state,
    incremental_neardup_dedup,
    incremental_semantic_dedup,
)
from iceberg_evaluation_spark.operators.ingest import GatedIngestSession
from iceberg_evaluation_spark.tables.bucketed_lookup import BucketedLookup
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable


def _corpus_rows(n=40):
    return [
        (i, f"document number {i} about topic {i % 7} with body text "
            f"padding alpha beta gamma delta {i * 13 % 101}")
        for i in range(1, n + 1)
    ]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_create_open_fetch_roundtrip(spark, tmp_path):
    docs = _docs(spark, _corpus_rows())
    lk = BucketedLookup.create(
        spark, docs, str(tmp_path / "lk"), "doc_id", "text", n_buckets=8
    )
    # open() restores the geometry from disk
    lk2 = BucketedLookup.open(spark, str(tmp_path / "lk"))
    assert (lk2.id_col, lk2.payload_col, lk2.n_buckets) == ("doc_id", "text", 8)
    assert lk2.read().count() == 40
    ids = spark.createDataFrame([(3,), (17,)], "doc_id bigint")
    fetched = {r["doc_id"] for r in lk2.fetch(ids).collect()}
    assert {3, 17} <= fetched  # superset: the ids' buckets, whole
    assert sorted(lk2.read().columns) == ["doc_id", "text"]


def test_fetch_reads_only_candidate_buckets(spark, tmp_path):
    """The IO receipt: a bounded candidate set touches a strict subset
    of the corpus files — O(candidate-buckets), not O(corpus)."""
    docs = _docs(spark, _corpus_rows(80))
    lk = BucketedLookup.create(
        spark, docs, str(tmp_path / "lk"), "doc_id", "text", n_buckets=16
    )
    all_files = lk.table._read_snapshot(lk.table.current_version())["files"]
    ids = spark.createDataFrame([(5,)], "doc_id bigint")
    touched = lk.fetch_files(ids)
    n_buckets_hit = len(lk.candidate_buckets(ids))
    assert n_buckets_hit == 1
    assert 0 < len(touched) < len(all_files)
    # every touched file sits under the candidate's bucket dir
    (b,) = lk.candidate_buckets(ids)
    assert all(f"_id_bucket={b}" in f for f in touched)
    # empty candidate set reads nothing
    empty = spark.createDataFrame([], "doc_id bigint")
    assert lk.fetch_files(empty) == []
    assert lk.fetch(empty).count() == 0


def test_append_keeps_layout_and_pruning(spark, tmp_path):
    docs = _docs(spark, _corpus_rows(30))
    lk = BucketedLookup.create(
        spark, docs, str(tmp_path / "lk"), "doc_id", "text", n_buckets=8
    )
    lk.append(_docs(spark, [(991, "fresh appended document")]))
    assert lk.read().count() == 31
    ids = spark.createDataFrame([(991,)], "doc_id bigint")
    fetched = {r["doc_id"] for r in lk.fetch(ids).collect()}
    assert 991 in fetched
    # the append's files landed under bucket dirs → still prunable
    touched = lk.fetch_files(ids)
    all_files = lk.table._read_snapshot(lk.table.current_version())["files"]
    assert 0 < len(touched) < len(all_files)


def test_incremental_dedup_same_answers_with_pruned_lookup(spark, tmp_path):
    """Classification must be IDENTICAL whether the lookup is a plain
    DataFrame (per-delta scan) or a BucketedLookup (pruned read)."""
    rows = _corpus_rows()
    docs = _docs(spark, rows)
    delta = _docs(
        spark,
        [
            (101, rows[2][1]),                     # exact dup of id 3
            (102, rows[5][1] + "  extra token"),   # near dup of id 6
            (103, "entirely novel content nothing shares shingles here"),
        ],
    )

    state_a = build_dedup_state(
        spark, docs, "doc_id", "text",
        str(tmp_path / "fp_a"), str(tmp_path / "b_a"),
    )
    plain = {
        r["id"]: r["status"]
        for r in incremental_neardup_dedup(
            state_a, delta, docs, "doc_id", "text", append_new=False
        ).collect()
    }

    state_b = build_dedup_state(
        spark, docs, "doc_id", "text",
        str(tmp_path / "fp_b"), str(tmp_path / "b_b"),
    )
    lk = BucketedLookup.create(
        spark, docs, str(tmp_path / "lk"), "doc_id", "text", n_buckets=8
    )
    pruned = {
        r["id"]: r["status"]
        for r in incremental_neardup_dedup(
            state_b, delta, lk, "doc_id", "text", append_new=False
        ).collect()
    }
    assert plain == pruned
    assert plain[101] == "exact_dup" and plain[103] == "new"


def test_semantic_dedup_with_pruned_lookup(spark, tmp_path):
    import random

    def vec(seed):
        rng = random.Random(seed)
        v = [rng.uniform(-1, 1) for _ in range(16)]
        n = sum(x * x for x in v) ** 0.5
        return [x / n for x in v]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(1, 21)],
        "vec_id bigint, embedding array<double>",
    )
    state = build_semantic_state(
        spark, corpus, str(tmp_path / "sem"), max_bucket=50
    )
    lk = BucketedLookup.create(
        spark, corpus, str(tmp_path / "lk"), "vec_id", "embedding",
        n_buckets=4,
    )
    delta = spark.createDataFrame(
        [(101, vec(7)), (102, vec(9999))],
        "vec_id bigint, embedding array<double>",
    )
    got = {
        r["id"]: r["status"]
        for r in incremental_semantic_dedup(
            state, delta, lk, append_new=False
        ).collect()
    }
    assert got == {101: "dup", 102: "new"}


def test_gated_session_with_bucketed_corpus(spark, tmp_path):
    """End-to-end: the session's standing corpus is a BucketedLookup;
    statuses match the plain-table session and accepted-new rows land
    in the bucketed layout (fetchable + prunable next delta)."""
    rows = _corpus_rows()
    docs = _docs(spark, rows)
    weights = spark.range(64).select(
        F.col("id").cast("int").alias("bucket"), F.lit(1.0).alias("wt")
    )

    lk = BucketedLookup.create(
        spark, docs, str(tmp_path / "corpus"), "doc_id", "text", n_buckets=8
    )
    state = build_dedup_state(
        spark, lk.read(), "doc_id", "text",
        str(tmp_path / "fp"), str(tmp_path / "bands"),
    )
    s = GatedIngestSession(
        state, weights, lk, id_col="doc_id", text_col="text", num_buckets=64
    )
    delta = _docs(
        spark,
        [
            (201, rows[0][1]),   # exact dup
            (202, "fresh accepted document with plenty of scoreable words"),
            (203, "   "),        # featureless → rejected
        ],
    )
    got = {r["id"]: r["status"] for r in s.process_delta(delta).collect()}
    assert got == {201: "exact_dup", 202: "new", 203: "rejected"}
    # accepted-new row joined the bucketed corpus — next delta sees it
    assert lk.read().count() == len(rows) + 1
    delta2 = _docs(spark, [(301, "fresh accepted document with plenty of scoreable words")])
    got2 = {r["id"]: r["status"] for r in s.process_delta(delta2).collect()}
    assert got2 == {301: "exact_dup"}


def test_open_missing_meta_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        BucketedLookup.open(spark, str(tmp_path / "nope"))


def test_bloom_cache_updates_incrementally_and_exactly(spark, tmp_path):
    """r7 probe finding: the per-version bloom rebuild scanned the full
    fingerprint table once per delta. The cache now ORs only the
    APPENDED rows' words in — and the result must be bit-identical to a
    from-scratch build at every version."""
    from iceberg_evaluation_spark.operators.bloom_dedup import build_bloom_words

    docs = _docs(spark, _corpus_rows(30))
    state = build_dedup_state(
        spark, docs, "doc_id", "text",
        str(tmp_path / "fp"), str(tmp_path / "bands"),
    )
    bits, hashes = 1 << 12, 4
    w1 = state.bloom_words(bits, hashes)
    assert state.bloom_words(bits, hashes) is w1  # same-version cache hit
    state.fingerprints.append(
        spark.createDataFrame(
            [(991, "aa" * 16), (992, "bb" * 16)], "id bigint, fp string"
        )
    )
    w2 = state.bloom_words(bits, hashes)
    full = build_bloom_words(
        state.fingerprints.read(), "fp", bits, hashes
    )
    assert w2 == full  # incremental OR == full rebuild, bit for bit
    # different geometry is a different filter — never served from the
    # (num_bits, num_hashes)-keyed cache of another
    w3 = state.bloom_words(1 << 13, 4)
    assert len(w3) != len(w2)


def test_dedup_state_reopens_with_persisted_geometry(spark, tmp_path):
    """r7: the signature geometry is DURABLE state — a restarted
    pipeline reopens the artifacts and classifies identically without
    re-passing any build kwargs; an explicit mismatched shingle width
    raises instead of silently mis-probing the index."""
    from iceberg_evaluation_spark.operators.incremental_dedup import (
        open_dedup_state,
    )

    rows = _corpus_rows()
    docs = _docs(spark, rows)
    build_dedup_state(
        spark, docs, "doc_id", "text",
        str(tmp_path / "fp"), str(tmp_path / "bands"),
        max_bucket=123, shingle_n=4,
    )
    # "tomorrow's run": reopen from disk alone
    state = open_dedup_state(
        spark, str(tmp_path / "fp"), str(tmp_path / "bands")
    )
    assert (state.max_bucket, state.shingle_n) == (123, 4)
    delta = _docs(spark, [(101, rows[0][1]), (102, "novel text entirely")])
    got = {
        r["id"]: r["status"]
        for r in incremental_neardup_dedup(
            state, delta, docs, "doc_id", "text", append_new=False
        ).collect()
    }
    assert got == {101: "exact_dup", 102: "new"}
    with pytest.raises(ValueError, match="build-time geometry"):
        incremental_neardup_dedup(
            state, delta, docs, "doc_id", "text",
            shingle_n=3, append_new=False,
        )


def test_semantic_state_reopens_with_persisted_params(spark, tmp_path):
    from iceberg_evaluation_spark.operators.incremental_dedup import (
        open_semantic_state,
    )
    import random

    def vec(seed):
        rng = random.Random(seed)
        v = [rng.uniform(-1, 1) for _ in range(16)]
        n = sum(x * x for x in v) ** 0.5
        return [x / n for x in v]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(1, 16)],
        "vec_id bigint, embedding array<double>",
    )
    build_semantic_state(
        spark, corpus, str(tmp_path / "sem"), max_bucket=77,
    )
    state = open_semantic_state(spark, str(tmp_path / "sem"))
    assert state.max_bucket == 77
    delta = spark.createDataFrame(
        [(101, vec(5)), (102, vec(5555))],
        "vec_id bigint, embedding array<double>",
    )
    got = {
        r["id"]: r["status"]
        for r in incremental_semantic_dedup(
            state, delta, corpus, append_new=False
        ).collect()
    }
    assert got == {101: "dup", 102: "new"}


def test_partitioned_band_index_same_answers_and_pruned_reads(spark, tmp_path):
    """r7: with index_partitions the band index is hash-partitioned on
    (band, bucket) and a delta's index read file-prunes to its touched
    partitions — identical classifications, bounded IO (receipt via
    pruned_files), geometry restored by open_dedup_state."""
    from iceberg_evaluation_spark.operators.incremental_dedup import (
        _INDEX_PCOL,
        _pband_expr,
        open_dedup_state,
    )

    rows = _corpus_rows(60)
    docs = _docs(spark, rows)
    delta = _docs(
        spark,
        [
            (101, rows[3][1]),                    # exact dup
            (102, rows[8][1] + "  extra token"),  # near dup
            (103, "fresh unseen content with no shared shingles at all"),
        ],
    )

    plain_state = build_dedup_state(
        spark, docs, "doc_id", "text",
        str(tmp_path / "fp_p"), str(tmp_path / "b_p"),
    )
    plain = {
        r["id"]: r["status"]
        for r in incremental_neardup_dedup(
            plain_state, delta, docs, "doc_id", "text"
        ).collect()
    }

    part_state = build_dedup_state(
        spark, docs, "doc_id", "text",
        str(tmp_path / "fp_q"), str(tmp_path / "b_q"),
        index_partitions=64,
    )
    part = {
        r["id"]: r["status"]
        for r in incremental_neardup_dedup(
            part_state, delta, docs, "doc_id", "text"
        ).collect()
    }
    assert plain == part
    assert plain[101] == "exact_dup" and plain[103] == "new"
    # both states accumulated the same band rows for the new doc
    assert (
        plain_state.bands.read().count()
        == part_state.bands.read().select("id", "band", "bucket").count()
    )

    # IO receipt: a tiny probe (one doc -> 16 band keys) touches a
    # strict subset of the index's files
    snap = part_state.bands._read_snapshot(
        part_state.bands.current_version()
    )
    one = _docs(spark, [(7, rows[6][1])])
    from iceberg_evaluation_spark.operators.dedup import _shingle_frame
    from iceberg_evaluation_spark.operators.incremental_dedup import _band_frame

    probe = _band_frame(_shingle_frame(one, "doc_id", "text", 3))
    vals = sorted(
        r["p"]
        for r in probe.select(
            _pband_expr(["band", "bucket"], 64).alias("p")
        ).distinct().collect()
    )
    pruned = part_state.bands.pruned_files([(_INDEX_PCOL, "in", vals)])
    assert 0 < len(pruned) < len(snap["files"])

    # restart restores the layout geometry from DEDUP_META
    reopened = open_dedup_state(
        spark, str(tmp_path / "fp_q"), str(tmp_path / "b_q")
    )
    assert reopened.index_partitions == 64
    again = {
        r["id"]: r["status"]
        for r in incremental_neardup_dedup(
            reopened, delta, docs.unionByName(delta), "doc_id", "text",
            append_new=False,
        ).collect()
    }
    assert again[103] in ("exact_dup", "near_dup")  # folded by run 1


def test_partitioned_semantic_index_same_answers(spark, tmp_path):
    import random

    from iceberg_evaluation_spark.operators.incremental_dedup import (
        open_semantic_state,
    )

    def vec(seed):
        rng = random.Random(seed)
        v = [rng.uniform(-1, 1) for _ in range(16)]
        n = sum(x * x for x in v) ** 0.5
        return [x / n for x in v]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(1, 25)],
        "vec_id bigint, embedding array<double>",
    )
    delta = spark.createDataFrame(
        [(101, vec(9)), (102, vec(31337))],
        "vec_id bigint, embedding array<double>",
    )
    plain = build_semantic_state(
        spark, corpus, str(tmp_path / "s_p"), max_bucket=50
    )
    part = build_semantic_state(
        spark, corpus, str(tmp_path / "s_q"), max_bucket=50,
        index_partitions=16,
    )
    a = {
        r["id"]: r["status"]
        for r in incremental_semantic_dedup(
            plain, delta, corpus, append_new=False
        ).collect()
    }
    b = {
        r["id"]: r["status"]
        for r in incremental_semantic_dedup(
            part, delta, corpus, append_new=False
        ).collect()
    }
    assert a == b == {101: "dup", 102: "new"}
    reopened = open_semantic_state(spark, str(tmp_path / "s_q"))
    assert reopened.index_partitions == 16


def test_compaction_preserves_bucket_pruning(spark, tmp_path):
    """Appends add one file per touched bucket per delta; compaction
    bin-packs them back WITHOUT losing the bucket layout — candidate
    pruning still reads a strict file subset afterwards."""
    docs = _docs(spark, _corpus_rows(40))
    lk = BucketedLookup.create(
        spark, docs, str(tmp_path / "lk"), "doc_id", "text", n_buckets=8
    )
    for wave in range(3):
        lk.append(
            _docs(spark, [(900 + wave, f"delta doc {wave} body")])
        )
    files_before = len(
        lk.table._read_snapshot(lk.table.current_version())["files"]
    )
    lk.compact()
    snap = lk.table._read_snapshot(lk.table.current_version())
    assert len(snap["files"]) < files_before
    assert lk.read().count() == 43
    ids = spark.createDataFrame([(902,)], "doc_id bigint")
    fetched = {r["doc_id"] for r in lk.fetch(ids).collect()}
    assert 902 in fetched
    touched = lk.fetch_files(ids)
    assert 0 < len(touched) < len(snap["files"])
    assert all("_id_bucket=" in f for f in touched)


def test_open_after_payload_schema_evolution_still_fetches(spark, tmp_path):
    """r7 verdict #5 (evolve half): add_column on the standing corpus
    then append rows carrying it — open() must still work, fetch must
    return the evolved column (NULL for pre-evolution rows) and stay
    file-pruned."""
    docs = _docs(spark, _corpus_rows(40))
    root = str(tmp_path / "lk")
    lk = BucketedLookup.create(spark, docs, root, "doc_id", "text", n_buckets=8)
    lk.table.add_column("lang", "string")
    lk2 = BucketedLookup.open(spark, root)
    lk2.append(
        spark.createDataFrame(
            [(100, "evolved doc", "en"), (101, "evolved too", "fr")],
            "doc_id bigint, text string, lang string",
        )
    )
    lk3 = BucketedLookup.open(spark, root)
    ids = spark.createDataFrame([(100,), (3,)], "doc_id bigint")
    got = {r["doc_id"]: r["lang"] for r in lk3.fetch(ids).collect()}
    assert got[100] == "en"
    assert got[3] is None  # pre-evolution row reads NULL
    # pruning receipt survives evolution
    all_files = lk3.table._read_snapshot(lk3.table.current_version())["files"]
    assert 0 < len(lk3.fetch_files(ids)) < len(all_files)


def test_open_refuses_geometry_change(spark, tmp_path):
    """r7 verdict #5 (refuse half): the corpus re-created at the same
    root with a different n_buckets under a STALE meta must refuse to
    open — a silent mismatch would fetch the wrong buckets and miss
    partners."""
    import os
    import shutil

    docs = _docs(spark, _corpus_rows(30))
    root = str(tmp_path / "lk")
    BucketedLookup.create(spark, docs, root, "doc_id", "text", n_buckets=8)
    shutil.copy(os.path.join(root, "LOOKUP_META"), str(tmp_path / "stale"))
    BucketedLookup.create(spark, docs, root, "doc_id", "text", n_buckets=16)
    shutil.copy(str(tmp_path / "stale"), os.path.join(root, "LOOKUP_META"))
    with pytest.raises(ValueError, match="geometry mismatch"):
        BucketedLookup.open(spark, root)


def test_dedup_state_open_refuses_geometry_change(spark, tmp_path):
    """Same refusal for the band index: rebuilt with a different
    shingle width under a stale DEDUP_META → open_dedup_state raises."""
    import os
    import shutil

    from iceberg_evaluation_spark.operators.incremental_dedup import (
        open_dedup_state,
    )

    docs = _docs(spark, _corpus_rows(30))
    fp_root, band_root = str(tmp_path / "fp"), str(tmp_path / "bands")
    build_dedup_state(
        spark, docs, "doc_id", "text", fp_root, band_root, shingle_n=3
    )
    shutil.copy(os.path.join(band_root, "DEDUP_META"), str(tmp_path / "stale"))
    build_dedup_state(
        spark, docs, "doc_id", "text", fp_root, band_root, shingle_n=2
    )
    shutil.copy(str(tmp_path / "stale"), os.path.join(band_root, "DEDUP_META"))
    with pytest.raises(ValueError, match="geometry mismatch"):
        open_dedup_state(spark, fp_root, band_root)


def test_semantic_state_open_refuses_geometry_change(spark, tmp_path):
    import os
    import shutil

    from iceberg_evaluation_spark.operators.incremental_dedup import (
        open_semantic_state,
    )

    vecs = spark.range(30).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda p: ((F.col("id") * (p + 1) % 17) / 17.0).cast("float"),
        ).alias("embedding"),
    )
    band_root = str(tmp_path / "sbands")
    build_semantic_state(spark, vecs, band_root, n_bits=64, band_bits=16)
    shutil.copy(os.path.join(band_root, "DEDUP_META"), str(tmp_path / "stale"))
    build_semantic_state(spark, vecs, band_root, n_bits=64, band_bits=8)
    shutil.copy(str(tmp_path / "stale"), os.path.join(band_root, "DEDUP_META"))
    with pytest.raises(ValueError, match="geometry mismatch"):
        open_semantic_state(spark, band_root)


def _ids_in_bucket(spark, n_buckets, bucket, count, start=1):
    """Deterministic adversarial ids: the first `count` ids >= start that
    hash into `bucket` under pmod(xxhash64, n_buckets)."""
    rows = (
        spark.range(start, start + count * n_buckets * 4)
        .select(
            F.col("id"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(n_buckets)).alias("b"),
        )
        .filter(F.col("b") == bucket)
        .limit(count)
        .collect()
    )
    assert len(rows) == count
    return [r["id"] for r in rows]


def test_hot_bucket_fetch_degrades_and_rebucket_restores(spark, tmp_path):
    """r7 verdict #4: an adversarial corpus whose rows all hash to ONE
    bucket makes every fetch hitting it read ~the whole corpus — and
    rebucket() (bucket evolution) restores bounded per-fetch IO."""
    n0 = 8
    hot = _ids_in_bucket(spark, n0, 3, 400)
    cold = [i for i in range(100_000, 100_400)]
    rows = [(i, f"hot doc {i} " + "x" * 50) for i in hot] + [
        (i, f"cold doc {i}") for i in cold
    ]
    docs = _docs(spark, rows)
    root = str(tmp_path / "lk")
    lk = BucketedLookup.create(spark, docs, root, "doc_id", "text", n_buckets=n0)

    sizes = lk.bucket_sizes()
    assert sizes[3] == max(sizes.values())  # the hot bucket dominates

    one_hot = spark.createDataFrame([(hot[0],)], "doc_id bigint")
    before = lk.fetch(one_hot).count()
    assert before >= 400  # the fetch pays the whole hot bucket

    # bucket evolution: 8 -> 128 splits the hot bucket ~16 ways
    lk2 = lk.rebucket(128)
    assert lk2.n_buckets == 128
    after = lk2.fetch(one_hot).count()
    assert after < before / 4  # bounded again
    assert hot[0] in {r["doc_id"] for r in lk2.fetch(one_hot).collect()}
    # geometry round-trips through open()
    lk3 = BucketedLookup.open(spark, root)
    assert lk3.n_buckets == 128
    assert lk3.read().count() == 800  # nothing lost in the rewrite
    # receipts: per-fetch file count strictly shrinks too
    all_files = lk3.table._read_snapshot(lk3.table.current_version())["files"]
    assert 0 < len(lk3.fetch_files(one_hot)) < len(all_files)


def test_many_delta_appends_then_compact_bounds_file_count(spark, tmp_path):
    """Appends add one file per touched bucket per delta; compact()
    keeps the per-fetch FILE count flat (the other half of the
    hot-bucket story — file-count skew, not byte skew)."""
    n0 = 8
    hot = _ids_in_bucket(spark, n0, 5, 60)
    root = str(tmp_path / "lk")
    lk = BucketedLookup.create(
        spark,
        _docs(spark, [(hot[0], "seed")]),
        root, "doc_id", "text", n_buckets=n0,
    )
    for i in range(1, 21):  # 20 deltas, every one hits bucket 5
        lk.append(_docs(spark, [(hot[i], f"delta {i}"), (hot[i + 20], f"d{i}")]))
    one_hot = spark.createDataFrame([(hot[0],)], "doc_id bigint")
    files_before = len(lk.fetch_files(one_hot))
    assert files_before >= 20  # one file per delta landed in the bucket
    lk.compact(target_file_mb=128)
    files_after = len(lk.fetch_files(one_hot))
    assert files_after <= 2
    assert lk.fetch(one_hot).count() == 41  # seed + 2*20 rows, none lost


def test_rebucket_rejects_concurrent_append(spark, tmp_path, monkeypatch):
    """A delta appended while rebucket's rewrite is in flight must
    surface as a ConcurrentCommitError, never be silently dropped by
    the full rewrite."""
    from iceberg_evaluation_spark.tables.snapshot_table import (
        ConcurrentCommitError,
    )

    docs = _docs(spark, _corpus_rows(30))
    root = str(tmp_path / "lk")
    lk = BucketedLookup.create(spark, docs, root, "doc_id", "text", n_buckets=8)

    orig = lk.table.create_or_replace

    def racy(*args, **kwargs):
        # a concurrent writer lands a delta between rebucket's input
        # scan and its commit
        BucketedLookup.open(spark, root).append(
            _docs(spark, [(999, "late delta")])
        )
        return orig(*args, **kwargs)

    monkeypatch.setattr(lk.table, "create_or_replace", racy)
    with pytest.raises(ConcurrentCommitError):
        lk.rebucket(32)
    monkeypatch.undo()
    # nothing lost: the late delta is in the (un-rebucketed) corpus
    lk2 = BucketedLookup.open(spark, root)
    assert lk2.n_buckets == 8
    assert lk2.read().count() == 31
    # the retry on fresh state succeeds and carries the delta
    lk3 = lk2.rebucket(32)
    assert lk3.read().count() == 31


def test_dedup_state_compact_preserves_pruning_and_answers(spark, tmp_path):
    """Every folded delta appends one file per touched index partition;
    DedupState.compact() bin-packs the artifacts back while keeping the
    identity partitioning (pruned partner reads intact), the geometry
    witness (open still passes), and the classifications byte-identical."""
    from iceberg_evaluation_spark.operators.incremental_dedup import (
        _INDEX_PCOL,
        _band_frame,
        _pband_expr,
        open_dedup_state,
    )

    rows = _corpus_rows(40)
    docs = _docs(spark, rows)
    state = build_dedup_state(
        spark, docs, "doc_id", "text",
        str(tmp_path / "fp_c"), str(tmp_path / "b_c"),
        index_partitions=32,
    )
    # fragment: fold several singleton deltas (one run per day)
    for j in range(4):
        incremental_neardup_dedup(
            state,
            _docs(spark, [(200 + j, f"daily delta number {j} with wholly "
                                     f"novel shingle content {j * 17}")]),
            docs, "doc_id", "text",
        ).collect()
        docs = docs  # the lookup arg stays the original corpus
    frag_files = len(
        state.bands._read_snapshot(state.bands.current_version())["files"]
    )
    delta = _docs(spark, [
        (301, rows[3][1]),                       # exact dup
        (302, "daily delta number 2 with wholly novel shingle content 34"),
        (303, "never seen sentence about adaptive query execution plans"),
    ])
    lookup = _docs(
        spark,
        rows + [(200 + j, f"daily delta number {j} with wholly novel "
                          f"shingle content {j * 17}") for j in range(4)],
    )
    before = {
        r["id"]: r["status"]
        for r in incremental_neardup_dedup(
            state, delta, lookup, "doc_id", "text", append_new=False
        ).collect()
    }
    assert before[301] == "exact_dup" and before[302] == "exact_dup"
    assert before[303] == "new"

    receipt = state.compact()
    assert receipt["bands"]["files_after"] < frag_files
    assert (
        receipt["fingerprints"]["files_after"]
        <= receipt["fingerprints"]["files_before"]
    )

    # geometry witness unchanged: open passes; answers identical
    reopened = open_dedup_state(
        spark, str(tmp_path / "fp_c"), str(tmp_path / "b_c")
    )
    after = {
        r["id"]: r["status"]
        for r in incremental_neardup_dedup(
            reopened, delta, lookup, "doc_id", "text", append_new=False
        ).collect()
    }
    assert after == before
    # pruned partner reads still prune: a one-doc probe touches a
    # strict subset of the compacted index's files
    from iceberg_evaluation_spark.operators.dedup import _shingle_frame

    probe = _band_frame(_shingle_frame(
        _docs(spark, [(7, rows[6][1])]), "doc_id", "text", 3
    ))
    vals = sorted(
        r["p"]
        for r in probe.select(
            _pband_expr(["band", "bucket"], 32).alias("p")
        ).distinct().collect()
    )
    snap = reopened.bands._read_snapshot(reopened.bands.current_version())
    pruned = reopened.bands.pruned_files([(_INDEX_PCOL, "in", vals)])
    assert 0 < len(pruned) < len(snap["files"])

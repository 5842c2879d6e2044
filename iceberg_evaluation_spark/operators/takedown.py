"""Takedown propagation: drive corpus deletions through every standing
derived artifact.

The corpus layer already handles deletes — the delete-aware conditional
MERGE (M5; reference updating_db_with_deltas_iceberg.ipynb cell 26) and
``DROP … PURGE`` (M9) — and ``table_changes`` (operators/changelog.py)
emits ``delete``-typed change rows for them. But a 100 TB training-data
pipeline keeps DERIVED standing state alongside the corpus: dedup band
indexes, SRP semantic bands, ANN inverted lists, id-bucketed lookups,
session bloom caches. An opt-out / contamination / license takedown
that only deletes the corpus row leaves the document's fingerprints in
every index — deleted content keeps matching as a "duplicate" partner
and keeps surfacing in ANN results, which defeats the takedown.

This module is the missing composition (r9 verdict #1): extract the
deleted ids from a CDF window and fan them out to every registered
artifact's delete surface —

- :meth:`DedupState.apply_deletes` — fingerprint + LSH band purge
  (bloom cache compensated by construction: the exact anti-join
  discharges stale bits; see that method's docstring);
- :meth:`SemanticState.apply_deletes` — SRP band purge;
- :meth:`AnnState.delete` — inverted-list purge, cell layout intact;
- :meth:`BucketedLookup.delete` — bucket-pruned corpus-copy purge.

Every surface routes through ``SnapshotTable.delete_keys``: a
column-pruned match scan locates the files holding a deleted id and
ONLY those files are rewritten — takedown cost tracks the deleted ids'
locality, never the corpus size. A no-op window (no deletes) commits
nothing anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["takedown_ids", "propagate_takedown"]


def takedown_ids(changes: DataFrame, id_col: str) -> DataFrame:
    """The distinct ids a CDF window DELETEd (``_change_type =
    'delete'`` — true removals only, not update retractions: an
    ``update_preimage`` row's document still exists post-window and
    must keep its index entries)."""
    return (
        changes.filter(F.col("_change_type") == "delete")
        .select(id_col)
        .distinct()
    )


def propagate_takedown(
    ids: DataFrame,
    *,
    dedup_state=None,
    semantic_state=None,
    ann_state=None,
    lookups=(),
    mode: str = "copy-on-write",
) -> dict:
    """Purge ``ids`` (single-column DataFrame) from every provided
    standing artifact. Pass the artifacts a pipeline actually maintains;
    each is optional. The ids frame is checkpointed once and reused —
    each artifact's delete is its own atomic snapshot commit, so a
    crash mid-propagation leaves some artifacts purged and some not;
    re-running the SAME takedown is idempotent everywhere (the second
    pass matches nothing and commits nothing), so the recovery story is
    "re-run the propagation".

    ``mode='merge-on-read'`` routes the band-index and lookup purges
    through equality-delete files (O(|victims|) write cost however the
    victims scatter across the partition layouts — the 100 TB takedown
    shape; the artifacts' reads are MOR-aware and their ``compact()``
    materializes). The ANN index always takes the copy-on-write path:
    its cell-evolution machinery (``split_cell``) operates on
    delete-free snapshots, and victims are cell-local anyway.

    Returns a receipt of removed-row counts per artifact — the audit
    evidence a takedown obligation wants."""
    ids = ids.localCheckpoint(eager=False)
    receipt: dict = {}
    if dedup_state is not None:
        receipt["dedup"] = dedup_state.apply_deletes(ids, mode=mode)
    if semantic_state is not None:
        receipt["semantic"] = semantic_state.apply_deletes(ids, mode=mode)
    if ann_state is not None:
        receipt["ann_rows"] = ann_state.delete(ids)
    for i, lk in enumerate(lookups):
        receipt[f"lookup_{i}_rows"] = lk.delete(ids, mode=mode)
    return receipt

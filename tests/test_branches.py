"""Branch refs + write-audit-publish (tables/snapshot_table.BranchTable)."""

from __future__ import annotations

import os
import time

import pytest

from iceberg_evaluation_spark.tables.snapshot_table import (
    ConcurrentCommitError,
    MergeClause,
    SnapshotTable,
)


def _mk(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create_or_replace(
        spark.createDataFrame([(1, 10), (2, 20)], "id bigint, v bigint")
    )
    return t


def test_wap_stage_audit_publish(spark, tmp_path):
    t = _mk(spark, tmp_path)
    br = t.create_branch("wap")
    # stage: writes land on the branch only
    br.append(spark.createDataFrame([(3, 30)], "id bigint, v bigint"))
    br.merge(
        spark.createDataFrame([(1, 11)], "id bigint, v bigint"),
        on=["id"], clause=MergeClause(matched_update={"v": "s.v"}),
    )
    assert sorted(map(tuple, t.read().collect())) == [(1, 10), (2, 20)]
    assert sorted(map(tuple, br.read().collect())) == [(1, 11), (2, 20), (3, 30)]
    # audit passes → publish: main fast-forwards to the branch head,
    # including the branch's intermediate history for time travel
    head = t.fast_forward("wap")
    assert t.current_version() == head == br.current_version()
    assert sorted(map(tuple, t.read().collect())) == [(1, 11), (2, 20), (3, 30)]
    assert sorted(map(tuple, t.read(version=2).collect())) == [
        (1, 10), (2, 20), (3, 30)
    ]
    assert t.branches() == ["wap"]
    t.drop_branch("wap")
    assert t.branches() == []


def test_diverged_main_refuses_fast_forward(spark, tmp_path):
    t = _mk(spark, tmp_path)
    br = t.create_branch("stale")
    br.append(spark.createDataFrame([(3, 30)], "id bigint, v bigint"))
    t.append(spark.createDataFrame([(9, 90)], "id bigint, v bigint"))
    with pytest.raises(ConcurrentCommitError, match="re-branch"):
        t.fast_forward("stale")
    # both timelines intact after the refused publish
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 9]
    assert sorted(r["id"] for r in br.read().collect()) == [1, 2, 3]


def test_gc_never_crosses_timelines(spark, tmp_path):
    """Orphan GC / expiry on one timeline must treat the other's
    references as live — in BOTH directions."""
    t = _mk(spark, tmp_path)
    br = t.create_branch("b")
    br.append(spark.createDataFrame([(3, 30)], "id bigint, v bigint"))
    # main's orphan sweep must not eat the branch's fresh files
    old = time.time() + 60  # make cutoff generous: sweep "future" orphans
    t.remove_orphan_files(older_than_ms=int(old * 1000))
    assert sorted(r["id"] for r in br.read().collect()) == [1, 2, 3]
    # branch expiry must not eat files main still references
    t.append(spark.createDataFrame([(4, 40)], "id bigint, v bigint"))
    br.append(spark.createDataFrame([(5, 50)], "id bigint, v bigint"))
    br.expire_snapshots(keep_last=1)
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 4]
    # and main expiry keeps what the branch references
    t.expire_snapshots(keep_last=1)
    assert sorted(r["id"] for r in br.read().collect()) == [1, 2, 3, 5]


def test_branch_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create_branch("b")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("b")
    with pytest.raises(ValueError, match="invalid branch name"):
        t.create_branch("a/b")
    with pytest.raises(ValueError, match="does not exist"):
        t.branch("ghost")
    br = t.branch("b")
    with pytest.raises(ValueError, match="main-timeline"):
        br.create_tag("nope")
    with pytest.raises(ValueError, match="drop_branch"):
        br.drop(purge=True)
    assert os.path.isdir(t.root)


def test_abandoned_branch_files_become_orphans(spark, tmp_path):
    t = _mk(spark, tmp_path)
    br = t.create_branch("bad")
    br.append(spark.createDataFrame([(3, 30)], "id bigint, v bigint"))
    t.drop_branch("bad")
    removed = t.remove_orphan_files(
        older_than_ms=int((time.time() + 60) * 1000)
    )
    assert removed > 0  # the abandoned append's files got collected
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2]


def test_concurrent_main_manifest_fails_publish_loudly(spark, tmp_path):
    """Review fix: a main commit that lands its manifest at a branch
    version number DURING the publish must make fast_forward raise —
    never return success while the staged rows silently miss main."""
    t = _mk(spark, tmp_path)
    br = t.create_branch("wap")
    br.append(spark.createDataFrame([(3, 30)], "id bigint, v bigint"))
    # a concurrent appender linked ITS v2 manifest but has not flipped
    # the pointer yet (the exact interleaving the old code turned into
    # a silent no-op publish)
    import json
    import shutil

    alien = dict(br._read_snapshot(2))
    alien["summary"] = {"alien": True}  # different content, same version
    with open(t._snapshot_path(2), "w") as f:
        json.dump(alien, f)
    with pytest.raises(ConcurrentCommitError, match="re-branch"):
        t.fast_forward("wap")
    assert t.current_version() == 1  # pointer untouched
    assert sorted(r["id"] for r in br.read().collect()) == [1, 2, 3]


def test_publish_failure_unpublishes_partial_links(spark, tmp_path):
    """If the conflict is detected at a LATER branch version, the
    manifests already linked by this publish are removed again — no
    half-published history left for the adoption path to pick up."""
    import json

    t = _mk(spark, tmp_path)
    br = t.create_branch("wap")
    br.append(spark.createDataFrame([(3, 30)], "id bigint, v bigint"))   # v2
    br.append(spark.createDataFrame([(4, 40)], "id bigint, v bigint"))   # v3
    alien = dict(br._read_snapshot(3))
    alien["summary"] = {"alien": True}
    with open(t._snapshot_path(3), "w") as f:
        json.dump(alien, f)
    with pytest.raises(ConcurrentCommitError):
        t.fast_forward("wap")
    # v2 (linked before the v3 conflict) must have been unpublished
    assert not os.path.exists(t._snapshot_path(2))
    assert t.current_version() == 1


def test_flip_refuses_vanished_manifest(spark, tmp_path):
    """ADVICE r6 (medium): an EEXIST adopter that validated a manifest
    linked by an in-progress fast_forward must NOT flip the pointer to
    it after the publish rolled back and unlinked it — that would
    publish a dangling version. The flip re-verifies the manifest
    exists under the lock and raises instead."""
    t = _mk(spark, tmp_path)
    assert t.current_version() == 1
    with pytest.raises(ConcurrentCommitError, match="unpublished"):
        t._flip_version_monotonic(2)  # no v2 manifest exists
    assert t.current_version() == 1  # pointer untouched
    # and no stale lock left behind
    assert not os.path.exists(t._version_file() + ".lock")


def test_create_branch_seeds_only_up_to_fork(spark, tmp_path):
    """ADVICE r6: a completed-but-unadopted manifest ABOVE the recorded
    fork point (crashed writer, or a concurrently-landing main commit)
    must not be copied into the branch log — the branch's first commit
    would hit EEXIST on it and fold a main commit into the branch
    timeline, breaking WAP isolation."""
    import json

    t = _mk(spark, tmp_path)  # main at v1
    # plant a completed-but-unadopted v2 manifest: VERSION still reads 1
    orphan = dict(t._read_snapshot(1))
    orphan["version"] = 2
    orphan["summary"] = {"orphan": True}
    with open(t._snapshot_path(2), "w") as f:
        json.dump(orphan, f)
    assert t.current_version() == 1
    br = t.create_branch("wap")
    # the branch log holds only fork-reachable history
    assert [s["version"] for s in br._snapshots()] == [1]
    # and the branch's first commit claims v2 cleanly on ITS timeline
    br.append(spark.createDataFrame([(3, 30)], "id bigint, v bigint"))
    assert br.current_version() == 2
    assert sorted(r["id"] for r in br.read().collect()) == [1, 2, 3]
    assert br._read_snapshot(2)["operation"] == "append"


def test_unpublish_links_spares_adopted_versions(spark, tmp_path):
    """ADVICE r6: a stolen-from publisher withdraws only manifests
    still ABOVE the current pointer — an already-adopted version is
    part of the published chain and must stay."""
    import json

    t = _mk(spark, tmp_path)  # v1
    t.append(spark.createDataFrame([(3, 30)], "id bigint, v bigint"))  # v2
    # simulate a publish that linked v2 (now adopted: pointer == 2) and
    # v3 (not adopted: pointer < 3)
    phantom = dict(t._read_snapshot(2))
    phantom["version"] = 3
    with open(t._snapshot_path(3), "w") as f:
        json.dump(phantom, f)
    t._unpublish_links([(2, t._snapshot_path(2)), (3, t._snapshot_path(3))])
    assert os.path.exists(t._snapshot_path(2))      # adopted: kept
    assert not os.path.exists(t._snapshot_path(3))  # unadopted: withdrawn
    assert t.current_version() == 2
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3]
    assert not os.path.exists(t._version_file() + ".lock")


def test_publish_refusal_property_over_random_interleavings(spark, tmp_path):
    """Property (r6 verdict #6): across random interleavings of branch
    staging and main commits, fast_forward succeeds iff main made NO
    commit since the fork; a refusal leaves both timelines intact and a
    re-branch from current main always publishes cleanly."""
    import random

    rnd = random.Random(9)
    for trial in range(6):
        t = SnapshotTable(spark, str(tmp_path / f"t{trial}"))
        t.create_or_replace(
            spark.createDataFrame([(1, 10), (2, 20)], "id bigint, v bigint")
        )
        fork_rows = t.read().count()
        br = t.create_branch("wap")
        staged = 0
        for i in range(rnd.randint(1, 2)):
            br.append(
                spark.createDataFrame(
                    [(100 + trial * 10 + i, 1)], "id bigint, v bigint"
                )
            )
            staged += 1
        n_main = rnd.randint(0, 2)
        for i in range(n_main):
            t.append(
                spark.createDataFrame(
                    [(500 + trial * 10 + i, 2)], "id bigint, v bigint"
                )
            )
        if n_main == 0:
            head = t.fast_forward("wap")
            assert head == br.current_version()
            assert t.read().count() == fork_rows + staged
        else:
            with pytest.raises(ConcurrentCommitError, match="re-branch"):
                t.fast_forward("wap")
            # both timelines intact after the refusal
            assert t.read().count() == fork_rows + n_main
            assert br.read().count() == fork_rows + staged
            # rebase from CURRENT main always publishes
            br2 = t.create_branch("wap2")
            br2.append(
                spark.createDataFrame(
                    [(900 + trial, 3)], "id bigint, v bigint"
                )
            )
            t.fast_forward("wap2")
            assert t.read().count() == fork_rows + n_main + 1


def test_tag_aware_expiry_property_over_random_histories(spark, tmp_path):
    """Property (r6 verdict #8): across random interleavings of appends,
    create_tag/drop_tag, expire_snapshots, and remove_orphan_files —
    tagged versions NEVER expire (their reads stay exact however old),
    orphan GC never touches tag-reachable files, and dropping the tag
    releases the version at the next expiry. Red under a mutation that
    ignores tags as GC roots."""
    import random
    import time

    rnd = random.Random(31)
    t = SnapshotTable(spark, str(tmp_path / "hist"))
    t.create_or_replace(spark.createDataFrame([(0, 0)], "id bigint, v bigint"))
    expected = {1: 1}          # version -> row count at that version
    tags: dict[str, int] = {}  # live tags -> version
    rows = 1
    next_id = 1
    t.create_tag("t1")         # guarantee an OLD tagged version exists
    tags["t1"] = 1
    future = lambda: int((time.time() + 60) * 1000)

    for step in range(12):
        op = rnd.choice(["append", "append", "tag", "drop_tag", "expire", "gc"])
        if op == "append":
            n = rnd.randint(1, 2)
            t.append(
                spark.createDataFrame(
                    [(next_id + i, step) for i in range(n)],
                    "id bigint, v bigint",
                )
            )
            next_id += n
            rows += n
            expected[t.current_version()] = rows
        elif op == "tag":
            name = f"t{t.current_version()}"
            if name not in tags:
                tags[name] = t.create_tag(name)
        elif op == "drop_tag" and len(tags) > 1:  # keep t1 as the old root
            name = rnd.choice(sorted(set(tags) - {"t1"}))
            t.drop_tag(name)
            del tags[name]
        elif op == "expire":
            t.expire_snapshots(keep_last=rnd.randint(1, 2))
        elif op == "gc":
            t.remove_orphan_files(older_than_ms=future())
        # invariants after EVERY step: current + every tagged version read
        assert t.read().count() == rows, f"step {step} ({op})"
        for name, v in tags.items():
            assert t.read(version=v).count() == expected[v], (
                f"step {step} ({op}): tagged {name}=v{v} lost rows"
            )
            assert t.read_tag(name).count() == expected[v]

    # the old tagged version survived everything; dropping the tag
    # releases it at the next expiry
    assert t.read_tag("t1").count() == expected[1]
    t.drop_tag("t1")
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files(older_than_ms=future())
    import os as _os

    live = [s["version"] for s in t._snapshots()]
    assert 1 not in live or t.current_version() == 1
    assert t.read().count() == rows  # head unaffected
    assert not _os.path.exists(t._version_file() + ".lock")

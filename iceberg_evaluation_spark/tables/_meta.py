"""Atomic single-file JSON metadata persist/load.

The durable-geometry pattern shared by DEDUP_META (dedup-state
geometry), LOOKUP_META (bucketed-lookup layout), and ROLLUP_META
(refresh checkpoint): write to a tmp sibling, then ``os.replace`` so a
crash mid-write can never leave a torn file — readers see the old meta
or the new one, nothing in between.
"""

from __future__ import annotations

import json
import os
from typing import Any

__all__ = ["read_json_meta", "write_json_meta"]


def write_json_meta(path: str, meta: dict[str, Any]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
        # fsync BEFORE the rename: without it the rename can persist
        # ahead of the data on a power loss, leaving an empty/truncated
        # meta file behind the atomic-replace promise (r8 ADVICE)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    # best-effort directory fsync so the rename itself is durable;
    # platforms that cannot open directories skip it
    try:
        dfd = os.open(os.path.dirname(os.path.abspath(path)), os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass


def read_json_meta(path: str) -> dict[str, Any]:
    with open(os.path.abspath(path)) as f:
        return json.load(f)

#!/usr/bin/env python
"""Synthesize a scaled-up copy of an sf dir for SCALING PROBES ONLY.

The driver's testdata tops out at sf0.1, where this corpus is
driver-bound (the r11 driver's own 8-core bench BEAT its 32-core run),
so §2/§3 parallelism claims carry no at-scale receipt. This tool
replicates the fact tables k× with deterministic key remapping so the
heavy operator families can be timed at c8 vs c32 on data big enough to
be executor-bound. NOT oracle data — the planted-corpus invariants of
the registered queries are not preserved; use with bare operators or
whole-query wall timing only (BENCH_NOTES records which).

Remapping rules (deterministic, no RNG):
- orders/lineitem: order keys offset per copy (joins stay 1:1 — no
  quadratic fan-out); part/supp/cust FKs untouched (dims stay fixed,
  as TPC-H dims are far smaller than facts).
- events: event_id offset; user_id offset per copy so sessionization
  state scales with data.
- documents: doc_id offset; copies >0 get a copy-tag token spliced
  every 5 words — word-shingle Jaccard across copies drops below any
  dedup threshold (~0.33 at n=3) while WITHIN-copy near-dup structure
  is preserved (both members of a planted pair receive the same
  positional splices), so dedup candidate volume scales ~linearly.
- embeddings: vec_id offset; copies >0 get their vectors cyclically
  rotated by the copy index — norms and within-copy cosines are exactly
  preserved, cross-copy cosines decorrelate, so SRP/ANN candidate
  volume scales ~linearly.

    python tools/gen_scale.py --k 10 --out /tmp/scale_sf1 \
        [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIMS = ["region", "nation", "customer", "supplier", "part"]


def _splice_tokens(texts, tag: str, every: int = 5):
    out = []
    for t in texts:
        if t is None:
            out.append(t)
            continue
        w = t.split(" ")
        for j in range(every - 1, len(w), every):
            w[j] = f"{w[j]} {tag}{j}"
        out.append(" ".join(w))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for t in DIMS:
        shutil.copyfile(
            os.path.join(args.src, f"{t}.parquet"),
            os.path.join(args.out, f"{t}.parquet"),
        )
        print(f"{t}: copied (dimension)")

    def scale(name, offset_cols, per_copy=None, id_span_col=None):
        tbl = pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        span_src = id_span_col or offset_cols[0]
        span = int(pa.compute.max(tbl[span_src]).as_py()) + 1
        copies = []
        for i in range(args.k):
            d = tbl.to_pydict()
            for c in offset_cols:
                d[c] = [v + i * span for v in d[c]]
            if per_copy is not None:
                d = per_copy(d, i)
            copies.append(pa.table(d, schema=tbl.schema))
        out = pa.concat_tables(copies)
        pq.write_table(
            out, os.path.join(args.out, f"{name}.parquet"),
            compression="zstd",
        )
        print(f"{name}: {tbl.num_rows} -> {out.num_rows} rows")

    scale("orders", ["o_orderkey"])
    scale("lineitem", ["l_orderkey"])

    def ev_copy(d, i):
        if i:
            span_u = max(d["user_id"]) + 1
            d["user_id"] = [u + i * span_u for u in d["user_id"]]
        return d

    scale("events", ["event_id"], per_copy=ev_copy)

    def doc_copy(d, i):
        if i:
            d["text"] = _splice_tokens(d["text"], f"c{i}w")
            d["n_chars"] = [
                len(t) if t is not None else n
                for t, n in zip(d["text"], d["n_chars"])
            ]
        return d

    scale("documents", ["doc_id"], per_copy=doc_copy)

    def emb_copy(d, i):
        if i:
            d["embedding"] = [
                None if v is None else np.roll(
                    np.asarray(v, dtype="float32"), i
                ).tolist()
                for v in d["embedding"]
            ]
        return d

    scale("embeddings", ["vec_id"], per_copy=emb_copy)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

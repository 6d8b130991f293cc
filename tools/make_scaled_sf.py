"""Deterministic scale-up of the driver test tables for large-SF bench runs.

Usage: python tools/make_scaled_sf.py [factor] [src_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 /tmp/pdfx_sf1)

The driver ships sf{0.001,0.01,0.1}; the 100 TB story needs at least one
measured point an order of magnitude past the bench scale (VERDICT r4
"what's missing" #3). This writes an sf1-equivalent set of tables by
replicating the sf0.1 tables ``factor`` times with per-replica
transformations chosen so every operator's WORK scales ~linearly —
i.e. the replicas neither collapse into each other (exact duplicates
would explode near-dup pair volume quadratically) nor break structure:

- documents: doc_id += r * n_docs; within replica 0 texts are unchanged
  (so in-replica dup/near-dup structure is preserved exactly); replicas
  r > 0 rewrite ~2/3 of token positions to replica-tagged variants
  ((i + doc_id) % 3 != 0), pushing cross-replica shingle Jaccard far
  below every near-dup threshold — pair volume scales with factor, not
  factor².
- embeddings: vec_id += r * n_vecs; vectors np.roll by r (norm- and
  distribution-preserving; in-replica neighbor structure intact,
  cross-replica neighbors scrambled); labels unchanged.
- events: event_id/user_id offset per replica (per-user cardinalities
  preserved → sessionize/retention/WAU scale linearly); ts shifted by
  r * 31 days so replicas occupy disjoint windows.
- orders/lineitem/customer/part/supplier: ALL keys offset consistently
  (o_orderkey and l_orderkey by the same stride, custkey/partkey/suppkey
  likewise) so referential integrity holds exactly at the new scale.
- nation/region: dimension tables, copied as-is.

Everything is a pure function of (source bytes, factor): re-runs are
byte-identical; a manifest makes the build idempotent.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP = 64 * 1024


def _perturb_texts(texts, doc_ids, r: int):
    out = []
    tag = f"r{r}"
    for t, d in zip(texts, doc_ids):
        toks = t.split(" ")
        base = int(d) % 3
        out.append(
            " ".join(
                tok if (i + base) % 3 == 0 else f"{tok}{tag}"
                for i, tok in enumerate(toks)
            )
        )
    return out


def scale_documents(src: pa.Table, factor: int) -> pa.Table:
    n = src.num_rows
    reps = []
    ids = src["doc_id"].to_numpy()
    texts = src["text"].to_pylist()
    for r in range(factor):
        t = texts if r == 0 else _perturb_texts(texts, ids, r)
        reps.append(
            pa.table(
                {
                    "doc_id": pa.array(ids + r * n, pa.int64()),
                    "text": pa.array(t, pa.string()),
                    "lang": src["lang"],
                    "source": src["source"],
                    "n_chars": pa.array([len(x) for x in t], pa.int64()),
                }
            )
        )
    return pa.concat_tables(reps)


def scale_embeddings(src: pa.Table, factor: int) -> pa.Table:
    n = src.num_rows
    ids = src["vec_id"].to_numpy()
    emb = np.asarray(src["embedding"].to_pylist(), dtype=np.float32)
    reps = []
    for r in range(factor):
        v = emb if r == 0 else np.roll(emb, r, axis=1)
        reps.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + r * n, pa.int64()),
                    "embedding": pa.array(list(v), pa.list_(pa.float32())),
                    "label": src["label"],
                }
            )
        )
    return pa.concat_tables(reps)


def scale_events(src: pa.Table, factor: int) -> pa.Table:
    n = src.num_rows
    ids = src["event_id"].to_numpy()
    users = src["user_id"].to_numpy()
    n_users = int(users.max()) + 1
    ts = src["ts"].to_numpy()  # datetime64[us]
    shift = np.timedelta64(31, "D")
    reps = []
    for r in range(factor):
        reps.append(
            pa.table(
                {
                    "event_id": pa.array(ids + r * n, pa.int64()),
                    "ts": pa.array(ts + r * shift),
                    "user_id": pa.array(users + r * n_users, pa.int64()),
                    "event_type": src["event_type"],
                    "value": src["value"],
                    "props": src["props"],
                }
            )
        )
    return pa.concat_tables(reps)


def _offset_keys(src: pa.Table, factor: int, strides: dict[str, int]) -> pa.Table:
    reps = []
    for r in range(factor):
        cols = {}
        for name in src.schema.names:
            if name in strides:
                cols[name] = pa.array(
                    src[name].to_numpy() + r * strides[name], pa.int64()
                )
            else:
                cols[name] = src[name]
        reps.append(pa.table(cols))
    return pa.concat_tables(reps)


def build(factor: int, src_dir: str, out_dir: str) -> str:
    spec = {"factor": factor, "src": os.path.abspath(src_dir), "version": 1}
    manifest = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == spec:
                print(f"cached: {out_dir}")
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    t = {n: pq.read_table(os.path.join(src_dir, f"{n}.parquet"))
         for n in ("documents", "embeddings", "events", "orders", "lineitem",
                   "customer", "part", "supplier", "nation", "region")}
    n_orders = t["orders"].num_rows
    n_cust = t["customer"].num_rows
    n_part = t["part"].num_rows
    n_supp = t["supplier"].num_rows

    out = {
        "documents": scale_documents(t["documents"], factor),
        "embeddings": scale_embeddings(t["embeddings"], factor),
        "events": scale_events(t["events"], factor),
        "orders": _offset_keys(t["orders"], factor,
                               {"o_orderkey": n_orders, "o_custkey": n_cust}),
        "lineitem": _offset_keys(t["lineitem"], factor,
                                 {"l_orderkey": n_orders, "l_partkey": n_part,
                                  "l_suppkey": n_supp}),
        "customer": _offset_keys(t["customer"], factor, {"c_custkey": n_cust}),
        "part": _offset_keys(t["part"], factor, {"p_partkey": n_part}),
        "supplier": _offset_keys(t["supplier"], factor, {"s_suppkey": n_supp}),
        "nation": t["nation"],
        "region": t["region"],
    }
    for name, tbl in out.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(tbl, tmp, row_group_size=ROW_GROUP)
        os.replace(tmp, path)
        print(f"{name}: {tbl.num_rows} rows -> {path}")
    with open(manifest + ".tmp", "w") as f:
        json.dump(spec, f)
    os.replace(manifest + ".tmp", manifest)
    return out_dir


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/pdfx_sf1"
    build(factor, src, out)
    # digest for reproducibility evidence
    h = hashlib.md5()
    for n in sorted(os.listdir(out)):
        if n.endswith(".parquet"):
            with open(os.path.join(out, n), "rb") as f:
                h.update(f.read())
    print("corpus md5:", h.hexdigest())

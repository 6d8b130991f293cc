"""Per-partition checkpointing, lineage sidecars and resume.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics … any partition can resume without recomputation".

Design (SURVEY.md §4.2):

- the partition IS the unit of shuffle, fold, output file and checkpoint:
  ``part_id = md5(conv_id) % n_parts`` assigned vectorized at the read, so
  a conversation always lands in the same partition across runs;
- ONE ``groupby(part_id)`` co-locates each partition; the group UDF sorts
  ``(conv_id, turn_idx)``, folds every conversation, writes
  ``part-<id>.parquet`` atomically (tmp + rename) and a lineage sidecar
  ``_lineage/part-<id>.json`` (input turn/conv counts, output rows,
  extraction counters, content hash) — one sidecar per output file, not per
  block, so 10^12-turn runs don't produce a small-file storm
  (SURVEY.md §7.5 #7);
- resume: completed part ids are read from the sidecars and their rows are
  dropped by a vectorized filter BEFORE the shuffle — finished partitions
  cost one pruned scan, zero recompute, zero rewrite.

Writes are idempotent (atomic rename), so Ray task retries cannot corrupt
output.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..oracle import catalog as _catalog
from ..oracle import census as _census
from ..oracle import grid as _grid
from ..oracle import invoice as _invoice
from ..oracle import layout as _layout
from ..oracle import table as _table
from ..pipelines import schemas
from ..stages.fold import rows_to_table

FOLDS = {
    "catalog": (_catalog.extract_catalog_conv, schemas.CATALOG_SCHEMA),
    "invoice": (_invoice.extract_invoice_conv, schemas.INVOICE_SCHEMA),
    "layout": (_layout.extract_layout_conv, schemas.LAYOUT_SCHEMA),
    "table": (_table.extract_table_conv, schemas.TABLE_SCHEMA),
    "grid": (_grid.extract_grid_conv, schemas.GRID_SCHEMA),
    "census": (_census.extract_census_conv, schemas.HOUSEHOLD_SCHEMA),
}

METRICS_SCHEMA = pa.schema(
    [
        pa.field("part_id", pa.int64()),
        pa.field("n_turns", pa.int64()),
        pa.field("n_convs", pa.int64()),
        pa.field("n_rows", pa.int64()),
        pa.field("content_hash", pa.string()),
        pa.field("resumed", pa.bool_()),
    ]
)


def conv_part_ids(conv_ids, n_parts: int) -> np.ndarray:
    """Stable partition id per conv_id (md5-based; never Python hash)."""
    uniq = pd.unique(np.asarray(conv_ids, dtype=object))
    lut = {
        c: int.from_bytes(hashlib.md5(str(c).encode()).digest()[:8], "little") % n_parts
        for c in uniq
    }
    return np.fromiter((lut[c] for c in conv_ids), dtype=np.int64, count=len(conv_ids))


def _lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def completed_parts(out_dir: str) -> set[int]:
    ldir = _lineage_dir(out_dir)
    if not os.path.isdir(ldir):
        return set()
    done = set()
    for f in os.listdir(ldir):
        if f.startswith("part-") and f.endswith(".json"):
            done.add(int(f[len("part-") : -len(".json")]))
    return done


def read_lineage(out_dir: str) -> list[dict]:
    ldir = _lineage_dir(out_dir)
    out = []
    for f in sorted(os.listdir(ldir)) if os.path.isdir(ldir) else []:
        if f.endswith(".json"):
            with open(os.path.join(ldir, f)) as fh:
                out.append(json.load(fh))
    return out


def partitioned_extract(path: str, family: str, out_dir: str, n_parts: int = 32):
    """Checkpointed extraction run; returns the per-partition metrics table.

    Resume-safe: rerunning after a partial failure folds and writes only the
    partitions without sidecars.
    """
    from ..pipelines.extract import family_dataset

    fold_fn, schema = FOLDS[family]
    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    done = completed_parts(out_dir)

    ds = family_dataset(path, family)

    def assign_and_prune(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(part_id=conv_part_ids(batch["conv_id"].to_numpy(), n_parts))
        if done:
            batch = batch[~batch["part_id"].isin(done)]
        return batch

    ds = ds.map_batches(assign_and_prune, batch_format="pandas")

    def write_partition(group: pd.DataFrame) -> pd.DataFrame:
        part_id = int(group["part_id"].iloc[0])
        g = group.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        rows: list[dict] = []
        n_convs = 0
        for conv_id, conv in g.groupby("conv_id", sort=True):
            n_convs += 1
            conv_rows = fold_fn(list(conv["text"]), [int(i) for i in conv["turn_idx"]])
            for r in conv_rows:
                r["conv_id"] = conv_id
            rows.extend(conv_rows)
        table = rows_to_table(rows, schema)
        out_file = os.path.join(out_dir, f"part-{part_id:05d}.parquet")
        tmp = out_file + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, out_file)  # atomic publish
        with open(out_file, "rb") as fh:
            content_hash = hashlib.md5(fh.read()).hexdigest()
        sidecar = {
            "part_id": part_id,
            "family": family,
            "n_turns": int(len(g)),
            "n_convs": n_convs,
            "n_rows": table.num_rows,
            "content_hash": content_hash,
            "output_file": os.path.basename(out_file),
        }
        stmp = os.path.join(_lineage_dir(out_dir), f"part-{part_id}.json.tmp")
        with open(stmp, "w") as fh:
            json.dump(sidecar, fh)
        os.replace(stmp, os.path.join(_lineage_dir(out_dir), f"part-{part_id}.json"))
        return pd.DataFrame(
            [
                {
                    "part_id": part_id,
                    "n_turns": len(g),
                    "n_convs": n_convs,
                    "n_rows": table.num_rows,
                    "content_hash": content_hash,
                    "resumed": False,
                }
            ]
        )

    metrics = ds.groupby("part_id").map_groups(write_partition, batch_format="pandas")
    fresh = metrics.to_pandas()

    skipped = []
    for entry in read_lineage(out_dir):
        if entry["part_id"] in done:
            skipped.append(
                {
                    "part_id": entry["part_id"],
                    "n_turns": entry["n_turns"],
                    "n_convs": entry["n_convs"],
                    "n_rows": entry["n_rows"],
                    "content_hash": entry["content_hash"],
                    "resumed": True,
                }
            )
    return pd.concat([fresh, pd.DataFrame(skipped)], ignore_index=True) if skipped else fresh


def read_output(out_dir: str):
    """Dataset over the completed partition files."""
    import ray.data as rd

    files = [
        os.path.join(out_dir, f)
        for f in sorted(os.listdir(out_dir))
        if f.startswith("part-") and f.endswith(".parquet")
    ]
    return rd.read_parquet(files)

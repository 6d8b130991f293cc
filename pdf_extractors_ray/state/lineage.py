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
import pyarrow.compute as pc
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


def append_part_id(batch: pa.Table, n_parts: int, done: set[int] | None = None) -> pa.Table:
    """Zero-copy-friendly part_id assignment on an Arrow batch.

    Dictionary-encodes ``conv_id`` so md5 runs once per DISTINCT conv, then
    maps codes through a numpy LUT — the (large) ``text`` column is never
    converted to Python objects. ``done`` partitions are filtered out here,
    before the shuffle.
    """
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(batch["conv_id"]).combine_chunks()
    dictionary = enc.dictionary.to_pylist()
    lut = np.fromiter(
        (
            int.from_bytes(hashlib.md5(c.encode()).digest()[:8], "little") % n_parts
            for c in dictionary
        ),
        dtype=np.int64,
        count=len(dictionary),
    )
    part = lut[enc.indices.to_numpy(zero_copy_only=False)]
    batch = batch.append_column("part_id", pa.array(part, pa.int64()))
    if done:
        mask = ~np.isin(part, np.fromiter(done, dtype=np.int64))
        batch = batch.filter(pa.array(mask))
    return batch


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
        if f.startswith("part-") and f.endswith(".json"):
            with open(os.path.join(ldir, f)) as fh:
                out.append(json.load(fh))
    return out


_TARGET_PART_BYTES = 256 << 20  # compressed input bytes per partition fold


def derive_n_parts(files: list[str], target_part_bytes: int = _TARGET_PART_BYTES,
                   min_parts: int | None = None) -> int:
    """Byte-size-driven partition count: ``ceil(input_bytes / target)``
    with a cluster-width floor. A constant n_parts is a test-scale value —
    at 100 TB a 64-way split would make each fold hold >1 TB; deriving
    from bytes keeps every partition fold's working set bounded at
    ~``target_part_bytes`` (compressed) no matter the corpus size."""
    total = sum(os.path.getsize(f) for f in files)
    by_bytes = max(1, -(-total // target_part_bytes))
    if min_parts is None:
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:  # noqa: BLE001
            cpus = 8
        min_parts = 2 * cpus
    return max(min_parts, int(by_bytes))


def _resolve_n_parts(out_root: str, files: list[str], requested: int | None) -> int:
    """Resume-stable n_parts: ``part_id = md5(conv_id) % n_parts``, so a
    resumed run MUST reuse the original count or every completed sidecar
    becomes invalid. The first run records its choice in the lineage dir;
    later runs always honor the recorded value."""
    ldir = _lineage_dir(out_root)
    os.makedirs(ldir, exist_ok=True)
    meta_path = os.path.join(ldir, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            recorded = json.load(fh).get("n_parts")
        if recorded:
            return int(recorded)
    n = int(requested) if requested else derive_n_parts(files)
    with open(meta_path, "w") as fh:
        json.dump({"n_parts": n}, fh)
    return n


def _list_parquet(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )


def partitioned_extract(path: str, family: str, out_dir: str, n_parts: int | None = 32):
    """Checkpointed extraction run; returns the per-partition metrics table.

    Resume-safe: rerunning after a partial failure folds and writes only the
    partitions without sidecars. ``n_parts=None`` derives the count from
    input bytes (and a resumed run always reuses the recorded count).
    """
    from ..pipelines.extract import family_dataset

    fold_fn, schema = FOLDS[family]
    n_parts = _resolve_n_parts(out_dir, _list_parquet(path), n_parts)
    done = completed_parts(out_dir)

    ds = family_dataset(path, family)
    ds = ds.map_batches(
        lambda b: append_part_id(b, n_parts, done),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def write_partition(group: pa.Table) -> pd.DataFrame:
        part_id = int(group["part_id"][0].as_py())
        folded = list(fold_partition(group, families={family: (fold_fn, schema)}, derive_census=False))
        if folded:
            _fam, table, _n_turns, n_convs = folded[0]
        else:
            table, n_convs = schema.empty_table(), 0
        out_file = os.path.join(out_dir, f"part-{part_id:05d}.parquet")
        tmp = out_file + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, out_file)  # atomic publish
        with open(out_file, "rb") as fh:
            content_hash = hashlib.md5(fh.read()).hexdigest()
        sidecar = {
            "part_id": part_id,
            "family": family,
            "n_turns": int(group.num_rows),
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
                    "n_turns": int(group.num_rows),
                    "n_convs": n_convs,
                    "n_rows": table.num_rows,
                    "content_hash": content_hash,
                    "resumed": False,
                }
            ]
        )

    metrics = ds.groupby("part_id").map_groups(write_partition, batch_format="pyarrow")
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


def fold_partition(part: pa.Table, families: dict | None = None, derive_census: bool = True):
    """Fold every conversation in one co-located partition, all families.

    Hot loop of the production path: ONE sort via integer-factorized
    ``np.lexsort`` and numpy boundary slicing — no per-conversation pandas
    ``groupby`` (which costs ~0.2 ms per conv, dominating at 10^5+ convs
    per run). Yields ``(family, arrow_table, n_turns, n_convs)``.
    """
    families = families or FOLDS

    def sorted_codes(col: "pa.ChunkedArray"):
        """Integer codes ranked by sorted distinct VALUE + the sorted
        uniques — ``pd.factorize(sort=True)`` semantics without ever
        materializing a per-ROW Python-object column (r3 #8 DRAM diet:
        only the ~n_convs DISTINCT strings become Python objects; the
        per-row side stays int32 Arrow indices end-to-end). Value-sorted
        codes matter: recomputed partitions must be byte-identical
        regardless of block arrival order."""
        enc = pc.dictionary_encode(col.combine_chunks())
        uniq = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        # nulls -> code -1 (pd.factorize's convention); without the
        # fill_null the float-NaN indices would astype to a garbage
        # int64 and index rank out of range
        idx = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        perm = np.argsort(uniq, kind="stable")
        rank = np.empty(len(perm), dtype=np.int64)
        rank[perm] = np.arange(len(perm))
        return np.where(idx >= 0, rank[idx], np.int64(-1)), uniq[perm]

    tidx = part["turn_idx"].to_numpy(zero_copy_only=False)
    texts = np.asarray(part["text"].to_pandas(), dtype=object)
    if pd.isna(texts).any():
        texts = np.where(pd.isna(texts), "", texts)  # null text ≡ empty line
    conv_codes, conv_uniq = sorted_codes(part["conv_id"])
    tool_codes, tool_uniq = sorted_codes(part["tool"])
    order = np.lexsort((tidx, conv_codes, tool_codes))
    tc, cc = tool_codes[order], conv_codes[order]
    ti, tx = tidx[order], texts[order]
    change = np.flatnonzero((np.diff(tc) != 0) | (np.diff(cc) != 0)) + 1
    bounds = np.concatenate(([0], change, [len(tc)]))

    rows_by_family: dict[str, list] = {}
    stats: dict[str, list[int]] = {}
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        fam = tool_uniq[tc[lo]]
        if fam not in families:
            continue
        fold_fn = families[fam][0]
        conv_rows = fold_fn(list(tx[lo:hi]), [int(x) for x in ti[lo:hi]])
        cid = conv_uniq[cc[lo]] if cc[lo] >= 0 else None  # -1 = null conv_id
        for r in conv_rows:
            r["conv_id"] = cid
        rows_by_family.setdefault(fam, []).extend(conv_rows)
        st = stats.setdefault(fam, [0, 0])
        st[0] += hi - lo
        st[1] += 1
    # census downstream stages run HERE, on the already co-located partition:
    # summary + per-household kinship need no further shuffle or pass
    # (roman-census stage B is household-local, SURVEY.md §2.4 J1-J3)
    if "census" in rows_by_family and "census" in families and derive_census:
        from ..oracle import persons as _personsmod

        households = rows_by_family["census"]
        summary_rows, person_rows = [], []
        for h in households:
            s = _census.summarize_household(h)
            s["conv_id"] = h["conv_id"]
            summary_rows.append(s)
            for p in _personsmod.extract_persons_for_household(h):
                p["conv_id"] = h["conv_id"]
                person_rows.append(p)
        rows_by_family["census_summary"] = summary_rows
        rows_by_family["census_persons"] = person_rows
        families = dict(families)
        families["census_summary"] = (None, schemas.CENSUS_SUMMARY_SCHEMA)
        families["census_persons"] = (None, schemas.PERSONS_SCHEMA)
        stats["census_summary"] = stats["census"]
        stats["census_persons"] = stats["census"]

    for fam in sorted(rows_by_family):
        schema = families[fam][1]
        yield fam, rows_to_table(rows_by_family[fam], schema), stats[fam][0], stats[fam][1]


def _split_by_part(tbl: pa.Table, n_parts: int) -> list[pa.Table]:
    """Order-stable split of a batch into its n_parts slices (map side of
    the exchange). Empty slice for absent partitions."""
    part = tbl["part_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(part, kind="stable")
    tbl = tbl.take(pa.array(order))
    part = part[order]
    bounds = np.searchsorted(part, np.arange(n_parts + 1))
    return [tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i])) for i in range(n_parts)]


def _shard_map(files: list[str], n_parts: int, done: frozenset) -> list[pa.Table]:
    tbl = pa.concat_tables(
        pq.read_table(f, columns=["conv_id", "turn_idx", "text", "tool"]) for f in files
    )
    tbl = append_part_id(tbl, n_parts, set(done) or None)
    return _split_by_part(tbl, n_parts)


def _fold_and_write(out_root: str, part_id: int, *slices) -> dict:
    # slices arrive as varargs so Ray resolves every ObjectRef BEFORE
    # scheduling this task — a task that ray.get()s inside would be
    # scheduled early, block holding a worker, and starve the map stage
    nonempty = [t for t in slices if t.num_rows]
    group = pa.concat_tables(nonempty) if nonempty else None
    if group is None or group.num_rows == 0:
        return {"part_id": part_id, "n_turns": 0, "n_convs": 0, "n_rows": 0,
                "content_hash": "", "resumed": False}
    sidecar: dict = {"part_id": part_id, "n_turns": int(group.num_rows), "families": {}}
    for family, table, n_turns, n_convs in fold_partition(group):
        fam_dir = os.path.join(out_root, family)
        os.makedirs(fam_dir, exist_ok=True)
        out_file = os.path.join(fam_dir, f"part-{part_id:05d}.parquet")
        tmp = out_file + f".tmp{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, out_file)
        with open(out_file, "rb") as fh:
            content_hash = hashlib.md5(fh.read()).hexdigest()
        sidecar["families"][family] = {
            "n_turns": n_turns, "n_convs": n_convs,
            "n_rows": table.num_rows, "content_hash": content_hash,
        }
    stmp = os.path.join(_lineage_dir(out_root), f"part-{part_id}.json.tmp{os.getpid()}")
    with open(stmp, "w") as fh:
        json.dump(sidecar, fh)
    os.replace(stmp, os.path.join(_lineage_dir(out_root), f"part-{part_id}.json"))
    fams = sidecar["families"].values()
    return {
        "part_id": part_id,
        "n_turns": int(group.num_rows),
        "n_convs": sum(f["n_convs"] for f in fams),
        "n_rows": sum(f["n_rows"] for f in fams),
        "content_hash": hashlib.md5("".join(f["content_hash"] for f in fams).encode()).hexdigest(),
        "resumed": False,
    }


def partitioned_extract_all_tasks(path: str, out_root: str, n_parts: int | None = None):
    """Task-based two-stage exchange variant of ``partitioned_extract_all``.

    Why not ``groupby(part_id)``: Ray Data's sort-based groupby is a full
    barrier (boundary sampling; no fold starts until every reduce slot is
    final) and packs multiple partitions per ``map_groups`` task, halving
    fold parallelism. Here the exchange is expressed directly with Ray
    task primitives — the ONE place this engine drops below the Dataset
    API, because the Dataset API cannot express a streaming key-exchange
    whose reduce side starts per-partition:

        shard map tasks (read files → assign part_id → ``num_returns=
        n_parts`` slices) → one fold/write task per partition consuming
        its n_shards slices directly from the object store.

    Measured: ~1.4x faster at 8 CPUs and ~1.6x at 32 CPUs than the
    Dataset groupby path on the bench corpus, with the same outputs,
    sidecars and resume semantics (byte-identical partition files).
    """
    import ray

    from ..runtime import shuffle_num_blocks

    files = _list_parquet(path)
    n_parts = _resolve_n_parts(out_root, files, n_parts)
    done = completed_parts(out_root)

    n_shards = min(len(files), shuffle_num_blocks())
    shards = [list(files[i::n_shards]) for i in range(n_shards)]

    shard_map = ray.remote(_shard_map).options(num_returns=n_parts)
    # retry_exceptions: a fold that dies with a Python exception (transient
    # FS error, allocator failure) retries like worker death does — safe
    # because the fold is idempotent by construction: family files are
    # deterministic bytes landed via atomic os.replace, the sidecar is
    # written LAST, and metrics come only from the one successful return,
    # so a retry can neither double-write nor double-count (pinned by
    # tests/test_fault_tolerance.py::test_fold_task_poison_retries_exactly)
    fold_task = ray.remote(_fold_and_write).options(retry_exceptions=True, max_retries=4)

    slice_refs = [shard_map.remote(shard, n_parts, frozenset(done)) for shard in shards]
    if n_parts == 1:  # num_returns=1 returns a bare ref
        slice_refs = [[r] for r in slice_refs]
    fold_refs = [
        fold_task.remote(out_root, p, *[slice_refs[s][p] for s in range(n_shards)])
        for p in range(n_parts)
        if p not in done
    ]
    fresh = pd.DataFrame(ray.get(fold_refs)) if fold_refs else pd.DataFrame(
        columns=["part_id", "n_turns", "n_convs", "n_rows", "content_hash", "resumed"]
    )
    fresh = fresh[fresh["n_turns"] > 0] if len(fresh) else fresh
    skipped = []
    for entry in read_lineage(out_root):
        if entry["part_id"] in done and "families" in entry:
            fams = entry["families"].values()
            skipped.append(
                {
                    "part_id": entry["part_id"],
                    "n_turns": entry["n_turns"],
                    "n_convs": sum(f["n_convs"] for f in fams),
                    "n_rows": sum(f["n_rows"] for f in fams),
                    "content_hash": hashlib.md5("".join(f["content_hash"] for f in fams).encode()).hexdigest(),
                    "resumed": True,
                }
            )
    return pd.concat([fresh, pd.DataFrame(skipped)], ignore_index=True) if skipped else fresh


def partitioned_extract_all(path: str, out_root: str, n_parts: int | None = None):
    """ALL families, ONE read, ONE shuffle — the production/headline path.

    Every turn gets ``part_id = md5(conv_id) % n_parts``; a single
    ``groupby(part_id)`` co-locates each partition; the group task splits
    its rows by family, folds each conversation with the family's oracle
    core, writes one parquet file per (family, partition) atomically, and
    records ONE lineage sidecar per partition (per-family row counts +
    content hashes). Compared to running the per-family pipelines
    separately this replaces 6 scans + 6 shuffles with 1 + 1, and each task
    carries enough fold work (≈ turns/n_parts) to amortize scheduling —
    the shape that scales to a 256-node cluster.

    Resume: partitions with sidecars are pruned before the shuffle.
    Returns the per-partition metrics DataFrame.
    """
    import ray.data as rd

    from ..runtime import tune_data_context

    tune_data_context()
    n_parts = _resolve_n_parts(out_root, _list_parquet(path), n_parts)
    done = completed_parts(out_root)

    from ..runtime import shuffle_num_blocks

    ds = rd.read_parquet(
        path,
        columns=["conv_id", "turn_idx", "text", "tool"],
        override_num_blocks=shuffle_num_blocks(),
    )
    ds = ds.map_batches(
        lambda b: append_part_id(b, n_parts, done),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def write_partition(group: pa.Table) -> pd.DataFrame:
        part_id = int(group["part_id"][0].as_py())
        sidecar: dict = {"part_id": part_id, "n_turns": int(group.num_rows), "families": {}}
        for family, table, n_turns, n_convs in fold_partition(group):
            fam_dir = os.path.join(out_root, family)
            os.makedirs(fam_dir, exist_ok=True)
            out_file = os.path.join(fam_dir, f"part-{part_id:05d}.parquet")
            tmp = out_file + ".tmp"
            pq.write_table(table, tmp)
            os.replace(tmp, out_file)
            with open(out_file, "rb") as fh:
                content_hash = hashlib.md5(fh.read()).hexdigest()
            sidecar["families"][family] = {
                "n_turns": n_turns,
                "n_convs": n_convs,
                "n_rows": table.num_rows,
                "content_hash": content_hash,
            }
        stmp = os.path.join(_lineage_dir(out_root), f"part-{part_id}.json.tmp")
        with open(stmp, "w") as fh:
            json.dump(sidecar, fh)
        os.replace(stmp, os.path.join(_lineage_dir(out_root), f"part-{part_id}.json"))
        n_rows = sum(f["n_rows"] for f in sidecar["families"].values())
        return pd.DataFrame(
            [
                {
                    "part_id": part_id,
                    "n_turns": len(group),
                    "n_convs": sum(f["n_convs"] for f in sidecar["families"].values()),
                    "n_rows": n_rows,
                    "content_hash": hashlib.md5(
                        "".join(f["content_hash"] for f in sidecar["families"].values()).encode()
                    ).hexdigest(),
                    "resumed": False,
                }
            ]
        )

    metrics = ds.groupby("part_id").map_groups(write_partition, batch_format="pyarrow")
    fresh = metrics.to_pandas()
    skipped = []
    for entry in read_lineage(out_root):
        if entry["part_id"] in done and "families" in entry:
            fams = entry["families"].values()
            skipped.append(
                {
                    "part_id": entry["part_id"],
                    "n_turns": entry["n_turns"],
                    "n_convs": sum(f["n_convs"] for f in fams),
                    "n_rows": sum(f["n_rows"] for f in fams),
                    "content_hash": hashlib.md5("".join(f["content_hash"] for f in fams).encode()).hexdigest(),
                    "resumed": True,
                }
            )
    return pd.concat([fresh, pd.DataFrame(skipped)], ignore_index=True) if skipped else fresh

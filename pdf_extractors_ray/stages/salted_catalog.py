"""Salted splits for the catalog fold (lookahead state machine).

The catalog fold carries non-trivially-composable state (one-line
lookahead, record context that flushes on transitions — SURVEY.md §7.5 #3),
so the invoice-style "windows + stitch nulls" trick does not apply.
Instead each window is decomposed EXACTLY into:

- a **head**: the window's line prefix up to the first manufacturer/year
  pair that fires given the window's (known) entry gates — its processing
  depends on the carried record context, so its raw lines are forwarded to
  a tiny per-conversation stitch;
- a **tail**: from that manufacturer line on, processing is independent of
  the entry record context (the manufacturer rule resets model/engine/oils
  and sets manufacturer; the stale entry ``year`` is provably overwritten
  by the pair's year line before any emission can read it) — the tail's
  rows and exit state are computed IN PARALLEL per window.

The entry gates (page-banner seen, ``Oil`` validity) are made exact by a
cheap shuffle-free pre-pass: per-conversation first-banner / first-Oil turn
indices, broadcast via ``ray.put``. Windows with no firing pair fall back
to forwarding all their lines (correct, just less parallel).

The stitch per conversation then: runs the real machine over each head (in
salt order), replays the manufacturer-rule flush at each tail boundary,
splices the precomputed tail rows, and adopts the tail's exit state —
sequential work is O(total head lines), not O(conversation).

Partitioning assumptions (documented per SURVEY §7.2 build plan):
``turn_idx`` is dense per conversation (the window lookahead line is the
row with ``turn_idx == (salt+1)*W``), which the synthesizer guarantees.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

from ..oracle import catalog as _catalog
from ..pipelines import schemas
from ..stages.fold import rows_to_table
from ..stages.salted import hot_conversations

_S = pa.string()
WINDOW_SCHEMA = pa.schema(
    [
        pa.field("conv_id", _S),
        pa.field("salt", pa.int64()),
        pa.field("kind", _S),  # 'head' | 'row'
        pa.field("seq", pa.int64()),
        pa.field("payload", _S),  # JSON head summary (kind='head')
        pa.field("ref_turn", pa.int32()),
        pa.field("manufacturer", _S),
        pa.field("year", _S),
        pa.field("model", _S),
        pa.field("engine", _S),
        pa.field("oils", pa.list_(_S)),
    ]
)


def _gate_prepass(ds, hot: set[str]) -> dict[str, tuple[int, int]]:
    """conv_id → (first banner turn, first Oil turn); 2^31-1 when absent.

    Restricted to HOT conversations: cold conversations are a single
    window whose entry gates are trivially (False, False), so the
    broadcast map stays tiny at any corpus scale (DESIGN_SCALE.md).
    Shuffle-free per-batch partial mins + one tiny grouped Min."""
    from ray.data.aggregate import Min

    if not hot:
        return {}
    INF = np.int64(2**31 - 1)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["conv_id"].isin(hot)]
        text = batch["text"].str.strip()
        t = batch["turn_idx"].astype(np.int64)
        banner = t.where(text == _catalog.BANNER, INF)
        oil = t.where(text == "Oil", INF)
        out = pd.DataFrame({"conv_id": batch["conv_id"], "b": banner, "o": oil})
        return out.groupby("conv_id", as_index=False, sort=False).min()

    agg = ds.map_batches(partial, batch_format="pandas").groupby("conv_id").aggregate(
        Min("b", alias_name="b"), Min("o", alias_name="o")
    )
    df = agg.to_pandas()
    return {c: (int(b), int(o)) for c, b, o in zip(df["conv_id"], df["b"], df["o"])}


def _find_split(lines: list[str], la: str, started: bool, valid: bool) -> int:
    """Index of the first manufacturer/year pair that fires, else -1."""
    n = len(lines)
    for i, raw in enumerate(lines):
        line = raw.strip()
        if not started:
            if line == _catalog.BANNER:
                started = True
            else:
                continue
        if valid and not _catalog.is_boilerplate_line(line):
            nxt = lines[i + 1].strip() if i + 1 < n else la
            if _catalog.RE_MANUFACTURER.match(line) and _catalog.RE_YEAR.match(nxt):
                return i
        if line == "Oil":
            valid = True
    return -1


def extract_catalog_salted(path: str, hot_threshold: int = 256, window: int = 128):
    """Catalog extraction with salted hot-conversation splits;
    output ≡ ``extract_catalog`` (tested)."""
    import ray

    from ..pipelines.extract import family_dataset

    ds = family_dataset(path, "catalog")
    hot = hot_conversations(ds, hot_threshold)
    hot_ref = ray.put(hot)
    gates_ref = ray.put(_gate_prepass(family_dataset(path, "catalog"), hot))

    def add_salt(batch: pa.Table) -> pa.Table:
        hotset = ray.get(hot_ref)
        conv = np.asarray(batch["conv_id"].to_pandas(), dtype=object)
        tidx = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_hot = np.fromiter((c in hotset for c in conv), dtype=bool, count=len(conv))
        salt = np.where(is_hot, tidx // window, 0)
        batch = batch.append_column("salt", pa.array(salt, pa.int64()))
        batch = batch.append_column("la", pa.array(np.zeros(len(conv), dtype=bool)))
        # duplicate each hot window's first line into the PREVIOUS window as
        # its lookahead-only row
        dup_mask = is_hot & (tidx % window == 0) & (tidx > 0)
        if dup_mask.any():
            dup = batch.filter(pa.array(dup_mask))
            dup = dup.set_column(
                dup.schema.get_field_index("salt"), "salt",
                pa.array(dup["salt"].to_numpy(zero_copy_only=False) - 1, pa.int64()),
            )
            dup = dup.set_column(
                dup.schema.get_field_index("la"), "la",
                pa.array(np.ones(dup.num_rows, dtype=bool)),
            )
            batch = pa.concat_tables([batch, dup])
        return batch

    salted = ds.map_batches(add_salt, batch_format="pyarrow")

    def window_fold(group: dict) -> pa.Table:
        conv_id = str(group["conv_id"][0])
        salt = int(group["salt"][0])
        order = np.argsort(np.asarray(group["turn_idx"]), kind="stable")
        texts = np.asarray(group["text"], dtype=object)[order]
        idxs = np.asarray(group["turn_idx"])[order].astype(int)
        la_flags = np.asarray(group["la"])[order]
        la_text = ""
        if la_flags.any():
            la_text = str(texts[la_flags][0]).strip()
        keep = ~la_flags
        lines = [str(t) for t in texts[keep]]
        lidx = [int(i) for i in idxs[keep]]

        gates = ray.get(gates_ref).get(conv_id, (2**31 - 1, 2**31 - 1))
        win_start = salt * window
        entry_started = gates[0] < win_start
        entry_valid = gates[1] < win_start

        split = _find_split(lines, la_text, entry_started, entry_valid)
        rows: list[dict] = []
        if split < 0:
            head = {"lines": lines, "idxs": lidx, "la": la_text, "tail": None,
                    "last_idx": lidx[-1] if lidx else 0}
        else:
            machine = _catalog.CatalogMachine(started=True, valid=True)
            machine.feed(lines[split:], lidx[split:], lookahead=la_text)
            head = {
                "lines": lines[:split], "idxs": lidx[:split],
                "la": lines[split].strip(),
                "tail": {"first_idx": lidx[split], "exit_state": machine.state()},
                "last_idx": lidx[-1] if lidx else 0,
            }
            for seq, r in enumerate(machine.rows):
                rows.append({"conv_id": conv_id, "salt": salt, "kind": "row",
                             "seq": seq, **r})
        rows.insert(0, {"conv_id": conv_id, "salt": salt, "kind": "head",
                        "seq": -1, "payload": json.dumps(head)})
        return rows_to_table(rows, WINDOW_SCHEMA)

    windows = salted.groupby(["conv_id", "salt"]).map_groups(window_fold, batch_format="numpy")

    def stitch(group: pd.DataFrame) -> pa.Table:
        conv_id = group["conv_id"].iloc[0]
        g = group.sort_values(["salt", "seq"], kind="mergesort")
        machine = _catalog.CatalogMachine()
        out_rows: list[dict] = []
        last_idx = 0
        for salt in sorted(g["salt"].unique()):
            win = g[g["salt"] == salt]
            head = json.loads(win[win["kind"] == "head"]["payload"].iloc[0])
            last_idx = max(last_idx, head["last_idx"])
            machine.rows = []
            machine.feed(head["lines"], head["idxs"], lookahead=head["la"])
            out_rows.extend(machine.rows)
            if head["tail"] is not None:
                # replay the manufacturer-rule flush at the tail boundary
                if machine.context_complete():
                    machine.emit(head["tail"]["first_idx"])
                    out_rows.append(machine.rows[-1])
                for _, r in win[win["kind"] == "row"].iterrows():
                    out_rows.append(
                        {"ref_turn": r["ref_turn"], "manufacturer": r["manufacturer"],
                         "year": r["year"], "model": r["model"], "engine": r["engine"],
                         "oils": list(r["oils"])}
                    )
                machine.load_state(head["tail"]["exit_state"])
        machine.rows = []
        machine.finish(last_idx)
        out_rows.extend(machine.rows)
        for r in out_rows:
            r["conv_id"] = conv_id
        return rows_to_table(out_rows, schemas.CATALOG_SCHEMA)

    return windows.groupby("conv_id").map_groups(stitch, batch_format="pandas")

"""Transcript-corpus hygiene: per-conversation structural validation.

The north rule's per-row invariant is per-turn text equality UNDER STABLE
TURN ORDERING — the synthesizer writes rows deliberately shuffled, so any
pipeline that silently loses the (conv_id, turn_idx) restore emits wrong
bytes. This operator pins that property in the driver record with an
ORDER-SENSITIVE conversation digest: md5 over the role-initial sequence in
turn order. A single transposed turn anywhere in the corpus flips its
conversation's hash, and the DuckDB twin (``string_agg(... ORDER BY
turn_idx)``) recomputes the same digest independently, so the engine's
shuffle-then-restore is hash-checked end to end.

Distributed shape: the same single-exchange co-location the extraction
folds use (``stages/fold.py``) — ``part_id = md5(conv_id) % n_parts``
appended map-side, one ``groupby(part_id)``, then vectorized
boundary-slice aggregation per partition. Output is conversation-
cardinality (tiny next to the input); the exchange carries only the four
pruned columns.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def conv_hygiene_frame(group: pd.DataFrame) -> pd.DataFrame:
    """Per-conversation structural stats for one co-located partition.

    All columns are vectorized over the partition's (conv, turn_idx)
    sort; the only per-conversation Python is the role-initial join that
    feeds the order-sensitive digest."""
    from ..stages.fold import conv_boundaries
    from .text import _md5_hash15_str

    if len(group) == 0:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "n_turns": pd.Series([], dtype=np.int64),
                "n_tool_turns": pd.Series([], dtype=np.int64),
                "role_seq_hash": pd.Series([], dtype=np.int64),
                "ts_span_us": pd.Series([], dtype=np.int64),
            }
        )
    conv = np.asarray(group["conv_id"], dtype=object)
    tidx = np.asarray(group["turn_idx"], dtype=np.int64)
    role = np.asarray(group["role"], dtype=object)
    ts = np.asarray(group["ts"], dtype="datetime64[us]").astype(np.int64)
    order, bounds = conv_boundaries(conv, tidx)
    cv, rl, t = conv[order], role[order], ts[order]
    is_tool = (rl == "tool").astype(np.int64)
    initials = np.array([r[0] for r in rl], dtype=object)

    n = len(bounds) - 1
    conv_ids = np.empty(n, dtype=object)
    seqs = np.empty(n, dtype=object)
    n_turns = np.empty(n, dtype=np.int64)
    n_tool = np.empty(n, dtype=np.int64)
    span = np.empty(n, dtype=np.int64)
    for i in range(n):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        conv_ids[i] = cv[lo]
        seqs[i] = "".join(initials[lo:hi])
        n_turns[i] = hi - lo
        n_tool[i] = int(is_tool[lo:hi].sum())
        span[i] = int(t[lo:hi].max() - t[lo:hi].min())
    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "n_turns": n_turns,
            "n_tool_turns": n_tool,
            "role_seq_hash": _md5_hash15_str(seqs, ""),
            "ts_span_us": span,
        }
    )


def transcript_hygiene(path: str, n_parts: int | None = None):
    """Order-sensitive per-conversation hygiene digest over a transcript
    Parquet directory → Dataset(conv_id, n_turns, n_tool_turns,
    role_seq_hash, ts_span_us), sorted by conv_id."""
    from ..sources.transcripts import read_transcripts
    from ..stages.fold import _default_n_parts
    from ..state.lineage import append_part_id

    n_parts = n_parts or _default_n_parts()
    ds = read_transcripts(path, columns=["conv_id", "turn_idx", "role", "ts"])
    ds = ds.map_batches(
        lambda b: append_part_id(b, n_parts), batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        ds.groupby("part_id")
        .map_groups(conv_hygiene_frame, batch_format="pandas")
        .sort("conv_id")
    )


def transcript_hygiene_sql(path: str) -> str:
    """DuckDB twin over the same Parquet files: the ordered
    ``string_agg`` digest recomputed without any Ray machinery."""
    return f"""
WITH t AS (
    SELECT conv_id, turn_idx, role, ts FROM read_parquet('{path}/*.parquet')
),
per AS (
    SELECT conv_id,
           COUNT(*) AS n_turns,
           SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS n_tool_turns,
           ('0x' || substr(md5(string_agg(substr(role, 1, 1), '' ORDER BY turn_idx)), 1, 15))::BIGINT
               AS role_seq_hash,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS ts_span_us
    FROM t GROUP BY conv_id
)
SELECT conv_id, CAST(n_turns AS BIGINT) AS n_turns,
       CAST(n_tool_turns AS BIGINT) AS n_tool_turns,
       CAST(role_seq_hash AS BIGINT) AS role_seq_hash,
       CAST(ts_span_us AS BIGINT) AS ts_span_us
FROM per ORDER BY conv_id
"""


def _md5_seq_hash(seq: str) -> int:
    """Reference single-string digest (tests): first 15 hex of md5."""
    return int(hashlib.md5(seq.encode("utf-8")).hexdigest()[:15], 16)

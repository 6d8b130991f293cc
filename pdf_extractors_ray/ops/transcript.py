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


# ---------------------------------------------------------------------------
# conversation-level exact dedup (order-sensitive full-transcript digest)


CONV_SEP = "\x1f"  # unit separator: cannot appear in synthesized turn text


def turn_digest_batch(batch):
    """Map-side per-turn md5 hex — the 100 TB payload reduction: the
    co-location exchange then carries 32-byte digests instead of the
    text corpus (shuffle volume drops by the corpus/digest size
    ratio). Arrow in, Arrow out: keeping blocks in Arrow through this
    stage keeps the downstream sort-based groupby on the Arrow fast
    path (a pandas block here measured ~6x slower end to end)."""
    import pyarrow as pa

    texts = batch.column("text").to_pylist()
    digests = pa.array(
        [hashlib.md5(("" if t is None else t).encode("utf-8")).hexdigest() for t in texts],
        pa.string(),
    )
    return pa.table(
        {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "turn_md5": digests,
        }
    )


def conv_digest_frame(group: pd.DataFrame) -> pd.DataFrame:
    """Per-conversation content digest for one co-located partition:
    the 128-bit md5 hex over the CONCATENATED per-turn md5 hexes in
    turn order (fixed-width components, so no separator is needed and
    the encoding is injective). A string digest on purpose: it rides
    exactly through joins (int64 digests truncated by the cogroup
    join's null-interleaved float64 promotion), and 60-bit keys
    birthday-collide at the 10^12-conversation scale this op targets
    while 128 bits do not. Two conversations collide only if their
    full turn sequences are byte-identical (up to md5 collisions).
    DuckDB mirror: ``md5(string_agg(md5(text), '' ORDER BY
    turn_idx))``."""
    from ..stages.fold import conv_boundaries

    if len(group) == 0:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "conv_digest": pd.Series([], dtype=object),
                "n_turns": pd.Series([], dtype=np.int64),
            }
        )
    conv = np.asarray(group["conv_id"], dtype=object)
    tidx = np.asarray(group["turn_idx"], dtype=np.int64)
    tmd5 = np.asarray(group["turn_md5"], dtype=object)
    order, bounds = conv_boundaries(conv, tidx)
    cv, tx = conv[order], tmd5[order]
    n = len(bounds) - 1
    conv_ids = np.empty(n, dtype=object)
    digests = np.empty(n, dtype=object)
    n_turns = np.empty(n, dtype=np.int64)
    for i in range(n):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        conv_ids[i] = cv[lo]
        digests[i] = hashlib.md5("".join(tx[lo:hi]).encode("ascii")).hexdigest()
        n_turns[i] = hi - lo
    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "conv_digest": digests,
            "n_turns": n_turns,
        }
    )


def transcript_conv_dedup(path: str, n_parts: int | None = None):
    """Exact duplicate-CONVERSATION detection: order-sensitive full-text
    digest per conversation → group by digest → representative = minimum
    conv_id → Dataset(conv_id, conv_digest, rep_conv_id, is_dup), sorted
    by conv_id.

    The transcript-corpus twin of ``exact_dedup`` over documents, with
    the digest doing what per-doc md5 cannot: two conversations whose
    turns arrive in different physical orders but restore to the same
    logical sequence dedup together, while a turn swap keeps them apart.
    Shape: the fold exchange (part_id co-location) builds digests; ONE
    digest-bucketed exchange then both picks representatives (in-bucket
    grouped MIN — exact, because all rows of a digest co-locate) and
    labels members, with nothing broadcast and only conversation-
    cardinality rows moving."""
    from ..sources.transcripts import read_transcripts
    from ..stages.fold import _default_n_parts
    from ..state.lineage import append_part_id

    n_parts = n_parts or _default_n_parts()
    ds = read_transcripts(path, columns=["conv_id", "turn_idx", "text"])
    ds = ds.map_batches(
        turn_digest_batch, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda b: append_part_id(b, n_parts), batch_format="pyarrow", zero_copy_batch=True
    )
    digests = ds.groupby("part_id").map_groups(
        conv_digest_frame, batch_format="pandas"
    )

    # ONE digest-bucketed exchange resolves representatives AND labels
    # members: rows sharing a digest co-locate in their hash bucket, so
    # the in-bucket transform('min') is an exact global group min — no
    # separate aggregation + join-back round trips (measured: the fused
    # exchange replaced a bucketed agg + cogroup join worth ~2/3 of the
    # op's wall-clock). The exchange carries conversation-cardinality
    # (conv_id, digest) rows.
    from .common import _default_buckets

    nb = _default_buckets()

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["conv_id", "conv_digest"]].copy()
        out["__b"] = (
            pd.util.hash_array(out["conv_digest"].to_numpy(object)) % nb
        ).astype(np.int64)
        return out

    def label(group: pd.DataFrame) -> pd.DataFrame:
        rep = group.groupby("conv_digest", sort=False)["conv_id"].transform("min")
        return pd.DataFrame(
            {
                "conv_id": group["conv_id"].to_numpy(object),
                "conv_digest": group["conv_digest"].to_numpy(object),
                "rep_conv_id": rep.to_numpy(object),
                "is_dup": (group["conv_id"].to_numpy(object) != rep.to_numpy(object)).astype(np.int64),
            }
        )

    labeled = (
        digests.map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(label, batch_format="pandas")
    )

    return labeled.sort("conv_id")


def transcript_conv_dedup_sql(path: str) -> str:
    return f"""
WITH d AS (
    SELECT conv_id,
           md5(string_agg(md5(COALESCE(text, '')), '' ORDER BY turn_idx)) AS conv_digest
    FROM read_parquet('{path}/*.parquet')
    GROUP BY conv_id
),
r AS (SELECT conv_digest, MIN(conv_id) AS rep_conv_id FROM d GROUP BY conv_digest)
SELECT d.conv_id, d.conv_digest, r.rep_conv_id,
       CAST(CASE WHEN d.conv_id != r.rep_conv_id THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM d JOIN r USING (conv_digest)
ORDER BY d.conv_id
"""


def transcript_conv_neardup(path: str, n_parts: int | None = None,
                            max_hamming: int = 3):
    """Conversation-level NEAR-duplicate pairs over the transcript table
    — the transcript arm of the SimHash dedup family: agent re-rolls and
    retried conversations differ by a few turns of wording, not
    byte-identically, so ``transcript_conv_dedup``'s exact digest misses
    them. Each conversation's turns RESTORE (part_id co-location, the
    fold exchange, in-group sort by (conv_id, turn_idx) — the north
    rule's ordering invariant made load-bearing: swapping two turns
    changes the signature) and concatenate to one text; the shared
    banded tail (``dedup.banded_hash_pairs``: 4×16-bit pigeonhole
    bands, star cap, chunked XOR+popcount verification) emits
    (a, b, hamming) keyed by a 52-bit md5 prefix of the conv_id string
    — format-agnostic (any conv_id scheme works; no ``conv-%06d``
    assumption), 52 bits so the key survives float64 promotion in the
    sparse-safe cogroup exchange downstream (cluster resolution); see
    ``conv_sig`` for the full budget note.

    Scale shape: after the fold exchange only conversation-cardinality
    signature rows move (the text leaves the fold as a 64-bit hash);
    conversations with zero tokens are excluded on both engines (an
    all-zero signature would pair every empty conv with every other).
    Pinned to ``transcript_conv_neardup_sql`` (bit-exact below the
    shared ``_MAX_BUCKET`` star cap — see the twin's docstring for the
    two documented equality assumptions)."""
    from ..sources.transcripts import read_transcripts
    from ..stages.fold import _default_n_parts
    from ..state.lineage import append_part_id
    from .dedup import banded_hash_pairs, simhash_rows

    n_parts = n_parts or _default_n_parts()
    ds = read_transcripts(path, columns=["conv_id", "turn_idx", "text"])
    ds = ds.map_batches(
        lambda b: append_part_id(b, n_parts), batch_format="pyarrow", zero_copy_batch=True
    )

    def conv_sig(group: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        g = group.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        ids, texts = [], []
        for cid, sub in g.groupby("conv_id", sort=False):
            text = " ".join(t if isinstance(t, str) else "" for t in sub["text"])
            if not text.split():
                continue  # empty conversations carry no signature
            # 52-bit md5 prefix of the conv_id string: works for ANY id
            # scheme (twin: ('0x' || substr(md5(conv_id), 1, 13))::BIGINT).
            # 52 bits — not 60 — on purpose: cluster resolution downstream
            # rides the sparse-safe cogroup exchange, whose null-interleaved
            # merges promote int64 through float64 (exact only to 2^53);
            # a 60-bit key silently splits into real+rounded node pairs
            # (found as a 1.7x node inflation at sf1). Birthday budget:
            # ~1.6e-4 collision odds at 1.2M convs; at the 10^12 design
            # point conversation identity uses the 128-bit STRING digest path
            # (transcript_conv_dedup) — documented, not silent.
            ids.append(int(hashlib.md5(str(cid).encode()).hexdigest()[:13], 16))
            texts.append(text)
        cache: dict = {}
        df = pd.DataFrame({"doc_id": np.asarray(ids, np.int64),
                           "text": pd.Series(texts, dtype=object)})
        out = simhash_rows(df, cache)
        out["doc_id"] = out["doc_id"].astype(np.int64)
        for b in range(4):
            out[f"band{b}"] = out[f"band{b}"].astype(np.int64)
        return out

    sigs = ds.groupby("part_id").map_groups(conv_sig, batch_format="pandas")
    return banded_hash_pairs(sigs, max_hamming=max_hamming)


def transcript_conv_clusters(path: str, max_hamming: int = 3,
                             max_rounds: int = 32):
    """Conversation-level near-duplicate CLUSTERS — the scale-correct
    deliverable of the conv near-dup family. Measured at the sf1 corpus
    (1.2M convs): the PAIR list grows ~96x at 10x convs (972k → 93.6M
    pairs; duplicate-group size grows with corpus, so pairwise output is
    inherently quadratic in group size), while clusters stay linear —
    one row per conversation. Edges come from
    ``transcript_conv_neardup`` (banded SimHash verification); the
    universe is EVERY conversation (hashed 52-bit float-exact conv
    key — see ``conv_sig``), so empty
    and unique conversations appear as singletons; components resolve
    with the shared pointer-jumping min-label propagation
    (``dedup.dup_clusters(universe=...)``).

    Output: (doc_id = conv key, cluster = min member key,
    cluster_size), sorted by doc_id. Pinned to
    ``transcript_conv_clusters_sql`` (recursive-CTE transitive closure
    over the bit-exact pair twin)."""
    from ..sources.transcripts import read_transcripts
    from .dedup import dup_clusters

    edges = transcript_conv_neardup(path, max_hamming=max_hamming)

    def conv_keys(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch["conv_id"].drop_duplicates()
        ids = [int(hashlib.md5(str(c).encode()).hexdigest()[:13], 16) for c in u]
        return pd.DataFrame({"doc_id": np.asarray(ids, np.int64)})

    # cross-batch duplicate keys are fine: dup_clusters' singleton merge
    # is a bucketed (node -> min label) aggregate, which dedupes nodes
    universe = read_transcripts(path, columns=["conv_id"]).map_batches(
        conv_keys, batch_format="pandas"
    )
    return dup_clusters(path, edges=edges, universe=universe,
                        max_rounds=max_rounds)


def transcript_conv_clusters_sql(path: str, max_hamming: int = 3) -> str:
    """DuckDB replay: the bit-exact pair twin wrapped in a
    recursive-CTE transitive closure (same shape as DUP_CLUSTERS_SQL),
    universe = every distinct hashed conv key. Closure size is bounded
    by sum(component^2) — gate-scale only; the engine path is the
    production shape."""
    pairs = transcript_conv_neardup_sql(path, max_hamming=max_hamming)
    return f"""
WITH RECURSIVE pairs AS (
    SELECT a, b FROM ({pairs.rstrip()}) t
),
univ AS (
    SELECT DISTINCT ('0x' || substr(md5(conv_id), 1, 13))::BIGINT AS doc_id
    FROM read_parquet('{path}/*.parquet')
),
bidir AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b AS u, a AS v FROM pairs),
reach(u, v) AS (
    SELECT u, v FROM bidir
    UNION
    SELECT r.u, e.v FROM reach r JOIN bidir e ON r.v = e.u WHERE e.v <> r.u
),
labels AS (
    SELECT d.doc_id AS doc_id,
           CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT) AS cluster
    FROM univ d LEFT JOIN reach r ON r.u = d.doc_id
    GROUP BY d.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, cluster,
       CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size
FROM labels
ORDER BY doc_id
"""


def transcript_conv_neardup_sql(path: str, max_hamming: int = 3) -> str:
    """DuckDB replay: ordered per-conversation concat feeding the SHARED
    SimHash tail (``dedup.simhash_tail_sql`` — md5-LE64 token hashes,
    band pigeonhole, XOR-popcount Hamming; one copy with the docs twin).

    Twin-equality assumptions, both documented here because the gate is
    forced: (1) the star cap — below ``dedup._MAX_BUCKET`` conversations
    per (band, value) bucket the engine's capped tail equals this
    all-pairs SQL (same contract as DOCS_MINHASH/SIMHASH); (2) the
    tokenizer — Python ``str.split()`` separates on ANY Unicode
    whitespace, so the RE2 class below enumerates Python's full
    whitespace set explicitly (RE2's ``\s`` alone is ASCII-only and
    misses NBSP — which the invoice family's payloads carry — as well
    as \x0b, \x1c-\x1f, \x85 and the U+2000 block)."""
    from .dedup import simhash_tail_sql

    # Python str.split() whitespace, enumerated for RE2
    ws = (r"\t\n\x{000B}\x{000C}\r\x{001C}-\x{001F} \x{0085}\x{00A0}"
          r"\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}")
    return f"""
WITH conv AS (
    SELECT ('0x' || substr(md5(conv_id), 1, 13))::BIGINT AS doc_id,
           string_agg(COALESCE(text, ''), ' ' ORDER BY turn_idx) AS text
    FROM read_parquet('{path}/*.parquet')
    GROUP BY conv_id
),
otok AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(text, '[{ws}]+'), x -> x <> '')) AS t
    FROM conv
),
{simhash_tail_sql(max_hamming)}
"""


# ---------------------------------------------------------------------------
# context-tail assembly (last-K turns rendered per conversation)


CTX_TAIL_K = 4


def context_tail_frame(group: pd.DataFrame, k: int = CTX_TAIL_K) -> pd.DataFrame:
    """Per-conversation rendered tail for one co-located partition: the
    last ``k`` turns in restored order, rendered ``role: text`` and
    newline-joined — the context-window assembly an inference or
    eval-harness pipeline runs per conversation."""
    from ..stages.fold import conv_boundaries

    if len(group) == 0:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "n_turns": pd.Series([], dtype=np.int64),
                "n_ctx": pd.Series([], dtype=np.int64),
                "context": pd.Series([], dtype=object),
            }
        )
    conv = np.asarray(group["conv_id"], dtype=object)
    tidx = np.asarray(group["turn_idx"], dtype=np.int64)
    role = np.asarray(group["role"], dtype=object)
    text = np.asarray(group["text"], dtype=object)
    order, bounds = conv_boundaries(conv, tidx)
    cv, rl, tx = conv[order], role[order], text[order]
    n = len(bounds) - 1
    conv_ids = np.empty(n, dtype=object)
    n_turns = np.empty(n, dtype=np.int64)
    n_ctx = np.empty(n, dtype=np.int64)
    ctx = np.empty(n, dtype=object)
    for i in range(n):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        s = max(lo, hi - k)
        conv_ids[i] = cv[lo]
        n_turns[i] = hi - lo
        n_ctx[i] = hi - s
        ctx[i] = "\n".join(
            f"{rl[j]}: {'' if tx[j] is None else tx[j]}" for j in range(s, hi)
        )
    return pd.DataFrame(
        {"conv_id": conv_ids, "n_turns": n_turns, "n_ctx": n_ctx, "context": ctx}
    )


def transcript_context_tails(path: str, n_parts: int | None = None):
    """Rendered last-``CTX_TAIL_K``-turn context per conversation →
    Dataset(conv_id, n_turns, n_ctx, context), sorted by conv_id. Same
    one-exchange fold co-location as the other transcript ops; output is
    conversation-cardinality with k-turn-bounded strings."""
    from ..sources.transcripts import read_transcripts
    from ..stages.fold import _default_n_parts
    from ..state.lineage import append_part_id

    n_parts = n_parts or _default_n_parts()
    ds = read_transcripts(path, columns=["conv_id", "turn_idx", "role", "text"])
    ds = ds.map_batches(
        lambda b: append_part_id(b, n_parts), batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        ds.groupby("part_id")
        .map_groups(context_tail_frame, batch_format="pandas")
        .sort("conv_id")
    )


def transcript_context_tails_sql(path: str, k: int = CTX_TAIL_K) -> str:
    return f"""
WITH t AS (
    SELECT conv_id, turn_idx, role, text,
           COUNT(*) OVER (PARTITION BY conv_id) AS n,
           ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
    FROM read_parquet('{path}/*.parquet')
)
SELECT conv_id, CAST(MIN(n) AS BIGINT) AS n_turns,
       CAST(COUNT(*) AS BIGINT) AS n_ctx,
       string_agg(role || ': ' || COALESCE(text, ''), chr(10) ORDER BY turn_idx) AS context
FROM t WHERE rn > n - {k}
GROUP BY conv_id ORDER BY conv_id
"""


# ---------------------------------------------------------------------------
# turn-gap latency telemetry (per tool family × role, exact quantiles)


_ROLE_IDS = {"user": 0, "assistant": 1, "tool": 2}


def transcript_tool_latency(path: str, n_parts: int | None = None):
    """Exact p50/p95 of the turn-to-turn time gap, grouped by (tool
    family, role of the later turn) — the latency telemetry an agent
    platform reads off its own transcripts (how long do tool turns take
    vs assistant turns, per pipeline family).

    Shape: the fold exchange restores turn order and emits the narrow
    (gid, gap_us) table (one int pair per non-first turn), materialized
    like ``docs_quality_rank``'s key table; both quantiles then run as
    ``exact_grouped_quantile_int`` histogram-narrowing selections —
    (tool × role) is a BOUNDED group set, every group narrowed in the
    same pass, no sort. Rank semantics k = ceil(q·n) shared with the
    kernel, so the DuckDB twin (LAG + windowed rank selection) is
    bit-exact."""
    from ..sources.transcripts import read_transcripts
    from ..stages.fold import _default_n_parts, conv_boundaries
    from ..state.lineage import append_part_id
    from .relational import exact_grouped_quantile_int

    n_parts = n_parts or _default_n_parts()
    ds = read_transcripts(path, columns=["conv_id", "turn_idx", "role", "tool", "ts"])
    ds = ds.map_batches(
        lambda b: append_part_id(b, n_parts), batch_format="pyarrow", zero_copy_batch=True
    )

    # bounded tool-family set → stable integer gids (sorted for determinism)
    tools = sorted(
        read_transcripts(path, columns=["tool"])
        .map_batches(lambda b: b.drop_duplicates(["tool"]), batch_format="pandas")
        .to_pandas()["tool"].unique()
    )
    t2i = {t: i for i, t in enumerate(tools)}

    def gaps(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame(
                {"gid": pd.Series([], dtype=np.int64), "gap_us": pd.Series([], dtype=np.int64)}
            )
        conv = np.asarray(group["conv_id"], dtype=object)
        tidx = np.asarray(group["turn_idx"], dtype=np.int64)
        role = np.asarray(group["role"], dtype=object)
        tool = np.asarray(group["tool"], dtype=object)
        ts = np.asarray(group["ts"], dtype="datetime64[us]").astype(np.int64)
        order, bounds = conv_boundaries(conv, tidx)
        rl, tl, t = role[order], tool[order], ts[order]
        gid_out, gap_out = [], []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            if hi - lo < 2:
                continue
            g = t[lo + 1 : hi] - t[lo : hi - 1]
            gids = np.array(
                [t2i[x] * 4 + _ROLE_IDS[r] for x, r in zip(tl[lo + 1 : hi], rl[lo + 1 : hi])],
                dtype=np.int64,
            )
            gid_out.append(gids)
            gap_out.append(g)
        if not gid_out:
            return pd.DataFrame(
                {"gid": pd.Series([], dtype=np.int64), "gap_us": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {"gid": np.concatenate(gid_out), "gap_us": np.concatenate(gap_out)}
        )

    gap_ds = ds.groupby("part_id").map_groups(gaps, batch_format="pandas").materialize()

    p50 = exact_grouped_quantile_int(gap_ds, "gid", "gap_us", 500_000)
    p95 = exact_grouped_quantile_int(gap_ds, "gid", "gap_us", 950_000)
    rows = []
    for gid in sorted(p50):
        n, _k, v50 = p50[gid]
        _n, _k95, v95 = p95[gid]
        rows.append((tools[gid // 4], ["user", "assistant", "tool"][gid % 4], n, v50, v95))
    out = pd.DataFrame(rows, columns=["tool", "role", "n", "p50_us", "p95_us"])
    out[["n", "p50_us", "p95_us"]] = out[["n", "p50_us", "p95_us"]].astype(np.int64)

    import ray.data

    return ray.data.from_pandas(out)


def transcript_tool_latency_sql(path: str) -> str:
    return f"""
WITH s AS (
    SELECT tool, role, ts,
           LAG(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pts
    FROM read_parquet('{path}/*.parquet')
),
g AS (
    SELECT tool, role, epoch_us(ts) - epoch_us(pts) AS gap
    FROM s WHERE pts IS NOT NULL
),
r AS (
    SELECT tool, role, gap,
           ROW_NUMBER() OVER (PARTITION BY tool, role ORDER BY gap) AS rn,
           COUNT(*) OVER (PARTITION BY tool, role) AS n
    FROM g
),
p50 AS (
    SELECT tool, role, MIN(n) AS n, MIN(gap) AS p50_us FROM r
    WHERE rn = (500000 * n + 999999) // 1000000 GROUP BY tool, role
),
p95 AS (
    SELECT tool, role, MIN(gap) AS p95_us FROM r
    WHERE rn = (950000 * n + 999999) // 1000000 GROUP BY tool, role
)
SELECT p50.tool, p50.role, CAST(p50.n AS BIGINT) AS n,
       CAST(p50.p50_us AS BIGINT) AS p50_us, CAST(p95.p95_us AS BIGINT) AS p95_us
FROM p50 JOIN p95 USING (tool, role)
ORDER BY p50.tool, p50.role
"""


# ---------------------------------------------------------------------------
# role-transition matrix (Markov counts over restored turn order)


def transcript_role_transitions(path: str, n_parts: int | None = None):
    """Corpus-wide (previous role → role) transition counts over
    RESTORED turn order, plus per-transition conversation counts — the
    Markov structure audit of a dialogue corpus (does `tool` ever
    follow `user`? how often does `assistant` self-transition?). Another
    ordering-sensitive aggregate: a row-order bug reshuffles mass
    between cells, and the LAG-based DuckDB twin recomputes the matrix
    independently.

    Shape: the fold exchange; per-partition vectorized boundary-masked
    shift (the bigram kernel's shape over roles instead of tokens);
    KB-sized grouped sums (≤ 9 cells)."""
    from ..sources.transcripts import read_transcripts
    from ..stages.fold import _default_n_parts, conv_boundaries
    from ..state.lineage import append_part_id
    from .common import grouped_sums

    n_parts = n_parts or _default_n_parts()
    ds = read_transcripts(path, columns=["conv_id", "turn_idx", "role"])
    ds = ds.map_batches(
        lambda b: append_part_id(b, n_parts), batch_format="pyarrow", zero_copy_batch=True
    )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame(
                {
                    "prev_role": pd.Series([], dtype=object),
                    "role": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                    "n_convs": pd.Series([], dtype=np.int64),
                }
            )
        conv = np.asarray(group["conv_id"], dtype=object)
        tidx = np.asarray(group["turn_idx"], dtype=np.int64)
        role = np.asarray(group["role"], dtype=object)
        order, bounds = conv_boundaries(conv, tidx)
        cv, rl = conv[order], role[order]
        same = np.zeros(len(cv) - 1, dtype=bool) if len(cv) > 1 else np.zeros(0, dtype=bool)
        if len(cv) > 1:
            starts = np.zeros(len(cv), dtype=bool)
            starts[bounds[:-1]] = True
            same = ~starts[1:]
        df = pd.DataFrame(
            {
                "prev_role": rl[:-1][same],
                "role": rl[1:][same],
                "conv": cv[1:][same],
            }
        )
        out = df.groupby(["prev_role", "role"], as_index=False).agg(
            n=("conv", "size"), n_convs=("conv", "nunique")
        )
        out[["n", "n_convs"]] = out[["n", "n_convs"]].astype(np.int64)
        return out

    per_part = ds.groupby("part_id").map_groups(pairs, batch_format="pandas")
    # conversations never span partitions (part_id is a function of
    # conv_id), so per-partition nunique sums are exact global nuniques
    mat = grouped_sums(per_part, ["prev_role", "role"], ["n", "n_convs"])
    return mat.sort(["prev_role", "role"])


def transcript_role_transitions_sql(path: str) -> str:
    return f"""
WITH s AS (
    SELECT conv_id, role,
           LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
    FROM read_parquet('{path}/*.parquet')
)
SELECT prev_role, role, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM s WHERE prev_role IS NOT NULL
GROUP BY prev_role, role
ORDER BY prev_role, role
"""


# ---------------------------------------------------------------------------
# Conversation-ordered context packing: assign every turn to a fixed-size
# token window within its conversation (the SFT-batch preparation step —
# ``docs_pack_sequences`` packs documents corpus-wide; this packs TURNS in
# restored conversation order). The window assignment is an order-sensitive
# functional of the turn sequence (exclusive token cumsum), so it pins the
# north rule's stable-turn-ordering restore through a different lens than
# the hygiene digest: a transposed turn shifts every later window offset.

PACK_WINDOW_TOKENS = 64


def transcript_turn_pack(path: str, n_parts: int | None = None,
                         window_tokens: int = PACK_WINDOW_TOKENS):
    """Per-turn window id + token offset inside its conversation.

    ``n_toks`` counts single-space splits (``text.count(' ') + 1`` ==
    ``len(string_split(text, ' '))`` for EVERY string, so engine and twin
    agree bytewise regardless of corpus whitespace). Shape: the fold
    exchange (part_id map-side, one groupby, vectorized segment cumsum via
    global-cumsum-minus-segment-base — no per-conversation Python loop).
    Output is turn-cardinality but narrow (no text leaves the exchange
    carrying stage)."""
    from ..sources.transcripts import read_transcripts
    from ..stages.fold import _default_n_parts, conv_boundaries
    from ..state.lineage import append_part_id

    n_parts = n_parts or _default_n_parts()
    ds = read_transcripts(path, columns=["conv_id", "turn_idx", "text"])
    ds = ds.map_batches(
        lambda b: append_part_id(b, n_parts), batch_format="pyarrow", zero_copy_batch=True
    )

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        cols = ("conv_id", "turn_idx", "n_toks", "win", "win_off")
        if len(group) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=object if c == "conv_id" else np.int64)
                 for c in cols}
            )
        conv = np.asarray(group["conv_id"], dtype=object)
        tidx = np.asarray(group["turn_idx"], dtype=np.int64)
        txt = np.asarray(group["text"], dtype=object)
        ntok = np.fromiter((t.count(" ") + 1 for t in txt), dtype=np.int64, count=len(txt))
        order, bounds = conv_boundaries(conv, tidx)
        c, t, n = conv[order], tidx[order], ntok[order]
        excl = np.cumsum(n) - n  # exclusive prefix sum, globally
        base = np.repeat(excl[bounds[:-1]], np.diff(bounds))
        cum = excl - base        # exclusive prefix sum within each conversation
        return pd.DataFrame(
            {
                "conv_id": c,
                "turn_idx": t,
                "n_toks": n,
                "win": cum // window_tokens,
                "win_off": cum % window_tokens,
            }
        )

    return (
        ds.groupby("part_id")
        .map_groups(pack, batch_format="pandas")
        .sort(["conv_id", "turn_idx"])
    )


def transcript_turn_pack_sql(path: str, window_tokens: int = PACK_WINDOW_TOKENS) -> str:
    return f"""
WITH s AS (
    SELECT conv_id, turn_idx,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
           CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
                PARTITION BY conv_id ORDER BY turn_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
    FROM read_parquet('{path}/*.parquet')
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, n_toks,
       cum // {window_tokens} AS win, cum % {window_tokens} AS win_off
FROM s
ORDER BY conv_id, turn_idx
"""


# ---------------------------------------------------------------------------
# Extraction-success telemetry: the monitoring rollup a production
# extraction platform reads off its own output — per (tool family, day),
# how many turns did the invoice field bank fire on, and how many fields
# per turn. Runs the PRODUCTION vectorized RE2 stage
# (``stages.invoice_extract.InvoiceFieldExtractor``) over the raw turns;
# the DuckDB twin replays the identical RE2 bank (both engines are RE2, the
# bank has no lookbehind) including the ":"-prefix re-anchor quirk. On this
# corpus the bank discriminates perfectly (fires on every invoice-family
# turn, on no other family) — the telemetry shows it.


def transcript_extract_rate(path: str):
    """(tool, day_epoch, n_turns, n_hits, n_fields, hit_ppm) sorted.

    Map-only extraction + bounded-group rollup (tool families × days):
    no exchange carries text; day is the epoch-day integer so both
    engines agree bytewise on the time key. ``hit`` = at least one bank
    field extracted non-empty; ``n_fields`` sums fields over turns."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sources.transcripts import read_transcripts
    from ..stages.invoice_extract import FIELD_PREFIX, InvoiceFieldExtractor
    from .common import grouped_sums

    ds = read_transcripts(path, columns=["tool", "ts", "text"])
    extracted = ds.map_batches(InvoiceFieldExtractor(), batch_format="pyarrow")

    def rollup_rows(batch: pa.Table) -> pd.DataFrame:
        nf = np.zeros(len(batch), dtype=np.int64)
        for name in batch.schema.names:
            if name.startswith(FIELD_PREFIX):
                got = pc.coalesce(batch[name], "")
                nf += pc.not_equal(got, "").to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        )
        return pd.DataFrame(
            {
                "tool": np.asarray(batch["tool"].to_pandas(), dtype=object),
                "day_epoch": day,
                "n_turns": np.int64(1),
                "n_hits": (nf > 0).astype(np.int64),
                "n_fields": nf,
            }
        )

    agg = grouped_sums(
        extracted.map_batches(rollup_rows, batch_format="pyarrow"),
        ["tool", "day_epoch"],
        ["n_turns", "n_hits", "n_fields"],
    ).to_pandas()  # bounded: tool families x days

    agg["hit_ppm"] = (1_000_000 * agg["n_hits"]) // agg["n_turns"]
    agg = agg.sort_values(["tool", "day_epoch"]).reset_index(drop=True)
    for c in ("day_epoch", "n_turns", "n_hits", "n_fields", "hit_ppm"):
        agg[c] = agg[c].astype(np.int64)

    import ray.data

    return ray.data.from_pandas(agg)


def transcript_extract_rate_sql(path: str) -> str:
    from .surrogate import _SQL_INV_PATTERNS, _sql_quote

    hits = " + ".join(
        f"CASE WHEN regexp_extract(t2, {_sql_quote(p)}, 1) <> '' THEN 1 ELSE 0 END"
        for p in _SQL_INV_PATTERNS.values()
    )
    return f"""
WITH s AS (
    SELECT tool,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_epoch,
           CASE WHEN starts_with(text, ':') THEN 'Order No.' || text
                ELSE text END AS t2
    FROM read_parquet('{path}/*.parquet')
),
f AS (SELECT tool, day_epoch, ({hits}) AS nf FROM s)
SELECT tool, day_epoch,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(CASE WHEN nf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(SUM(nf) AS BIGINT) AS n_fields,
       CAST((1000000 * SUM(CASE WHEN nf > 0 THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
           AS hit_ppm
FROM f
GROUP BY 1, 2
ORDER BY 1, 2
"""


def transcript_prompt_response(path: str, n_parts: int | None = None):
    """Prompt→response length moments — the conversational-quality
    statistic over adjacent (user turn, assistant turn) pairs: exact
    integer sufficient statistics (n, Σu, Σa, Σu², Σa², Σu·a) per tool
    family, from which correlation/regression derive downstream without
    re-reading the corpus. ORDER-SENSITIVE: pairing walks turn_idx
    order inside each conversation, so this is a third independent lens
    (besides the hygiene digest and turn packing) on the north rule's
    stable-turn-ordering restore.

    Scale shape: one part_id-bucketed exchange (the fold exchange every
    transcript op shares) carrying (conv, turn, role, len) — lengths,
    not text; in-bucket vectorized lexsort + shifted-role mask; the
    emitted partial is ONE row per (bucket, tool family). Moments fold
    in int64 throughout (len ≤ 8 KB per turn → Σu·a stays inside 2^63
    below ~10^11 pairs — beyond that, shard the corpus and merge the
    per-shard moment rows in Python ints; the combine itself has no
    wider-than-int64 path)."""
    from ..sources.transcripts import read_transcripts
    from ..stages.fold import _default_n_parts
    from ..state.lineage import append_part_id

    n_parts = n_parts or _default_n_parts()
    ds = read_transcripts(path, columns=["conv_id", "turn_idx", "role", "tool", "text"])

    def proj(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "role": batch["role"],
                "tool": batch["tool"],
                "tlen": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            }
        )

    narrow = ds.map_batches(proj, batch_format="pyarrow").map_batches(
        lambda b: append_part_id(b, n_parts),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy(object)
        role = g["role"].to_numpy(object)
        tool = g["tool"].to_numpy(object)
        ln = g["tlen"].to_numpy(np.int64)
        same_conv = conv[1:] == conv[:-1]
        pair = same_conv & (role[:-1] == "user") & (role[1:] == "assistant")
        idx = np.flatnonzero(pair)
        if len(idx) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=(object if c == "tool" else np.int64))
                 for c in ("tool", "n_pairs", "sum_u", "sum_a", "sum_u2",
                           "sum_a2", "sum_ua")}
            )
        u, a = ln[idx], ln[idx + 1]
        fam = tool[idx]
        df = pd.DataFrame(
            {
                "tool": fam, "n_pairs": np.int64(1),
                "sum_u": u, "sum_a": a,
                "sum_u2": u * u, "sum_a2": a * a, "sum_ua": u * a,
            }
        )
        return df.groupby("tool", as_index=False, sort=False).sum()

    from .common import bucketed_group_agg

    agg = bucketed_group_agg(
        narrow.groupby("part_id").map_groups(fold, batch_format="pandas"),
        ["tool"],
        {"n_pairs": "sum", "sum_u": "sum", "sum_a": "sum",
         "sum_u2": "sum", "sum_a2": "sum", "sum_ua": "sum"},
    )

    def fin(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("n_pairs", "sum_u", "sum_a", "sum_u2", "sum_a2", "sum_ua"):
            batch[c] = batch[c].astype(np.int64)
        return batch

    return agg.map_batches(fin, batch_format="pandas").sort("tool")


def transcript_prompt_response_sql(path: str) -> str:
    return f"""
WITH t AS (
    SELECT conv_id, turn_idx, role, tool, length(text) AS tlen
    FROM read_parquet('{path}/*.parquet')
),
w AS (
    SELECT conv_id, turn_idx, role, tool, tlen,
           LEAD(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_role,
           LEAD(tlen) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_len
    FROM t
)
SELECT tool,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(tlen) AS BIGINT) AS sum_u,
       CAST(SUM(next_len) AS BIGINT) AS sum_a,
       CAST(SUM(tlen * tlen) AS BIGINT) AS sum_u2,
       CAST(SUM(next_len * next_len) AS BIGINT) AS sum_a2,
       CAST(SUM(tlen * next_len) AS BIGINT) AS sum_ua
FROM w
WHERE role = 'user' AND next_role = 'assistant'
GROUP BY tool
ORDER BY tool
"""

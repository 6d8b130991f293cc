"""Deduplication operators over the ``documents`` table.

- exact: content-hash partition + per-group min (shuffle only over hashes)
- MinHash + LSH: shingle → minhash signature → band buckets → candidate
  pairs → exact-Jaccard verification (ray_guide "Aggregation at scale")
- SimHash: 64-bit token simhash per document + banded near-dup pairs
- n-gram Jaccard: group-bounded all-pairs similarity inside map_groups

Everything is deterministic: hashes are md5-derived (never Python ``hash``),
minhash permutations come from fixed constants, pair emission is
canonically ordered.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from ray.data.aggregate import Min

_MERSENNE = (1 << 61) - 1
_N_HASHES = 64
_BANDS = 16  # 16 bands x 4 rows
_ROWS = _N_HASHES // _BANDS
# Universal hash family (a*h + b) mod p, p = 2^61-1, computed EXACTLY.
# a naive uint64 (a*h+b) % p wraps mod 2^64 before the reduction (breaks
# the pairwise-independence analysis), while shrinking a to avoid the wrap
# makes h -> a*h+b piecewise-monotone with so few wraps that every
# "permutation" picks the same min-shingle (observed: 0.06 signature
# agreement at jaccard 0.75). _mulmod_p below does the 122-bit product
# with 32-bit limbs and Mersenne folding (2^61 === 1 mod p), so the family
# is both exact and well-mixed.
_RNG = np.random.RandomState(42)
_P61 = np.uint64((1 << 61) - 1)
_A = _RNG.randint(1, (1 << 61) - 1, size=_N_HASHES, dtype=np.int64).astype(np.uint64)
_B = _RNG.randint(0, (1 << 61) - 1, size=_N_HASHES, dtype=np.int64).astype(np.uint64)
_M32 = np.uint64((1 << 32) - 1)


def _fold_p(x: np.ndarray) -> np.ndarray:
    """x mod p for x < 2^64, via 2^61 === 1 folding (exact, no overflow)."""
    x = (x >> np.uint64(61)) + (x & _P61)
    x = (x >> np.uint64(61)) + (x & _P61)
    return np.where(x >= _P61, x - _P61, x)


def _mulmod_p(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """(a * h) mod p with a, h < 2^61, exact in uint64 via 32-bit limbs:
    a*h = a1*h1*2^64 + (a1*h0 + a0*h1)*2^32 + a0*h0, and 2^64 === 8,
    2^32 stays as a shifted limb — every intermediate fits in uint64."""
    a1, a0 = a >> np.uint64(32), a & _M32
    h1, h0 = h >> np.uint64(32), h & _M32
    t1 = _fold_p(np.uint64(8) * _fold_p(a1 * h1))
    m = _fold_p(a1 * h0 + a0 * h1)
    m1, m0 = m >> np.uint64(32), m & _M32
    t2 = _fold_p(np.uint64(8) * m1 + _fold_p(m0 << np.uint64(32)))
    t3 = _fold_p(a0 * h0)
    return _fold_p(t1 + t2 + t3)
# oversized-bucket policy: past this many distinct-text docs in one band
# bucket, emit star edges to the bucket minimum instead of all pairs
# (bounds one viral near-dup cluster to O(m) instead of O(m^2); cluster
# connectivity is preserved, some direct pairs become transitive)
_MAX_BUCKET = 1 << 15


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    from ..runtime import tune_data_context

    tune_data_context()

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _md5_32(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "little")


def word_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    """64 minhashes over word 3-gram shingles (exact universal-hash family
    mod 2^61-1 — see ``_mulmod_p``)."""
    shingles = word_shingles(text, n)
    if not shingles:
        return np.zeros(_N_HASHES, dtype=np.uint64)
    base = np.array(sorted(_md5_64(s) for s in shingles), dtype=np.uint64) & _P61
    # (a*h + b) mod p for each of the 64 permutations, min over shingles
    hashed = _fold_p(_mulmod_p(_A[None, :], base[:, None]) + _B[None, :])
    return hashed.min(axis=0)


def exact_dedup(sf_dir: str):
    """Exact dedup: md5(text) → min doc_id per hash (+ group size).

    Hash-bucketed combine (``ops.common.bucketed_group_agg``): every
    distinct text is its own group, so Ray's per-group hash-aggregate
    overhead would scale with corpus size; bucketing pays it per bucket."""
    from .common import bucketed_group_agg

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "h": [hashlib.md5(t.encode()).hexdigest() for t in batch["text"]],
                "keep_id": batch["doc_id"],
                "n": np.int64(1),
            }
        )

    hashed = ds.map_batches(hash_batch, batch_format="pandas")
    return bucketed_group_agg(hashed, ["h"], {"keep_id": "min", "n": "sum"}).sort("h")


EXACT_DEDUP_SQL = """
SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n
FROM documents
GROUP BY 1
ORDER BY 1
"""


class MinHasher:
    """Actor stage: signature per doc → (band, band_hash, doc_id) rows."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        bands, band_hashes, doc_ids = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = minhash_signature(text)
            for b in range(_BANDS):
                chunk = sig[b * _ROWS : (b + 1) * _ROWS]
                bands.append(b)
                band_hashes.append(hashlib.md5(chunk.tobytes()).hexdigest()[:16])
                doc_ids.append(doc_id)
        return pd.DataFrame({"band": bands, "band_hash": band_hashes, "doc_id": doc_ids})


def _pair_table(a, b, **extra):
    """int64 pair table with an EXPLICIT Arrow schema: empty pandas blocks
    lose their column schema on the way into the hash-shuffle join
    aggregator (ArrowInvalid: no match for FieldRef), so every stage that
    can emit zero rows builds Arrow directly."""
    import pyarrow as pa

    cols = {
        "a": pa.array(np.asarray(a, dtype=np.int64), pa.int64()),
        "b": pa.array(np.asarray(b, dtype=np.int64), pa.int64()),
    }
    for k, v in extra.items():
        cols[k] = pa.array(np.asarray(v, dtype=np.int64), pa.int64())
    return pa.table(cols)


def minhash_lsh_pairs(sf_dir: str, jaccard_threshold: float = 0.5,
                      max_bucket: int = _MAX_BUCKET, num_partitions: int | None = None):
    """Near-dup pairs via MinHash-LSH, verified by exact shingle Jaccard.

    100 TB shape (nothing corpus-sized ever reaches the driver):

    1. EXACT-COLLAPSE first: one groupby(md5(text)) elects a representative
       (min doc_id) per distinct text and records every doc's rep. The
       common web-crawl viral cluster - thousands of byte-identical docs -
       collapses to ONE LSH participant, which is what defuses the
       quadratic band bucket.
    2. Band the representatives only; candidate rep pairs per (band,
       band_hash) bucket, emitted vectorized (triu indices). Buckets larger
       than ``max_bucket`` emit star edges to the bucket min instead of all
       pairs (O(m), cluster connectivity preserved, documented
       approximation - never reached at test scale).
    3. Verify candidates by exact Jaccard with texts obtained via a
       cogroup join back to the representative table - not a broadcast
       text dict (and not ``Dataset.join``, whose hash aggregator cannot
       handle the empty partitions a sparse candidate set produces).
    4. EXPAND verified rep pairs across exact-duplicate members with two
       cogroup joins, plus within-cluster pairs (jaccard = 1.0) per rep.

    Output is identical to direct banding+verification over all docs
    (members share their representative's signature); tested by
    ``tests/test_dedup_similarity.py`` including a planted viral cluster.
    """
    from .common import bucketed_group_agg, cogroup_join

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "h": [hashlib.md5(t.encode()).hexdigest() for t in batch["text"]],
                "doc_id": batch["doc_id"],
                "text": batch["text"],
                # empty-token docs have no shingles -> never near-dups
                "has_tok": [bool(t.split()) for t in batch["text"]],
            }
        )

    def collapse(group: pd.DataFrame) -> pd.DataFrame:
        """One hash group -> member rows tagged with their representative;
        the representative row keeps its text, members carry None."""
        g = group.sort_values("doc_id", kind="mergesort")
        rep = int(g["doc_id"].iloc[0])
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "rep_id": np.full(len(g), rep, dtype=np.int64),
                "has_tok": g["has_tok"].to_numpy(),
            }
        )
        out["text"] = [g["text"].iloc[0] if int(d) == rep else None for d in out["doc_id"]]
        return out

    # ONE text-bearing shuffle; both the rep table and the membership table
    # derive from it with stateless filters. materialize() pins the (small,
    # reduced) result so its consumers don't re-run the groupby.
    combined = (
        ds.map_batches(hash_batch, batch_format="pandas")
        .groupby("h")
        .map_groups(collapse, batch_format="pandas")
        .materialize()
    )
    rep_texts = combined.map_batches(
        lambda b: b[b["text"].notna()][["doc_id", "text"]], batch_format="pandas"
    ).materialize()
    members = combined.select_columns(["doc_id", "rep_id", "has_tok"]).materialize()

    banded = rep_texts.map_batches(MinHasher, batch_format="pandas", concurrency=(1, 4))

    def emit_pairs(group: pd.DataFrame):
        ids = np.unique(group["doc_id"].to_numpy().astype(np.int64))
        if len(ids) < 2:
            return _pair_table([], [])
        if len(ids) > max_bucket:
            return _pair_table(np.full(len(ids) - 1, ids[0]), ids[1:])
        iu = np.triu_indices(len(ids), 1)
        return _pair_table(ids[iu[0]], ids[iu[1]])

    pairs = banded.groupby(["band", "band_hash"]).map_groups(emit_pairs, batch_format="pandas")
    # a pair can surface from several bands -> dedup BEFORE the text joins.
    # Each reduced intermediate is pinned: a 30-operator lazy plan with ten
    # chained shuffle barriers schedules pathologically (observed 265 s for
    # sub-second stages); pinned, the same work runs in seconds.
    def mark(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(_nb=np.int64(1))

    cand = (
        bucketed_group_agg(pairs.map_batches(mark, batch_format="pandas"), ["a", "b"], {"_nb": "sum"})
        .drop_columns(["_nb"])
        .materialize()
    )

    # candidate texts via cogroup joins (rename to avoid collisions)
    ta = rep_texts.map_batches(
        lambda b: b.rename(columns={"text": "text_a"}), batch_format="pandas"
    )
    tb = rep_texts.map_batches(
        lambda b: b.rename(columns={"text": "text_b"}), batch_format="pandas"
    )
    cand = cogroup_join(cand, ta, "a", "doc_id", ["a", "b"], ["text_a"])
    cand = cogroup_join(cand, tb, "b", "doc_id", ["a", "b", "text_a"], ["text_b"])

    def verify(batch: pd.DataFrame):
        out = []
        for a, b, text_a, text_b in zip(batch["a"], batch["b"], batch["text_a"], batch["text_b"]):
            sa, sb = word_shingles(text_a), word_shingles(text_b)
            union = len(sa | sb)
            j = len(sa & sb) / union if union else 0.0
            if j >= jaccard_threshold:
                out.append((int(a), int(b), int(np.floor(j * 1e6 + 0.5))))
        arr = np.array(out, dtype=np.int64).reshape(-1, 3)
        return _pair_table(arr[:, 0], arr[:, 1], jaccard_ppm=arr[:, 2])

    verified_reps = cand.map_batches(verify, batch_format="pandas").materialize()

    # expansion 1: verified rep pair -> all member cross pairs
    ma = members.map_batches(lambda b: b[["doc_id", "rep_id"]].rename(columns={"doc_id": "x"}), batch_format="pandas")
    mb = members.map_batches(lambda b: b[["doc_id", "rep_id"]].rename(columns={"doc_id": "y"}), batch_format="pandas")
    cross = cogroup_join(verified_reps, ma, "a", "rep_id", ["b", "jaccard_ppm"], ["x"])
    cross = cogroup_join(cross, mb, "b", "rep_id", ["jaccard_ppm", "x"], ["y"])

    def canonize(batch: pd.DataFrame):
        x = batch["x"].to_numpy(dtype=np.int64)
        y = batch["y"].to_numpy(dtype=np.int64)
        return _pair_table(
            np.minimum(x, y), np.maximum(x, y),
            jaccard_ppm=batch["jaccard_ppm"].to_numpy(dtype=np.int64),
        )

    cross_pairs = cross.map_batches(canonize, batch_format="pandas")

    # expansion 2: within-cluster pairs (identical text -> jaccard exactly 1)
    def within(batch: pd.DataFrame):
        g = batch[batch["has_tok"]]
        frames = []
        for _rep, grp in g.groupby("rep_id", sort=False):
            ids = np.sort(grp["doc_id"].to_numpy(np.int64))
            if len(ids) < 2:
                continue
            iu = np.triu_indices(len(ids), 1)
            frames.append((ids[iu[0]], ids[iu[1]]))
        if not frames:
            return _pair_table([], [], jaccard_ppm=[])
        a = np.concatenate([f[0] for f in frames])
        b = np.concatenate([f[1] for f in frames])
        return _pair_table(a, b, jaccard_ppm=np.full(len(a), 1_000_000, dtype=np.int64))

    # collapse() emits each hash group contiguously inside one block, but a
    # giant group can span blocks -> regroup by rep_id to be safe
    within_pairs = members.groupby("rep_id").map_groups(within, batch_format="pandas")

    # No pair-level dedup needed: band-level duplicates were already
    # collapsed at the (small) rep-candidate stage; cross pairs (distinct
    # reps) and within pairs (same rep) are disjoint, and each unordered
    # doc pair maps to exactly one rep pair. A groupby here would also be a
    # scale bug: Ray's hash aggregate pays per-group overhead, and pair
    # keys are ~all distinct (measured 250+ s for 500k groups on 4 CPUs).
    return cross_pairs.union(within_pairs).sort(["a", "b"])


_BIT_IDX = np.arange(64, dtype=np.uint64)


def simhash64_batch(texts, _cache: dict | None = None) -> list[int]:
    """Vectorized 64-bit token SimHash per text: token hashes gathered
    through a cache (tokens repeat heavily), then ONE matrix bit-unpack +
    sign accumulation per document instead of a per-token Python loop."""
    cache = _cache if _cache is not None else {}
    out = []
    for text in texts:
        toks = text.split()
        if not toks:
            out.append(0)
            continue
        hs = np.fromiter(
            (cache.setdefault(t, _md5_64(t)) for t in toks),
            dtype=np.uint64, count=len(toks),
        )
        bits = ((hs[:, None] >> _BIT_IDX[None, :]) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        out.append(int(((acc > 0).astype(np.uint64) << _BIT_IDX).sum()))
    return out


def simhash64(text: str) -> int:
    """64-bit token SimHash (md5-derived token hashes, sign accumulation)."""
    return simhash64_batch([text])[0]


class SimHasher:
    """Actor stage: per-batch simhash with a per-actor token-hash cache."""

    def __init__(self) -> None:
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hs = simhash64_batch(list(batch["text"]), self.cache)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "simhash": [f"{h:016x}" for h in hs],
                "band0": [(h >> 0) & 0xFFFF for h in hs],
                "band1": [(h >> 16) & 0xFFFF for h in hs],
                "band2": [(h >> 32) & 0xFFFF for h in hs],
                "band3": [(h >> 48) & 0xFFFF for h in hs],
            }
        )


def simhash_docs(sf_dir: str):
    """Per-document 64-bit simhash (hex) + its 4 16-bit band keys
    (actor-pool stage so the token-hash cache persists across batches)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 4)).sort("doc_id")


def _hamming_pairs_chunked(ids: np.ndarray, hashes: np.ndarray, max_hamming: int,
                           chunk: int = 2048) -> pd.DataFrame:
    """All pairs with Hamming ≤ max_hamming, computed block-pairwise so
    peak memory is O(chunk^2) regardless of bucket size: XOR matrix per
    block pair, popcount via uint8 unpackbits."""
    out_a, out_b, out_d = [], [], []
    n = len(ids)
    for i0 in range(0, n, chunk):
        hi_i = min(i0 + chunk, n)
        for j0 in range(i0, n, chunk):
            hi_j = min(j0 + chunk, n)
            xor = np.bitwise_xor.outer(hashes[i0:hi_i], hashes[j0:hi_j])
            d = np.unpackbits(
                xor.view(np.uint8).reshape(hi_i - i0, hi_j - j0, 8), axis=2
            ).sum(axis=2, dtype=np.int64)
            ii, jj = np.nonzero(d <= max_hamming)
            gi, gj = ii + i0, jj + j0
            keep = gi < gj  # strict upper triangle in global index space
            out_a.append(ids[gi[keep]])
            out_b.append(ids[gj[keep]])
            out_d.append(d[ii[keep], jj[keep]])
    a = np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
    b = np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
    dd = np.concatenate(out_d) if out_d else np.array([], dtype=np.int64)
    return pd.DataFrame({"a": a.astype(np.int64), "b": b.astype(np.int64), "hamming": dd.astype(np.int64)})


def simhash_pairs(sf_dir: str, max_hamming: int = 3, max_bucket: int = _MAX_BUCKET):
    """SimHash near-dup pairs: 4x16-bit band buckets → candidate pairs →
    exact Hamming verification (near-dups must share ≥1 band when
    distance ≤ 3 by pigeonhole over 4 bands). Verification is vectorized
    (chunked XOR + popcount); buckets beyond ``max_bucket`` verify each
    member only against the bucket minimum (star cap, same policy as
    MinHash-LSH — O(m) instead of O(m^2) for one viral cluster)."""
    ds = simhash_docs(sf_dir)

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for b in range(4):
            frames.append(pd.DataFrame({
                "band": np.int64(b),
                "band_val": batch[f"band{b}"].astype(np.int64),
                "doc_id": batch["doc_id"],
                "simhash": batch["simhash"],
            }))
        return pd.concat(frames, ignore_index=True)

    banded = ds.map_batches(band_rows, batch_format="pandas")

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy().astype(np.int64)
        hashes = np.array([int(h, 16) for h in g["simhash"]], dtype=np.uint64)
        if len(ids) > max_bucket:
            d = np.unpackbits(
                np.bitwise_xor(hashes[0], hashes[1:]).view(np.uint8).reshape(-1, 8), axis=1
            ).sum(axis=1, dtype=np.int64)
            keep = d <= max_hamming
            return pd.DataFrame(
                {"a": np.full(int(keep.sum()), ids[0]), "b": ids[1:][keep], "hamming": d[keep]}
            )
        return _hamming_pairs_chunked(ids, hashes, max_hamming)

    pairs = banded.groupby(["band", "band_val"]).map_groups(emit_pairs, batch_format="pandas")
    # a pair can surface from several bands → exact dedup on the pair key
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming")).sort(["a", "b"])


def ngram_jaccard_groups(sf_dir: str, threshold: float = 0.3):
    """Group-bounded all-pairs n-gram Jaccard: pairs within each ``source``
    group (groupby co-locates; quadratic work stays inside small groups)."""
    ds = _docs(sf_dir, columns=["doc_id", "source", "text"])

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        docs = sorted(zip(group["doc_id"], group["text"]))
        shingles = {d: word_shingles(t) for d, t in docs}
        out = []
        for i, (a, _) in enumerate(docs):
            for b, _ in docs[i + 1 :]:
                sa, sb = shingles[a], shingles[b]
                union = len(sa | sb)
                j = len(sa & sb) / union if union else 0.0
                if j >= threshold:
                    out.append((group["source"].iloc[0], int(a), int(b), int(np.floor(j * 1e6 + 0.5))))
        cols = ["source", "a", "b", "jaccard_ppm"]
        return pd.DataFrame(out, columns=cols) if out else pd.DataFrame({c: [] for c in cols})

    return ds.groupby("source").map_groups(pairs, batch_format="pandas").sort(["source", "a", "b"])


def dup_clusters(sf_dir: str, max_hamming: int = 3, max_rounds: int = 12):
    """Near-duplicate CLUSTERS: distributed connected components over the
    SimHash near-dup edge set — the "cluster → keep one representative"
    primitive a dedup pipeline actually consumes (pair lists are an
    intermediate; cluster labels are the deliverable).

    Min-label propagation, fully distributed (no driver union-find over an
    edge list that is corpus-sized in a duplicate-heavy crawl), shaped to
    keep the iterative part SMALL:

    - the loop runs only over edge ENDPOINTS (~2E rows) — singleton docs
      (the overwhelming majority) never change label and are merged back
      in ONE final bucketed-min pass, no broadcast of the endpoint set;
    - edges are materialized bidirectionally once, so each round is a
      single cogroup join (neighbor labels offered downstream) + a
      bucketed min — labels are monotonically non-increasing, and
      ``sum(label)`` is the convergence certificate;
    - rounds needed = cluster diameter; the banded emitter's star cap
      keeps near-dup components shallow, so this converges in a handful
      of rounds (``max_rounds`` is a safety bound).

    Output: ``(doc_id, cluster, cluster_size)`` — cluster = min doc_id of
    the component; singletons keep themselves. Verified against a
    union-find reference over the same edges (tests).
    """
    from .common import bucketed_group_agg, cogroup_join

    edges = simhash_pairs(sf_dir, max_hamming=max_hamming).drop_columns(["hamming"])

    def bidir(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a"].to_numpy(dtype=np.int64)
        b = batch["b"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
        )

    bi = edges.map_batches(bidir, batch_format="pandas").materialize()

    # round 0 folded into initialization: every endpoint starts from
    # min(itself, its direct neighbors)
    def seed(batch: pd.DataFrame) -> pd.DataFrame:
        src = batch["src"].to_numpy(dtype=np.int64)
        dst = batch["dst"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"node": np.concatenate([src, dst]), "label": np.concatenate([src, src])}
        )

    labels = bucketed_group_agg(
        bi.map_batches(seed, batch_format="pandas"), ["node"], {"label": "min"}
    ).materialize()
    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        offers = cogroup_join(bi, labels, "src", "node", ["dst"], ["label"]).map_batches(
            lambda b: pd.DataFrame(
                {"node": b["dst"].astype(np.int64), "label": b["label"].astype(np.int64)}
            ),
            batch_format="pandas",
        )
        labels = bucketed_group_agg(labels.union(offers), ["node"], {"label": "min"}).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    # merge singletons back: every doc contributes (doc_id, doc_id); the
    # bucketed min keeps the propagated label for endpoint nodes
    docs = _docs(sf_dir, columns=["doc_id"])

    def init_all(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"node": ids, "label": ids})

    full = bucketed_group_agg(
        docs.map_batches(init_all, batch_format="pandas").union(labels),
        ["node"], {"label": "min"},
    ).materialize()

    # cluster sizes joined back onto members
    def one(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"label": batch["label"].astype(np.int64), "n": np.int64(1)})

    sizes = bucketed_group_agg(full.map_batches(one, batch_format="pandas"), ["label"], {"n": "sum"})
    sizes = sizes.map_batches(
        lambda b: b.rename(columns={"label": "s_label", "n": "cluster_size"}), batch_format="pandas"
    )
    out = cogroup_join(full, sizes, "label", "s_label", ["node", "label"], ["cluster_size"])

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["node"].astype(np.int64),
                "cluster": batch["label"].astype(np.int64),
                "cluster_size": batch["cluster_size"].astype(np.int64),
            }
        )

    return out.map_batches(project, batch_format="pandas").sort("doc_id")

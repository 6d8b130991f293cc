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

from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 61) - 1
_N_HASHES = 64
_BANDS = 16  # 16 bands x 4 rows
_ROWS = _N_HASHES // _BANDS
_RNG = np.random.RandomState(42)
_A = _RNG.randint(1, _MERSENNE, size=_N_HASHES, dtype=np.int64).astype(np.uint64)
_B = _RNG.randint(0, _MERSENNE, size=_N_HASHES, dtype=np.int64).astype(np.uint64)


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    from ..runtime import tune_data_context

    tune_data_context()

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def word_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    """64 minhashes over word 3-gram shingles (universal-hash family)."""
    shingles = word_shingles(text, n)
    if not shingles:
        return np.zeros(_N_HASHES, dtype=np.uint64)
    base = np.array(sorted(_md5_64(s) for s in shingles), dtype=np.uint64)
    # (a*h + b) mod p for each of the 64 permutations, min over shingles
    hashed = (base[:, None] * _A[None, :] + _B[None, :]) % np.uint64(_MERSENNE)
    return hashed.min(axis=0)


def exact_dedup(sf_dir: str):
    """Exact dedup: md5(text) → min doc_id per hash (+ group size)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "h": [hashlib.md5(t.encode()).hexdigest() for t in batch["text"]],
                "doc_id": batch["doc_id"],
            }
        )

    hashed = ds.map_batches(hash_batch, batch_format="pandas")
    out = hashed.groupby("h").aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n"))
    return out.sort("h")


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


def minhash_lsh_pairs(sf_dir: str, jaccard_threshold: float = 0.5):
    """Near-dup candidate pairs via MinHash-LSH, verified by exact Jaccard.

    Scale path: the verify stage re-reads only candidate docs via a
    broadcast id→text lookup. At 100 TB the lookup side would instead be a
    ``Dataset.join`` of candidates against documents on doc_id; the band
    groupby already bounds candidate volume.
    """
    import ray

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    # broadcast doc_id -> text once (small side at verification scale)
    texts = {}
    for batch in ds.iter_batches(batch_size=8192, batch_format="pandas"):
        texts.update(zip(batch["doc_id"], batch["text"]))
    texts_ref = ray.put(texts)

    banded = ds.map_batches(MinHasher, batch_format="pandas", concurrency=(1, 4))

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(int(i) for i in group["doc_id"]))
        rows = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(rows, columns=["a", "b"]) if rows else pd.DataFrame({"a": [], "b": []})

    pairs = banded.groupby(["band", "band_hash"]).map_groups(emit_pairs, batch_format="pandas")

    class VerifyJaccard:
        def __init__(self):
            self.texts = ray.get(texts_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                return pd.DataFrame({"a": [], "b": [], "jaccard_ppm": []})
            out = []
            for a, b in zip(batch["a"], batch["b"]):
                sa, sb = word_shingles(self.texts[int(a)]), word_shingles(self.texts[int(b)])
                union = len(sa | sb)
                j = len(sa & sb) / union if union else 0.0
                if j >= jaccard_threshold:
                    out.append((int(a), int(b), int(np.floor(j * 1e6 + 0.5))))
            return pd.DataFrame(out, columns=["a", "b", "jaccard_ppm"]) if out else pd.DataFrame(
                {"a": [], "b": [], "jaccard_ppm": []}
            )

    verified = pairs.map_batches(VerifyJaccard, batch_format="pandas", concurrency=(1, 4))
    # a pair can surface from several bands → exact dedup on the pair key
    return verified.groupby(["a", "b"]).aggregate(Min("jaccard_ppm", alias_name="jaccard_ppm")).sort(["a", "b"])


def simhash64(text: str) -> int:
    """64-bit token SimHash (md5-derived token hashes, sign accumulation)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.split():
        h = _md5_64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_docs(sf_dir: str):
    """Per-document 64-bit simhash (hex) + its 4 16-bit band keys."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def derive(batch: pd.DataFrame) -> pd.DataFrame:
        hs = [simhash64(t) for t in batch["text"]]
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

    return ds.map_batches(derive, batch_format="pandas").sort("doc_id")


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs: 4x16-bit band buckets → candidate pairs →
    exact Hamming verification (near-dups must share ≥1 band when
    distance ≤ 3 by pigeonhole over 4 bands)."""
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
        ids = g["doc_id"].to_numpy()
        hashes = [int(h, 16) for h in g["simhash"]]
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(hashes[i] ^ hashes[j]).count("1")
                if d <= max_hamming:
                    out.append((int(ids[i]), int(ids[j]), d))
        arr = np.array(out, dtype=np.int64).reshape(-1, 3)
        return pd.DataFrame({"a": arr[:, 0], "b": arr[:, 1], "hamming": arr[:, 2]})

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

"""Similarity search over the ``embeddings`` table (``list<float>`` dim-64).

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (the baseline; one pass over the corpus, no shuffle except
  the tiny per-query top-k combine),
- LSH-bucketed ANN: random-hyperplane signatures → bucket groupby → search
  only within buckets (the scale path; recall<1 by design).

Cosine values are fixed-point rounded (ppm) before ranking so ordering and
the DuckDB oracle are bit-stable across engines.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

_N_BITS = 4  # 16 buckets: sized for the ~500-vector test corpora; scale with corpus
_HYPERPLANES = np.random.RandomState(7).normal(size=(_N_BITS, 64)).astype(np.float64)


def _emb(sf_dir: str, columns=None):
    import ray.data as rd

    from ..runtime import tune_data_context

    tune_data_context()

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=columns)


def _matrix(batch: pd.DataFrame) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])


def knn_bruteforce(sf_dir: str, k: int = 5, n_queries: int = 10):
    """Exact cosine top-k for queries ``vec_id < n_queries`` (self excluded).

    Per batch: one matmul candidates×queries; per-query top-k is resolved in
    a final per-query group fold over per-batch partial top-ks.
    """
    import ray

    ds = _emb(sf_dir, columns=["vec_id", "embedding"])
    qdf = ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    q = _matrix(qdf)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    queries_ref = ray.put((qdf["vec_id"].to_numpy(), qn))

    class Score:
        def __init__(self):
            self.qids, self.qn = ray.get(queries_ref)
            self.k = k

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            c = _matrix(batch)
            cn = c / np.linalg.norm(c, axis=1, keepdims=True)
            sims = cn @ self.qn.T  # candidates x queries
            sim_ppm = np.floor(sims * 1e6 + 0.5).astype(np.int64)
            cids = batch["vec_id"].to_numpy()
            out = []
            for j, qid in enumerate(self.qids):
                col = sim_ppm[:, j]
                mask = cids != qid
                ids, vals = cids[mask], col[mask]
                # partial top-k inside the batch: (sim desc, vec_id asc)
                order = np.lexsort((ids, -vals))[: self.k]
                for i in order:
                    out.append((int(qid), int(ids[i]), int(vals[i])))
            return pd.DataFrame(out, columns=["query_id", "vec_id", "sim_ppm"])

    partial = ds.map_batches(Score, batch_format="pandas", concurrency=(1, 4))

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim_ppm", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partial.groupby("query_id").map_groups(topk, batch_format="pandas").sort(["query_id", "rank"])


KNN_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10),
scored AS (
    SELECT q.query_id, e.vec_id,
           CAST(FLOOR(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[])*1000000 + 0.5) AS BIGINT) AS sim_ppm
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
),
ranked AS (
    SELECT query_id, vec_id, sim_ppm,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim_ppm DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, sim_ppm, rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


def emb_dup_pairs(sf_dir: str, threshold_ppm: int = 400_000):
    """Embedding-cosine near-duplicate pairs (similarity join, a < b).

    Baseline exact variant: each batch of candidates is scored against the
    broadcast full matrix (one matmul per batch); only pairs ≥ threshold
    survive, so output stays tiny even though scoring is all-pairs. The
    bucketed scale path for huge corpora is ``ann_lsh`` / MinHash-LSH.
    """
    import ray

    ds = _emb(sf_dir, columns=["vec_id", "embedding"])
    all_df = ds.to_pandas()
    m = _matrix(all_df)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put((all_df["vec_id"].to_numpy(), mn))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        ids_all, mn_all = ray.get(ref)
        c = _matrix(batch)
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        sims = cn @ mn_all.T
        sim_ppm = np.floor(sims * 1e6 + 0.5).astype(np.int64)
        bids = batch["vec_id"].to_numpy()
        out = []
        for i, a in enumerate(bids):
            hits = np.flatnonzero(sim_ppm[i] >= threshold_ppm)
            for j in hits:
                b = ids_all[j]
                if a < b:  # canonical pair orientation, self excluded
                    out.append((int(a), int(b), int(sim_ppm[i, j])))
        arr = np.array(out, dtype=np.int64).reshape(-1, 3)
        return pd.DataFrame({"a": arr[:, 0], "b": arr[:, 1], "sim_ppm": arr[:, 2]})

    return ds.map_batches(score, batch_format="pandas").sort(["a", "b"])


EMB_DUP_PAIRS_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b,
       CAST(FLOOR(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])*1000000 + 0.5) AS BIGINT) AS sim_ppm
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE CAST(FLOOR(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])*1000000 + 0.5) AS BIGINT) >= 400000
ORDER BY a, b
"""


def lsh_signature(m: np.ndarray) -> np.ndarray:
    """random-hyperplane signature per row (one bit per hyperplane)."""
    bits = (m @ _HYPERPLANES.T) > 0
    return (bits * (1 << np.arange(_N_BITS))).sum(axis=1).astype(np.int64)


def ann_lsh(sf_dir: str, k: int = 5, n_queries: int = 10):
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The bucket groupby replaces the full scan — each group holds its bucket's
    candidates plus any co-bucketed queries; recall is approximate.
    """
    import ray

    ds = _emb(sf_dir, columns=["vec_id", "embedding"])
    qdf = ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    q = _matrix(qdf)
    qsig = lsh_signature(q)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    queries_ref = ray.put((qdf["vec_id"].to_numpy(), qn, qsig))

    def sign(batch: pd.DataFrame) -> pd.DataFrame:
        m = _matrix(batch)
        return pd.DataFrame(
            {"vec_id": batch["vec_id"], "bucket": lsh_signature(m), "embedding": list(batch["embedding"])}
        )

    signed = ds.map_batches(sign, batch_format="pandas")

    def bucket_search(group: pd.DataFrame) -> pd.DataFrame:
            qids, qn, qsig = ray.get(queries_ref)  # zero-copy local fetch
            bucket = int(group["bucket"].iloc[0])
            sel = qsig == bucket
            if not sel.any():
                return pd.DataFrame({"query_id": [], "vec_id": [], "sim_ppm": [], "rank": []})
            c = _matrix(group)
            cn = c / np.linalg.norm(c, axis=1, keepdims=True)
            sims = cn @ qn[sel].T
            sim_ppm = np.floor(sims * 1e6 + 0.5).astype(np.int64)
            cids = group["vec_id"].to_numpy()
            out = []
            for j, qid in enumerate(qids[sel]):
                col = sim_ppm[:, j]
                mask = cids != qid
                ids, vals = cids[mask], col[mask]
                order = np.lexsort((ids, -vals))[:k]
                for rank, i in enumerate(order, 1):
                    out.append((int(qid), int(ids[i]), int(vals[i]), rank))
            return pd.DataFrame(out, columns=["query_id", "vec_id", "sim_ppm", "rank"])

    return signed.groupby("bucket").map_groups(bucket_search, batch_format="pandas").sort(["query_id", "rank"])


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + probe-list search


def _kmeans(m: np.ndarray, k: int, iters: int = 5, seed: int = 11) -> np.ndarray:
    """Tiny deterministic k-means on normalized vectors (coarse quantizer).
    At 100 TB the fit runs on a driver-side sample; assignment stays
    distributed — the standard IVF recipe."""
    rng = np.random.RandomState(seed)
    centroids = m[rng.choice(len(m), size=min(k, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    return centroids


def ivf_knn(sf_dir: str, k: int = 5, n_queries: int = 10, n_lists: int = 8, nprobe: int = 2):
    """IVF ANN: vectors bucketed by nearest centroid; each query searches
    only its ``nprobe`` closest lists (groupby co-locates each list)."""
    import ray

    ds = _emb(sf_dir, columns=["vec_id", "embedding"])
    sample = _matrix(ds.to_pandas())  # sample == full corpus at test scale
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    centroids = _kmeans(sample, n_lists)

    qdf = ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    q = _matrix(qdf)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    probes = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    ref = ray.put((qdf["vec_id"].to_numpy(), qn, probes, centroids))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        _ids, _qn, _probes, cents = ray.get(ref)
        c = _matrix(batch)
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        lists = np.argmax(cn @ cents.T, axis=1)
        return pd.DataFrame(
            {"vec_id": batch["vec_id"], "ivf_list": lists, "embedding": list(batch["embedding"])}
        )

    assigned = ds.map_batches(assign, batch_format="pandas")

    def list_search(group: pd.DataFrame) -> pd.DataFrame:
        qids, qn_, probes_, _cents = ray.get(ref)
        lst = int(group["ivf_list"].iloc[0])
        sel = np.flatnonzero((probes_ == lst).any(axis=1))
        cols = ["query_id", "vec_id", "sim_ppm"]
        if not len(sel):
            return pd.DataFrame({c: np.array([], dtype=np.int64) for c in cols})
        c = _matrix(group)
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        sims = cn @ qn_[sel].T
        sim_ppm = np.floor(sims * 1e6 + 0.5).astype(np.int64)
        cids = group["vec_id"].to_numpy()
        out = []
        for j, qi in enumerate(sel):
            qid = qids[qi]
            mask = cids != qid
            ids, vals = cids[mask], sim_ppm[:, j][mask]
            order = np.lexsort((ids, -vals))[:k]
            for i in order:
                out.append((int(qid), int(ids[i]), int(vals[i])))
        arr = np.array(out, dtype=np.int64).reshape(-1, 3)
        return pd.DataFrame({c: arr[:, i] for i, c in enumerate(cols)})

    partial = assigned.groupby("ivf_list").map_groups(list_search, batch_format="pandas")

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim_ppm", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partial.groupby("query_id").map_groups(topk, batch_format="pandas").sort(["query_id", "rank"])

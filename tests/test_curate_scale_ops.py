"""Round-3 curation scale ops: line-level exact dedup (first occurrence
wins + reassembly), benchmark decontamination, Gopher-style repetition
signals, and deterministic mixture sampling — DuckDB twin parity at two
sfs plus semantic invariants and single-process reference differentials."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extractors_ray.ops import curate
from pdf_extractors_ray.ops import text as tx

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _oracle(sf: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    return con.sql(sql).df()


def _docs_df(sf: str) -> pd.DataFrame:
    return duckdb.sql(f"SELECT doc_id, text, source FROM '{sf}/documents.parquet'").df()


# ---------------------------------------------------------------------------
# line-level dedup
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_line_dedup_matches_duckdb_twin(ray_session, sf):
    eng = curate.docs_line_dedup(sf).to_pandas().reset_index(drop=True)
    ora = _oracle(sf, curate.DOCS_LINE_DEDUP_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)
    # the rendered boilerplate actually collides: a real fraction of lines
    # is dropped, and no document loses its unique line 0 entirely
    assert eng["n_kept"].sum() < eng["n_lines"].sum()
    assert (eng["n_kept"] >= 1).all()


def _ref_line_dedup(df: pd.DataFrame) -> pd.DataFrame:
    """Single-process first-occurrence-wins reference over the rendered
    corpus, processed in global (doc_id, line_idx) order."""
    df = df.sort_values("doc_id").reset_index(drop=True)
    rendered = curate._render_doc_lines(df["doc_id"].to_numpy(), df["text"])
    seen: set[str] = set()
    rows = []
    for doc_id, r in zip(df["doc_id"], rendered):
        lines = r.split("\n")
        kept = []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        rows.append(
            {
                "doc_id": int(doc_id),
                "n_lines": len(lines),
                "n_kept": len(kept),
                "dedup_text": "\n".join(kept),
            }
        )
    return pd.DataFrame(rows).astype(
        {"doc_id": np.int64, "n_lines": np.int64, "n_kept": np.int64}
    )


def test_line_dedup_matches_reference_fold(ray_session):
    sf = "/root/testdata/sf0.001"
    eng = curate.docs_line_dedup(sf).to_pandas().reset_index(drop=True)
    ref = _ref_line_dedup(_docs_df(sf))
    pd.testing.assert_frame_equal(eng, ref[eng.columns], check_dtype=True)


def test_line_dedup_global_uniqueness_and_first_winner(ray_session):
    """Surviving lines are globally unique across the whole corpus, and
    each distinct rendered line survives in exactly the document where it
    first occurred."""
    sf = "/root/testdata/sf0.01"
    eng = curate.docs_line_dedup(sf).to_pandas()
    surv = eng[eng["n_kept"] > 0]
    exploded = (
        surv.set_index("doc_id")["dedup_text"].str.split("\n").explode().reset_index()
    )
    assert not exploded["dedup_text"].duplicated().any()
    # first-winner: the shared even-doc boilerplate line survives exactly
    # once, in the smallest even doc_id
    bp = exploded[exploded["dedup_text"] == "subscribe to our newsletter today"]
    even_min = int(eng["doc_id"][eng["doc_id"] % 2 == 0].min())
    assert bp["doc_id"].tolist() == [even_min]


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_decontaminate_matches_duckdb_twin(ray_session, sf):
    eng = curate.docs_decontaminate(sf).to_pandas().reset_index(drop=True)
    ora = _oracle(sf, curate.DOCS_DECONTAMINATE_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)


def test_decontaminate_flags_planted_and_matches_bruteforce(ray_session):
    sf = "/root/testdata/sf0.001"
    eng = curate.docs_decontaminate(sf).to_pandas().set_index("doc_id")
    docs = _docs_df(sf)
    grams = curate.blocklist_grams(sf)
    assert grams and grams == sorted(set(grams))
    # brute-force substring reference
    for _, row in docs.iterrows():
        hits = sum(g in row["text"] for g in grams)
        assert eng.loc[row["doc_id"], "n_hits"] == hits
        assert eng.loc[row["doc_id"], "contaminated"] == int(hits > 0)
    # every blocklist-contributing document is itself flagged
    donors = docs[
        (docs["doc_id"] % curate.DECON_RESIDUE == 0)
        & (docs["text"].str.split(" ").str.len() >= curate.DECON_HI)
    ]
    assert (eng.loc[donors["doc_id"], "contaminated"] == 1).all()


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_repetition_matches_duckdb_twin(ray_session, sf):
    eng = tx.docs_repetition(sf).to_pandas().reset_index(drop=True)
    ora = _oracle(sf, tx.DOCS_REPETITION_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)
    # the signals are non-degenerate on the corpus
    assert (eng["dup_tokens_ppm"] > 0).any()
    assert (eng["top_bigram_count"] > 1).any()


def test_repetition_kernel_ties_and_edges():
    """Crafted strings through the pure kernel: lexicographic tie-break on
    tokens, bigram counting across repeats, the single-token edge, and the
    all-duplicates case."""
    batch = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["b a b a", "xyz", "q q q"]}
    )
    out = tx.repetition_frame(batch).set_index("doc_id")
    # doc 1: a and b tie at 2 → 'a' wins; bigrams 'b a':2, 'a b':1
    assert out.loc[1, "top_token"] == "a"
    assert out.loc[1, "top_token_count"] == 2
    assert out.loc[1, "top_token_ppm"] == int(np.floor(2 * 1 / 7 * 1e6 + 0.5))
    assert out.loc[1, "top_bigram"] == "b a"
    assert out.loc[1, "top_bigram_count"] == 2
    assert out.loc[1, "top_bigram_ppm"] == int(np.floor(2 / 3 * 1e6 + 0.5))
    assert out.loc[1, "dup_tokens_ppm"] == 1_000_000
    # doc 2: single token — no bigram
    assert out.loc[2, "top_token"] == "xyz"
    assert out.loc[2, "top_bigram"] is None
    assert out.loc[2, "top_bigram_count"] == 0
    assert out.loc[2, "top_bigram_ppm"] == 0
    assert out.loc[2, "dup_tokens_ppm"] == 0
    # doc 3: everything repeats
    assert out.loc[3, "top_token"] == "q"
    assert out.loc[3, "dup_tokens_ppm"] == 1_000_000
    assert out.loc[3, "top_bigram"] == "q q"
    assert out.loc[3, "top_bigram_ppm"] == 1_000_000


def test_repetition_kernel_matches_counter_bruteforce():
    """Kernel == collections.Counter reference on the sf0.001 texts."""
    from collections import Counter

    docs = _docs_df("/root/testdata/sf0.001").head(100).reset_index(drop=True)
    out = tx.repetition_frame(docs[["doc_id", "text"]]).set_index("doc_id")
    for _, row in docs.iterrows():
        toks = row["text"].split(" ")
        tc = Counter(toks)
        top_tok = min(tc, key=lambda t: (-tc[t], t))
        got = out.loc[row["doc_id"]]
        assert got["top_token"] == top_tok and got["top_token_count"] == tc[top_tok]
        dup = sum(c for c in tc.values() if c > 1)
        assert got["dup_tokens_ppm"] == int(np.floor(dup / len(toks) * 1e6 + 0.5))
        if len(toks) > 1:
            bc = Counter(" ".join(p) for p in zip(toks, toks[1:]))
            top_bg = min(bc, key=lambda g: (-bc[g], g))
            assert got["top_bigram"] == top_bg and got["top_bigram_count"] == bc[top_bg]


# ---------------------------------------------------------------------------
# mixture sampling
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_mixture_matches_duckdb_twin(ray_session, sf):
    eng = curate.docs_sample_mixture(sf).to_pandas().reset_index(drop=True)
    ora = _oracle(sf, curate.DOCS_MIXTURE_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)


def test_mixture_targets_and_envelope(ray_session):
    """Per-source realized rates sit inside the binomial envelope of the
    deterministic targets; the rollup partitions the corpus; the target
    formula matches the documented 20 + (7k) % 71."""
    sf = "/root/testdata/sf0.01"
    roll = curate.docs_sample_mixture(sf).to_pandas()
    docs = _docs_df(sf)
    assert roll["n_docs"].sum() == len(docs)
    for _, r in roll.iterrows():
        k = int(r["source"][3:])
        assert r["target_pct"] == 20 + (7 * k) % 71
        n, p = r["n_docs"], r["target_pct"] / 100.0
        sigma = np.sqrt(n * p * (1 - p))
        assert abs(r["n_kept"] - n * p) <= 5 * sigma + 1, dict(r)
    # determinism: the kept decision is a pure hash — rerun identical
    again = curate.docs_sample_mixture(sf).to_pandas()
    pd.testing.assert_frame_equal(roll, again)


# ---------------------------------------------------------------------------
# sequence packing (distributed ordered prefix scan)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_pack_sequences_matches_duckdb_twin(ray_session, sf):
    got = curate.docs_pack_sequences(sf).to_pandas().reset_index(drop=True)
    want = _oracle(sf, curate.DOCS_PACK_SQL)
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)


def test_pack_sequences_matches_sequential_bruteforce(ray_session):
    sf = SFS[0]
    got = curate.docs_pack_sequences(sf, seq_len=97).to_pandas()
    docs = _docs_df(sf).sort_values("doc_id")
    pos = 0
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        n = text.count(" ") + 1
        rows.append((doc_id, n, pos, pos // 97, (pos + n) // 97, (pos + n) // 97 - pos // 97 + 1))
        pos += n + 1  # doc tokens + EOD separator
    want = pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "start_tok", "seq_first", "seq_last", "n_seqs"]
    ).astype(np.int64).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_exact=True)


def test_pack_sequences_stream_invariants(ray_session):
    """Consecutive docs tile the token stream exactly (no gaps/overlaps),
    chunk spans are consistent with the offsets, and the first doc starts
    at 0 — the properties a resume/shard consumer relies on."""
    out = curate.docs_pack_sequences(SFS[1]).to_pandas().sort_values("doc_id")
    start = out["start_tok"].to_numpy()
    n = out["n_tokens"].to_numpy()
    assert start[0] == 0
    assert (start[1:] == start[:-1] + n[:-1] + 1).all()
    assert (out["seq_first"] == start // curate.SEQ_LEN).all()
    assert (out["seq_last"] == (start + n) // curate.SEQ_LEN).all()
    assert (out["n_seqs"] >= 1).all()


# ---------------------------------------------------------------------------
# TF-IDF distinctive terms (skew-aware DF join)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_tfidf_matches_duckdb_twin(ray_session, sf):
    got = tx.docs_tfidf(sf).to_pandas().reset_index(drop=True)
    want = _oracle(sf, tx.DOCS_TFIDF_SQL)
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)


def test_tfidf_heavy_and_tail_paths_agree(ray_session):
    """The broadcast Zipf-head shortcut must be invisible in the result:
    forcing every token through the cogroup join (heavy_k=0) and forcing
    every token through the broadcast map (heavy_k >> vocab) both equal
    the default mixed path."""
    sf = SFS[0]
    default = tx.docs_tfidf(sf).to_pandas().reset_index(drop=True)
    all_tail = tx.docs_tfidf(sf, heavy_k=0).to_pandas().reset_index(drop=True)
    all_heavy = tx.docs_tfidf(sf, heavy_k=10**9).to_pandas().reset_index(drop=True)
    # the synthetic vocab (31 tokens) is smaller than the default heavy_k,
    # so the default path is all-heavy; heavy_k=10 forces a GENUINE mixed
    # split (10 broadcast + 21 joined) — the boundary the op exists for
    vocab = len(set(" ".join(_docs_df(sf)["text"]).split(" ")))
    assert 10 < vocab, "mixed-split leg needs heavy_k < vocabulary size"
    mixed = tx.docs_tfidf(sf, heavy_k=10).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(default, all_tail, check_dtype=True, check_exact=True)
    pd.testing.assert_frame_equal(default, all_heavy, check_dtype=True, check_exact=True)
    pd.testing.assert_frame_equal(default, mixed, check_dtype=True, check_exact=True)


def test_tfidf_matches_counter_bruteforce(ray_session):
    """Pure-Python Counter reference over the raw docs: per-doc tf, global
    df, integer score, (score desc, token asc) top-3."""
    from collections import Counter

    sf = SFS[0]
    docs = _docs_df(sf)
    tf = {r.doc_id: Counter(r.text.split(" ")) for r in docs.itertuples()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    got = tx.docs_tfidf(sf).to_pandas()
    for doc_id, grp in got.groupby("doc_id"):
        scored = sorted(
            ((t, n, df[t], n * 1_000_000 // df[t]) for t, n in tf[doc_id].items()),
            key=lambda x: (-x[3], x[0]),
        )[: tx.TFIDF_K]
        want = [(t, n, d, s) for t, n, d, s in scored]
        have = list(zip(grp["token"], grp["tf"], grp["df"], grp["score_ppm"]))
        assert have == want, (doc_id, have[:3], want[:3])


# ---------------------------------------------------------------------------
# reservoir sampling (exact-k per source)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_reservoir_matches_duckdb_twin(ray_session, sf):
    got = curate.docs_reservoir_sample(sf).to_pandas().reset_index(drop=True)
    want = _oracle(sf, curate.DOCS_RESERVOIR_SQL)
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)


def test_reservoir_exact_count_and_mergeability(ray_session):
    """Each source yields exactly min(k, source size) rows; the sample is
    the k globally smallest hashes per source (so per-batch pruning lost
    nothing), and a different k re-derives a PREFIX of the same ranking."""
    import hashlib as _h

    sf = SFS[1]
    out = curate.docs_reservoir_sample(sf).to_pandas()
    docs = _docs_df(sf)
    sizes = docs.groupby("source").size()
    counts = out.groupby("source").size()
    for src, n in sizes.items():
        assert counts.get(src, 0) == min(curate.RESERVOIR_K, n)
    # brute-force the winning set per source
    docs = docs.assign(
        h=[
            int(_h.md5((curate.RES_SALT + str(int(i))).encode()).hexdigest()[:15], 16)
            for i in docs["doc_id"]
        ]
    )
    for src, grp in docs.groupby("source"):
        want = grp.sort_values(["h", "doc_id"]).head(curate.RESERVOIR_K)["doc_id"].tolist()
        have = out[out["source"] == src].sort_values("rank")["doc_id"].tolist()
        assert have == want
    smaller = curate.docs_reservoir_sample(sf, k=3).to_pandas()
    merged = out[out["rank"] <= 3].reset_index(drop=True)
    pd.testing.assert_frame_equal(smaller.reset_index(drop=True), merged, check_exact=True)


# ---------------------------------------------------------------------------
# composed curation pipeline
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_curation_pipeline_matches_duckdb_twin(ray_session, sf):
    got = curate.docs_curation_pipeline(sf).to_pandas().reset_index(drop=True)
    want = _oracle(sf, curate.DOCS_CURATION_SQL)
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
    assert got["n_docs"].sum() < 500  # the filter+dedup stages must prune


def test_curation_pipeline_matches_bruteforce(ray_session):
    """Sequential reference of the whole chain over the raw docs."""
    import hashlib as _h

    sf = SFS[1]
    docs = _docs_df(sf).sort_values("doc_id")
    from pdf_extractors_ray.ops.text import STOPWORDS

    seen, rows = set(), []
    for r in docs.itertuples():
        toks = r.text.split(" ")
        n_tok, n_stop = len(toks), sum(t in STOPWORDS for t in toks)
        if n_tok < curate.CURATION_MIN_TOKENS:
            continue
        if n_stop * 1_000_000 < curate.CURATION_MIN_STOP_PPM * n_tok:
            continue
        fp = _h.md5(" ".join(toks[: curate.CURATION_FP_TOKENS]).encode()).hexdigest()
        if fp in seen:  # doc_id-ascending iteration = first-occurrence-wins
            continue
        seen.add(fp)
        rows.append((r.doc_id, n_tok))
    from pdf_extractors_ray.ops.curate import split_labels
    from pdf_extractors_ray.ops.text import langid_preds

    ref = pd.DataFrame(rows, columns=["doc_id", "n_tokens"])
    texts = docs.set_index("doc_id").loc[ref["doc_id"], "text"]
    ref["pred_lang"] = langid_preds(texts)
    ref["split"] = split_labels(ref["doc_id"].to_numpy())
    want = (
        ref.groupby(["pred_lang", "split"])
        .agg(n_docs=("doc_id", "size"), n_tokens=("n_tokens", "sum"))
        .reset_index()
        .sort_values(["pred_lang", "split"])
        .reset_index(drop=True)
    )
    got = curate.docs_curation_pipeline(sf).to_pandas().reset_index(drop=True)
    assert got["pred_lang"].tolist() == want["pred_lang"].tolist()
    assert got["split"].tolist() == want["split"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()


# ---------------------------------------------------------------------------
# duplicated k-gram span stats (ExactSubstr signal)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_dup_span_stats_matches_duckdb_twin(ray_session, sf):
    got = curate.docs_dup_span_stats(sf).to_pandas().reset_index(drop=True)
    want = _oracle(sf, curate.DOCS_DUP_SPAN_SQL)
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
    assert got["n_dup"].sum() > 0  # the corpus genuinely repeats spans


def test_dup_span_stats_matches_bruteforce(ray_session):
    """Sequential dict reference: first occurrence (by doc_id, pos) of
    each k-window is kept, every later occurrence counts as duplicated."""
    sf = SFS[0]
    docs = _docs_df(sf).sort_values("doc_id")
    k = curate.SPAN_K
    seen, per_doc = set(), {}
    for r in docs.itertuples():
        t = r.text.split(" ")
        n = max(len(t) - k + 1, 0)
        nd = 0
        for p in range(n):
            g = " ".join(t[p : p + k])
            if g in seen:
                nd += 1
            else:
                seen.add(g)
        per_doc[r.doc_id] = (n, nd)
    got = curate.docs_dup_span_stats(sf).to_pandas()
    for row in got.itertuples():
        n, nd = per_doc[row.doc_id]
        assert (row.n_grams, row.n_dup) == (n, nd), row.doc_id
        assert row.dup_ppm == (nd * 1_000_000 // n if n else 0)


def test_dup_span_stats_short_doc_edge(ray_session, tmp_path):
    """Docs shorter than k tokens keep a zero row; a planted repeated
    span across two docs is attributed to the LATER doc only."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    span = "one two three four five six seven eight"
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["tiny doc", f"start {span} end", f"prefix {span} suffix tail"],
            "lang": "en",
            "source": "src0",
            "n_chars": np.int64(1),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    out = curate.docs_dup_span_stats(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_grams"] == 0 and out.loc[0, "n_dup"] == 0 and out.loc[0, "dup_ppm"] == 0
    assert out.loc[1, "n_dup"] == 0  # first occurrence wins
    assert out.loc[2, "n_dup"] == 1  # exactly the planted 8-token window


# ---------------------------------------------------------------------------
# deterministic global shuffle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_global_shuffle_matches_duckdb_twin(ray_session, sf):
    eng = curate.docs_global_shuffle(sf).to_pandas().reset_index(drop=True)
    ora = _oracle(sf, curate.DOCS_SHUFFLE_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)


def test_global_shuffle_is_a_permutation_and_matches_reference(ray_session):
    sf = SFS[1]
    eng = curate.docs_global_shuffle(sf).to_pandas()
    n = len(eng)
    # dense permutation 0..n-1, shards cut every SHUFFLE_SHARD ranks
    assert sorted(eng["shuffle_rank"]) == list(range(n))
    assert (eng["shard"] == eng["shuffle_rank"] // curate.SHUFFLE_SHARD).all()
    # single-process reference: argsort of (md5 key, doc_id)
    d = eng["doc_id"].to_numpy(np.int64)
    key = curate._md5_hash15(d, curate.SHUFFLE_SALT)
    order = np.lexsort((d, key))
    ref_rank = np.empty(n, dtype=np.int64)
    ref_rank[order] = np.arange(n, dtype=np.int64)
    assert (eng["shuffle_rank"].to_numpy() == ref_rank).all()


def test_global_shuffle_stable_under_bucket_count(ray_session, monkeypatch):
    """The rank must not depend on the cluster size that computed it —
    resume/reproducibility at 10^12 docs hinges on this."""
    sf = SFS[0]
    base = curate.docs_global_shuffle(sf).to_pandas()
    from pdf_extractors_ray.ops import common

    monkeypatch.setattr(common, "_default_buckets", lambda: 3)
    alt = curate.docs_global_shuffle(sf).to_pandas()
    pd.testing.assert_frame_equal(base, alt, check_dtype=True)


# ---------------------------------------------------------------------------
# inverted index
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_inverted_index_matches_duckdb_twin(ray_session, sf):
    eng = tx.docs_inverted_index(sf).to_pandas().reset_index(drop=True)
    ora = _oracle(sf, tx.DOCS_INVERTED_INDEX_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)


def test_inverted_index_matches_bruteforce(ray_session):
    sf = SFS[1]
    eng = tx.docs_inverted_index(sf).to_pandas().set_index("token")
    docs = _docs_df(sf)
    postings: dict[str, set] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for tok in set(text.split(" ")):
            postings.setdefault(tok, set()).add(int(doc_id))
    assert set(eng.index) == set(postings)
    for tok, s in postings.items():
        assert eng.loc[tok, "df"] == len(s)
        want = ",".join(map(str, sorted(s)[: tx.INDEX_HEADS]))
        assert eng.loc[tok, "postings"] == want


def test_inverted_index_head_merge_is_batch_invariant(ray_session, tmp_path):
    """df sums and postings heads must be mergeable: re-running with a
    tiny batch size (many partials per token) must not change anything."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    docs = _docs_df(SFS[0]).head(40)
    p = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": docs["doc_id"].to_numpy(np.int64),
                "text": docs["text"],
                "lang": ["en"] * len(docs),
                "source": docs["source"],
                "n_chars": docs["text"].str.len().to_numpy(np.int64),
            }
        ),
        p,
        row_group_size=3,  # many tiny blocks → many partials per token
    )
    eng = tx.docs_inverted_index(str(tmp_path)).to_pandas().reset_index(drop=True)
    ora = _oracle(str(tmp_path), tx.DOCS_INVERTED_INDEX_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)


# ---------------------------------------------------------------------------
# distributed BPE tokenizer training
# ---------------------------------------------------------------------------


def _inline_bpe(word_counts: dict, n_merges: int) -> list:
    """Independent textbook BPE written fresh for the test (the module's
    own ref_bpe_merges gates the driver; this one gates BOTH)."""
    from collections import Counter

    vocab = Counter()
    for w, n in word_counts.items():
        vocab[tuple(list(w) + ["</w>"])] += int(n)
    merges = []
    for it in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((it, left, right, cnt))
        nv = Counter()
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (left, right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] += n
        vocab = nv
    return merges


@pytest.mark.parametrize("sf", SFS)
def test_bpe_train_matches_inline_textbook(ray_session, sf):
    import duckdb

    dist = tx.docs_bpe_train(sf)
    wc = duckdb.sql(
        f"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS word
                       FROM '{sf}/documents.parquet')
            SELECT word, COUNT(*) AS n FROM t GROUP BY word"""
    ).df()
    ref = _inline_bpe(dict(zip(wc["word"], wc["n"])), tx.BPE_MERGES)
    got = list(dist.itertuples(index=False, name=None))
    assert got == ref


def test_bpe_word_counts_match_duckdb_twin(ray_session):
    eng = tx.bpe_word_counts(SFS[1]).to_pandas().reset_index(drop=True)
    ora = _oracle(SFS[1], tx.BPE_WORD_COUNTS_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)


def test_bpe_merge_regex_respects_symbol_boundaries():
    """A symbol whose text merely ENDS with `left` must not capture a
    following `right`: after merging (a,b)→'ab', the pair (b,c) must not
    fire inside '…ab|c…'."""
    sep = "\x1f"
    pat = tx._merge_pattern("b", "c")
    # word 'abc' already merged to symbols [ab, c]: no 'b'-symbol present
    assert pat.sub("bc", sep.join(["ab", "c"])) == sep.join(["ab", "c"])
    # genuine [a, b, c] does merge its (b, c)
    assert pat.sub("bc", sep.join(["a", "b", "c"])) == sep.join(["a", "bc"])
    # left-to-right non-overlap: [b, c, b, c] → [bc, bc]; [c, c, c] with
    # pair (c, c) merges the first two only
    assert pat.sub("bc", sep.join(["b", "c", "b", "c"])) == sep.join(["bc", "bc"])
    pat_cc = tx._merge_pattern("c", "c")
    assert pat_cc.sub("cc", sep.join(["c", "c", "c"])) == sep.join(["cc", "c"])


def test_bpe_reference_tiebreak_and_stop():
    # tie on count → lexicographically smallest pair wins
    ref = tx.ref_bpe_merges({"ab": 3, "cd": 3}, n_merges=1)
    assert list(ref.iloc[0][["left", "right"]]) == ["a", "b"]
    # all pairs unique → trainer stops before n_merges
    ref = tx.ref_bpe_merges({"xy": 1, "zq": 1}, n_merges=5)
    assert len(ref) == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "ab", "bc"]), min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([("a", "b"), ("b", "c"), ("c", "c"), ("ab", "c")]),
)
def test_bpe_regex_apply_equals_scan_merge(words, pair):
    """Property: the vectorized boundary-aware regex merge equals the
    textbook scan-merge on arbitrary symbol sequences, including symbols
    whose text embeds the pair's characters."""
    sep = "\x1f"
    left, right = pair
    pat = tx._merge_pattern(left, right)
    for syms in words:
        got = pat.sub(left + right, sep.join(syms)).split(sep)
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        assert got == out


# ---------------------------------------------------------------------------
# bigram PMI collocations
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_bigram_pmi_matches_duckdb_twin(ray_session, sf):
    eng = tx.docs_bigram_pmi(sf).to_pandas().reset_index(drop=True)
    ora = _oracle(sf, tx.DOCS_BIGRAM_PMI_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)
    assert len(eng) == tx.PMI_TOP_K
    assert (eng["n_ab"] >= tx.PMI_MIN_COUNT).all()


def test_bigram_pmi_matches_brute_force(ray_session):
    """Independent single-process reference with exact Python-int PMI."""
    from collections import Counter

    sf = SFS[0]
    docs = _docs_df(sf)
    ug: Counter = Counter()
    bg: Counter = Counter()
    for t in docs["text"]:
        toks = t.split(" ")
        ug.update(toks)
        bg.update(zip(toks[:-1], toks[1:]))
    n_total = sum(ug.values())
    scored = [
        (
            (c * n_total * 1_000_000) // (ug[l] * ug[r]),
            l,
            r,
            c,
        )
        for (l, r), c in bg.items()
        if c >= tx.PMI_MIN_COUNT
    ]
    scored.sort(key=lambda x: (-x[0], x[1], x[2]))
    want = pd.DataFrame(
        {
            "left_token": [s[1] for s in scored[: tx.PMI_TOP_K]],
            "right_token": [s[2] for s in scored[: tx.PMI_TOP_K]],
            "n_ab": np.array([s[3] for s in scored[: tx.PMI_TOP_K]], dtype=np.int64),
            "pmi_ppm": np.array([s[0] for s in scored[: tx.PMI_TOP_K]], dtype=np.int64),
            "rank": np.arange(1, min(tx.PMI_TOP_K, len(scored)) + 1, dtype=np.int64),
        }
    )
    eng = tx.docs_bigram_pmi(sf).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(eng, want, check_dtype=True)


# ---------------------------------------------------------------------------
# curriculum quality ranking (skewed-key exact distributed ORDER BY)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_quality_rank_matches_duckdb_twin(ray_session, sf):
    eng = curate.docs_quality_rank(sf).to_pandas().reset_index(drop=True)
    ora = _oracle(sf, curate.DOCS_QUALITY_RANK_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)
    # dense total order: every rank appears exactly once
    r = np.sort(eng["curriculum_rank"].to_numpy())
    assert (r == np.arange(len(eng))).all()


def test_quality_rank_is_plan_independent(ray_session):
    """The rank must not depend on the bucket plan: forcing EVERY score
    down the hot sub-bucket path vs forcing NONE (one giant threshold)
    must produce identical frames — the resume/reproducibility property."""
    sf = SFS[0]
    all_hot = curate.docs_quality_rank(sf, n_buckets=3, hot_factor=0).to_pandas()
    no_hot = curate.docs_quality_rank(sf, n_buckets=97, hot_factor=10**9).to_pandas()
    pd.testing.assert_frame_equal(
        all_hot.reset_index(drop=True), no_hot.reset_index(drop=True), check_dtype=True
    )


def test_quality_rank_single_tie_group(ray_session, tmp_path):
    """Worst-case skew: every document has the SAME score — the whole
    corpus is one tie group and must split across doc-range sub-buckets
    while ranking purely by doc_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 40
    pq.write_table(
        pa.table(
            {
                "doc_id": np.arange(100, 100 + n, dtype=np.int64),
                "text": ["the data of the row to a stream"] * n,
                "lang": ["en"] * n,
                "source": ["s"] * n,
                "n_chars": np.full(n, 31, dtype=np.int64),
            }
        ),
        tmp_path / "documents.parquet",
        row_group_size=5,
    )
    eng = curate.docs_quality_rank(str(tmp_path), n_buckets=4, hot_factor=1).to_pandas()
    assert (eng["curriculum_rank"].to_numpy() == np.arange(n)).all()
    assert eng["quality_ppm"].nunique() == 1
    ora = _oracle(str(tmp_path), curate.DOCS_QUALITY_RANK_SQL)
    pd.testing.assert_frame_equal(eng.reset_index(drop=True), ora[eng.columns], check_dtype=True)


# ---------------------------------------------------------------------------
# vocabulary growth curve (Heaps' law)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_vocab_growth_matches_duckdb_twin(ray_session, sf):
    eng = tx.docs_vocab_growth(sf).to_pandas().reset_index(drop=True)
    ora = _oracle(sf, tx.DOCS_VOCAB_GROWTH_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)
    # the overlay keeps the curve non-trivial and the cumsum monotone
    assert len(eng) >= 2
    assert (np.diff(eng["vocab_size"].to_numpy()) > 0).all()


def test_vocab_growth_is_batch_invariant(ray_session, tmp_path):
    """First-occurrence minima must be mergeable: tiny row groups (many
    partials per token, tokens seen 'late' in some batch before 'early'
    in another) must not change the curve."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = _docs_df(SFS[0])
    # reverse order on disk: partials see high doc_ids first
    docs = docs.sort_values("doc_id", ascending=False)
    pq.write_table(
        pa.table(
            {
                "doc_id": docs["doc_id"].to_numpy(np.int64),
                "text": docs["text"],
                "lang": ["en"] * len(docs),
                "source": docs["source"],
                "n_chars": docs["text"].str.len().to_numpy(np.int64),
            }
        ),
        tmp_path / "documents.parquet",
        row_group_size=7,
    )
    eng = tx.docs_vocab_growth(str(tmp_path)).to_pandas().reset_index(drop=True)
    ora = _oracle(str(tmp_path), tx.DOCS_VOCAB_GROWTH_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)


# ---------------------------------------------------------------------------
# cross-source duplicate-contamination matrix
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_cross_source_overlap_matches_duckdb_twin(ray_session, sf):
    import duckdb

    got = curate.docs_cross_source_overlap(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(curate.DOCS_CROSS_SOURCE_SQL).df()
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=True)
    # the overlay makes the matrix sparse AND non-trivial
    assert 0 < len(got) < 190
    assert (got["source_a"] < got["source_b"]).all()


def test_cross_source_overlap_bruteforce(ray_session, tmp_path):
    """Hand-built corpus with known sharing: pairwise set-intersection
    reference over the same fingerprint derivation."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    # 12 docs, 4 sources; doc_ids chosen so the paragraph family
    # (doc_id % 149) takes only values {0,1,2} — each family spans all
    # 4 sources, giving known cross-source sharing
    doc_ids = np.array([f + 149 * r for f in range(3) for r in range(4)], dtype=np.int64)
    df = pd.DataFrame(
        {
            "doc_id": doc_ids,
            "text": [f"unique body {i}" for i in range(12)],
            "lang": "en",
            "source": [f"s{i % 4}" for i in range(12)],
            "n_chars": np.int64(10),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    got = curate.docs_cross_source_overlap(str(tmp_path)).to_pandas()

    fps: dict[str, set] = {}
    for _, r in df.iterrows():
        sets = [r["text"], "shared paragraph " + str(r["doc_id"] % 149)]
        if r["doc_id"] % 4 == 1:
            sets.append("press release " + str(r["doc_id"] % 11))
        for s in sets:
            fps.setdefault(hashlib.md5(s.encode()).hexdigest()[:16], set()).add(r["source"])
    want: dict[tuple, int] = {}
    for srcs in fps.values():
        if 2 <= len(srcs) <= curate.OVERLAP_MAX_SOURCES:
            ss = sorted(srcs)
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    want[(ss[i], ss[j])] = want.get((ss[i], ss[j]), 0) + 1
    got_d = {(r.source_a, r.source_b): r.shared_fps for r in got.itertuples()}
    assert got_d == want
    # each paragraph family spans all 4 sources → all 6 source pairs
    # present, each sharing ≥3 fingerprints (one per family)
    assert len(want) == 6 and all(v >= 3 for v in want.values())


def test_cross_source_overlap_ubiquity_cap(ray_session, tmp_path):
    """A fingerprint present in MORE than max_sources sources is dropped
    entirely (boilerplate, not contamination)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64) * 149,  # same paragraph family 0
            "text": [f"body {i}" for i in range(6)],
            "lang": "en",
            "source": [f"s{i}" for i in range(6)],
            "n_chars": np.int64(5),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    # all 6 sources share paragraph family 0 → with the cap at 3 the
    # family is ubiquitous and must vanish; nothing else collides
    got = curate.docs_cross_source_overlap(str(tmp_path), max_sources=3).to_pandas()
    assert len(got) == 0
    full = curate.docs_cross_source_overlap(str(tmp_path)).to_pandas()
    assert len(full) == 15 and (full["shared_fps"] == 1).all()


# ---------------------------------------------------------------------------
# context-window chunking
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_chunk_windows_matches_duckdb_twin(ray_session, sf):
    got = curate.docs_chunk_windows(sf).to_pandas().reset_index(drop=True)
    want = _oracle(sf, curate.DOCS_CHUNK_SQL)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=True, check_exact=True)
    # overlapping tails exist (docs longer than one stride)
    assert (got["window_idx"] > 0).any()


def test_chunk_windows_bruteforce(ray_session, tmp_path):
    """Hand-built docs covering: empty-ish text (1 token), exactly one
    stride, exactly seq_len tokens, a long doc with a short tail."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = {
        0: "solo",  # 1 token → one window of 1
        1: " ".join(f"t{i}" for i in range(24)),  # == stride → 1 window
        2: " ".join(f"u{i}" for i in range(32)),  # == seq_len → 2 windows (tail at 24)
        3: " ".join(f"v{i}" for i in range(75)),  # 4 windows, tail of 3
    }
    df = pd.DataFrame(
        {
            "doc_id": np.array(sorted(texts), dtype=np.int64),
            "text": [texts[k] for k in sorted(texts)],
            "lang": "en",
            "source": "s0",
            "n_chars": np.int64(1),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    got = curate.docs_chunk_windows(str(tmp_path)).to_pandas()

    rows = []
    for did in sorted(texts):
        toks = texts[did].split(" ")
        s = 0
        w = 0
        while s < len(toks):
            rows.append((did, w, s, toks[s], min(32, len(toks) - s)))
            s += 24
            w += 1
    want = pd.DataFrame(
        rows, columns=["doc_id", "window_idx", "start_tok", "head_tok", "n_window_tokens"]
    ).astype(
        {
            "doc_id": np.int64,
            "window_idx": np.int64,
            "start_tok": np.int64,
            "n_window_tokens": np.int64,
        }
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=True, check_exact=True
    )
    # per-doc window counts: ceil(n/stride)
    assert got.groupby("doc_id").size().tolist() == [1, 1, 2, 4]


# ---------------------------------------------------------------------------
# mixture budget water filling
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_mixture_budget_matches_duckdb_twin(ray_session, sf):
    got = curate.docs_mixture_budget(sf).reset_index(drop=True)
    want = _oracle(sf, curate.DOCS_MIXTURE_BUDGET_SQL)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=True)
    # invariants: caps respected, budget never exceeded
    assert (got["alloc_tokens"] <= got["avail_tokens"]).all()
    assert got["alloc_tokens"].sum() <= got["avail_tokens"].sum() // curate.BUDGET_HALF_DENOM


def _ref_water_fill(avail: list[int], budget: int, rounds: int) -> list[int]:
    alloc = [0] * len(avail)
    remaining = budget
    for _ in range(rounds):
        active = [i for i in range(len(avail)) if avail[i] > alloc[i]]
        if not active or remaining <= 0:
            break
        fair = remaining // len(active)
        for i in active:
            add = min(fair, avail[i] - alloc[i])
            alloc[i] += add
            remaining -= add
    return alloc


def test_mixture_budget_skewed_capping(ray_session, tmp_path):
    """Skewed sources force multi-round redistribution: small sources cap
    out and their freed budget flows to the large ones."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # token counts per doc are len(split); build docs with exact counts
    sizes = {"s_tiny": 10, "s_small": 40, "s_big": 2000, "s_huge": 6000}
    rows = []
    did = 0
    for src, n in sizes.items():
        # split across docs of ≤500 tokens to exercise the rollup
        left = n
        while left > 0:
            take = min(500, left)
            rows.append((did, " ".join(["w"] * take), src))
            did += 1
            left -= take
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"]).astype({"doc_id": np.int64})
    df["lang"] = "en"
    df["n_chars"] = np.int64(1)
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))

    got = curate.docs_mixture_budget(str(tmp_path)).set_index("source")
    avail = [sizes[s] for s in sorted(sizes)]
    budget = sum(avail) // curate.BUDGET_HALF_DENOM
    want = _ref_water_fill(avail, budget, curate.BUDGET_ROUNDS)
    assert got.loc[sorted(sizes), "alloc_tokens"].tolist() == want
    # tiny and small sources fully consumed (epoch 1.0), huge one partial
    assert got.loc["s_tiny", "epoch_ppm"] == 1_000_000
    assert got.loc["s_small", "epoch_ppm"] == 1_000_000
    assert got.loc["s_huge", "epoch_ppm"] < 1_000_000
    # and the SQL twin reproduces the same allocation on this fixture
    want_sql = _oracle(str(tmp_path), curate.DOCS_MIXTURE_BUDGET_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index()[want_sql.columns.tolist()], want_sql, check_dtype=True
    )


def test_mixture_budget_waterfill_property(ray_session):
    """Hypothesis-style randomized check of the pure water-filling rule
    against an independent invariant formulation: (1) caps respected,
    (2) budget conservation, (3) all uncapped sources end with EQUAL
    allocation ±(rounds) quanta, (4) monotone in avail."""
    rng = np.random.RandomState(23)
    for _ in range(200):
        n_src = rng.randint(1, 12)
        avail = rng.randint(0, 10_000, size=n_src).tolist()
        budget = int(sum(avail)) // curate.BUDGET_HALF_DENOM
        alloc = _ref_water_fill(avail, budget, curate.BUDGET_ROUNDS)
        assert all(0 <= a <= v for a, v in zip(alloc, avail))
        assert sum(alloc) <= budget
        uncapped = [a for a, v in zip(alloc, avail) if a < v]
        if len(uncapped) > 1:
            # equal-share fairness: uncapped sources differ by at most
            # one fair-share quantum per round
            assert max(uncapped) - min(uncapped) <= curate.BUDGET_ROUNDS


# ---------------------------------------------------------------------------
# weighted priority sampling
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_priority_sample_matches_duckdb_twin(ray_session, sf):
    got = curate.docs_priority_sample(sf).to_pandas().reset_index(drop=True)
    want = _oracle(sf, curate.DOCS_PRIORITY_SQL)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=True)
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    assert got["priority"].is_monotonic_increasing


def test_priority_sample_weight_bias_and_stability(ray_session, tmp_path):
    """Heavier docs are sampled preferentially, and the winning set is
    stable under re-partitioning (mergeability)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 1000
    # half tiny (1 token), half heavy (200 tokens)
    texts = ["x"] * (n // 2) + [" ".join(["y"] * 200)] * (n // 2)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": np.int64(1),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    got = curate.docs_priority_sample(str(tmp_path)).to_pandas()
    heavy = (got["doc_id"] >= n // 2).sum()
    # expected heavy share ≈ 200/201; binomial floor at k=50: ≥ 40
    assert heavy >= 40
    # brute-force winners over the same derivation
    import hashlib

    pr = np.array(
        [
            int(hashlib.md5((curate.PRIORITY_SALT + str(i)).encode()).hexdigest()[:15], 16)
            // (1 if i < n // 2 else 200)
            for i in range(n)
        ],
        dtype=np.int64,
    )
    order = np.lexsort((np.arange(n), pr))[: curate.PRIORITY_K]
    assert sorted(got["doc_id"].tolist()) == sorted(order.tolist())
    # partition stability: tiny row groups → same winners, same ranks
    pq.write_table(
        pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"), row_group_size=17
    )
    again = curate.docs_priority_sample(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(got, again, check_dtype=True)


# ---------------------------------------------------------------------------
# part-type revenue share (Q14 shape)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_part_type_revenue_matches_duckdb_twin(ray_session, sf):
    from pdf_extractors_ray.ops import relational as rl

    got = rl.part_type_revenue(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    try:
        for t in ("lineitem", "part"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        want = con.sql(rl.PART_TYPE_REVENUE_SQL).df()
    finally:
        con.close()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=True)
    # shares are a partition of total revenue (floor rounding loses ≤1 ppm
    # per type) and every lineitem lands in exactly one type
    assert 1_000_000 - len(got) <= got["share_ppm"].sum() <= 1_000_000
    n_li = duckdb.sql(f"SELECT COUNT(*) FROM '{sf}/lineitem.parquet'").df().iloc[0, 0]
    assert got["n_items"].sum() == n_li


# ---------------------------------------------------------------------------
# LM coverage (bigram-frequency fluency filter)
# ---------------------------------------------------------------------------


def test_lm_coverage_matches_duckdb_twin(ray_session):
    import duckdb

    from pdf_extractors_ray.ops import text as tx

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        eng = tx.docs_lm_coverage(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
        ora = con.sql(tx.DOCS_LM_COVERAGE_SQL).df()
        pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=False)
        assert eng["doc_id"].is_unique and len(eng) == 500


def test_lm_coverage_discriminates_rare_bigrams(ray_session, tmp_path):
    """Hand-built corpus where the filter must separate fluent from
    garbled docs: 'a b' appears in 5 docs (known at min_count=3); each
    garbled doc carries unique bigrams (count 1 → unknown). Includes a
    single-token doc (vacuous 1e6) and an empty-text doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractors_ray.ops import text as tx

    rows = []
    for i in range(5):
        rows.append((i, "a b a b"))           # all bigrams known
    for i in range(5, 8):
        rows.append((i, f"x{i} y{i} a b"))    # 1 of 3 bigram positions known
    rows.append((8, "solo"))                   # no bigram → 1e6
    rows.append((9, ""))                       # one empty token → no bigram
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["t"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = tx.docs_lm_coverage(str(tmp_path)).to_pandas().set_index("doc_id")
    for i in range(5):
        assert got.loc[i, "coverage_ppm"] == 1_000_000
    for i in range(5, 8):
        # 3 bigram positions, only 'a b' known (x_i y_i, y_i a unique)
        assert got.loc[i, "n_bigrams"] == 3 and got.loc[i, "n_known"] == 1
        assert got.loc[i, "coverage_ppm"] == 333_333
    assert got.loc[8, "coverage_ppm"] == 1_000_000 and got.loc[8, "n_bigrams"] == 0
    assert got.loc[9, "coverage_ppm"] == 1_000_000 and got.loc[9, "n_bigrams"] == 0


# ---------------------------------------------------------------------------
# per-source percentile calibration
# ---------------------------------------------------------------------------


def test_source_percentile_matches_duckdb_twin(ray_session):
    import duckdb

    from pdf_extractors_ray.ops import curate as cu

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        eng = cu.docs_source_percentile(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
        ora = con.sql(cu.DOCS_SOURCE_PCTL_SQL).df()
        pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=False)


def test_source_percentile_semantics_bruteforce(ray_session):
    """Within every source: below == strict-below count (ties share a
    rank), pctl monotone in score, 0 for each source's minimum."""
    from pdf_extractors_ray.ops import curate as cu

    got = cu.docs_source_percentile("/root/testdata/sf0.001").to_pandas()
    for src, g in got.groupby("source"):
        q = g["q"].to_numpy()
        for row in g.itertuples():
            assert row.below == int((q < row.q).sum())
            assert row.n_source == len(g)
        gm = g.sort_values("q")
        assert gm["below"].iloc[0] == 0
        assert (np.diff(gm["pctl_ppm"].to_numpy()) >= 0).all()
    # calibration property: every source's minimum normalizes to 0 even
    # though raw score floors differ across sources
    mins = got.groupby("source")["pctl_ppm"].min()
    assert (mins == 0).all()


# ---------------------------------------------------------------------------
# rejection-reason bitmap
# ---------------------------------------------------------------------------


def test_reject_reasons_match_duckdb_twin(ray_session):
    import duckdb

    from pdf_extractors_ray.ops import curate as cu

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        eng = cu.docs_reject_reasons(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
        ora = con.sql(cu.DOCS_REJECT_SQL).df()
        pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=False)
        # the bitmap must DISCRIMINATE on the natural corpus
        assert 0.2 < eng["accept"].mean() < 0.95


def test_reject_reasons_each_bit_fires(ray_session, tmp_path):
    """Crafted docs exercise every rule bit independently and in
    combination; a clean doc passes all rules."""
    import duckdb

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractors_ray.ops import curate as cu

    clean = "the cat and a dog walked to the busy market of laughter today now"
    docs = [
        (0, clean, 0),
        # 2 tokens, no stopwords, and its single bigram is dominant
        (1, "tiny doc", 1 | 2 | 16),
        (2, "zebra quartz jumps over nine lazy brown foxes wildly", 2),  # no stopwords
        (3, clean + " " + "x" * 30, 4),                           # overlong token
        # 20/21 duplicated tokens and a 95% bigram
        (4, "the " + " ".join(["spam"] * 20), 8 | 16),
        (5, "z " + "y" * 25, 1 | 2 | 4 | 16),                      # combo
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs]),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["t"] * len(docs)),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = cu.docs_reject_reasons(str(tmp_path)).to_pandas().set_index("doc_id")
    for doc_id, _text, want in docs:
        assert got.loc[doc_id, "reasons"] == want, (doc_id, got.loc[doc_id, "reasons"], want)
    assert got.loc[0, "accept"] == 1 and (got.loc[1:, "accept"] == 0).all()
    # twin agrees on the crafted corpus
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    ora = con.sql(cu.DOCS_REJECT_SQL).df().set_index("doc_id")
    assert (ora["reasons"] == got["reasons"].reindex(ora.index)).all()


# ---------------------------------------------------------------------------
# per-source distributional drift (exact total variation)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_source_drift_matches_duckdb_twin(ray_session, sf):
    got = curate.docs_source_drift(sf).to_pandas().reset_index(drop=True)
    assert got["tv_ppm"].gt(0).all()  # real drift exists in the corpus
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    ora = con.sql(curate.DOCS_SOURCE_DRIFT_SQL).df()
    pd.testing.assert_frame_equal(got, ora[got.columns], check_dtype=True)
    con.close()


def test_source_drift_bruteforce(ray_session):
    """Engine tv_ppm equals the exact-rational TV computed single-process
    from raw token counts — including the zero-cell closed form (tokens a
    source never emits still contribute their corpus mass)."""
    from collections import Counter

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet", columns=["source", "text"])
    per_src: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for src, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        c = Counter(txt.split(" "))
        per_src.setdefault(src, Counter()).update(c)
        corpus.update(c)
    big_n = sum(corpus.values())
    got = curate.docs_source_drift(sf).to_pandas().set_index("source")
    for src, cnt in per_src.items():
        ns = sum(cnt.values())
        num = sum(abs(cnt.get(tok, 0) * big_n - ct * ns) for tok, ct in corpus.items())
        assert got.loc[src, "n_tokens"] == ns
        assert got.loc[src, "tv_ppm"] == (1_000_000 * num) // (2 * ns * big_n)


def test_source_drift_planted_divergence(ray_session, tmp_path):
    """Crafted corpus: a source emitting only a private token has maximal
    drift (tv_ppm near 1e6 * (1 - ns/N)); a source matching the corpus
    mix has small drift; zero-cell terms are exercised in both
    directions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        ("balanced", "a b c d"), ("balanced", "a b c d"),
        ("skewed", "zzz zzz zzz zzz"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "source": pa.array([r[0] for r in rows]),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = curate.docs_source_drift(str(tmp_path)).to_pandas().set_index("source")
    # skewed: obs(zzz)=4, C(zzz)=4, ns=4, N=12; TV = 1/2*(|4*12-4*4|/48
    # + zero cells 4*(12-4)/48) = (32+32)/96 = 2/3
    assert got.loc["skewed", "tv_ppm"] == (1_000_000 * 64) // 96
    # balanced: obs(t)=2 each of a..d, C(t)=2, ns=8, N=12:
    # present |2*12-2*8| = 8 per token *4 = 32; zero cell zzz: 8*(12-8)=32
    assert got.loc["balanced", "tv_ppm"] == (1_000_000 * 64) // (2 * 8 * 12)


# ---------------------------------------------------------------------------
# incremental (cross-shard) dedup
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_incremental_dedup_matches_duckdb_twin(ray_session, sf):
    got = curate.docs_incremental_dedup(sf).to_pandas().reset_index(drop=True)
    # both verdict branches must carry rows for the check to mean anything
    assert (got["dup_of"] >= 0).any() and (got["dup_of"] < 0).any()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    ora = con.sql(curate.DOCS_INCR_DEDUP_SQL).df()
    pd.testing.assert_frame_equal(got, ora[got.columns], check_dtype=True)
    con.close()


def test_incremental_dedup_semantics(ray_session):
    """dup_of is the MINIMUM index doc_id sharing the fingerprint; only
    new-shard docs (source number >= 10) are emitted; -1 rows have a
    fingerprint genuinely absent from the index shard."""
    import hashlib

    sf = "/root/testdata/sf0.001"
    got = curate.docs_incremental_dedup(sf).to_pandas()
    assert (got["doc_id"] % 20 >= 10).all()
    index_ids = [d for d in range(500) if d % 20 < 10]
    by_fam: dict[int, int] = {}
    for d in index_ids:
        by_fam.setdefault(d % 331, d)  # ascending -> min
    for doc_id, fp, dup_of in got.itertuples(index=False):
        fam = doc_id % 331
        expect = by_fam.get(fam, -1)
        assert dup_of == expect
        assert fp == hashlib.md5(f"ingest paragraph {fam}".encode()).hexdigest()[:16]


# ---------------------------------------------------------------------------
# BPE encoding (apply the trained merges)
# ---------------------------------------------------------------------------


def test_bpe_encode_matches_twin(ray_session):
    sf = "/root/testdata/sf0.001"
    merges = tx.docs_bpe_train(sf)
    got = tx.docs_bpe_encode(sf, merges=merges).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    ora = con.sql(tx.docs_bpe_encode_sql(merges)).df()
    pd.testing.assert_frame_equal(got, ora[got.columns], check_dtype=True)
    con.close()
    # merges actually fired: some symbol is multi-char (beyond </w>)
    assert got["bpe_text"].str.contains(r"\|\w\w", regex=True).any()


def test_bpe_encode_word_scan_merge_reference():
    """The doubled-separator literal-replace encode equals the textbook
    scan-merge application (merge all non-overlapping occurrences left to
    right, rules in training order) — including the adjacency edges the
    separator trick must get right."""

    def ref_apply(word, pairs):
        syms = list(word) + ["</w>"]
        for left, right in pairs:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    cases = [
        ("abab", [("a", "b")]),                      # adjacent repeats both merge
        ("aaa", [("a", "a")]),                       # overlapping: left-to-right pairing
        ("aaaa", [("a", "a"), ("aa", "aa")]),        # chained merges
        ("abc", [("a", "b"), ("ab", "c"), ("abc", "</w>")]),
        ("xy", [("y", "</w>"), ("x", "y</w>")]),     # end-of-word merges
        ("q", []),
    ]
    for word, pairs in cases:
        assert tx.bpe_encode_word(word, pairs) == ref_apply(word, pairs), (word, pairs)

    # randomized sweep against the reference
    rng = np.random.RandomState(5)
    alphabet = list("abcd")
    for _ in range(200):
        word = "".join(rng.choice(alphabet, size=rng.randint(1, 9)))
        pairs = []
        pool = alphabet + ["</w>"]
        for _ in range(rng.randint(0, 4)):
            left, right = rng.choice(pool), rng.choice(pool)
            pairs.append((left, right))
            pool.append(left + right)
        assert tx.bpe_encode_word(word, pairs) == ref_apply(word, pairs), (word, pairs)


# --- language-ID confusion eval ---------------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_langid_eval_matches_duckdb_twin(ray_session, sf):
    import duckdb

    from pdf_extractors_ray.ops import text as tx

    eng = tx.docs_langid_eval(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ora = con.execute(tx.DOCS_LANGID_EVAL_SQL).fetchdf()
    ndocs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    con.close()
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True), check_dtype=True
    )
    assert int(eng["n_docs"].sum()) == ndocs  # every doc lands in one cell


def test_langid_eval_consistent_with_predictions(ray_session):
    """The matrix must re-derive exactly from the per-doc predictions op."""
    from pdf_extractors_ray.ops import text as tx

    sf = "/root/testdata/sf0.001"
    preds = tx.docs_langid(sf).to_pandas()
    want = (
        preds.groupby(["lang", "pred_lang"]).size().reset_index(name="n_docs")
        .sort_values(["lang", "pred_lang"]).reset_index(drop=True)
    )
    got = tx.docs_langid_eval(sf).to_pandas()
    pd.testing.assert_frame_equal(got, want.astype({"n_docs": np.int64}))


# ---------------------------------------------------------------------------
# ExactSubstr span REMOVAL (the rewrite step after the stats)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_dup_span_remove_matches_duckdb_twin(ray_session, sf):
    got = curate.docs_dup_span_remove(sf).to_pandas().reset_index(drop=True)
    want = _oracle(sf, curate.DOCS_DUP_SPAN_REMOVE_SQL)
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
    assert (got["n_removed"] > 0).any()  # the corpus genuinely repeats spans


def test_dup_span_remove_matches_bruteforce(ray_session):
    """Sequential reference: duplicated windows (non-first by doc_id,
    pos) cover their k tokens; a doc's clean text keeps exactly the
    uncovered tokens in order."""
    sf = SFS[0]
    docs = _docs_df(sf).sort_values("doc_id")
    k = curate.SPAN_K
    seen = set()
    want = {}
    for r in docs.itertuples():
        t = r.text.split(" ")
        n = max(len(t) - k + 1, 0)
        covered = np.zeros(len(t), dtype=bool)
        for p in range(n):
            g = " ".join(t[p : p + k])
            if g in seen:
                covered[p : p + k] = True
            else:
                seen.add(g)
        want[r.doc_id] = (
            len(t), int(covered.sum()),
            " ".join(tok for tok, c in zip(t, covered) if not c),
        )
    got = curate.docs_dup_span_remove(sf).to_pandas()
    for row in got.itertuples():
        assert (row.n_tokens, row.n_removed, row.clean_text) == want[row.doc_id], row.doc_id


def test_dup_span_remove_composes_with_stats(ray_session, tmp_path):
    """A planted full-copy doc must come out (almost) empty while the
    first occurrence survives untouched, and re-running the stats on the
    REWRITTEN corpus must find no duplicated spans left."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = " ".join(f"tok{i}" for i in range(30))
    texts = [base, base, "short unique doc"]
    df = pd.DataFrame(
        {"doc_id": np.arange(3, dtype=np.int64), "text": texts,
         "source": ["s"] * 3, "n_chars": [len(t) for t in texts]}
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))

    out = curate.docs_dup_span_remove(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "clean_text"] == base and out.loc[0, "n_removed"] == 0
    assert out.loc[1, "clean_text"] == "" and out.loc[1, "n_removed"] == 30
    assert out.loc[2, "clean_text"] == "short unique doc"

    # idempotence: stats over the rewritten corpus report zero dup spans
    clean = out.reset_index().rename(columns={"clean_text": "text"})[["doc_id", "text"]]
    clean["source"] = "s"
    clean["n_chars"] = clean["text"].str.len()
    pq.write_table(pa.Table.from_pandas(clean), str(tmp_path / "documents.parquet"))
    stats = curate.docs_dup_span_stats(str(tmp_path)).to_pandas()
    assert int(stats["n_dup"].sum()) == 0

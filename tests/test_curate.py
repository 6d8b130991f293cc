"""Curation ops: PII redaction (DuckDB RE2 twin + Python-re differential +
idempotence) and the deterministic md5 train/val/test split (twin parity,
partition/fraction invariants)."""

import re

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractors_ray.ops import curate


def _oracle(sf: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    return con.sql(sql).df()


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_redact_matches_duckdb_twin(ray_session, sf):
    eng = curate.docs_redact(sf).to_pandas().reset_index(drop=True)
    ora = _oracle(sf, curate.DOCS_REDACT_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)
    # residue conditions actually exercised: every kind has >0 total AND
    # at least one zero-count row
    for col in ("n_emails", "n_urls", "n_ips", "n_phones"):
        assert eng[col].sum() > 0 and (eng[col] == 0).any()
    # nothing pattern-shaped survives redaction
    for _, pat, _ in curate.REDACTIONS:
        assert not eng["redacted"].str.contains(pat, regex=True).any()


def _py_redact_chain(text: str):
    """Reference implementation of the ordered count+replace chain in
    Python `re` (leftmost-first semantics match RE2 for these patterns)."""
    counts, red = [], text
    for _, pat, repl in curate.REDACTIONS:
        counts.append(len(re.findall(pat, red)))
        red = re.sub(pat, repl, red)
    return counts, red


@given(
    st.lists(
        st.text(alphabet="ab5. @_:/+-\nhttpexamplecom", min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=300, deadline=None)
def test_redact_kernel_differential(texts):
    """pyarrow RE2 chain == Python-re chain on adversarial strings, and
    redaction is idempotent (a second pass changes nothing)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts, type=pa.string())
    red = arr
    got_counts = []
    for _, pat, repl in curate.REDACTIONS:
        got_counts.append(pc.count_substring_regex(red, pat).to_pylist())
        red = pc.replace_substring_regex(red, pat, repl)
    got_red = red.to_pylist()
    for i, t in enumerate(texts):
        want_counts, want_red = _py_redact_chain(t)
        assert [c[i] for c in got_counts] == want_counts
        assert got_red[i] == want_red
        assert _py_redact_chain(want_red)[1] == want_red  # idempotent


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_split_matches_duckdb_twin(ray_session, sf):
    eng = curate.docs_split_stratified(sf).to_pandas().reset_index(drop=True)
    ora = _oracle(sf, curate.DOCS_SPLIT_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)


def test_split_partition_and_fractions(ray_session):
    """The split partitions the corpus (rollup doc total == corpus rows),
    every (lang) stratum is represented, and global fractions sit near
    80/10/10 (binomial tolerance at n=500)."""
    sf = "/root/testdata/sf0.01"
    roll = curate.docs_split_stratified(sf).to_pandas()
    n = duckdb.sql(f"SELECT COUNT(*) FROM '{sf}/documents.parquet'").fetchone()[0]
    assert roll["n_docs"].sum() == n
    by_split = roll.groupby("split")["n_docs"].sum()
    for split, pct in (("train", 0.80), ("val", 0.10), ("test", 0.10)):
        sigma = np.sqrt(n * pct * (1 - pct))
        assert abs(by_split.get(split, 0) - n * pct) < 5 * sigma, (split, dict(by_split))


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_top_tokens_matches_duckdb_twin(ray_session, sf):
    from pdf_extractors_ray.ops import text as tx

    eng = tx.docs_top_tokens(sf).to_pandas().reset_index(drop=True)
    ora = _oracle(sf, tx.DOCS_TOP_TOKENS_SQL)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)


def test_top_tokens_exact_vs_full_count(ray_session):
    """The partial/bucket/prune path must equal a single-process full
    count with the same (n DESC, token ASC) tiebreak — ties at the k
    boundary included."""
    from pdf_extractors_ray.ops import text as tx

    sf = "/root/testdata/sf0.01"
    eng = tx.docs_top_tokens(sf, k=40).to_pandas().reset_index(drop=True)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    vc = docs["text"].str.split(" ").explode().value_counts()
    full = pd.DataFrame({"token": vc.index, "n": vc.to_numpy("int64")})
    full = full.sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
    full = full.head(40).reset_index(drop=True)
    full["rank"] = np.arange(1, len(full) + 1, dtype=np.int64)
    pd.testing.assert_frame_equal(eng, full, check_dtype=True)


def test_top_tokens_wide_vocab_many_buckets(ray_session):
    """Regression: with more buckets×k pruned rows than the default
    1024-row map_batches batch size, the final ranking must still see
    them as ONE batch (two disjoint 'top-k's with duplicate ranks
    otherwise). 3000-token vocabulary, 200 buckets, known counts."""
    import ray

    from pdf_extractors_ray.ops import text as tx

    docs = pd.DataFrame({"text": [f"tok{i:04d}" for i in range(3000) for _ in (i % 7 + 1) * [0]]})
    ds = ray.data.from_pandas(docs).repartition(8)
    got = tx.top_tokens_from(ds, k=10, n_buckets=200).to_pandas()
    vc = docs["text"].value_counts()
    want = pd.DataFrame({"token": vc.index, "n": vc.to_numpy("int64")})
    want = want.sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
    want = want.head(10).reset_index(drop=True)
    want["rank"] = np.arange(1, 11, dtype=np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_dtype=True)


def test_split_labels_deterministic_and_balanced():
    ids = np.arange(20000, dtype=np.int64)
    a, b = curate.split_labels(ids), curate.split_labels(ids)
    assert (a == b).all()
    frac_train = (a == "train").mean()
    assert 0.78 < frac_train < 0.82


# --- text normalization ----------------------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_normalize_matches_duckdb_twin(ray_session, sf):
    import duckdb

    eng = curate.docs_normalize(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ora = con.execute(curate.DOCS_NORMALIZE_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)
    # the dirty overlay must make the pass observable AND leave clean rows
    changed = eng["n_chars_raw"] != eng["n_chars_norm"]
    assert changed.any() and (~changed).any()


def test_normalize_reference_chain(ray_session, tmp_path):
    """Pure-python re reference of the same 4-step chain over adversarial
    strings routed through the engine (overlay rules pinned too)."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "MiXeD CaSe  and   runs",
        "tabs\tand\nnewlines\r here",
        "punct!@#$%^&*()[]{};:'\",.<>/?`~-_=+",
        "",
        "   ",
        "already clean lowercase words",
    ]
    ids = np.arange(11, 11 + len(texts), dtype=np.int64)  # avoid overlay-zero rows
    pq.write_table(
        pa.table(
            {
                "doc_id": ids,
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = (
        curate.docs_normalize(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, (d, t) in enumerate(zip(ids, texts)):
        body = t.upper() if d % 7 == 3 else t
        pre = "  Hello, WORLD!! " if d % 4 == 0 else ("\t(Re: §4) " if d % 3 == 1 else "")
        suf = " ***End.  " if d % 5 == 2 else ("  -- footer --" if d % 3 == 0 else "")
        dirty = pre + body + suf
        x = dirty.lower()
        x = re.sub(r"[^a-z0-9\s]", "", x)
        x = re.sub(r"\s+", " ", x)
        x = re.sub(r"^ | $", "", x)
        assert got.loc[i, "norm_text"] == x, (d, t)
        assert int(got.loc[i, "n_chars_raw"]) == len(dirty)
        assert int(got.loc[i, "n_chars_norm"]) == len(x)

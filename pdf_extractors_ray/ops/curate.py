"""Training-data curation operators over the ``documents`` table: PII
redaction and deterministic train/val/test splitting with stratified
accounting.

Both are first-class LLM-corpus ops the reference's extraction pipelines
feed into at scale (reference analogue: the per-record scrub/normalize
passes, e.g. roman-census' text normalization before record assembly).

Determinism / oracle parity:

- Redaction runs the SAME RE2 engine on both sides (pyarrow.compute and
  DuckDB's regexp_* are both RE2), with the patterns applied in one fixed
  order, so the redacted strings are byte-identical.
- The synthetic corpus contains no PII, so the op first RENDERS a
  deterministic PII overlay from ``doc_id`` (the repo's surrogate recipe:
  both engines build the same string analytically) — conditional residues
  exercise zero-match rows as well.
- The split hash is ``int(md5(str(doc_id))[:15], 16) % 100`` — the same
  md5 hex-parse construct the KMV sketch twin already pins
  (``ops/events.py EVENTS_KMV_SQL``), reproduced in DuckDB as
  ``('0x' || substr(md5(...), 1, 15))::BIGINT``.

Scale shape: redaction and hashing are embarrassingly parallel
``map_batches`` passes (no shuffle); the stratified rollup is a tiny
grouped sum over per-batch partials (``ops/common.grouped_sums``). At
100 TB nothing here widens beyond the final KB-sized rollup.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from .common import grouped_sums

# RE2-safe patterns (no lookaround); applied in THIS order on both engines.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"
REDACTIONS = (
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_urls", URL_RE, "<URL>"),
    ("n_ips", IP_RE, "<IP>"),
    ("n_phones", PHONE_RE, "<PHONE>"),
)

TRAIN_PCT, VAL_PCT = 80, 10  # remainder = test


def _docs(sf_dir: str, columns=None):
    from ..runtime import read_parquet_sized

    return read_parquet_sized(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _render_pii(doc_id: np.ndarray, text: pd.Series) -> pd.Series:
    """Deterministic PII overlay: which fragments appear depends on doc_id
    residues (so some rows carry 0 of a kind), values derive from doc_id."""
    d = pd.Series(doc_id, dtype=np.int64)
    ds = d.astype(str)
    email = (" contact user" + ds + "@example.com").where(d % 3 != 0, "")
    phone = (" ph +1-555-" + (d % 10000).astype(str).str.zfill(4)).where(d % 2 == 0, "")
    url = (" see http://h" + ds + ".example.org/a?b=" + (d % 7).astype(str)).where(d % 5 != 1, "")
    ip = (
        " from 10." + (d % 256).astype(str) + "." + ((d // 256) % 256).astype(str)
        + "." + (d % 200).astype(str)
    ).where(d % 4 == 2, "")
    return text.reset_index(drop=True) + email + phone + url + ip


def docs_redact(sf_dir: str):
    """Render the PII overlay, count each PII kind, redact all of them.

    One embarrassingly-parallel pyarrow pass per batch: RE2 count kernels
    on the rendered text, then the ordered ``replace_substring_regex``
    chain. No shuffle; the terminal sort is presentation-only.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def derive(batch: pd.DataFrame) -> "pa.Table":
        rendered = pa.array(
            _render_pii(batch["doc_id"].to_numpy(), batch["text"]), type=pa.string()
        )
        cols = {"doc_id": pa.array(batch["doc_id"].to_numpy(), type=pa.int64())}
        red = rendered
        for name, pat, repl in REDACTIONS:
            cols[name] = pc.cast(pc.count_substring_regex(red, pat), pa.int64())
            red = pc.replace_substring_regex(red, pat, repl)
        cols["redacted"] = red
        return pa.table(cols)

    return ds.map_batches(derive, batch_format="pandas").sort("doc_id")


def _rendered_sql_expr() -> str:
    """The DuckDB twin of ``_render_pii`` (same concatenation, same
    residue conditions, same zero-padding)."""
    return (
        "text"
        " || CASE WHEN doc_id % 3 <> 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 2 = 0 THEN ' ph +1-555-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
        " || CASE WHEN doc_id % 5 <> 1 THEN ' see http://h' || CAST(doc_id AS VARCHAR)"
        " || '.example.org/a?b=' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END"
        " || CASE WHEN doc_id % 4 = 2 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)"
        " || '.' || CAST(doc_id % 200 AS VARCHAR) ELSE '' END"
    )


def _redact_sql() -> str:
    counts = []
    red_expr = "rendered"
    for name, pat, repl in REDACTIONS:
        # counts are taken on the PARTIALLY-redacted text, exactly like the
        # engine's ordered kernel chain
        counts.append(f"len(regexp_extract_all({red_expr}, '{pat}')) AS {name}")
        red_expr = f"regexp_replace({red_expr}, '{pat}', '{repl}', 'g')"
    return f"""
WITH r AS (SELECT doc_id, {_rendered_sql_expr()} AS rendered FROM documents)
SELECT doc_id,
       {", ".join(counts)},
       {red_expr} AS redacted
FROM r
ORDER BY doc_id
"""


DOCS_REDACT_SQL = _redact_sql()


def _split_hash(doc_ids) -> np.ndarray:
    """60-bit md5 prefix of the decimal doc_id, mod 100 — stable across
    runs, machines and engines (no salted hashing)."""
    return np.fromiter(
        (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:15], 16) % 100 for i in doc_ids),
        dtype=np.int64,
        count=len(doc_ids),
    )


def split_labels(doc_ids) -> np.ndarray:
    h = _split_hash(doc_ids)
    return np.select([h < TRAIN_PCT, h < TRAIN_PCT + VAL_PCT], ["train", "val"], "test")


def docs_split_stratified(sf_dir: str):
    """Deterministic train/val/test assignment + stratified accounting:
    per (lang, split) document and token totals. The assignment is a pure
    per-row hash (resume-safe, no coordination); only the KB-sized rollup
    shuffles."""
    ds = _docs(sf_dir, columns=["doc_id", "lang", "text"])

    def derive(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": batch["lang"],
                "split": split_labels(batch["doc_id"].to_numpy()),
                "n_docs": np.int64(1),
                "n_tokens": (batch["text"].str.count(" ") + 1).astype(np.int64),
            }
        )

    ds = ds.map_batches(derive, batch_format="pandas")
    return grouped_sums(ds, ["lang", "split"], ["n_docs", "n_tokens"]).sort(["lang", "split"])


DOCS_SPLIT_SQL = f"""
WITH a AS (
    SELECT lang, text,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS h
    FROM documents
)
SELECT lang,
       CASE WHEN h < {TRAIN_PCT} THEN 'train'
            WHEN h < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM a
GROUP BY lang, split
ORDER BY lang, split
"""

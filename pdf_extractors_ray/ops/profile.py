"""Table profiling — the data-quality "describe" stage a 100 TB ingest
runs before anything else: per-column row/null counts, min/max, and an
approximate distinct count via the repo's HyperLogLog registers.

All arithmetic is integer (floats canonicalize to cents, timestamps to
epoch micros) and the HLL hash is the shared md5 60-bit hex-parse, so the
ENTIRE profile — including every distinct estimate — replays bit-exactly
in a generated DuckDB twin.

Scale shape: two pruned streaming passes (counts/min-max partials, then
HLL register partials), each a per-batch partial + one bucketed combine;
the exchange carries one stats row per (block, column) and ≤ 256 register
rows per (block, column). No corpus-sized state anywhere; the register
merge is idempotent (grouped MAX), so lineage replay cannot corrupt it.

Reference-parity note: the reference repo has no profiler; this is part
of the training-data-pipeline operator family (schema/quality validation
before heavy curation).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..runtime import read_parquet_sized
from .common import bucketed_group_agg
from .events import HLL_M, HLL_P, HLL_RHO_CAP, hll_estimate, hll_registers
from .text import _md5_hash15_str

# profiled tables: (column, kind) with kind ∈ int | float | str | ts —
# the spec is the single source for BOTH the engine pass and the SQL twin
PROFILE_SPECS = {
    "orders": [
        ("o_orderkey", "int"),
        ("o_custkey", "int"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "float"),
        ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ],
    "documents": [
        ("doc_id", "int"),
        ("text", "str"),
        ("lang", "str"),
        ("source", "str"),
        ("n_chars", "int"),
    ],
}

_I64_MAX = np.iinfo(np.int64).max
_I64_MIN = np.iinfo(np.int64).min


def _canon_num(vals: np.ndarray, kind: str) -> np.ndarray:
    """Canonical int64 form of a numeric column (cents / epoch micros)."""
    if kind == "int":
        return vals.astype(np.int64)
    if kind == "float":
        return np.floor(vals.astype(np.float64) * 100.0 + 0.5).astype(np.int64)
    if kind == "ts":
        return vals.astype("datetime64[us]").astype(np.int64)
    raise ValueError(kind)


def _nonnull(batch: pd.DataFrame, col: str):
    s = batch[col]
    mask = s.notna().to_numpy()
    return s.to_numpy()[mask], int((~mask).sum())


def table_profile(sf_dir: str, table: str = "orders"):
    """Per-column profile: (column, n_rows, n_nulls, n_distinct_est,
    min_num, max_num, min_s, max_s). Numeric columns report canonical
    int64 min/max (cents / epoch micros) with min_s = max_s = '';
    string columns report lexicographic min/max with min_num =
    max_num = 0; fully-null columns report 0 / ''."""
    import ray.data as rd

    spec = PROFILE_SPECS[table]
    cols = [c for c, _ in spec]
    path = os.path.join(sf_dir, f"{table}.parquet")

    # ---- pass A: counts + min/max ----
    ds = read_parquet_sized(path, columns=cols)

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        # string min/max merge across blocks through presence-PREFIXED
        # keys: "1"+s for a real value, "2"/"0" absence sentinels that
        # sort after/before every prefixed string — a block with the
        # column all-null (the null-clustered layouts real ingests
        # produce) must not poison the combine with None-vs-str compares
        rows = []
        for c, kind in spec:
            vals, nulls = _nonnull(batch, c)
            if kind == "str":
                if len(vals):
                    # vals stays an OBJECT array: numpy's min/max have no
                    # unicode loop, but object arrays compare via Python
                    mn, mx = "1" + str(vals.min()), "1" + str(vals.max())
                else:
                    mn, mx = "2", "0"
                rows.append((c, len(batch), nulls, 0, 0, mn, mx))
            else:
                if len(vals):
                    nums = _canon_num(vals, kind)
                    rows.append((c, len(batch), nulls, nums.min(), nums.max(), "1", "1"))
                else:
                    rows.append((c, len(batch), nulls, _I64_MAX, _I64_MIN, "1", "1"))
        out = pd.DataFrame(
            rows,
            columns=["column", "n_rows", "n_nulls", "min_num", "max_num", "min_s", "max_s"],
        )
        for k in ("n_rows", "n_nulls", "min_num", "max_num"):
            out[k] = out[k].astype(np.int64)
        for k in ("min_s", "max_s"):
            # keep object dtype: fixed-width unicode arrays route pandas'
            # grouped min/max to the np.minimum ufunc, which has no str loop
            out[k] = out[k].astype(object)
        return out

    stats = bucketed_group_agg(
        ds.map_batches(stats_partial, batch_format="pandas"),
        ["column"],
        {"n_rows": "sum", "n_nulls": "sum", "min_num": "min",
         "max_num": "max", "min_s": "min", "max_s": "max"},
    ).to_pandas()

    # ---- pass B: HLL registers over canonical value strings ----
    ds2 = read_parquet_sized(path, columns=cols)

    def reg_partial(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c, kind in spec:
            vals, _ = _nonnull(batch, c)
            if len(vals) == 0:
                continue
            if kind == "str":
                canon = np.unique(vals.astype(str))
            else:
                canon = np.unique(_canon_num(vals, kind)).astype(str)
            reg, rho = hll_registers(_md5_hash15_str(canon, "hll:"))
            df = pd.DataFrame({"column": c, "register": reg, "max_rho": rho})
            frames.append(
                df.groupby(["column", "register"], as_index=False, sort=False).max()
            )
        if not frames:
            return pd.DataFrame(
                {"column": pd.Series([], dtype=object),
                 "register": pd.Series([], dtype=np.int64),
                 "max_rho": pd.Series([], dtype=np.int64)}
            )
        return pd.concat(frames, ignore_index=True)

    regs = bucketed_group_agg(
        ds2.map_batches(reg_partial, batch_format="pandas"),
        ["column", "register"],
        {"max_rho": "max"},
    ).to_pandas()

    est = {}
    for c, _ in spec:
        sub = regs[regs["column"] == c]
        merged = dict(zip(sub["register"].astype(int), sub["max_rho"].astype(int)))
        est[c] = hll_estimate(merged)[2]

    out = stats.copy()
    out["n_distinct_est"] = out["column"].map(est).astype(np.int64)
    allnull = out["n_rows"] == out["n_nulls"]
    out.loc[allnull, ["min_num", "max_num"]] = 0
    kinds = dict(spec)

    def _unprefix(v: str, col: str) -> str:
        if kinds[col] != "str":
            return ""
        return v[1:] if isinstance(v, str) and v.startswith("1") else ""

    out["min_s"] = [_unprefix(v, c) for v, c in zip(out["min_s"], out["column"])]
    out["max_s"] = [_unprefix(v, c) for v, c in zip(out["max_s"], out["column"])]
    out = out[
        ["column", "n_rows", "n_nulls", "n_distinct_est",
         "min_num", "max_num", "min_s", "max_s"]
    ].sort_values("column").reset_index(drop=True)
    return rd.from_pandas(out)


def _canon_sql(col: str, kind: str) -> str:
    if kind == "int":
        return col
    if kind == "float":
        return f"CAST(FLOOR({col}*100 + 0.5) AS BIGINT)"
    if kind == "ts":
        return f"epoch_us({col})"
    raise ValueError(kind)


def profile_sql(table: str = "orders") -> str:
    """Generated DuckDB twin: one stats CTE + one full HLL-estimate chain
    per column, from the same spec the engine runs."""
    from .events import HLL_ALPHA_PPM, _hll_ln_values_sql

    spec = PROFILE_SPECS[table]
    parts = []
    selects = []
    for c, kind in spec:
        if kind == "str":
            canon = c
            min_num, max_num = "CAST(0 AS BIGINT)", "CAST(0 AS BIGINT)"
            min_s = f"COALESCE(MIN({c}), '')"
            max_s = f"COALESCE(MAX({c}), '')"
        else:
            num = _canon_sql(c, kind)
            canon = f"CAST({num} AS VARCHAR)"
            min_num = f"CAST(COALESCE(MIN({num}), 0) AS BIGINT)"
            max_num = f"CAST(COALESCE(MAX({num}), 0) AS BIGINT)"
            min_s, max_s = "''", "''"
        parts.append(
            f"""h_{c} AS (
    SELECT DISTINCT ('0x' || substr(md5('hll:' || {canon}), 1, 15))::BIGINT AS hv
    FROM {table} WHERE {c} IS NOT NULL
),
rr_{c} AS (
    SELECT hv % {HLL_M} AS register,
           CASE WHEN hv // {HLL_M} = 0 THEN {HLL_RHO_CAP}
                ELSE bit_count(((hv // {HLL_M}) & -(hv // {HLL_M})) - 1) + 1 END AS rho
    FROM h_{c}
),
filled_{c} AS (
    SELECT gs.j AS register, COALESCE(r.max_rho, 0) AS max_rho
    FROM generate_series(0, {HLL_M - 1}) gs(j)
    LEFT JOIN (SELECT register, MAX(rho) AS max_rho FROM rr_{c} GROUP BY register) r
      ON r.register = gs.j
),
est_{c} AS (
    SELECT v_nonzero,
           (CAST({HLL_ALPHA_PPM} AS HUGEINT) * {HLL_M} * {HLL_M} * (CAST(1 AS HUGEINT) << {HLL_RHO_CAP}))
               // (s_scaled * 1000000) AS raw
    FROM (SELECT COUNT(*) FILTER (WHERE max_rho > 0) AS v_nonzero,
                 SUM(CAST(1 AS HUGEINT) << ({HLL_RHO_CAP} - max_rho)) AS s_scaled
          FROM filled_{c})
)"""
        )
        selects.append(
            f"""SELECT '{c}' AS "column",
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_nulls,
       (SELECT CAST(CASE WHEN raw <= {(5 * HLL_M) // 2} AND v_nonzero < {HLL_M}
                 THEN ({HLL_M} * (SELECT ppm FROM (VALUES {_hll_ln_values_sql()}) ln(vz, ppm)
                                  WHERE vz = {HLL_M} - v_nonzero)) // 1000000
                 ELSE raw END AS BIGINT) FROM est_{c}) AS n_distinct_est,
       {min_num} AS min_num, {max_num} AS max_num,
       {min_s} AS min_s, {max_s} AS max_s
FROM {table}"""
        )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        + "\nUNION ALL ".join(selects)
        + '\nORDER BY "column"'
    )


ORDERS_PROFILE_SQL = profile_sql("orders")
DOCS_PROFILE_SQL = profile_sql("documents")

"""Benchmark harness.

Headline: full multi-family transcript extraction (all 8 outputs consumed)
over the sf-matched synthetic transcript corpus — reported as wall seconds
and turns/sec. Plus representative scale-operator timings over the
``$GRAFT_SF_DIR`` tables.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "turns": N, "turns_per_sec": N}

``--scaling``: runs the headline twice in fresh processes
(num_cpus=8 then 32) on the same input and reports both throughputs plus
scaling efficiency (the sandbox evidence for the N-vs-4N-node criterion).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# bench transcript corpus size (conversations); compute-dominated by design
_DEFAULT_BENCH_CONVS = {"sf0.001": 2000, "sf0.01": 12000, "sf0.1": 120000}
BENCH_CONVS = int(
    os.environ.get("GRAFT_BENCH_CONVS", "0")
) or _DEFAULT_BENCH_CONVS.get(os.path.basename(os.path.normpath(SF_DIR)), 120000)

OP_QUERIES = [
    "q1_pricing_summary",
    "q6_filtered_revenue",
    "events_hourly",
    "events_sessionize",
    "docs_exact_dedup",
    "docs_token_stats",
    "emb_knn_bruteforce",
]


def _warm_cache(paths: list[str]) -> None:
    for p in paths:
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import shutil

    import pyarrow.parquet as pq

    from pdf_extractors_ray.pipelines.queries import REGISTRY
    from pdf_extractors_ray.runtime import tune_data_context
    from pdf_extractors_ray.sources.transcripts import synthesize_transcripts
    from pdf_extractors_ray.state.lineage import partitioned_extract_all_tasks

    tune_data_context(NUM_CPUS)

    # dedicated bench corpus, sized so fold compute dominates shuffle/startup
    # overhead; generated once (parallel Ray tasks), cached across runs
    n_convs = BENCH_CONVS
    path = synthesize_transcripts(
        os.path.join("/tmp/pdfx_transcripts", f"bench-{n_convs}"), n_convs=n_convs
    )
    files = sorted(glob.glob(path + "/*.parquet"))
    _warm_cache(files)
    n_turns = sum(pq.read_metadata(f).num_rows for f in files)

    # warm the worker pool + shuffle aggregators (a real cluster is warm;
    # cold-spawning 32 python workers inside the timed window would measure
    # process startup, not the pipeline)
    import ray.data as rd

    w = rd.range(NUM_CPUS * 4).map_batches(lambda b: b, batch_size=1)
    w.groupby("id").map_groups(lambda g: g, batch_format="pandas").count()

    queries: dict[str, float] = {}
    out_root = f"/tmp/pdfx_bench_out_{NUM_CPUS}"
    shutil.rmtree(out_root, ignore_errors=True)

    # headline: ALL families in one read + one part_id shuffle; each
    # partition task folds its conversations, runs the census downstream
    # stages (summary + kinship) on its co-located households, writes all
    # outputs + a lineage sidecar
    t0 = time.time()
    metrics = partitioned_extract_all_tasks(path, out_root, n_parts=64)
    headline = time.time() - t0
    queries["extract_all_partitioned"] = round(headline, 3)
    rows = {"all_families": int(metrics["n_rows"].sum())}

    # representative scale operators over the driver tables (skipped in
    # scaling mode: the criterion times the headline pipeline only)
    for name in [] if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY") else OP_QUERIES:
        fn = REGISTRY[name][0]
        t = time.time()
        fn(SF_DIR).count()
        queries[name] = round(time.time() - t, 3)

    out = {
        "metric": "transcript_extraction_all_families",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1),
        "output_rows": rows,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same job, fresh processes, two parallelism levels (8 vs 32 CPUs)."""

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
                   GRAFT_BENCH_HEADLINE_ONLY="1")
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        )
        return json.loads(res.stdout.strip().splitlines()[-1])

    def run(ncpu: int, reps: int = 3) -> dict:
        # median of 3: consecutive fresh Ray sessions interfere (object-store
        # shm teardown, page cache) with ±20% noise; the median is robust in
        # both directions (a best-of estimator would just chase each side's
        # lucky tail)
        rs = []
        for _ in range(reps):
            rs.append(run_once(ncpu))
            time.sleep(5)
        rs.sort(key=lambda r: r["value"])
        return rs[len(rs) // 2]

    lo, hi = (2, 8) if "--scaling-low" in sys.argv else (8, 32)
    r_lo, r_hi = run(lo, reps=3), run(hi, reps=2)
    tput_lo, tput_hi = r_lo["turns_per_sec"], r_hi["turns_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": SF_DIR,
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "turns_per_sec_lo": tput_lo,
        "turns_per_sec_hi": tput_hi,
        "turns": r_lo["turns"],
    }
    if "--scaling-low" not in sys.argv:
        # corroborating pair away from the host's DRAM-saturation region
        # (single-box 8->32 shares one memory bus; real N->4N nodes do not)
        c_lo, c_hi = run(2, reps=1), run(8, reps=1)
        out["corroboration_2v8"] = round(
            (c_hi["turns_per_sec"] / c_lo["turns_per_sec"]) / 4, 3
        )
        out["corroboration_sec_2"] = c_lo["value"]
        out["corroboration_sec_8"] = c_hi["value"]
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

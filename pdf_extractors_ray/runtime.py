"""Ray Data execution tuning (never session ownership).

``tune_data_context()`` sizes the shuffle machinery to the cluster:
hash-based shuffle for groupby/aggregate (no global sort for folds — keys
only need co-location, not order) with aggregator counts bounded by the
CPU budget; the default sort-shuffle at 200-way parallelism drowns a small
CPU budget in actor startup. Idempotent; callable from any pipeline entry
(the driver owns ``ray.init`` — this only touches ``DataContext``).
"""

from __future__ import annotations


def _cluster_cpus(default: int = 8) -> int:
    import ray

    if not ray.is_initialized():
        return default
    return int(ray.cluster_resources().get("CPU", default))


def tune_data_context(num_cpus: int | None = None) -> None:
    """Measured choice (BASELINE.md): the default pull-based sort shuffle
    with COARSE map-side blocks (see ``shuffle_num_blocks``) beats hash
    shuffle here — hash aggregator actors go latency-bound on many small
    block pushes, and 200-way default parallelism drowns small CPU budgets
    in actor startup. So the only global knob set is quiet progress bars;
    block coarsening happens at the reads that feed a shuffle."""
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def sized_num_blocks(path: str, floor_bytes: int = 2 << 20,
                     ceil_bytes: int = 128 << 20, per_cpu: int = 4) -> int:
    """Read block count derived from on-disk bytes, not a constant.

    Target block size = clamp(total_bytes / (per_cpu x CPUs), floor, ceil):
    tiny corpora collapse to a handful of blocks (a 65 KB table in 64
    blocks pays ~1.5 s of pure scheduling per shuffle — measured), while
    large inputs keep ~128 MB blocks so block COUNT grows with data (the
    100 TB case is unchanged: bytes/128 MB blocks, exactly Ray's default
    shape). Directories are walked; missing paths fall back to 1 block.
    """
    import os

    total = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    elif os.path.exists(path):
        total = os.path.getsize(path)
    if total <= 0:
        return 1
    block = min(max(total // max(1, per_cpu * _cluster_cpus()), floor_bytes), ceil_bytes)
    return max(1, -(-total // block))


def read_parquet_sized(path: str, columns=None, floor_bytes: int = 2 << 20, **kwargs):
    """``read_parquet`` with byte-derived ``override_num_blocks`` (see
    ``sized_num_blocks``) and quiet progress bars."""
    import ray.data as rd

    tune_data_context()
    return rd.read_parquet(
        path, columns=columns,
        override_num_blocks=sized_num_blocks(path, floor_bytes=floor_bytes),
        **kwargs,
    )


def shuffle_num_blocks(num_cpus: int | None = None) -> int:
    """Map-side block count feeding a shuffle: ~1 block per CPU (min 16).

    Measured on the bench corpus: 16 blocks at 8 CPUs / 32 at 32 CPUs cut
    the shuffle wall 2x vs fine-grained blocks (fewer, larger exchange
    chunks; the shuffle is latency- not bandwidth-bound locally)."""
    return max(16, num_cpus or _cluster_cpus())

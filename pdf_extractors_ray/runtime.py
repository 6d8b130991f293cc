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


def shuffle_num_blocks(num_cpus: int | None = None) -> int:
    """Map-side block count feeding a shuffle: ~1 block per CPU (min 16).

    Measured on the bench corpus: 16 blocks at 8 CPUs / 32 at 32 CPUs cut
    the shuffle wall 2x vs fine-grained blocks (fewer, larger exchange
    chunks; the shuffle is latency- not bandwidth-bound locally)."""
    return max(16, num_cpus or _cluster_cpus())

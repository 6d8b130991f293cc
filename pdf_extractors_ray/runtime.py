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
    from ray.data.context import DataContext, ShuffleStrategy

    ncpu = num_cpus or _cluster_cpus()
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.default_hash_shuffle_parallelism = max(8, ncpu)
    ctx.max_hash_shuffle_aggregators = max(4, ncpu // 2)

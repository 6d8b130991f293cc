"""Large-scale data-processing operators over the generic star-schema /
document / event / embedding tables.

These extend the engine beyond the reference's own operators with the
operations a 100 TB training-data pipeline needs (dedup, similarity search,
text analysis, windowed aggregation) plus the relational core (grouped
aggregates with partial pre-aggregation, broadcast and hash joins, top-k).
Every operator favors: pruned reads → vectorized batch kernels → partial
aggregation before any shuffle → broadcast small sides.
"""

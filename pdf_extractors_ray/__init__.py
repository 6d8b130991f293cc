"""Ray-Data-native extraction engine.

A brand-new engine (not a port) with the data-processing capabilities of the
reference repo ShahzadAmjadKhan/pdf-extractors, re-expressed as
``ray.data.Dataset`` pipelines over Parquet tables of multi-turn
conversation/agent transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:

- ``oracle/``    pure single-threaded Python reimplementations of the
                 reference extractor semantics (the correctness oracle AND
                 the per-group UDF cores; file:line citations point into
                 ``/root/reference``).
- ``sources/``   transcript reader + deterministic fixture synthesizer.
- ``stages/``    Ray Data stages: vectorized boilerplate strip, actor-pool
                 field extraction, ordered per-conversation folds, skew
                 (salted splits), per-partition checkpointing.
- ``pipelines/`` end-to-end extraction pipelines (the flagship).
- ``ops/``       large-scale training-data operators over the generic tables
                 (dedup, similarity search, text analysis, relational ops).
- ``state/``     lineage sidecars + resume logic.
"""

__version__ = "0.1.0"

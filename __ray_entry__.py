"""Driver contract for the Ray-Data-native extraction engine.

The driver initialises Ray itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()`` — flagship pipeline on the sf0.001-scale transcript corpus:
  pruned read → vectorized stages → conv_id shuffle → ordered folds →
  per-household kinship resolution; returns the persons Dataset.
- ``queries()`` — one callable per implemented operator (SURVEY.md §2 and
  the training-data ops); each takes ``sf_dir``.
- ``oracle_sql()`` — DuckDB-equivalent SQL for EVERY query (matching
  column names). The extraction-family slots record order-sensitive
  transcript ops (path-embedded twins built in ``oracle_sql()``) while
  running their family pipelines as forced in-query gates; the folds are
  additionally verified by tests/test_engine_vs_oracle.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pdf_extractors_ray.pipelines import extract
from pdf_extractors_ray.pipelines import queries as _q
from pdf_extractors_ray.sources.transcripts import transcripts_path_for_sf


def entry() -> Any:
    path = transcripts_path_for_sf("/root/testdata/sf0.001")
    return extract.extract_census_persons(path)


def queries() -> dict[str, Callable[[str], Any]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()

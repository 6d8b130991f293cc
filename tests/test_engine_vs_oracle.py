"""Distributed engine ≡ single-threaded oracle (the correctness gate).

The Ray pipelines must reproduce the oracle's output per turn exactly —
same rows, same values — regardless of input block order (the synthesizer
writes rows shuffled). Comparison: both sides coerced through the same
Arrow schema, canonically sorted, compared cell-for-cell
(SURVEY.md §5.2 items 1 & 3).
"""

import pandas as pd
import pytest

from pdf_extractors_ray.oracle import runner
from pdf_extractors_ray.pipelines import extract, schemas
from helpers import canonical, oracle_table


FAMILY_CASES = [
    ("catalog", extract.extract_catalog, schemas.CATALOG_SCHEMA),
    ("invoice", extract.extract_invoice, schemas.INVOICE_SCHEMA),
    ("layout", extract.extract_layout, schemas.LAYOUT_SCHEMA),
    ("table", extract.extract_table, schemas.TABLE_SCHEMA),
    ("grid", extract.extract_grid, schemas.GRID_SCHEMA),
]


@pytest.mark.parametrize("family,engine_fn,schema", FAMILY_CASES, ids=[c[0] for c in FAMILY_CASES])
def test_engine_matches_oracle(ray_session, small_corpus_dir, small_corpus_table, family, engine_fn, schema):
    golden = runner.run_family(small_corpus_table, family)
    engine = engine_fn(small_corpus_dir).to_pandas()
    assert len(engine) == len(golden) > 0
    pd.testing.assert_frame_equal(
        canonical(oracle_table(golden, schema)), canonical(engine), check_dtype=False
    )


def test_census_engine_matches_oracle(ray_session, small_corpus_dir, small_corpus_table):
    g_hh, g_sum, g_pers = runner.run_census(small_corpus_table)
    households = extract.extract_census_households(small_corpus_dir)
    e_hh = households.to_pandas()
    pd.testing.assert_frame_equal(
        canonical(oracle_table(g_hh, schemas.HOUSEHOLD_SCHEMA)), canonical(e_hh), check_dtype=False
    )
    e_sum = extract.extract_census_summary(small_corpus_dir).to_pandas()
    pd.testing.assert_frame_equal(
        canonical(oracle_table(g_sum, schemas.CENSUS_SUMMARY_SCHEMA)), canonical(e_sum), check_dtype=False
    )
    e_pers = extract.extract_census_persons(small_corpus_dir).to_pandas()
    assert len(e_pers) == len(g_pers) > 0
    pd.testing.assert_frame_equal(
        canonical(oracle_table(g_pers, schemas.PERSONS_SCHEMA)), canonical(e_pers), check_dtype=False
    )


def test_null_text_treated_as_empty_line(ray_session):
    """Null text payloads fold as empty lines instead of crashing."""
    import ray.data as rd

    from pdf_extractors_ray.oracle import catalog as oc
    from pdf_extractors_ray.stages.fold import fold_conversations

    rows = [
        {"conv_id": "c1", "turn_idx": 0, "text": oc.BANNER, "tool": "catalog"},
        {"conv_id": "c1", "turn_idx": 1, "text": "Oil", "tool": "catalog"},
        {"conv_id": "c1", "turn_idx": 2, "text": None, "tool": "catalog"},
        {"conv_id": "c1", "turn_idx": 3, "text": "BMW", "tool": "catalog"},
        {"conv_id": "c1", "turn_idx": 4, "text": "2020", "tool": "catalog"},
        {"conv_id": "c1", "turn_idx": 5, "text": "330i", "tool": "catalog"},
        {"conv_id": "c1", "turn_idx": 6, "text": "L4 2.0L", "tool": "catalog"},
        {"conv_id": "c1", "turn_idx": 7, "text": "M1-201A", "tool": "catalog"},
    ]
    ds = rd.from_items(rows)
    out = fold_conversations(ds, oc.extract_catalog_conv, schemas.CATALOG_SCHEMA).to_pandas()
    assert len(out) == 1 and out["manufacturer"].iloc[0] == "BMW"

"""Single-pass all-family partitioned extraction ≡ per-family pipelines."""

import os

import pandas as pd

from pdf_extractors_ray.pipelines import extract
from pdf_extractors_ray.state import lineage

from helpers import canonical


def test_partitioned_all_matches_pipelines(ray_session, small_corpus_dir, tmp_path):
    out_root = str(tmp_path / "all_out")
    metrics = lineage.partitioned_extract_all(small_corpus_dir, out_root, n_parts=8)
    assert not metrics["resumed"].any()

    for family, pipeline in [
        ("catalog", extract.extract_catalog),
        ("invoice", extract.extract_invoice),
        ("layout", extract.extract_layout),
        ("table", extract.extract_table),
        ("grid", extract.extract_grid),
        ("census", extract.extract_census_households),
        ("census_summary", extract.extract_census_summary),
        ("census_persons", extract.extract_census_persons),
    ]:
        got = lineage.read_output(os.path.join(out_root, family)).to_pandas()
        want = pipeline(small_corpus_dir).to_pandas()
        assert len(got) == len(want) > 0, family
        pd.testing.assert_frame_equal(canonical(want), canonical(got), check_dtype=False)

    # lineage sidecars carry per-family extraction metrics
    entries = lineage.read_lineage(out_root)
    assert entries and all("families" in e for e in entries)
    total = sum(f["n_rows"] for e in entries for f in e["families"].values())
    assert total == int(metrics["n_rows"].sum())

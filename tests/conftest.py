import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extractors_ray.sources.transcripts import synthesize_transcripts

SMALL_DIR = "/tmp/pdfx_test/sf-small"
SMALL_CONVS = 90  # includes conv-000089, the first hot invoice conversation


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus_dir() -> str:
    return synthesize_transcripts(SMALL_DIR, n_convs=SMALL_CONVS)


@pytest.fixture(scope="session")
def small_corpus_table(small_corpus_dir) -> pa.Table:
    files = sorted(glob.glob(small_corpus_dir + "/*.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files])

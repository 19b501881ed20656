from __future__ import annotations

import pytest

from aiwhispr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # local[16]: tests are dominated by the ~250ms/task python floor, so more
    # concurrent tasks = fewer waves; 8 shuffle partitions keeps task counts low
    s = get_spark("aiwhispr-tests", master="local[16]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    from aiwhispr_spark.sources.synthetic import write_corpus_parquet

    path = tmp_path_factory.mktemp("corpus") / "documents.parquet"
    write_corpus_parquet(str(path), n_docs=98)  # full 7-length × 20-lang cycle coverage
    return str(path)

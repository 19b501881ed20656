from __future__ import annotations

import pytest

from aiwhispr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("aiwhispr-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    from aiwhispr_spark.sources.synthetic import write_corpus_parquet

    path = tmp_path_factory.mktemp("corpus") / "documents.parquet"
    write_corpus_parquet(str(path), n_docs=140)
    return str(path)

from __future__ import annotations

import pytest

from harvester_spark.fixtures.corpus import make_corpus
from harvester_spark.session import get_spark


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark("harvester_spark_tests", cores=4, shuffle_partitions=8,
                  extra_conf={"spark.sql.warehouse.dir": str(wh)})
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    return make_corpus(400, seed=42)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_pdf):
    from harvester_spark.operators.docids import assign_doc_ids
    df = assign_doc_ids(spark.createDataFrame(corpus_pdf), num_partitions=4)
    df = df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def index_dir(tmp_path_factory, spark, corpus_df):
    from harvester_spark.operators.index_build import IndexConfig, build_index
    out = tmp_path_factory.mktemp("index")
    cfg = IndexConfig(salt_df_threshold=50, salt_range_docs=100, block_size=32)
    build_index(spark, corpus_df, out, content_col="content", cfg=cfg)
    return out

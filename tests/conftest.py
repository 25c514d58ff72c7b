from __future__ import annotations

import pytest

from pero_ocr_api_spark import corpus
from pero_ocr_api_spark.session import get_spark
from pero_ocr_api_spark.sources.tables import DOCUMENTS_SCHEMA, MEDIA_SCHEMA

N_DOCS = 60
SEED = 42


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus_pandas():
    return corpus.generate_pandas(N_DOCS, seed=SEED)


@pytest.fixture(scope="session")
def docs_df(spark, corpus_pandas):
    docs_pdf, _ = corpus_pandas
    return spark.createDataFrame(
        docs_pdf.to_dict("records"), DOCUMENTS_SCHEMA
    ).cache()


@pytest.fixture(scope="session")
def media_df(spark, corpus_pandas):
    _, media_pdf = corpus_pandas
    return spark.createDataFrame(
        media_pdf.to_dict("records"), MEDIA_SCHEMA
    ).cache()

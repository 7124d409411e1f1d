import pytest


@pytest.fixture(scope="session")
def spark():
    from textsearch_spark.session import get_spark

    s = get_spark("local[4]", app_name="textsearch_spark-tests", shuffle_partitions=4)
    yield s
    s.stop()


# The 7-doc BM25 golden corpus (reference: test/runtests.jl:20-28),
# 1-based doc ids matching the reference's array positions.
GOLDEN_CORPUS = [
    "la casa roja",
    "la casa verde",
    "la casa azul",
    "la manzana roja",
    "la pera verde esta rica",
    "la manzana verde esta rica",
    "la hoja verde",
]

SENTIMENT_CORPUS = ["me gusta", "me encanta", "lo lo odio", "odio esto", "me encanta esto LOL!"]
SENTIMENT_LABELS = ["pos", "pos", "neg", "neg", "pos"]
CORPUS3 = ["hello world :)", "@user;) excellent!!", "#jello world."]


@pytest.fixture(scope="session")
def golden_corpus_df(spark):
    rows = [(i + 1, t) for i, t in enumerate(GOLDEN_CORPUS)]
    return spark.createDataFrame(rows, "doc_id long, text string")

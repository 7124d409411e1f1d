"""Synthetic source-code corpus: determinism and doc-id stability."""

from textsearch_spark.sources.corpus import synthetic_code_corpus, with_doc_ids


def _fingerprint(df):
    from pyspark.sql import functions as F

    return df.select(
        F.sha2(F.concat_ws("\x01", "repo", "path", "commit", "lang", "content"), 256).alias("h")
    ).agg(F.count("*").alias("n"), F.min("h").alias("lo"), F.max("h").alias("hi"),
          F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias("s")).collect()[0]


def test_determinism_across_parallelism(spark):
    a = _fingerprint(synthetic_code_corpus(spark, 500, partitions=2))
    b = _fingerprint(synthetic_code_corpus(spark, 500, partitions=16))
    assert a == b


def test_doc_ids_dense_and_stable(spark):
    df = with_doc_ids(synthetic_code_corpus(spark, 300, partitions=4))
    ids = sorted(r.doc_id for r in df.select("doc_id").collect())
    assert ids == list(range(1, 301))
    # same ids regardless of input partitioning
    df2 = with_doc_ids(synthetic_code_corpus(spark, 300, partitions=9))
    a = {(r.repo, r.path, r.commit): r.doc_id for r in df.collect()}
    b = {(r.repo, r.path, r.commit): r.doc_id for r in df2.collect()}
    assert a == b


def test_skew_present(spark):
    """At least one token must appear in >10% of docs (FIXTURES.md F2)."""
    from textsearch_spark.config import TextConfig
    from textsearch_spark.operators.vocab import build_vocab

    df = with_doc_ids(synthetic_code_corpus(spark, 400, partitions=4))
    voc = build_vocab(df, TextConfig(nlist=[1]), text_col="content")
    top = voc.orderBy("ndocs", ascending=False).first()
    assert top.ndocs > 40

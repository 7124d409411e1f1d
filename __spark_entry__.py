"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k batch on sf0.001.
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL.

Oracle-parity notes:
- the ``documents`` test table is pure ``[a-z ]`` text, so the engine's
  default unigram tokenizer (TextConfig(nlist=[1])) is exactly
  space-splitting there — which makes the full pipeline SQL-expressible;
- BM25/TF-IDF constants are written as the same arithmetic expressions
  on both sides (e.g. ``1.2 + 1.0`` rather than ``2.2``) so the IEEE
  doubles match bit-for-bit;
- float outputs are rounded to 4 decimals on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------- fixtures

# fixed query set over the documents table vocabulary (FIXTURES.md F3)
QUERY_SET = [
    (1, "table scan fast"),
    (2, "group agg key hash"),
    (3, "spark shuffle partition join"),
    (4, "window order line data"),
    (5, "customer order part supplier"),
    (6, "slow query plan index"),
    (7, "batch stream event merge"),
    (8, "sort column vector row value"),
    (9, "zzz notavocabword"),
]
TOP_K = 10

_INDEX_CACHE: dict = {}


def _cfg():
    from textsearch_spark.config import TextConfig

    return TextConfig(nlist=[1])


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _index(spark: SparkSession, sf_dir: str):
    from textsearch_spark.plans.build import build_bm25_index

    key = ("idx", sf_dir)
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = build_bm25_index(_docs(spark, sf_dir), _cfg())
    return _INDEX_CACHE[key]


def _blocks_index(spark: SparkSession, sf_dir: str):
    from textsearch_spark.operators.postings import build_posting_blocks

    key = ("blocks", sf_dir)
    if key not in _INDEX_CACHE:
        idx = _index(spark, sf_dir)
        idx.blocks = build_posting_blocks(idx.postings, span=256).cache()
        _INDEX_CACHE[key] = idx
    return _INDEX_CACHE[key]


def _query_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(QUERY_SET, "query_id long, qtext string")


def _query_values_sql() -> str:
    """Distinct (query_id, token) literals for the oracle — tokenized
    with the engine's own (pure-Python) tokenizer."""
    from textsearch_spark.functions.tokenizer import tokenize

    pairs = []
    for qid, qtext in QUERY_SET:
        for tok in sorted(set(tokenize(_cfg(), qtext))):
            pairs.append(f"({qid}, '{tok}')")
    return ", ".join(pairs)


# ------------------------------------------------------------- entry point

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch BM25 top-k over the sf0.001 documents table."""
    return queries()["bm25_topk"](spark, "/root/testdata/sf0.001")


# -------------------------------------------------------------- queries

def q_vocab(spark, sf_dir):
    from textsearch_spark.operators.vocab import build_vocab

    return build_vocab(_docs(spark, sf_dir), _cfg()).select(
        "token", F.col("occs").cast("long").alias("occs"),
        F.col("ndocs").cast("long").alias("ndocs"),
    )


def q_bow(spark, sf_dir):
    from textsearch_spark.functions.udfs import exploded_tokens
    from textsearch_spark.operators.vocab import bow_from_tokens

    toks = exploded_tokens(_docs(spark, sf_dir), _cfg())
    return bow_from_tokens(toks).select("doc_id", "token", F.col("tf").cast("long").alias("tf"))


def q_doclens(spark, sf_dir):
    idx = _index(spark, sf_dir)
    return idx.doclens.select("doc_id", F.col("doclen").cast("long").alias("doclen"))


def q_corpus_stats(spark, sf_dir):
    idx = _index(spark, sf_dir)
    vocab_size = idx.vocab.count()
    return spark.createDataFrame(
        [(idx.n_docs, int(round(idx.avgdl * idx.n_docs)), round(idx.avgdl, 6), vocab_size)],
        "n_docs long, total_tokens long, avgdl double, vocab_size long",
    )


def q_bm25_topk(spark, sf_dir):
    from textsearch_spark.operators.search import search_bm25

    res = search_bm25(_index(spark, sf_dir), _query_df(spark), TOP_K)
    return res.select("query_id", "rank", "doc_id", F.round("score", 4).alias("score4"))


def q_bm25_topk_wand(spark, sf_dir):
    from textsearch_spark.operators.wand import search_bm25_wand

    res = search_bm25_wand(_blocks_index(spark, sf_dir), _query_df(spark), TOP_K)
    return res.select("query_id", "rank", "doc_id", F.round("score", 4).alias("score4"))


def q_posting_blocks_stats(spark, sf_dir):
    idx = _blocks_index(spark, sf_dir)
    return idx.blocks.groupBy("token").agg(
        F.count("*").alias("n_blocks"),
        F.sum("n").cast("long").alias("n_postings"),
        F.min("first_doc").alias("min_doc"),
        F.max("last_doc").alias("max_doc"),
    )


def q_filter_lists(spark, sf_dir):
    from textsearch_spark.plans.build import filter_lists

    pruned = filter_lists(
        _index(spark, sf_dir),
        list_min_length_for_checking=100,
        list_max_allowed_length=150,
        doc_min_freq=2,
        doc_max_freq=6,
    )
    return pruned.postings.select("token", "doc_id", F.col("tf").cast("long").alias("tf"))


def q_tfidf(spark, sf_dir):
    from textsearch_spark.functions.weighting import fit_vector_model, vectorize

    docs = _docs(spark, sf_dir)
    model = fit_vector_model(docs, _cfg(), local_weighting="tf", global_weighting="idf")
    v = vectorize(model, docs)  # no sentinel rows: all_docs handled oracle-side too
    return v.select("doc_id", "token", F.round("weight", 4).alias("weight4"))


def q_vocab_filtered(spark, sf_dir):
    from textsearch_spark.operators.vocab import build_vocab, filter_vocab

    voc = build_vocab(_docs(spark, sf_dir), _cfg())
    return filter_vocab(voc, "ndocs >= 100 AND ndocs <= 450").select(
        "token", F.col("occs").cast("long").alias("occs"),
        F.col("ndocs").cast("long").alias("ndocs"),
    )


def q_vocab_merged(spark, sf_dir):
    """Hierarchical merge parity: vocab(half A) ⊕ vocab(half B) ==
    vocab(all) (reference merge_voc, src/updatevoc.jl:65-83)."""
    from textsearch_spark.operators.vocab import build_vocab, merge_vocab

    docs = _docs(spark, sf_dir)
    a = build_vocab(docs.filter("doc_id % 2 = 0"), _cfg())
    b = build_vocab(docs.filter("doc_id % 2 = 1"), _cfg())
    return merge_vocab(a, b).select(
        "token", F.col("occs").cast("long").alias("occs"),
        F.col("ndocs").cast("long").alias("ndocs"),
    )


def q_ngrams2(spark, sf_dir):
    from textsearch_spark.config import TextConfig
    from textsearch_spark.functions.udfs import exploded_tokens
    from textsearch_spark.operators.vocab import bow_from_tokens

    toks = exploded_tokens(_docs(spark, sf_dir), TextConfig(nlist=[2]))
    return bow_from_tokens(toks).select("doc_id", "token", F.col("tf").cast("long").alias("tf"))


def q_skipgrams21(spark, sf_dir):
    from textsearch_spark.config import Skipgram, TextConfig
    from textsearch_spark.functions.udfs import exploded_tokens
    from textsearch_spark.operators.vocab import bow_from_tokens

    toks = exploded_tokens(_docs(spark, sf_dir), TextConfig(slist=[Skipgram(2, 1)]))
    return bow_from_tokens(toks).select("doc_id", "token", F.col("tf").cast("long").alias("tf"))


def q_qgrams3(spark, sf_dir):
    from textsearch_spark.config import TextConfig
    from textsearch_spark.functions.udfs import exploded_tokens
    from textsearch_spark.operators.vocab import bow_from_tokens

    toks = exploded_tokens(_docs(spark, sf_dir), TextConfig(qlist=[3]))
    return bow_from_tokens(toks).select("doc_id", "token", F.col("tf").cast("long").alias("tf"))


def q_encoded_corpus(spark, sf_dir):
    """EncodedCorpus long form (reference: src/tokcorpus.jl:21-69):
    (doc_id, pos, term_id) with deterministic dense term ids."""
    from textsearch_spark.functions.udfs import with_tokens
    from textsearch_spark.operators.vocab import build_vocab, with_term_ids

    docs = _docs(spark, sf_dir)
    voc = with_term_ids(build_vocab(docs, _cfg()))
    toks = with_tokens(docs, _cfg()).select(
        "doc_id", F.posexplode("tokens").alias("pos0", "token")
    ).withColumn("pos", F.col("pos0") + 1).drop("pos0")
    return toks.join(voc.select("token", "term_id"), "token").select(
        "doc_id", "pos", F.col("term_id").cast("long").alias("term_id")
    )


def q_content_sha(spark, sf_dir):
    from textsearch_spark.sources.io import content_sha_column

    return _docs(spark, sf_dir).select("doc_id", content_sha_column("text").alias("content_sha"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "vocab_unigrams": q_vocab,
        "bow": q_bow,
        "doclens": q_doclens,
        "corpus_stats": q_corpus_stats,
        "bm25_topk": q_bm25_topk,
        "bm25_topk_wand": q_bm25_topk_wand,
        "posting_blocks_stats": q_posting_blocks_stats,
        "filter_lists_pruned": q_filter_lists,
        "tfidf_vectorize": q_tfidf,
        "vocab_filtered": q_vocab_filtered,
        "vocab_merged": q_vocab_merged,
        "ngrams2": q_ngrams2,
        "skipgrams21": q_skipgrams21,
        "qgrams3": q_qgrams3,
        "encoded_corpus": q_encoded_corpus,
        "content_sha": q_content_sha,
    }


# ------------------------------------------------------------- oracle SQL

_TOK = "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
_BOW = f"SELECT doc_id, token, count(*)::BIGINT AS tf FROM ({_TOK}) GROUP BY doc_id, token"
_VOC = (
    f"SELECT token, sum(tf)::BIGINT AS occs, count(*)::BIGINT AS ndocs "
    f"FROM ({_BOW}) GROUP BY token"
)
_DL = f"SELECT doc_id, sum(tf)::BIGINT AS doclen FROM ({_BOW}) GROUP BY doc_id"
_POS = (
    "SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos, "
    "unnest(string_split(text,' ')) AS token FROM documents"
)


def _bm25_scored_sql() -> str:
    return f"""
WITH bow AS ({_BOW}),
voc AS ({_VOC}),
dl AS ({_DL}),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
         (SELECT sum(tf) FROM bow)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl
),
q(query_id, token) AS (SELECT * FROM (VALUES {_query_values_sql()})),
scored AS (
  SELECT q.query_id, b.doc_id,
         sum( ln(1.0 + (s.n_docs - v.ndocs + 0.5)/(v.ndocs + 0.5))
              * ( b.tf * (1.2 + 1.0)
                  / (b.tf + 1.2 * (1.0 - 0.75) + d.doclen * (1.2 * 0.75 / s.avgdl))
                  + 1.0) ) AS score
  FROM q
  JOIN bow b USING (token)
  JOIN voc v USING (token)
  JOIN dl d ON b.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, b.doc_id
)
SELECT query_id, rank, doc_id, round(score, 4) AS score4 FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def oracle_sql() -> dict[str, str]:
    sqls = {
        "vocab_unigrams": _VOC,
        "bow": _BOW,
        "doclens": _DL,
        "corpus_stats": f"""
WITH bow AS ({_BOW})
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT sum(tf) FROM bow)::BIGINT AS total_tokens,
       round((SELECT sum(tf) FROM bow)::DOUBLE / (SELECT count(*) FROM documents), 6) AS avgdl,
       (SELECT count(*) FROM ({_VOC}))::BIGINT AS vocab_size
""",
        "bm25_topk": _bm25_scored_sql(),
        "bm25_topk_wand": _bm25_scored_sql(),
        "posting_blocks_stats": f"""
WITH bow AS ({_BOW}),
blk AS (
  SELECT token, (doc_id // 256) AS block_id, count(*)::BIGINT AS n,
         min(doc_id) AS min_d, max(doc_id) AS max_d
  FROM bow GROUP BY token, block_id
)
SELECT token, count(*)::BIGINT AS n_blocks, sum(n)::BIGINT AS n_postings,
       min(min_d) AS min_doc, max(max_d) AS max_doc
FROM blk GROUP BY token
""",
        "filter_lists_pruned": f"""
WITH bow AS ({_BOW}),
voc AS ({_VOC}),
j AS (SELECT b.token, b.doc_id, b.tf, v.ndocs FROM bow b JOIN voc v USING (token)),
short AS (SELECT token, doc_id, tf FROM j WHERE ndocs < 100),
long_f AS (
  SELECT token, doc_id, tf,
         row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id ASC) AS rn
  FROM j WHERE ndocs >= 100 AND tf BETWEEN 2 AND 6
)
SELECT token, doc_id, tf FROM short
UNION ALL
SELECT token, doc_id, tf FROM long_f WHERE rn <= 150
""",
        "tfidf_vectorize": f"""
WITH bow AS ({_BOW}),
voc AS ({_VOC}),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
w AS (
  SELECT b.doc_id, b.token,
         (b.tf::DOUBLE / max(b.tf) OVER (PARTITION BY b.doc_id))
           * log2((0.5 + n.n_docs) / (0.5 + v.ndocs)) AS w
  FROM bow b JOIN voc v USING (token) CROSS JOIN n
),
kept AS (SELECT * FROM w WHERE w >= 1e-6)
SELECT doc_id, token,
       round(w / sqrt(sum(w*w) OVER (PARTITION BY doc_id)), 4) AS weight4
FROM kept
""",
        "vocab_filtered": f"SELECT * FROM ({_VOC}) WHERE ndocs >= 100 AND ndocs <= 450",
        "vocab_merged": _VOC,
        "ngrams2": f"""
WITH pos AS ({_POS}),
grams AS (
  SELECT doc_id,
         token || ' ' || lead(token) OVER (PARTITION BY doc_id ORDER BY pos)
           || chr(9) || 'n' AS token,
         lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM pos
)
SELECT doc_id, token, count(*)::BIGINT AS tf FROM grams WHERE nxt IS NOT NULL
GROUP BY doc_id, token
""",
        "skipgrams21": f"""
WITH pos AS ({_POS}),
grams AS (
  SELECT doc_id,
         token || ' ' || lead(token, 2) OVER (PARTITION BY doc_id ORDER BY pos)
           || chr(9) || 's' AS token,
         lead(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM pos
)
SELECT doc_id, token, count(*)::BIGINT AS tf FROM grams WHERE nxt IS NOT NULL
GROUP BY doc_id, token
""",
        "qgrams3": """
WITH padded AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),
idx AS (SELECT doc_id, p, unnest(generate_series(1, length(p) - 2)) AS i FROM padded),
grams AS (SELECT doc_id, substr(p, i, 3) || chr(9) || 'q' AS token FROM idx)
SELECT doc_id, token, count(*)::BIGINT AS tf FROM grams GROUP BY doc_id, token
""",
        "encoded_corpus": f"""
WITH pos AS ({_POS}),
voc AS ({_VOC}),
ids AS (SELECT token, row_number() OVER (ORDER BY ndocs DESC, token ASC)::BIGINT AS term_id FROM voc)
SELECT p.doc_id, p.pos::BIGINT AS pos, i.term_id FROM pos p JOIN ids i USING (token)
""",
        "content_sha": "SELECT doc_id, sha256(text) AS content_sha FROM documents",
    }
    return sqls

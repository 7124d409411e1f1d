"""Round-2 additions: entropy combiners, typo-tolerant search, emoji
table parity, high-dim LSH, hot-shingle ceiling, VectorModel
persistence, blocks-format validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from textsearch_spark.config import TextConfig

from .conftest import SENTIMENT_CORPUS, SENTIMENT_LABELS

CFG1 = TextConfig(nlist=[1])


# ------------------------------------------------------- entropy combiners

@pytest.fixture(scope="module")
def sentiment_df(spark):
    rows = [(i + 1, t, l) for i, (t, l) in enumerate(zip(SENTIMENT_CORPUS, SENTIMENT_LABELS))]
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def _fit_entropy(df, **kw):
    from textsearch_spark.functions.weighting import fit_vector_model

    return fit_vector_model(
        df, TextConfig(group_usr=True, nlist=[1]), local_weighting="binary",
        global_weighting="entropy", label_col="label", smooth=0, **kw,
    )


def test_entropy_combiners_formulas(sentiment_df):
    """The three combiners satisfy their closed-form relations
    (src/emodel.jl:6-16) on the same distribution."""
    import math

    ne = _fit_entropy(sentiment_df, mindocs=1, comb="normalized_entropy")
    pen = _fit_entropy(sentiment_df, mindocs=1, comb="penalize_few_samples")
    sig = _fit_entropy(sentiment_df, mindocs=1, comb="sigmoid_penalize_few_samples")
    maxent = math.log2(2)

    g_ne = {r.token: r.gweight for r in ne.vocab.collect()}
    g_pen = {r.token: r.gweight for r in pen.vocab.collect()}
    g_sig = {r.token: r.gweight for r in sig.vocab.collect()}
    nd = {r.token: r.ndocs for r in ne.vocab.collect()}

    for tok, w in g_ne.items():
        h = (1.0 - w) * maxent  # invert NormalizedEntropy
        assert g_pen[tok] == pytest.approx((maxent - h) * math.log2(nd[tok]), abs=1e-9)
        assert g_sig[tok] == pytest.approx(
            (1 - h / maxent) * (1 - 1 / (1 + math.log2(nd[tok]))), abs=1e-9
        )


def test_entropy_lowerweight(sentiment_df):
    m = _fit_entropy(sentiment_df, mindocs=2, lowerweight=0.125, comb="normalized_entropy")
    rows = m.vocab.collect()
    assert any(r.ndocs < 2 for r in rows)
    for r in rows:
        if r.ndocs < 2:
            assert r.gweight == pytest.approx(0.125)


# --------------------------------------------------- typo-tolerant search

def test_typo_query_hits_golden(golden_corpus_df):
    """Misspelled golden query still retrieves [6, 2, 4] — QgramsLookup
    as token2id (src/approxvoc.jl:46-57)."""
    from textsearch_spark.plans.build import build_bm25_index
    from textsearch_spark.operators.search import search_bm25

    idx = build_bm25_index(golden_corpus_df, TextConfig(nlist=[1]),
                           vocab_filter="ndocs > 1 AND ndocs < 5")
    q = golden_corpus_df.sparkSession.createDataFrame(
        [(0, "la kasa de la mansana verde")], "query_id long, qtext string"
    )
    res = search_bm25(idx, q, 3, typo_tolerant=True).orderBy("rank").collect()
    assert [r.doc_id for r in res] == [6, 2, 4]

    # without typo tolerance the misspelled terms are OOV
    res0 = search_bm25(idx, q, 3, typo_tolerant=False).orderBy("rank").collect()
    assert [r.doc_id for r in res0] != [6, 2, 4]


# ------------------------------------------------------ emoji table parity

def test_emoji_table_membership():
    from textsearch_spark.functions.normalize import isemoji

    # entries from the reference table that the old block ranges missed
    assert isemoji("©")  # © — first table entry
    assert isemoji("®")  # ®
    assert isemoji("™")  # ™
    assert isemoji("\U0001F600")
    assert not isemoji("a")
    assert not isemoji(" ")
    assert not isemoji("é")  # é is not in the table


def test_group_emo_tokenization(spark):
    from textsearch_spark.functions.tokenizer import tokenize

    cfg = TextConfig(nlist=[1], group_emo=True)
    toks = tokenize(cfg, "nice © day \U0001F600")
    # both table emojis collapse to the grouping char (src/normalize.jl:58)
    assert sum(1 for t in toks if "\U0001F47E" in t) == 2


def test_tokenize_empty_string():
    from textsearch_spark.functions.tokenizer import tokenize

    assert tokenize(CFG1, "") == []


# ---------------------------------------------------------- high-dim LSH

def test_lsh_high_dim(spark):
    """dim=768 runs through the pandas-UDF matmul path (no codegen
    explosion) and buckets deterministically."""
    from textsearch_spark.operators.simsearch import (
        lsh_cosine_topk, lsh_near_dup_pairs, with_lsh_bucket,
    )

    rng = np.random.RandomState(3)
    dim = 768
    rows = [(i, rng.rand(dim).tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b1 = {r.vec_id: r.bucket for r in with_lsh_bucket(emb, 8, dim).collect()}
    b2 = {r.vec_id: r.bucket for r in with_lsh_bucket(emb, 8, dim).collect()}
    assert b1 == b2 and len(b1) == 40 and all(len(v) == 8 for v in b1.values())

    topk = lsh_cosine_topk(emb, [0, 1], k=3, n_planes=4, dim=dim).collect()
    assert all(0 < r.cos <= 1.0 + 1e-9 for r in topk)
    pairs = lsh_near_dup_pairs(emb, threshold=0.99, n_planes=4, dim=dim)
    assert pairs.count() == 0  # random vectors are not near-dups


def test_cosine_topk_bounded_matches_exact(spark):
    """The bounded in-kernel top-k equals a full numpy brute force."""
    from textsearch_spark.operators.simsearch import cosine_topk

    rng = np.random.RandomState(11)
    n, dim, k = 60, 32, 5
    mat = rng.rand(n, dim)
    emb = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(n)], "vec_id long, embedding array<double>"
    ).repartition(6)  # multiple partitions => per-partition top-k merge
    got = cosine_topk(emb, [0, 7], k=k).collect()

    nmat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in (0, 7):
        sims = nmat @ nmat[qid]
        sims[qid] = -np.inf
        order = np.lexsort((np.arange(n), -sims))[:k]
        mine = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == qid]
        assert mine == list(order)


# ------------------------------------------------- hot-shingle DF ceiling

def test_ngram_jaccard_hot_shingle_bounded(spark):
    """100 docs sharing one boilerplate header: the ceiling keeps the
    candidate join from emitting the m^2 all-pairs explosion, while
    pairs that also share rare shingles survive."""
    from textsearch_spark.operators.dedup import ngram_jaccard_pairs

    header = "licensed under apache two"
    rows = [(i, f"{header} unique{i} body{i} text{i}") for i in range(100)]
    # two genuine near-dups sharing rare content
    rows += [(100, f"{header} same same same tail"), (101, f"{header} same same same tails")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    res = ngram_jaccard_pairs(df, shingle_n=3, threshold=0.3, max_df_ratio=0.2).collect()
    got = {(r.doc_a, r.doc_b) for r in res}
    assert (100, 101) in got
    # boilerplate-only pairs (jaccard from the header alone ~ 2/12 < .3)
    # are not emitted, and candidate generation didn't explode
    assert len(got) < 50


# -------------------------------------------- VectorModel save/load + blocks

def test_vector_model_roundtrip(spark, golden_corpus_df, tmp_path):
    from textsearch_spark.functions.weighting import fit_vector_model, vectorize
    from textsearch_spark.sources.io import load_model, save_model

    model = fit_vector_model(golden_corpus_df, CFG1, local_weighting="tf",
                             global_weighting="idf")
    save_model(model, str(tmp_path / "vm"))
    loaded = load_model(spark, str(tmp_path / "vm"))
    assert loaded.cfg == model.cfg
    assert loaded.corpuslen == model.corpuslen and loaded.maxoccs == model.maxoccs

    a = vectorize(model, golden_corpus_df).orderBy("doc_id", "token").collect()
    b = vectorize(loaded, golden_corpus_df).orderBy("doc_id", "token").collect()
    assert [(r.doc_id, r.token) for r in a] == [(r.doc_id, r.token) for r in b]
    assert np.allclose([r.weight for r in a], [r.weight for r in b])


def test_direct_blocks_match_classic(spark, golden_corpus_df):
    """build_bm25_index_direct's one-shuffle block table is row-identical
    to the classic postings->blocks path, and WAND over it reproduces
    the reference golden."""
    from textsearch_spark.operators.postings import build_posting_blocks
    from textsearch_spark.operators.wand import search_bm25_wand
    from textsearch_spark.plans.build import build_bm25_index, build_bm25_index_direct

    classic = build_bm25_index(golden_corpus_df, CFG1)
    classic.blocks = build_posting_blocks(classic.postings, span=4)
    direct = build_bm25_index_direct(golden_corpus_df, CFG1, span=4)

    cols = ["token", "block_id", "n", "first_doc", "last_doc", "ndocs", "max_impact", "span"]
    a = sorted(tuple(r) for r in classic.blocks.select(*cols).collect())
    b = sorted(tuple(r) for r in direct.blocks.select(*cols).collect())
    assert [t[:6] + t[7:] for t in a] == [t[:6] + t[7:] for t in b]
    # max_impact: classic takes max over the Catalyst-computed impact
    # column, direct computes it with tokenscore_np inside the encode
    # kernel — JVM log vs numpy log differ by <=1 ULP. The direct bound
    # is the one the WAND kernel's own scoring reproduces exactly.
    assert [t[6] for t in a] == pytest.approx([t[6] for t in b], rel=1e-12)
    ab = sorted((r.token, r.block_id, bytes(r.blob)) for r in classic.blocks.select("token", "block_id", "blob").collect())
    bb = sorted((r.token, r.block_id, bytes(r.blob)) for r in direct.blocks.select("token", "block_id", "blob").collect())
    assert ab == bb

    q = spark.createDataFrame([(0, "la casa de la manzana verde")], "query_id long, qtext string")
    res = search_bm25_wand(direct, q, 3).orderBy("rank").collect()
    assert len(res) == 3
    # the exact reference golden needs the pruned-vocab fixture; rank
    # AND score parity with the classic index is the check here:
    res_c = search_bm25_wand(classic, q, 3).orderBy("rank").collect()
    assert [(r.doc_id, round(r.score, 10)) for r in res] == [
        (r.doc_id, round(r.score, 10)) for r in res_c
    ]


def test_blocks_schema_validation(spark, golden_corpus_df):
    from textsearch_spark.operators.postings import validate_blocks_schema
    from textsearch_spark.operators.wand import search_bm25_wand
    from textsearch_spark.plans.build import build_bm25_index

    idx = build_bm25_index(golden_corpus_df, CFG1)
    # a stale pre-span blocks table must be rejected loudly
    stale = spark.createDataFrame([("la", 0, b"")], "token string, block_id long, blob binary")
    with pytest.raises(ValueError, match="span"):
        validate_blocks_schema(stale)
    idx.blocks = stale
    q = spark.createDataFrame([(0, "casa")], "query_id long, qtext string")
    with pytest.raises(ValueError):
        search_bm25_wand(idx, q, 3)

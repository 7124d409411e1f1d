"""Deterministic synthetic source-code corpus (FIXTURES.md F2).

Schema per BASELINE.json input_hint: (repo, path, commit, lang,
content). Generated distributed via ``spark.range`` + an Arrow UDF; the
per-row RNG is seeded by the row id, so the table is bit-identical at
any parallelism/partitioning — which is what makes the N-vs-4N scaling
runs and checkpoint fingerprints comparable.

Skew: repo sizes and token frequencies are zipf-heavy on purpose —
keywords like ``def``/``return``/``0`` appear in most docs so the
salted/blocked posting build is actually exercised (FIXTURES.md F2
skew requirement).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "jl", "c", "go", "md"]

_KEYWORDS = {
    "py": ["def", "return", "import", "class", "if", "else", "for", "in", "None", "self"],
    "jl": ["function", "end", "return", "using", "struct", "for", "if", "else", "begin"],
    "c": ["int", "return", "void", "static", "struct", "for", "if", "else", "char"],
    "go": ["func", "return", "package", "import", "type", "for", "if", "else", "var"],
    "md": ["the", "a", "of", "to", "and", "in", "is", "for", "with", "this"],
}

_IDENT_PARTS = [
    "get", "set", "run", "read", "write", "parse", "merge", "split", "index",
    "token", "block", "query", "score", "count", "batch", "shard", "hash",
    "node", "list", "tree", "map", "util", "core", "data", "file", "path",
]


def _gen_content(doc_id: int) -> tuple:
    rng = np.random.default_rng(doc_id + 1_000_003)
    lang = LANGS[int(rng.integers(0, len(LANGS)))]
    kw = _KEYWORDS[lang]
    n_lines = int(rng.integers(5, 40))
    lines = []
    for _ in range(n_lines):
        n_tok = int(rng.integers(3, 10))
        toks = []
        for _ in range(n_tok):
            r = rng.random()
            if r < 0.45:  # heavy-tailed keyword mass -> >10% doc frequency
                toks.append(kw[min(int(rng.zipf(1.6)) - 1, len(kw) - 1)])
            elif r < 0.80:
                a, b = rng.integers(0, len(_IDENT_PARTS), 2)
                toks.append(f"{_IDENT_PARTS[a]}_{_IDENT_PARTS[b]}")
            elif r < 0.90:
                toks.append(str(int(rng.integers(0, 10000))))
            elif r < 0.95:
                toks.append(f"v{rng.integers(0,9)}.{rng.integers(0,99)}")
            else:
                toks.append(f"https://example.org/{_IDENT_PARTS[int(rng.integers(0, len(_IDENT_PARTS)))]}")
        lines.append(" ".join(toks))
    content = "\n".join(lines)
    # zipf-distributed repo sizes
    org = int(rng.zipf(1.3)) % 50
    proj = int(rng.integers(0, 8))
    repo = f"org{org}/proj{proj}"
    path = f"src/module_{doc_id % 997}.{lang}"
    commit = hashlib.sha1(f"{repo}/{path}#{doc_id}".encode()).hexdigest()
    return repo, path, commit, lang, content


def synthetic_code_corpus(spark: SparkSession, n_docs: int, *, partitions: int | None = None) -> DataFrame:
    """(repo, path, commit, lang, content) — deterministic at any
    parallelism."""
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def gen(batches):
        for pdf in batches:
            rows = [_gen_content(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    base = spark.range(0, n_docs, numPartitions=partitions)
    return base.mapInPandas(gen, "repo string, path string, commit string, lang string, content string")


_DIGIT2ALPHA = str.maketrans("0123456789", "abcdefghij")


def _gen_zipf_content(doc_id: int, vocab_size: int, s: float,
                      min_tokens: int, max_tokens: int) -> tuple:
    rng = np.random.default_rng(doc_id + 7_000_003)
    lang = LANGS[int(rng.integers(0, len(LANGS)))]
    n_tok = int(rng.integers(min_tokens, max_tokens + 1))
    # Zipf(s)-ranked vocabulary: rank-1 is stop-word dense, the tail is
    # rare — the df shape where block-max bounds actually skip ranges.
    # Term strings are letters-only (rank digits transliterated a-j):
    # the default TextConfig groups numbers, which would collapse a
    # "w123"-style vocabulary into ONE token.
    ranks = np.minimum(rng.zipf(s, n_tok), vocab_size)
    toks = [f"w{str(r).translate(_DIGIT2ALPHA)}" for r in ranks]
    lines = [" ".join(toks[i:i + 8]) for i in range(0, n_tok, 8)]
    content = "\n".join(lines)
    org = int(rng.zipf(1.3)) % 50
    repo = f"org{org}/proj{int(rng.integers(0, 8))}"
    path = f"src/module_{doc_id % 997}.{lang}"
    commit = hashlib.sha1(f"{repo}/{path}#{doc_id}".encode()).hexdigest()
    return repo, path, commit, lang, content


def synthetic_zipf_corpus(
    spark: SparkSession,
    n_docs: int,
    *,
    vocab_size: int = 50_000,
    s: float = 1.15,
    min_tokens: int = 40,
    max_tokens: int = 120,
    partitions: int | None = None,
) -> DataFrame:
    """Same schema as :func:`synthetic_code_corpus`, but with a large
    Zipf(s)-distributed vocabulary instead of the tiny keyword set.

    ``synthetic_code_corpus`` is deliberately term-dense (every token in
    nearly every doc) to stress the skew path of the posting build; that
    very density makes every doc range's WAND upper bound comparable, so
    block-max pruning never fires on it. This corpus has the realistic
    web/code df shape — a handful of stop-wordish heads plus a long rare
    tail — on which the BMW bound test measurably skips ranges
    (bench.py's zipf leg records the kernel's skip counters).
    Deterministic per doc id at any parallelism, like the dense
    generator."""
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def gen(batches):
        for pdf in batches:
            rows = [_gen_zipf_content(int(i), vocab_size, s, min_tokens, max_tokens)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    base = spark.range(0, n_docs, numPartitions=partitions)
    return base.mapInPandas(
        gen, "repo string, path string, commit string, lang string, content string")


def with_doc_ids(df: DataFrame, order_cols=("repo", "path", "commit"), *,
                 start: int = 0) -> DataFrame:
    """Stable dense ``start+1``-based doc_id by ``order_cols`` —
    FIXTURES.md F2 — without a single-partition global window:
    range-partition + sort by the key, then ``zipWithIndex`` (one extra
    count job; the only RDD use in the engine, because it is the one
    primitive that assigns contiguous cross-partition offsets in a
    single consistent computation). ``start`` offsets every id — the
    append path passes the index's high-water mark so appended docs
    slot in above existing ids (streaming/append.py).

    A previous version derived per-partition offsets from
    ``spark_partition_id()`` in one query and joined them back in
    another — but AQE may coalesce the two instantiations of the
    exchange differently, making the pids disagree and silently
    DROPPING every row whose pid had no offsets match. Partition-id
    arithmetic across separate query executions is unsound under AQE;
    zipWithIndex runs inside one job and cannot skew.
    """
    from pyspark.sql.types import LongType, StructField

    if "doc_id" in df.columns:
        # schema.add would silently create a DUPLICATE doc_id field and
        # every downstream select would die with AMBIGUOUS_REFERENCE
        raise ValueError(
            "input already has a doc_id column — drop it first, or (on "
            "the append path) pass doc_col='doc_id' to use the existing ids")
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        df.repartitionByRange(n_part, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
    )
    schema = d.schema.add(StructField("doc_id", LongType(), False))
    base = int(start) + 1
    return spark.createDataFrame(
        d.rdd.zipWithIndex().map(lambda t: (*t[0], t[1] + base)), schema
    )

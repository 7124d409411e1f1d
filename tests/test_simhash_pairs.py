"""SimHash pair extraction via pigeonhole banding (round-5 addition).

``simhash_near_dup_pairs`` turns per-doc SimHashes into (doc_a, doc_b,
hamming) pairs: split the hash into max_hamming+1 bands — any pair
within the budget matches exactly on >= 1 band — equi-join on
(band, value), popcount-verify bucket-mates. Pins:

- completeness + precision: operator pairs == brute-force all-pairs
  popcount filter over the collected hashes (the banding may generate
  candidates but must never MISS an in-budget pair, and the verify
  must drop every out-of-budget candidate);
- max_hamming=0 degenerates to exact simhash equality;
- identical documents always pair at hamming 0;
- precomputed ``simhashes=`` path is identical;
- bounds validation.
"""

import pytest
from pyspark.sql import functions as F

from textsearch_spark.operators.dedup import simhash, simhash_near_dup_pairs


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _brute(spark, df, bits, max_hamming):
    hs = {r.doc_id: r.simhash for r in simhash(df, bits).collect()}
    ids = sorted(hs)
    return {
        (a, b, bin(hs[a] ^ hs[b]).count("1"))
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(hs[a] ^ hs[b]).count("1") <= max_hamming
    }


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",      # exact dup of 0
    "the quick brown fox leaps over the lazy dog",      # near dup
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
    "a b c d e f g h i j k l m n o p",
    "the quick brown fox jumps over a lazy dog",        # near dup
    "completely different content about spark engines",
    "pack my box with five dozen liquor jars",          # near dup of 3
    "x y z",
]


@pytest.mark.parametrize("max_hamming", [0, 1, 2, 4])
def test_matches_brute_force(spark, max_hamming):
    df = _corpus(spark, TEXTS)
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_dup_pairs(df, bits=16,
                                        max_hamming=max_hamming).collect()
    }
    assert got == _brute(spark, df, 16, max_hamming)


def test_exact_dup_always_pairs(spark):
    df = _corpus(spark, TEXTS)
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in simhash_near_dup_pairs(df, max_hamming=2).collect()}
    assert got.get((0, 1)) == 0


def test_precomputed_hashes_identical(spark):
    df = _corpus(spark, TEXTS)
    pre = simhash(df, 16)
    a = sorted(map(tuple, simhash_near_dup_pairs(df, max_hamming=2).collect()))
    b = sorted(map(tuple, simhash_near_dup_pairs(
        df, max_hamming=2, simhashes=pre).collect()))
    assert a == b


def test_bounds(spark):
    df = _corpus(spark, TEXTS[:3])
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_dup_pairs(df, bits=16, max_hamming=16)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_dup_pairs(df, bits=16, max_hamming=-1)
    # bit 63 is the long sign bit — simhash must refuse, not sign-wrap
    with pytest.raises(ValueError, match="bits"):
        simhash(df, bits=64)
    with pytest.raises(ValueError, match="bits"):
        simhash(df, bits=0)


def test_wide_hash_32_bits(spark):
    # the widest band geometry the bench uses: 32-bit hashes, 11/11/10
    # bands — differential vs brute force like the 16-bit cases
    df = _corpus(spark, TEXTS)
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_dup_pairs(df, bits=32, max_hamming=2).collect()
    }
    assert got == _brute(spark, df, 32, 2)

"""Differential tests: ASCII fast paths vs the reference char loops."""

from hypothesis import given, settings
from hypothesis import strategies as st

from textsearch_spark.config import IdentityTokenTransformation, IgnoreStopwords, TextConfig
from textsearch_spark.functions.normalize import _normalize_slow, normalize_text
from textsearch_spark.functions.tokenizer import _unigrams_automaton, unigrams

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0, max_codepoint=127), max_size=200
)
cfgs = st.builds(
    TextConfig,
    del_punc=st.booleans(),
    del_dup=st.booleans(),
    lc=st.booleans(),
    group_num=st.booleans(),
    group_url=st.booleans(),
    group_usr=st.booleans(),
)


@given(ascii_text, cfgs)
@settings(max_examples=500, deadline=None)
def test_normalize_fast_path_matches_slow(text, cfg):
    from textsearch_spark.functions.normalize import _preprocess

    pre = _preprocess(cfg, text)
    if not pre.isascii():  # fast path only claims ASCII inputs
        return
    assert normalize_text(cfg, text) == _normalize_slow(cfg, pre, True)


@given(ascii_text, cfgs)
@settings(max_examples=500, deadline=None)
def test_unigram_fast_path_matches_automaton(text, cfg):
    norm = normalize_text(cfg, text)
    fast_tokens, fast_unis = [], []
    unigrams(norm, fast_tokens, fast_unis, cfg.tt)
    slow_tokens = []
    _unigrams_automaton(norm, slow_tokens, cfg.tt)
    assert fast_tokens == slow_tokens
    assert fast_unis == slow_tokens


@given(st.text(max_size=120), cfgs)
@settings(max_examples=300, deadline=None)
def test_unigram_fast_path_matches_automaton_unicode(text, cfg):
    norm = normalize_text(cfg, text)
    fast_tokens, fast_unis = [], []
    unigrams(norm, fast_tokens, fast_unis, cfg.tt)
    slow_tokens = []
    _unigrams_automaton(norm, slow_tokens, cfg.tt)
    assert fast_tokens == slow_tokens


def test_fast_path_with_transformation():
    cfg = TextConfig(nlist=[1], tt=IgnoreStopwords({"la"}))
    norm = normalize_text(cfg, "la casa; la vida")
    fast_tokens, fast_unis = [], []
    unigrams(norm, fast_tokens, fast_unis, cfg.tt)
    slow = []
    _unigrams_automaton(norm, slow, cfg.tt)
    assert fast_tokens == slow == ["casa", ";", "vida"]


@given(st.text(alphabet="ab_#@.!~|<>^x0", max_size=24))
@settings(max_examples=1000, deadline=None)
def test_run_level_matches_automaton_punct_heavy(seg):
    """Stress the ASCII run-level path's 3-byte punct chunking and
    META_GLUE remainder handling against the char automaton."""
    from textsearch_spark.functions.normalize import BLANK
    from textsearch_spark.functions.tokenizer import _unigrams_runs_ascii

    tt = IdentityTokenTransformation()
    a, b = [], []
    _unigrams_automaton(BLANK + seg + BLANK, a, tt)
    if seg:
        _unigrams_runs_ascii(seg, b, tt.transform_unigram)
    assert a == b

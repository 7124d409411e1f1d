"""Pure-Python tokenizer kernel.

Reproduces the reference tokenizer family exactly
(/root/reference/src/tokenize.jl:107-349): the dispatch pipeline
(qgrams -> unigrams -> nwords -> skipgrams -> collocations), the
stateful word-unigram automaton with its punctuation-run rules, and the
token-type markers ("\\tq", "\\tn", "\\ts", "\\tc"; unigrams are never
marked).

Spark-free: wrapped by vectorized pandas UDFs in
``textsearch_spark.functions.udfs``; Spark's task parallelism replaces
the reference's ``Threads.@threads`` corpus loop (src/tokenize.jl:92-105).
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Union

from ..config import Skipgram, TextConfig, TokenTransformation
from .normalize import ASCII_PUNCT2, BLANK, isemoji, ispunct2, normalize_text

# alternating punct/word runs within an ASCII segment (no blanks inside
# a segment — unigrams() splits on BLANK first)
_PUNCT_CLASS = "[" + re.escape("".join(sorted(ASCII_PUNCT2))) + "]"
_SEG_RUNS = re.compile(f"{_PUNCT_CLASS}+|(?:(?!{_PUNCT_CLASS}).)+")
_ASCII_PUNCT_SEARCH = re.compile(_PUNCT_CLASS).search

_META_GLUE = ("#", "@", "_")


def _push_transformed(tokens: List[str], s) -> None:
    """Append a transform-hook result: None drops, list expands
    (reference: src/tokenize.jl:136-147)."""
    if s is None:
        return
    if isinstance(s, str):
        tokens.append(s)
    else:
        tokens.extend(s)


def qgrams(q: int, normtext: str, tokens: List[str], tt, mark: bool) -> None:
    """Character q-grams over the normalized text, boundary blanks
    included (reference: src/tokenize.jl:214-225)."""
    suffix = "\tq" if mark else ""
    n = len(normtext)
    for i in range(n - q + 1):
        s = normtext[i : i + q]
        _push_transformed(tokens, tt.transform_qgram(s + suffix))


def unigrams(normtext: str, tokens: List[str], unigram_out: List[str], tt) -> None:
    """The word-unigram automaton (reference: src/tokenize.jl:234-276).

    Scans the normalized text (normtext[0] is the boundary BLANK),
    splitting on blanks with special punctuation-run handling:

    - emoji are standalone tokens;
    - a run of punctuation flushes once its UTF-8 size reaches 3 bytes
      (the reference checks ``buff.io.size >= 3`` on an IOBuffer, i.e.
      bytes, not chars);
    - ``# @ _`` glue to the following word (meta-word prefixes);
    - a punct char after a non-blank non-punct char starts a new token.

    Unigrams are appended unmarked to both ``tokens`` and
    ``unigram_out`` (post-transform, mirroring src/tokenize.jl:271-273).
    """
    mfirst = len(tokens)

    # fast path: the automaton is the identity on blank-delimited
    # segments containing no punctuation/emoji — emit those directly and
    # run the char automaton only on the segments that need it. Segment
    # boundaries are blanks, and the automaton state resets at a blank
    # with p=BLANK, so per-segment processing is exactly equivalent.
    transform = tt.transform_unigram
    identity_tt = type(tt).transform_unigram is TokenTransformation.transform_unigram \
        and isinstance(tt, TokenTransformation)
    segments = normtext.split(BLANK)
    for seg in segments:
        if not seg:
            continue
        if seg.isascii():
            if _ASCII_PUNCT_SEARCH(seg) is None:
                if identity_tt:
                    tokens.append(seg)
                else:
                    _push_transformed(tokens, transform(seg))
            else:
                _unigrams_runs_ascii(seg, tokens, transform)
        else:
            _unigrams_automaton(BLANK + seg, tokens, tt)
    unigram_out.extend(tokens[mfirst:])


def _unigrams_runs_ascii(seg: str, tokens: List[str], transform) -> None:
    """Run-level equivalent of the char automaton for ASCII, emoji-free
    segments. A segment is an alternation of punct runs and word runs:

    - a word run is always flushed as one token (with any glued punct
      prefix) — the automaton flushes it at the next punct or at end;
    - a punct run emits full 3-byte chunks (the ``iosize >= 3`` flush;
      ASCII chars are 1 byte) and keeps the 1..3-char remainder pending:
      it glues to a following word run iff it ends in ``# @ _``
      (_META_GLUE), else it is emitted alone.

    Equivalence with _unigrams_automaton is pinned by the golden tests
    and tests/test_fastpaths.py's differential over random strings."""
    pending = ""
    for run in _SEG_RUNS.findall(seg):
        if run[0] in ASCII_PUNCT2:
            n = len(run)
            rem = ((n - 1) % 3) + 1
            for j in range(0, n - rem, 3):
                _push_transformed(tokens, transform(run[j:j + 3]))
            pending = run[n - rem:]
        else:
            if pending:
                if pending[-1] in _META_GLUE:
                    run = pending + run
                else:
                    _push_transformed(tokens, transform(pending))
                pending = ""
            _push_transformed(tokens, transform(run))
    if pending:
        _push_transformed(tokens, transform(pending))


# per-char class codes, cached: the automaton's three predicates
# (== BLANK, isemoji, ispunct2) collapse into one dict probe per char
_C_BLANK, _C_EMOJI, _C_PUNCT, _C_OTHER = 0, 1, 2, 3
_CLS_CACHE: dict = {}


def _char_cls(c: str) -> int:
    if c == BLANK:
        v = _C_BLANK
    elif isemoji(c):
        v = _C_EMOJI
    elif ispunct2(c):
        v = _C_PUNCT
    else:
        v = _C_OTHER
    _CLS_CACHE[c] = v
    return v


def _utf8len(c: str) -> int:
    cp = ord(c)
    return 1 if cp < 0x80 else 2 if cp < 0x800 else 3 if cp < 0x10000 else 4


def _unigrams_automaton(normtext: str, tokens: List[str], tt) -> None:
    """The exact char automaton, applied to one BLANK-prefixed segment
    (or a whole normalized text). Branches mirror src/tokenize.jl:234-276;
    ``iosize`` is the UTF-8 byte size of the buffer (the reference checks
    ``buff.io.size``, i.e. bytes, not chars)."""
    if not normtext:
        return
    transform = tt.transform_unigram
    cls_cache = _CLS_CACHE
    io: List[str] = []
    iosize = 0
    prev = normtext[0]
    pcls = cls_cache.get(prev)
    if pcls is None:
        pcls = _char_cls(prev)

    for i in range(1, len(normtext)):
        c = normtext[i]
        ccls = cls_cache.get(c)
        if ccls is None:
            ccls = _char_cls(c)

        if ccls == _C_BLANK:
            if iosize:
                _push_transformed(tokens, transform("".join(io)))
                io = []
                iosize = 0
        elif ccls == _C_EMOJI:
            if iosize:
                _push_transformed(tokens, transform("".join(io)))
                io = []
            _push_transformed(tokens, transform(c))
            iosize = 0
        elif pcls == _C_PUNCT:
            if ccls == _C_PUNCT:
                # inside a punctuation run; flush when it grows large
                if iosize >= 3:
                    _push_transformed(tokens, transform("".join(io)))
                    io = []
                    iosize = 0
            else:
                # run ends; keep meta-word prefixes glued
                if prev not in _META_GLUE and iosize:
                    _push_transformed(tokens, transform("".join(io)))
                    io = []
                    iosize = 0
            io.append(c)
            iosize += _utf8len(c)
        elif ccls == _C_PUNCT and pcls != _C_BLANK:
            # single punctuation starting after a word char
            if iosize:
                _push_transformed(tokens, transform("".join(io)))
                io = []
                iosize = 0
            io.append(c)
            iosize += _utf8len(c)
        else:
            io.append(c)
            iosize += _utf8len(c)

        prev = c
        pcls = ccls

    if iosize:
        _push_transformed(tokens, transform("".join(io)))


def nwords(q: int, unigrams_list: Sequence[str], tokens: List[str], tt, mark: bool) -> None:
    """Word n-grams: q adjacent unigrams joined by a blank
    (reference: src/tokenize.jl:281-296)."""
    suffix = "\tn" if mark else ""
    n = len(unigrams_list)
    for i in range(n - q + 1):
        s = " ".join(unigrams_list[i : i + q])
        _push_transformed(tokens, tt.transform_nword(s + suffix))


def skipgrams(sg: Skipgram, unigrams_list: Sequence[str], tokens: List[str], tt, mark: bool) -> None:
    """Skip-grams: qsize unigrams with `skip` separation
    (reference: src/tokenize.jl:326-348)."""
    suffix = "\ts" if mark else ""
    n = len(unigrams_list)
    span = sg.qsize + (sg.qsize - 1) * sg.skip
    step = 1 + sg.skip
    for start in range(n - span + 1):
        s = " ".join(unigrams_list[start + k * step] for k in range(sg.qsize))
        _push_transformed(tokens, tt.transform_skipgram(s + suffix))


def collocations(q: int, unigrams_list: Sequence[str], tokens: List[str], tt, mark: bool) -> None:
    """Bounded-window word pairs (reference: src/tokenize.jl:304-318):
    pairs (w_i, w_j) for j in i+1 .. min(i+1+q, n), 1-based."""
    suffix = "\tc" if mark else ""
    n = len(unigrams_list)
    for i in range(n - 1):
        # 1-based j upper bound min(i+1+q, n) -> 0-based inclusive min(i+q+1, n-1)
        jmax = min(i + q + 1, n - 1)
        for j in range(i + 1, jmax + 1):
            s = unigrams_list[i] + " " + unigrams_list[j]
            _push_transformed(tokens, tt.transform_collocation(s + suffix))


def tokenize_normalized(cfg: TextConfig, normtext: str, tokens: List[str], unigram_out: List[str]) -> List[str]:
    """Dispatch pipeline over one normalized text
    (reference: src/tokenize.jl:107-134)."""
    tt = cfg.tt
    for q in cfg.qlist:
        qgrams(q, normtext, tokens, tt, cfg.mark_token_type)

    if cfg.nlist or cfg.slist or cfg.collocations > 1:
        n1 = len(tokens)
        unigrams(normtext, tokens, unigram_out, tt)
        # unigrams are computed for nwords/skipgrams/collocations but
        # only kept as tokens when nlist starts with 1 (src/tokenize.jl:116-118)
        if not cfg.nlist or cfg.nlist[0] != 1:
            del tokens[n1:]
        for q in cfg.nlist:
            if q != 1:
                nwords(q, unigram_out, tokens, tt, cfg.mark_token_type)
        for sg in cfg.slist:
            skipgrams(sg, unigram_out, tokens, tt, cfg.mark_token_type)
        if cfg.collocations > 1:
            collocations(cfg.collocations, unigram_out, tokens, tt, cfg.mark_token_type)

    return tokens


def tokenize(cfg: TextConfig, text: Union[str, Sequence[str], None]) -> List[str]:
    """Tokenize a text (or a multi-message list of texts, whose tokens
    accumulate into one document; reference: src/tokenize.jl:44-61)."""
    tokens: List[str] = []
    if text is None:
        return tokens
    messages = [text] if isinstance(text, str) else list(text)
    for msg in messages:
        if msg is None:
            # a null element inside an array<string> document: skip it
            # rather than crash the whole Spark task in normalize
            continue
        normtext = normalize_text(cfg, msg, limits=True)
        unis: List[str] = []
        tokenize_normalized(cfg, normtext, tokens, unis)
    return tokens

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

from typing import List, Optional, Sequence, Union

from ..config import Skipgram, TextConfig, TokenTransformation
from .normalize import ASCII_PUNCT2, BLANK, isemoji, ispunct2, normalize_text

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
        if seg.isascii() and not (set(seg) & ASCII_PUNCT2):
            if identity_tt:
                tokens.append(seg)
            else:
                _push_transformed(tokens, transform(seg))
        else:
            _unigrams_automaton(BLANK + seg, tokens, tt)
    unigram_out.extend(tokens[mfirst:])


def _unigrams_automaton(normtext: str, tokens: List[str], tt) -> None:
    """The exact char automaton, applied to one BLANK-prefixed segment
    (or a whole normalized text)."""
    io: List[str] = []
    iosize = 0  # UTF-8 byte size of io, mirrors buff.io.size

    def flush():
        nonlocal io, iosize
        if iosize == 0:
            return
        s = "".join(io)
        io = []
        iosize = 0
        _push_transformed(tokens, tt.transform_unigram(s))

    def push(c: str):
        nonlocal iosize
        io.append(c)
        iosize += len(c.encode("utf-8"))

    n = len(normtext)
    for i in range(1, n):
        c = normtext[i]
        p = normtext[i - 1]
        if c == BLANK:
            flush()
        elif isemoji(c):
            flush()
            push(c)
            flush()
        elif ispunct2(p):
            if ispunct2(c):
                # inside a punctuation run; flush when it grows large
                if iosize >= 3:
                    flush()
                push(c)
            else:
                # run ends; keep meta-word prefixes glued
                if p not in _META_GLUE:
                    flush()
                push(c)
        elif ispunct2(c) and p != BLANK:
            # single punctuation starting after a word char
            flush()
            push(c)
        else:
            push(c)

    flush()


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
        normtext = normalize_text(cfg, msg, limits=True)
        unis: List[str] = []
        tokenize_normalized(cfg, normtext, tokens, unis)
    return tokens

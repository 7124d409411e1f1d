"""Pure-Python text normalization kernel.

Reproduces the reference normalization pipeline
(/root/reference/src/normalize.jl:25-66): regex preprocessing
(lowercase, URL/user/number grouping) followed by a single pass of
Unicode normalization (NFKC-compat + optional casefold + combining-mark
strip + control-char strip), whitespace folding, optional punctuation
deletion, emoji grouping, and duplicate-run collapsing.

This module is Spark-free so it can be unit-tested directly and shipped
inside vectorized pandas UDF closures.
"""

from __future__ import annotations

import re
import unicodedata

BLANK = " "

# Regexes use re.ASCII so \d / \s / \S match like the reference's PCRE
# defaults (ASCII classes).  Patterns from src/normalize.jl:17-19.
RE_URL = re.compile(r"(http|ftp|https)://\S+", re.ASCII)
RE_USER = re.compile(r"""@[^;:,.@#&\\\-"'/:\*\(\)\[\]¿\?¡!\{\}~<>\|\s]+""", re.ASCII)
RE_NUM = re.compile(r"[-+]?(\d+\.?\d*)|(\.\d+)", re.ASCII)

# Newline-function / tab characters that utf8proc's stripcc converts to
# a space instead of deleting (all other Cc chars are removed).
_CC_TO_SPACE = frozenset("\t\n\x0b\x0c\r\x85")

# Emoji predicate: the same fixed character set as the reference
# (src/emojis.txt loaded by src/normalize.jl:15 — `EMOJIS = Set(l[1] for
# l in lines)`, i.e. the distinct LEADING codepoint of each table row).
# emoji_data.py ships that derived codepoint set as an importable module
# (the source table is MIT-licensed public data).
from .emoji_data import CODEPOINTS as _EMOJI_SET

_EMOJI_MIN = min(_EMOJI_SET)  # 0xA9 — everything below (all ASCII) is fast-rejected


def isemoji(c: str) -> bool:
    cp = ord(c)
    return cp >= _EMOJI_MIN and cp in _EMOJI_SET


# Punctuation predicates.  Julia's ispunct == Unicode general category
# P* (src/tokenize.jl:227 builds ispunct2 by adding EXTRA_PUNCT symbols).
EXTRA_PUNCT = frozenset("~+^$|<>")

_PUNCT_CACHE: dict = {}
_PUNCT2_CACHE: dict = {}


def ispunct(c: str) -> bool:
    v = _PUNCT_CACHE.get(c)
    if v is None:
        v = _PUNCT_CACHE[c] = unicodedata.category(c).startswith("P")
    return v


def ispunct2(c: str) -> bool:
    v = _PUNCT2_CACHE.get(c)
    if v is None:
        v = _PUNCT2_CACHE[c] = ispunct(c) or c in EXTRA_PUNCT
    return v


# ASCII fast-path tables. For pure-ASCII text: NFKD is the identity,
# lower() == casefold(), there are no combining marks and no emoji —
# so normalization reduces to a str.translate.
ASCII_PUNCT2 = frozenset(c for c in map(chr, range(128)) if ispunct2(c))

def _ascii_tables():
    fold = {}
    fold_punct = {}
    for i in range(128):
        c = chr(i)
        if c in "\t\n\x0b\x0c\r" or unicodedata.category(c) == "Zs":
            fold[i] = " "
            fold_punct[i] = " "
        elif unicodedata.category(c) == "Cc":
            fold[i] = None
            fold_punct[i] = None
        else:
            fold_punct[i] = " " if (ispunct(c) and c not in "@#_") else None
    return fold, {**fold, **{k: v for k, v in fold_punct.items() if v == " "}}

_ASCII_FOLD, _ASCII_FOLD_DELPUNC = _ascii_tables()
_RE_DUPRUN = re.compile(r"(.)\1{2,}", re.DOTALL)


def _preprocess(cfg, text: str) -> str:
    """Regex preprocessing before Unicode normalization
    (reference: src/normalize.jl:25-43)."""
    if cfg.lc:
        text = text.lower()
    if cfg.group_url:
        text = RE_URL.sub("_url ", text)
    if cfg.group_usr:
        text = RE_USER.sub("_usr ", text)
    if cfg.group_num:
        text = RE_NUM.sub("0 ", text)
    return text


def _unicode_normalize(text: str, casefold: bool, stripmark: bool) -> str:
    """NFKC-compat normalization with optional casefold / mark strip /
    control-char strip, equivalent to the utf8proc flag combination the
    reference uses (src/normalize.jl:55)."""
    s = unicodedata.normalize("NFKD", text)
    if casefold:
        s = s.casefold()
    out = []
    for c in s:
        if stripmark and unicodedata.combining(c):
            continue
        if unicodedata.category(c) == "Cc":
            if c in _CC_TO_SPACE:
                out.append(" ")
            continue
        out.append(c)
    return unicodedata.normalize("NFC", "".join(out))


def normalize_text(cfg, text: str, limits: bool = True) -> str:
    """Normalize ``text`` per ``cfg``; returns the normalized char
    stream (with boundary blanks when ``limits``), mirroring
    src/normalize.jl:50-66 char-for-char.

    Pure-ASCII inputs take a vectorized fast path (str.translate +
    regex run-collapse) that is behavior-identical to the char loop;
    tests cross-check the two paths.
    """
    text = _preprocess(cfg, text)
    if text.isascii():
        s = text.translate(_ASCII_FOLD_DELPUNC if cfg.del_punc else _ASCII_FOLD)
        if limits:
            s = BLANK + s
        if cfg.del_dup:
            # run-collapse including the LEADING boundary blank (the
            # char-loop rep counter sees it) but not the trailing one
            # (the reference appends it unconditionally after the loop)
            s = _RE_DUPRUN.sub(r"\1\1", s)
        if limits:
            s = s + BLANK
        return s
    return _normalize_slow(cfg, text, limits)


def _normalize_slow(cfg, text: str, limits: bool = True) -> str:
    """The char-by-char normalization loop (any input; the ASCII fast
    path above is differential-tested against this)."""
    out = []
    if limits:
        out.append(BLANK)
    rep = 0
    for u in _unicode_normalize(text, casefold=cfg.lc, stripmark=cfg.del_diac):
        if u.isspace():
            u = BLANK
        if cfg.del_punc and ispunct(u) and u not in ("@", "#", "_"):
            u = BLANK
        if cfg.group_emo and isemoji(u):
            u = "\U0001F47E"
        rep = rep + 1 if (out and u == out[-1]) else 0
        if cfg.del_dup and rep > 1:
            continue
        out.append(u)
    if limits:
        out.append(BLANK)
    return "".join(out)

"""Text preprocessing / tokenization configuration.

Semantics mirror the reference TextConfig
(/root/reference/src/textconfig.jl:59-106) and the token-transformation
hooks (/root/reference/src/tokentrans.jl:6-66), re-expressed as plain
picklable Python dataclasses so they can be broadcast into Spark
executors and embedded in pandas/Arrow UDF closures.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace
from typing import Optional, Sequence, Union


@dataclass(frozen=True, order=True)
class Skipgram:
    """qsize words with `skip` separation form one token
    (reference: src/textconfig.jl:10-16)."""

    qsize: int
    skip: int


class TokenTransformation:
    """Per-token rewrite/drop hooks (reference: src/tokentrans.jl:16-51).

    Each hook returns the (possibly rewritten) token, ``None`` to drop
    the occurrence, or a list of tokens to expand into.
    """

    def transform_unigram(self, tok: str):
        return tok

    def transform_nword(self, tok: str):
        return tok

    def transform_qgram(self, tok: str):
        return tok

    def transform_skipgram(self, tok: str):
        return tok

    def transform_collocation(self, tok: str):
        return tok


class IdentityTokenTransformation(TokenTransformation):
    pass


class IgnoreStopwords(TokenTransformation):
    """Drop unigrams found in a stopword set
    (reference: src/tokentrans.jl:56-62)."""

    def __init__(self, stopwords):
        self.stopwords = frozenset(stopwords)

    def transform_unigram(self, tok: str):
        return None if tok in self.stopwords else tok


class ChainTransformation(TokenTransformation):
    """Apply a list of transformations in order; a ``None`` short-circuits
    (reference: src/tokentrans.jl:64-66)."""

    def __init__(self, transformations: Sequence[TokenTransformation]):
        self.transformations = list(transformations)

    def _chain(self, method: str, tok):
        for tt in self.transformations:
            if tok is None:
                return None
            tok = getattr(tt, method)(tok)
        return tok

    def transform_unigram(self, tok):
        return self._chain("transform_unigram", tok)

    def transform_nword(self, tok):
        return self._chain("transform_nword", tok)

    def transform_qgram(self, tok):
        return self._chain("transform_qgram", tok)

    def transform_skipgram(self, tok):
        return self._chain("transform_skipgram", tok)

    def transform_collocation(self, tok):
        return self._chain("transform_collocation", tok)


_IDENTITY = IdentityTokenTransformation()


@dataclass(frozen=True)
class TextConfig:
    """Preprocessing + tokenization pipeline configuration.

    Defaults mirror the reference (src/textconfig.jl:59-73). If
    ``qlist``, ``nlist`` and ``slist`` are all empty the config defaults
    to ``nlist=(1,)`` (src/textconfig.jl:77-79); the lists are kept
    sorted (src/textconfig.jl:80-82).
    """

    del_diac: bool = True
    del_dup: bool = False
    del_punc: bool = False
    group_num: bool = True
    group_url: bool = True
    group_usr: bool = False
    group_emo: bool = False
    lc: bool = True
    collocations: int = 0
    mark_token_type: bool = True
    qlist: tuple = ()
    nlist: tuple = ()
    slist: tuple = ()
    tt: TokenTransformation = field(default=_IDENTITY, compare=False)

    def __post_init__(self):
        qlist = tuple(sorted(int(q) for q in self.qlist))
        nlist = tuple(sorted(int(n) for n in self.nlist))
        slist = tuple(
            sorted(s if isinstance(s, Skipgram) else Skipgram(*s) for s in self.slist)
        )
        if not qlist and not nlist and not slist:
            nlist = (1,)
        object.__setattr__(self, "qlist", qlist)
        object.__setattr__(self, "nlist", nlist)
        object.__setattr__(self, "slist", slist)

    def with_(self, **kwargs) -> "TextConfig":
        return replace(self, **kwargs)

    def to_json(self) -> str:
        d = {
            k: getattr(self, k)
            for k in (
                "del_diac del_dup del_punc group_num group_url group_usr "
                "group_emo lc collocations mark_token_type".split()
            )
        }
        d["qlist"] = list(self.qlist)
        d["nlist"] = list(self.nlist)
        d["slist"] = [[s.qsize, s.skip] for s in self.slist]
        return json.dumps(d, sort_keys=True)

    @classmethod
    def from_json(cls, s: Union[str, dict]) -> "TextConfig":
        d = json.loads(s) if isinstance(s, str) else dict(s)
        d["qlist"] = tuple(d.get("qlist", ()))
        d["nlist"] = tuple(d.get("nlist", ()))
        d["slist"] = tuple(Skipgram(*p) for p in d.get("slist", ()))
        return cls(**d)


@dataclass(frozen=True)
class BM25Params:
    """Okapi BM25+ parameters with the reference's precomputed constant
    folding (reference: src/bm25.jl:4-22)."""

    k1: float = 1.2
    b: float = 0.75
    delta: float = 1.0

    def fold(self, avg_doc_len: float, collection_size: int) -> "FoldedBM25":
        return FoldedBM25(
            k1_plus_1=self.k1 + 1.0,
            k1_mult_1_min_b=self.k1 * (1.0 - self.b),
            k1_mult_b_div_avgdl=(self.k1 * self.b / avg_doc_len) if avg_doc_len else 0.0,
            delta=self.delta,
            collection_size=int(collection_size),
        )


@dataclass(frozen=True)
class FoldedBM25:
    """Precomputed BM25 constants (reference: src/bm25.jl:14-22)."""

    k1_plus_1: float
    k1_mult_1_min_b: float
    k1_mult_b_div_avgdl: float
    delta: float
    collection_size: int

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @classmethod
    def from_json(cls, s: Union[str, dict]) -> "FoldedBM25":
        d = json.loads(s) if isinstance(s, str) else dict(s)
        return cls(**d)

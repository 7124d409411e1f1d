"""PySpark-native full-text indexing and BM25 retrieval engine.

Re-implements the capabilities of the reference library
(sadit/TextSearch.jl, read-only at /root/reference) as Spark
DataFrame plans plus vectorized Arrow/pandas UDF kernels. See README.md
for the capability inventory and SURVEY.md for the reference mapping.

Common entry points::

    from textsearch_spark import TextConfig, build_bm25_index
    from textsearch_spark.operators.wand import search_bm25_wand
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    BM25Params,
    ChainTransformation,
    IgnoreStopwords,
    Skipgram,
    TextConfig,
    TokenTransformation,
)
from .plans.build import BM25Index, build_bm25_index, filter_lists  # noqa: F401

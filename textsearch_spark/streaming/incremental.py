"""Incremental / streaming index maintenance.

The reference supports incremental vocabulary construction over a
generator in 2^16-doc blocks (src/voc.jl:78-104) and incremental
``append_items!`` into the inverted file (src/bm25invfile.jl:118-128).
The Spark-native equivalents:

- ``merge_vocab_increment``: batch-merge new docs into a persisted
  vocabulary table (the merge_voc groupBy-sum, src/updatevoc.jl:65-83);
- ``stream_vocab``: Structured Streaming ``foreachBatch`` wrapper that
  applies the same merge per micro-batch — each batch is one of the
  reference's buffered blocks. Works with any streaming source; tests
  drive it with a file source + availableNow trigger.

BM25 statistics (N, avgdl) are refreshed from the merged tallies, so a
full rebuild of postings stays a deterministic function of (vocab,
docs) — the checkpointed build (plans/checkpoint.py) picks up from
there for the heavyweight posting refresh.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import TextConfig
from ..operators.vocab import build_vocab, merge_vocab


def _read_state(spark: SparkSession, state_dir: str) -> Optional[DataFrame]:
    p = os.path.join(state_dir, "vocab")
    if os.path.isdir(p):
        spark.catalog.refreshByPath(p)
        return spark.read.parquet(p)
    return None


def _write_state(vocab: DataFrame, state_dir: str, corpuslen: int) -> None:
    import json

    os.makedirs(state_dir, exist_ok=True)
    # write-new-then-swap keeps readers of the old snapshot consistent
    tmp = os.path.join(state_dir, "vocab__new")
    vocab.write.mode("overwrite").parquet(tmp)
    final = os.path.join(state_dir, "vocab")
    if os.path.isdir(final):
        import shutil

        shutil.rmtree(final)
    os.replace(tmp, final)
    with open(os.path.join(state_dir, "state.json"), "w") as f:
        json.dump({"corpuslen": corpuslen}, f)


def read_corpuslen(state_dir: str) -> int:
    import json

    p = os.path.join(state_dir, "state.json")
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return json.load(f)["corpuslen"]


def merge_vocab_increment(new_docs: DataFrame, cfg: TextConfig, state_dir: str, *,
                          doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Merge one block of new docs into the persisted vocabulary;
    returns the merged vocabulary DataFrame."""
    spark = new_docs.sparkSession
    inc = build_vocab(new_docs, cfg, doc_col=doc_col, text_col=text_col)
    prev = _read_state(spark, state_dir)
    # the merged plan reads the old snapshot lazily; _write_state writes
    # to a sibling dir first and swaps, so the read stays consistent
    merged = merge_vocab(prev, inc) if prev is not None else inc
    n = read_corpuslen(state_dir) + new_docs.count()
    _write_state(merged, state_dir, n)
    return _read_state(spark, state_dir)


def stream_vocab(stream_df: DataFrame, cfg: TextConfig, state_dir: str, *,
                 checkpoint_dir: str, doc_col: str = "doc_id", text_col: str = "text",
                 trigger_available_now: bool = True):
    """readStream docs -> incremental vocabulary. Returns the started
    StreamingQuery; callers await it (availableNow processes the
    backlog then stops, mirroring block-buffered ingestion)."""

    def update(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_vocab_increment(batch_df, cfg, state_dir, doc_col=doc_col, text_col=text_col)

    writer = stream_df.writeStream.foreachBatch(update).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

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


def _load_meta(state_dir: str) -> dict:
    import json

    p = os.path.join(state_dir, "state.json")
    if not os.path.exists(p):
        return {"corpuslen": 0, "version": 0, "vocab_dir": None,
                "last_batch_id": None}
    with open(p) as f:
        meta = json.load(f)
    # legacy layout: a bare "vocab" dir with no pointer in state.json
    if "vocab_dir" not in meta:
        meta["vocab_dir"] = "vocab" if os.path.isdir(os.path.join(state_dir, "vocab")) else None
        meta.setdefault("version", 0)
        meta.setdefault("last_batch_id", None)
    return meta


def read_vocab_state(spark: SparkSession, state_dir: str) -> Optional[DataFrame]:
    """The committed vocabulary snapshot (None before the first merge)."""
    meta = _load_meta(state_dir)
    if meta["vocab_dir"] is None:
        return None
    p = os.path.join(state_dir, meta["vocab_dir"])
    spark.catalog.refreshByPath(p)
    return spark.read.parquet(p)


def _commit_state(vocab: DataFrame, state_dir: str, corpuslen: int,
                  version: int, batch_id, *, run_id=None,
                  prev_dir=None) -> None:
    """Versioned snapshot + pointer commit: the new vocabulary parquet
    lands in its own ``vocab_v{n}`` dir, then ``state.json`` (the
    pointer: dir, corpuslen, last applied batch id, streaming run id)
    is renamed in atomically. A crash anywhere leaves the previous
    pointer intact and consistent — corpuslen can never disagree with
    the vocabulary it describes, and the old snapshot is never deleted
    before the new one is committed (the rmtree-then-rename swap this
    replaces could lose the only snapshot).

    Reader grace window: the IMMEDIATELY superseded snapshot
    (``prev_dir``) survives this commit and is swept by the commit
    after it — a reader that resolved the old pointer and has a query
    in flight does not hit deleted files the instant the writer
    commits (same retention idea as the txnlog vacuum window). One
    version of grace, not MVCC: a reader that lags two commits behind
    a hot writer must re-resolve ``read_vocab_state``. Older
    leftovers (including crash debris) are swept here."""
    import json
    import shutil

    os.makedirs(state_dir, exist_ok=True)
    new_dir = f"vocab_v{version}"
    vocab.write.mode("overwrite").parquet(os.path.join(state_dir, new_dir))
    tmp = os.path.join(state_dir, "state.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"corpuslen": corpuslen, "version": version,
                   "vocab_dir": new_dir, "last_batch_id": batch_id,
                   "run_id": run_id}, f)
    os.replace(tmp, os.path.join(state_dir, "state.json"))  # commit point
    for d in os.listdir(state_dir):
        if (d.startswith("vocab_v") or d == "vocab") \
                and d != new_dir and d != prev_dir:
            shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)


def read_corpuslen(state_dir: str) -> int:
    return _load_meta(state_dir)["corpuslen"]


def merge_vocab_increment(new_docs: DataFrame, cfg: TextConfig, state_dir: str, *,
                          doc_col: str = "doc_id", text_col: str = "text",
                          batch_id=None, run_id=None,
                          on_unknown_run: str = "raise") -> DataFrame:
    """Merge one block of new docs into the persisted vocabulary;
    returns the merged vocabulary DataFrame.

    ``batch_id`` (monotonic, e.g. the streaming epoch) makes replays
    idempotent: a batch id already recorded in the committed state is
    skipped — without this, a foreachBatch retry would double-count
    occs/ndocs/corpuslen for the replayed docs. The replay guard is
    scoped to ``run_id`` (stream_vocab passes its checkpoint dir): a
    fresh checkpoint restarts epoch ids at 0, and treating those as
    replays of the OLD run would silently discard every new batch — a
    reused ``state_dir`` under a different run fails loudly instead."""
    from .append import _validate_on_unknown_run

    _validate_on_unknown_run(on_unknown_run)
    spark = new_docs.sparkSession
    meta = _load_meta(state_dir)
    if batch_id is not None and meta["last_batch_id"] is not None \
            and batch_id <= meta["last_batch_id"]:
        prior_run = meta.get("run_id")
        # one shared replay-vs-conflict decision with the index-append
        # guard (exact / pre-nonce path / same-nonce / pre-remote-fix
        # mangled forms; prior_run None raises unless the caller opted
        # into on_unknown_run="skip") — see append.is_replay_of
        from .append import is_replay_of

        if not is_replay_of(prior_run, run_id, on_unknown_run):
            hint = ("" if prior_run is not None else
                    "; if this IS the original pre-upgrade stream "
                    "resuming its own checkpoint, pass "
                    "on_unknown_run='skip' to accept the replay")
            raise ValueError(
                f"vocab state {state_dir} was last written by streaming "
                f"run {prior_run} (epoch {meta['last_batch_id']}); this "
                f"run ({run_id}) restarted epoch ids — resume the "
                "original checkpoint_dir, or start a fresh state_dir "
                f"(silently skipping would drop this batch's documents)"
                f"{hint}")
        return read_vocab_state(spark, state_dir)
    inc = build_vocab(new_docs, cfg, doc_col=doc_col, text_col=text_col)
    prev = read_vocab_state(spark, state_dir)
    # the merged plan reads the old snapshot lazily; _commit_state
    # writes the merge into a NEW version dir, so the read stays
    # consistent and the old snapshot survives until the commit
    merged = merge_vocab(prev, inc) if prev is not None else inc
    n = meta["corpuslen"] + new_docs.count()
    _commit_state(merged, state_dir, n, meta["version"] + 1, batch_id,
                  run_id=run_id if run_id is not None else meta.get("run_id"),
                  prev_dir=meta["vocab_dir"])
    return read_vocab_state(spark, state_dir)


def stream_vocab(stream_df: DataFrame, cfg: TextConfig, state_dir: str, *,
                 checkpoint_dir: str, doc_col: str = "doc_id", text_col: str = "text",
                 trigger_available_now: bool = True,
                 on_unknown_run: str = "raise"):
    """readStream docs -> incremental vocabulary. Returns the started
    StreamingQuery; callers await it (availableNow processes the
    backlog then stops, mirroring block-buffered ingestion). Epoch ids
    key the committed state, so replays are exactly-once. Run identity
    is bound to the checkpoint-dir INSTANCE (a nonce written on first
    use), so deleting and recreating the same checkpoint path is a NEW
    run — its epoch-0 replay fails loudly instead of being dropped."""
    from .append import _checkpoint_run_id, _validate_on_unknown_run

    _validate_on_unknown_run(on_unknown_run)
    run_id = _checkpoint_run_id(checkpoint_dir, stream_df.sparkSession)

    def update(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_vocab_increment(batch_df, cfg, state_dir, doc_col=doc_col,
                              text_col=text_col, batch_id=batch_id,
                              run_id=run_id, on_unknown_run=on_unknown_run)

    writer = stream_df.writeStream.foreachBatch(update).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

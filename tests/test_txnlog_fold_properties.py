"""Property tests for the transaction-log FOLD algebra (no Spark).

The folds (snapshot, high-water mark, fragmentation, batch-id dedupe)
and the checkpoint/log-vacuum pair are pure functions of the on-disk
log. Invariant under test: for ANY lifecycle sequence of entries,
inserting a checkpoint and pruning the superseded prefix changes NO
fold result — a checkpoint is semantically invisible. Hypothesis
drives randomized lifecycles; entries are published through the real
create-if-absent commit path into a real on-disk log.
"""

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from textsearch_spark.sources import txnlog as tx


def _publish_entry(path: str, doc: dict) -> None:
    log = tx.read_log(path)
    doc = dict(doc)
    doc["seq"] = (log[-1]["seq"] + 1) if log else 1
    doc["committed_at"] = 0.0
    assert tx._publish(tx._log_path(path, doc["seq"]), doc)


# one lifecycle step: an append (with block rows + docs), a compaction,
# or a checkpoint at that point
_STEP = st.one_of(
    st.tuples(st.just("append"), st.integers(1, 50), st.integers(0, 30)),
    st.just(("compact",)),
    st.just(("checkpoint",)),
)


def _build_log(path: str, steps) -> None:
    os.makedirs(os.path.join(path, tx.LOG_DIR), exist_ok=True)
    _publish_entry(path, {
        "op": "init", "add": {"postings": ["data/postings/init-0"],
                              "doclens": ["data/doclens/init-0"],
                              "blocks": ["data/blocks/init-0"]},
        "metrics": {"last_doc": 100, "n_block_rows": 40, "n_block_groups": 40},
    })
    n_appends = 0
    for step in steps:
        if step[0] == "append":
            _, ndocs, nrows = step
            hwm = tx.high_water_mark_txn(path)
            i = n_appends = n_appends + 1
            _publish_entry(path, {
                "op": "append", "batch_id": f"b{i}",
                "add": {"postings": [f"data/postings/append-{i}"],
                        "doclens": [f"data/doclens/append-{i}"],
                        "blocks": [f"data/blocks/append-{i}"]},
                "metrics": {"last_doc": hwm + ndocs, "n_block_rows": nrows,
                            "n_docs_appended": ndocs, "batch_id": f"b{i}"},
            })
        elif step[0] == "compact":
            snap = tx.snapshot(path)
            est = tx.fragmentation_estimate_txn(path)
            merged_rows = est["base_block_groups"] + est["append_block_rows"]
            _publish_entry(path, {
                "op": "compact",
                "add": {"blocks": [f"data/blocks/compact-{len(tx.read_log(path))}"]},
                "remove": {"blocks": snap["blocks"]},
                "metrics": {"last_doc": tx.high_water_mark_txn(path),
                            "n_block_rows": merged_rows,
                            "n_block_groups": merged_rows},
            })
        else:
            tx.checkpoint_txn(path)


def _fold_state(path: str):
    log = tx.read_log(path)
    batches = {e["metrics"]["batch_id"]
               for e in log if e["op"] == "append"}
    for e in log:
        if e["op"] == "checkpoint":
            batches |= set(e.get("append_metrics", {}))
    return (
        tx.snapshot(path),
        tx.high_water_mark_txn(path),
        tx.fragmentation_estimate_txn(path),
        {b: tx._find_append(log, b) for b in sorted(batches)},
    )


@settings(max_examples=40, deadline=None)
@given(steps=st.lists(_STEP, min_size=0, max_size=12))
def test_checkpoint_and_prefix_vacuum_are_fold_invisible(tmp_path_factory, steps):
    path = str(tmp_path_factory.mktemp("txnfold"))
    _build_log(path, steps)

    before = _fold_state(path)
    tx.checkpoint_txn(path)
    assert _fold_state(path) == before, "checkpoint changed a fold"

    pruned = tx.vacuum_log_txn(path, min_age_sec=0)
    log = tx.read_log(path)
    # everything before the final checkpoint is gone, nothing after
    assert log[0]["op"] == "checkpoint"
    assert len(pruned) + len(log) >= 2  # init + the checkpoint at least
    assert _fold_state(path) == before, "log vacuum changed a fold"

    # the lifecycle continues on the truncated log: one more append,
    # then every fold sees it exactly once
    hwm = tx.high_water_mark_txn(path)
    _publish_entry(path, {
        "op": "append", "batch_id": "tail",
        "add": {"postings": ["data/postings/append-tail"],
                "doclens": ["data/doclens/append-tail"],
                "blocks": ["data/blocks/append-tail"]},
        "metrics": {"last_doc": hwm + 5, "n_block_rows": 3,
                    "n_docs_appended": 5, "batch_id": "tail"},
    })
    assert tx.high_water_mark_txn(path) == hwm + 5
    snap = tx.snapshot(path)
    assert "data/postings/append-tail" in snap["postings"]
    est = tx.fragmentation_estimate_txn(path)
    assert est["n_appends"] == before[2]["n_appends"] + 1
    assert tx._find_append(tx.read_log(path), "tail")["n_docs_appended"] == 5

def _mk_entry(op, **kw):
    return {"op": op, **kw}


def test_checkpoint_is_noop_when_nothing_committed_since(tmp_path):
    """Idle maintenance must not churn the log: a checkpoint directly
    on top of another returns the existing entry, commits nothing."""
    path = str(tmp_path)
    os.makedirs(os.path.join(path, tx.LOG_DIR))
    _publish_entry(path, _mk_entry(
        "init", add={"blocks": ["data/blocks/init-0"]},
        metrics={"last_doc": 5, "n_block_rows": 2, "n_block_groups": 2}))
    first = tx.checkpoint_txn(path)
    again = tx.checkpoint_txn(path)
    assert again["seq"] == first["seq"]
    assert len(tx.read_log(path)) == 2  # init + ONE checkpoint


def test_log_vacuum_retention_gates_on_checkpoint_age(tmp_path):
    """The window is the CHECKPOINT's age: a fresh checkpoint over old
    entries must not let the default window prune anything (a reader
    listing taken seconds ago lacks the checkpoint), while an aged
    checkpoint releases the prefix."""
    path = str(tmp_path)
    os.makedirs(os.path.join(path, tx.LOG_DIR))
    _publish_entry(path, _mk_entry(
        "init", add={"blocks": ["data/blocks/init-0"]},
        metrics={"last_doc": 5, "n_block_rows": 2, "n_block_groups": 2}))
    # age the prefix entry far past any window
    old = tx._log_path(path, 1)
    os.utime(old, (1.0, 1.0))
    cp = tx.checkpoint_txn(path)
    assert tx.vacuum_log_txn(path) == []  # default 24h: checkpoint too young
    assert os.path.exists(old)
    # age the checkpoint -> the prefix becomes reclaimable
    os.utime(tx._log_path(path, cp["seq"]), (1.0, 1.0))
    assert tx.vacuum_log_txn(path) == [os.path.basename(old)]


def test_read_log_refuses_torn_suffix(tmp_path):
    """Entries that are not a dense run rooted at seq 1 or a checkpoint
    (e.g. a mid-log file deleted outside vacuum_log_txn) must raise,
    never fold silently into a wrong snapshot."""
    path = str(tmp_path)
    os.makedirs(os.path.join(path, tx.LOG_DIR))
    _publish_entry(path, _mk_entry(
        "init", add={"blocks": ["data/blocks/init-0"]},
        metrics={"last_doc": 5, "n_block_rows": 2, "n_block_groups": 2}))
    _publish_entry(path, _mk_entry(
        "append", batch_id="b1", add={"blocks": ["data/blocks/append-1"]},
        metrics={"last_doc": 9, "n_block_rows": 1, "batch_id": "b1"}))
    _publish_entry(path, _mk_entry(
        "append", batch_id="b2", add={"blocks": ["data/blocks/append-2"]},
        metrics={"last_doc": 12, "n_block_rows": 1, "batch_id": "b2"}))
    os.remove(tx._log_path(path, 1))  # baseless suffix: [2, 3]
    import pytest

    with pytest.raises(RuntimeError, match="torn transaction log"):
        tx.read_log(path)
    # a PREFIX-truncated log rooted at a checkpoint stays readable:
    # restore coherence by rooting the suffix at a checkpoint
    os.remove(tx._log_path(path, 2))
    with pytest.raises(RuntimeError):
        tx.read_log(path)  # [3] alone is still baseless
    os.remove(tx._log_path(path, 3))
    assert tx.read_log(path) == []  # empty log is coherent

"""The bench's stdout JSON line must fit the per-round recorder's
tail window.

The recorder keeps only the final ~2000 characters of bench output and
parses the last JSON line out of them. r04's full record outgrew that
window and was recorded truncated mid-line (`BENCH_r04.json` carries
`parsed: null` and a tail that starts inside the JSON). bench.py now
prints a SLIM line (raw per-rep arrays moved to a side file) — this
test pins the invariant against the heaviest real record we have, the
round-5 full validation run (two dense scaling pairs + a zipf pair +
3-rep headline legs), padded with a second zipf pair since that became
the default after the run was recorded.
"""

import copy
import json
import os

import bench

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(HERE, "BENCH", "r05_validation_run.json")


def _heaviest_record() -> dict:
    with open(RECORD) as f:
        full = json.load(f)
    # today's default is TWO zipf scaling pairs; the recorded run has
    # one — double it so the pinned bound covers the default shape
    zipf = full["scaling"]["zipf"]
    zipf["pairs"] = zipf["pairs"] * 2
    return full


def test_slim_line_fits_recorder_tail_window():
    full = _heaviest_record()
    line = json.dumps(bench.slim_output(
        full, os.path.join(HERE, "BENCH", "last_run_full.json")))
    # 2000 is the observed window; require real headroom so a few new
    # stages or wider floats can't silently regress past it
    assert len(line) < 1900, len(line)
    slim = json.loads(line)
    # nothing a reader of the round record needs may be dropped:
    assert slim["metric"] == full["metric"]
    assert slim["value"] == full["value"]
    assert slim["queries"] == {k: round(v, 3) for k, v in full["queries"].items()} or \
        slim["queries"] == full["queries"]
    t = slim["throughput"]
    assert "headline_reps" not in t
    for key in ("build_rows_per_sec", "naive_qps", "wand_qps"):
        assert t[key] == full["throughput"][key]
    assert t["zipf"]["wand_counters"] == full["throughput"]["zipf"]["wand_counters"]
    sc = slim["scaling"]
    assert sc["build_efficiency"] == full["scaling"]["build_efficiency"]
    assert sc["query_efficiency"] == full["scaling"]["query_efficiency"]
    assert sc["n_pairs"] == len(full["scaling"]["pairs"]) and "pairs" not in sc
    assert sc["zipf"]["query_efficiency"] == full["scaling"]["zipf"]["query_efficiency"]
    assert sc["zipf"]["n_pairs"] == 2
    assert slim["full"].endswith("last_run_full.json")


def test_slim_output_does_not_mutate_input():
    full = _heaviest_record()
    snapshot = copy.deepcopy(full)
    bench.slim_output(full)
    assert full == snapshot

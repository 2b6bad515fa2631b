"""Guards in the round-9 tool fixes (ADVICE items): bench_diff must
fail loudly on unrecognized artifacts and disjoint query sets instead
of KeyError/ZeroDivisionError, and session.fanout_width must derive
from the cluster with its documented floor."""

from __future__ import annotations

import importlib
import json
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

bench_diff = importlib.import_module("bench_diff")


def test_bench_diff_load_accepts_both_artifact_shapes(tmp_path):
    raw = tmp_path / "raw.json"
    raw.write_text(json.dumps({"queries": {"q1": 1.0}}))
    wrapped = tmp_path / "wrapped.json"
    wrapped.write_text(json.dumps({"parsed": {"queries": {"q1": 2.0}}}))
    assert bench_diff.load(str(raw)) == {"q1": 1.0}
    assert bench_diff.load(str(wrapped)) == {"q1": 2.0}


def test_bench_diff_load_rejects_unknown_shape(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"something": 1}))
    with pytest.raises(SystemExit) as e:
        bench_diff.load(str(bad))
    assert "unrecognized" in str(e.value)


def test_bench_diff_survives_disjoint_query_sets(tmp_path):
    a = tmp_path / "a.json"
    a.write_text(json.dumps({"queries": {"only_a": 1.0}}))
    b = tmp_path / "b.json"
    b.write_text(json.dumps({"queries": {"only_b": 2.0}}))
    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/bench_diff.py", str(a), str(b)],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr
    assert "no comparable ratio" in proc.stdout


def test_fanout_width_derives_from_parallelism():
    from mcp_rag_server_spark.session import fanout_width, get_spark

    spark = get_spark(app_name="fanout-test", cpus="8")
    # literal expectations, NOT re-derivations of the implementation:
    # local[8] -> defaultParallelism 8, at the floor exactly
    assert spark.sparkContext.defaultParallelism == 8
    assert fanout_width(spark) == 8
    # the floor protects tiny sessions from single-digit fan-out: with
    # parallelism 8, a floor of 64 must win outright
    assert fanout_width(spark, floor=64) == 64
    # and a floor below the parallelism must NOT cap the width
    assert fanout_width(spark, floor=2) == 8

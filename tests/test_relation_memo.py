"""Round-15 pin: the per-session relation memo in catalog.load_table.

load_table memoizes the RESOLVED RELATION (a lazy DataFrame handle)
per session, keyed on (path, size, mtime_ns) — metadata caching only,
the session-level listing/footer reuse guide §6 endorses. These tests
pin the contract that makes it safe:

1. HIT: the same (session, path) returns the same DataFrame object —
   no repeated footer/listing resolution.
2. INVALIDATION: a file rewritten in place (mtime or size moved) is
   re-resolved, so no stale relation can survive a fixture rewrite.
3. ISOLATION: different sf_dirs resolve to different relations.
4. NO DATA CACHING: the memoized frame is not persisted — its storage
   level is NONE, so every action still scans the parquet bytes.
"""

from __future__ import annotations

import os
import shutil

from conftest import SF0001, SF001

from mcp_rag_server_spark.catalog import load_table


def test_memo_returns_same_relation(spark):
    a = load_table(spark, SF0001, "orders")
    b = load_table(spark, SF0001, "orders")
    assert a is b


def test_memo_invalidates_on_rewrite(spark, tmp_path):
    d = str(tmp_path)
    shutil.copy(f"{SF0001}/orders.parquet", f"{d}/orders.parquet")
    a = load_table(spark, d, "orders")
    n_before = a.count()
    # rewrite in place with different content (the sf0.01 fixture)
    shutil.copy(f"{SF001}/orders.parquet", f"{d}/orders.parquet")
    os.utime(f"{d}/orders.parquet")
    b = load_table(spark, d, "orders")
    assert b is not a
    assert b.count() != n_before


def test_memo_is_per_directory(spark):
    a = load_table(spark, SF0001, "orders")
    b = load_table(spark, SF001, "orders")
    assert a is not b


def test_memo_does_not_persist_data(spark):
    df = load_table(spark, SF0001, "orders")
    assert df.storageLevel.useMemory is False
    assert df.storageLevel.useDisk is False

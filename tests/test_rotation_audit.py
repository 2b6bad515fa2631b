"""Unit tests for tools/rotation_audit.py's query-granular staleness.

The audit decides which driver-evidence rows to trust each round, so
its chain extraction must actually see the things that change query
results: the decorated function, inline oracle SQL in the decorator,
oracle constants referenced by name, same-file helpers, cross-file
helpers (module-level AND function-local deferred imports), and
module attribute references. A blind spot here silently re-labels a
stale row fresh — the exact failure the r8 verdict's item 3 exists to
prevent.
"""

from __future__ import annotations

import importlib
import sys

sys.path.insert(0, "/root/repo/tools")

rotation_audit = importlib.import_module("rotation_audit")
_Revision = rotation_audit._Revision
query_chain = rotation_audit.query_chain

WT = _Revision("WORKTREE")


def _chain(path: str, qname: str) -> str:
    c = query_chain(WT, path, qname)
    assert c is not None, f"chain unextractable for {qname}"
    return c


def test_chain_includes_decorated_function_and_inline_oracle():
    c = _chain("mcp_rag_server_spark/operators/relational.py", "tpch_q1")
    assert "def tpch_q1" in c
    assert "@register(" in c
    # the inline oracle SQL rides in the decorator segment
    assert "l_returnflag" in c


def test_chain_follows_oracle_constant_reference():
    # sim_kmeans_refine registers with oracle=_KM_ORACLE (a module
    # constant) — the constant's defining assignment must be included
    c = _chain(
        "mcp_rag_server_spark/operators/clustering.py", "sim_kmeans_refine"
    )
    assert "_KM_ORACLE" in c
    assert "c1e AS (" in c  # text from the constant's value


def test_chain_follows_function_local_deferred_import():
    # sim_knn_graph -> _cell_scored_half -> (function-local import)
    # clustering.cell_probes -> _centroids_from: all four must appear
    c = _chain(
        "mcp_rag_server_spark/operators/similarity.py", "sim_knn_graph"
    )
    for marker in (
        "similarity.py:_cell_scored_half",
        "clustering.py:cell_probes",
        "clustering.py:_centroids_from",
        "clustering.py:CELL_PROBES",
    ):
        assert f"mcp_rag_server_spark/operators/{marker}" in c, marker


def test_chain_follows_cross_file_helper():
    # emb_hash_embed's spark fn calls functions/embedding.py helpers
    # via module-level from-imports
    c = _chain("mcp_rag_server_spark/operators/embed.py", "emb_hash_embed")
    assert "mcp_rag_server_spark/functions/embedding.py:with_embedding" in c


def test_chain_is_revision_sensitive():
    # the round-8 snapshot predates the r9 cell-probe refinement: the
    # same query's chain must differ between that commit and HEAD, and
    # an untouched query's chain must not
    rcommits = rotation_audit.round_commits()
    assert 8 in rcommits
    snap = _Revision(rcommits[8])
    path = "mcp_rag_server_spark/operators/similarity.py"
    assert query_chain(snap, path, "sim_knn_graph") != _chain(
        path, "sim_knn_graph"
    )
    # untouched exemplar: rag_topk's chain has no edits since r8 AND no
    # dependency on functions/numeric.py (tpch_q6, the previous
    # exemplar, became legitimately stale when the r11 non-finite
    # contract changed duckdb_dsum — the audit catching that is the
    # behavior under test, so the exemplar moved, not the assert)
    rag = "mcp_rag_server_spark/operators/rag.py"
    assert query_chain(snap, rag, "rag_topk") == _chain(rag, "rag_topk")


def test_free_name_loads_respects_python_scoping():
    """Shadowed names (parameters, locals, loop/comprehension targets,
    nested-def locals) must NOT count as module references — they made
    rows spuriously stale; genuinely free names (module consts, helper
    calls, names closed over by nested functions) must."""
    import ast

    src = (
        "def q(spark, load_table):\n"
        "    helper = 1\n"
        "    x = helper + load_table\n"
        "    ys = [shadow * x for shadow in range(3)]\n"
        "    def inner(pdf):\n"
        "        return pdf + MODULE_CONST + x\n"
        "    for row in ys:\n"
        "        x += row\n"
        "    return other_helper(x) + shadow\n"
    )
    fn = ast.parse(src).body[0]
    free = {n.id for n in rotation_audit._free_name_loads(fn)}
    # free: module-scope resolutions (incl. from inside nested scopes)
    assert {"MODULE_CONST", "other_helper", "range", "shadow"} <= free
    # shadowed: params, locals, comp targets, for targets, nested names
    assert not {"load_table", "helper", "x", "ys", "pdf", "row", "inner"} & free


def test_nested_def_decorators_and_defaults_resolve_in_enclosing_scope():
    """Decorator/default/annotation expressions of a nested def
    evaluate in the ENCLOSING scope: a default naming a module symbol
    that collides with one of the nested function's own parameter names
    must still be counted free (advice r10 — the old behavior dropped
    it, the false-fresh direction)."""
    import ast

    src = (
        "def q(spark):\n"
        "    @module_deco\n"
        "    def inner(limit, cap=limit, tag=MODULE_TAG):\n"
        "        return cap + limit + tag\n"
        "    g = lambda x, y=MODULE_Y: x + y\n"
        "    return inner, g\n"
    )
    fn = ast.parse(src).body[0]
    free = {n.id for n in rotation_audit._free_name_loads(fn)}
    assert {"limit", "MODULE_TAG", "module_deco", "MODULE_Y"} <= free
    # the body's own uses of parameters stay shadowed
    assert not {"cap", "tag", "x", "y", "spark", "g"} & free


def test_chain_skips_value_neutral_session_names():
    """fanout_width (a repartition-WIDTH pick — partition count never
    affects per-row values) is name-excluded from chains; the rest of
    the chain is unaffected."""
    c = _chain(
        "mcp_rag_server_spark/operators/similarity.py", "sim_knn_graph"
    )
    assert "session.py:fanout_width" not in c
    assert "mcp_rag_server_spark/operators/similarity.py:_cell_scored_half" in c


def test_proposed_window_puts_not_green_rows_first():
    """A red row enters every window until green, UNCONDITIONALLY —
    even when its row is fresh. r10's red row (`agg_percentile_audit`)
    was fresh-but-red and the proposal relied on the fix edit staling
    its chain to pull it in; the cadence's freshness bar is a promise
    about GREEN evidence, so red must outrank everything including
    never-checked."""
    no_row = [("nc_b", "p.py"), ("nc_a", "p.py")]
    stale = [
        ("stale_green", 4, True, "p.py"),
        ("stale_red", 9, False, "p.py"),
    ]
    fresh = [
        ("fresh_red", 10, False, "p.py"),
        ("fresh_green_old", 3, True, "p.py"),
    ]
    w = rotation_audit.proposed_window(no_row, stale, fresh)
    assert w[:2] == ["fresh_red", "stale_red"]  # red first, name-sorted
    assert w[2:4] == ["nc_a", "nc_b"]  # then never-checked
    assert w[4:] == ["stale_green", "fresh_green_old"]  # then by vintage
    assert len(w) == len(set(w))  # red rows not re-listed in their tier
    # size cap still applies, red always survives the cut
    assert rotation_audit.proposed_window(no_row, stale, fresh, size=2) == [
        "fresh_red",
        "stale_red",
    ]


def test_every_registry_query_is_extractable():
    """No query may fall out of the evidence audit: the @register
    decorator with a literal name must be AST-visible for all 302."""
    from mcp_rag_server_spark.registry import load_all
    import os

    bad = []
    for name, spec in load_all().items():
        mod = sys.modules[spec.spark_fn.__module__]
        path = os.path.relpath(mod.__file__, "/root/repo")
        if query_chain(WT, path, name) is None:
            bad.append(name)
    assert bad == [], bad

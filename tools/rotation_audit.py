"""Audit driver-check staleness and propose the next DRIVER_PRIORITY.

The external driver hash-checks only a 50-query prefix of
``ordered_registry()`` per round, so each query's hard correctness
evidence ages whenever its implementation changes after its last
checked round (VERDICT r2, "What's missing" #1). This tool computes,
for every registry query:

- the latest round with a CORRECTNESS_r{N}.json row (and its verdict);
- whether the query's OWN LOGIC changed after that round's snapshot
  commit (=> the row is STALE);

and prints a risk-ordered candidate list for the next round's window:
(a) no driver row at all, (b) row exists but stale, (c) fresh rows by
age. Run it at the start of each round before editing DRIVER_PRIORITY.

Staleness is QUERY-GRANULAR (r8 verdict item 3). A query's logic is
the concatenated source of: its ``@register``-decorated function
(decorators included, so inline oracle SQL counts), plus — resolved
transitively, across package files — every module-level assignment or
function the decorator expression or any included segment references
(oracle constant strings, SQL-builder helpers, shared stages like
``_cell_scored_half``/``cell_probes``). The same extraction runs
against the round-snapshot commit (``git show``) and the working
tree; differing text => stale. This replaces the r4-r8 whole-file
import-closure mtime heuristic, which marked all ~150 queries in a
file stale whenever ANY query in it changed (156 stale at r8 close;
the truthful list is the queries whose own chain changed).

Known coarseness that remains: a segment is included only if it is
reachable by NAME reference from the query's chain within the
package; dynamic dispatch (getattr, registry lookups) and
out-of-package behavior (Spark/DuckDB upgrades) are invisible.
registry.py and catalog.py are excluded wholesale (shared plumbing
that changes every round; the in-session 302-query replay covers
them); session.py participates normally EXCEPT the specific
value-neutral names in _NAME_EXCLUDE.

Usage: python tools/rotation_audit.py [--verbose]
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mcp_rag_server_spark.registry import load_all  # noqa: E402


def round_rows() -> dict[str, tuple[int, bool]]:
    """query -> (latest round with a row, fully green in that round)."""
    out: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        for name, row in data.items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            out[name] = (rnd, green)
    return out


def round_commits() -> dict[int, str]:
    """round -> commit hash of the driver's 'round N: verdict/...'
    commit (the snapshot the round's correctness rows describe)."""
    log = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    commits: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            commits[int(m.group(1))] = sha
    return commits


#: Excluded from logic chains: registry.py changes every round by
#: design (the DRIVER_PRIORITY rotation lives there) and its decorator
#: machinery does not touch query results; catalog is load plumbing
#: every query shares (a change there ages ALL 302 rows equally — the
#: in-session full replay, not the driver rotation, is the check that
#: catches it).
_CHAIN_EXCLUDE = {
    "mcp_rag_server_spark/registry.py",
    "mcp_rag_server_spark/catalog.py",
}

#: Specific names excluded from chains (file, name): value-neutral by
#: contract — fanout_width only picks a repartition WIDTH (partition
#: count never affects per-row values; pinned by
#: tests/test_registry_invariants.py). ensure_session_confs is NOT
#: excluded: it pins spark.sql.session.timeZone (every timestamp
#: conversion) and parquet nanosAsLong (how events.ts reads) — a
#: change there must age its consumers. Unlike the r9 whole-module
#: exclusion of session.py, any other session.py symbol a query chain
#: reaches now ages its consumers normally.
_NAME_EXCLUDE = {
    ("mcp_rag_server_spark/session.py", "fanout_width"),
}

_PKG = "mcp_rag_server_spark"


class _FileIndex:
    """Parsed top-level structure of one module file at one revision:
    name -> (segment text, referenced names), plus the import map."""

    def __init__(self, text: str):
        self.ok = True
        try:
            tree = ast.parse(text)
        except SyntaxError:
            self.ok = False
            return
        lines = text.splitlines(keepends=True)

        def seg(node) -> str:
            start = node.lineno
            decs = getattr(node, "decorator_list", [])
            if decs:
                start = min([start] + [d.lineno for d in decs])
            return "".join(lines[start - 1 : node.end_lineno])

        self.defs: dict[str, tuple[str, ast.AST]] = {}
        self.imports: dict[str, str] = {}  # local name -> dotted module
        self.register_of: dict[str, str] = {}  # query name -> func name
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.defs[node.name] = (seg(node), node)
                for dec in getattr(node, "decorator_list", []):
                    qname = self._register_name(dec)
                    if qname is not None:
                        self.register_of[qname] = node.name
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                targets = (
                    node.targets
                    if isinstance(node, ast.Assign)
                    else [node.target]
                )
                for t in targets:
                    if isinstance(t, ast.Name):
                        self.defs[t.id] = (seg(node), node)
            elif isinstance(node, ast.ImportFrom) and node.module:
                if node.module.startswith(_PKG):
                    for alias in node.names:
                        self.imports[alias.asname or alias.name] = (
                            f"{node.module}.{alias.name}"
                        )
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith(_PKG):
                        self.imports[alias.asname or alias.name] = alias.name

    @staticmethod
    def _register_name(dec: ast.AST) -> str | None:
        if not isinstance(dec, ast.Call):
            return None
        fname = getattr(dec.func, "id", getattr(dec.func, "attr", None))
        if fname != "register":
            return None
        if dec.args and isinstance(dec.args[0], ast.Constant):
            return dec.args[0].value
        for kw in dec.keywords:
            if kw.arg == "name" and isinstance(kw.value, ast.Constant):
                return kw.value.value
        return None


class _Revision:
    """Lazy file reader + index cache for one revision ('WORKTREE' or a
    commit hash)."""

    def __init__(self, rev: str):
        self.rev = rev
        self._idx: dict[str, _FileIndex | None] = {}
        self._exists: dict[str, bool] = {}

    def exists(self, relpath: str) -> bool:
        """File existence AT THIS REVISION — resolving a snapshot's
        imports against today's worktree silently drops segments when
        a helper was since renamed (and vice versa)."""
        if self.rev == "WORKTREE":
            return os.path.exists(os.path.join(REPO, relpath))
        if relpath not in self._exists:
            self._exists[relpath] = (
                subprocess.run(
                    ["git", "cat-file", "-e", f"{self.rev}:{relpath}"],
                    cwd=REPO,
                    capture_output=True,
                ).returncode
                == 0
            )
        return self._exists[relpath]

    def index(self, relpath: str) -> _FileIndex | None:
        if relpath in self._idx:
            return self._idx[relpath]
        text: str | None = None
        if self.rev == "WORKTREE":
            try:
                with open(
                    os.path.join(REPO, relpath), encoding="utf-8"
                ) as f:
                    text = f.read()
            except OSError:
                text = None
        else:
            proc = subprocess.run(
                ["git", "show", f"{self.rev}:{relpath}"],
                cwd=REPO,
                capture_output=True,
                text=True,
            )
            text = proc.stdout if proc.returncode == 0 else None
        idx = _FileIndex(text) if text is not None else None
        if idx is not None and not idx.ok:
            idx = None
        self._idx[relpath] = idx
        return idx


def _module_file(rev: _Revision, dotted: str) -> str | None:
    rel = dotted.replace(".", "/")
    for cand in (rel + ".py", rel + "/__init__.py"):
        if rev.exists(cand):
            return cand
    return None


def _resolve_import(rev: _Revision, dotted: str) -> tuple[str, str | None] | None:
    """'pkg.mod.name' -> (file, defined name) or (file, None) for a
    whole-module import; None when outside the repo/package. Resolved
    against ``rev``'s file set, not the worktree's."""
    f = _module_file(rev, dotted)
    if f is not None:
        return (f, None)
    mod, _, name = dotted.rpartition(".")
    f = _module_file(rev, mod)
    if f is not None:
        return (f, name)
    return None


#: AST nodes that open a new Python scope: their bindings shadow the
#: enclosing function chain, and (for our purpose) their bodies are
#: analyzed with the enclosing bindings in effect.
_SCOPE_NODES = (
    ast.FunctionDef,
    ast.AsyncFunctionDef,
    ast.Lambda,
    ast.ListComp,
    ast.SetComp,
    ast.DictComp,
    ast.GeneratorExp,
    ast.ClassDef,
)


def _outer_scope_exprs(fn: ast.AST) -> list[ast.AST]:
    """Expressions that sit syntactically inside a def/lambda but
    evaluate in the ENCLOSING scope: decorators, parameter defaults,
    and annotations. Python binds the function's own parameters only
    for its body — a default naming a module symbol that collides with
    one of the function's parameters still resolves to the module."""
    exprs: list[ast.AST] = []
    if isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
        exprs += fn.decorator_list
        if fn.returns is not None:
            exprs.append(fn.returns)
    a = fn.args
    exprs += [d for d in a.defaults if d is not None]
    exprs += [d for d in a.kw_defaults if d is not None]
    for arg in (
        a.posonlyargs
        + a.args
        + a.kwonlyargs
        + ([a.vararg] if a.vararg else [])
        + ([a.kwarg] if a.kwarg else [])
    ):
        if arg.annotation is not None:
            exprs.append(arg.annotation)
    return exprs


def _scope_bindings(scope: ast.AST) -> tuple[set[str], list[ast.AST]]:
    """(names bound directly in ``scope``, child nodes belonging to this
    scope — nested scope nodes included as single entries, their insides
    not). Bindings: parameters, comprehension targets, Store/Del names
    (assignments, for/with/except/walrus targets), nested def/class
    statement names. ``global``/``nonlocal`` declarations un-bind (the
    name resolves outward). Import aliases are deliberately NOT counted:
    the caller routes them through its local-import map."""
    bound: set[str] = set()
    unbound: set[str] = set()
    children: list[ast.AST] = []
    outer_ids: set[int] = set()
    if isinstance(scope, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
        a = scope.args
        for arg in (
            a.posonlyargs
            + a.args
            + a.kwonlyargs
            + ([a.vararg] if a.vararg else [])
            + ([a.kwarg] if a.kwarg else [])
        ):
            bound.add(arg.arg)
        # decorator / default / annotation expressions evaluate in the
        # ENCLOSING scope, not this one — exclude their subtrees here;
        # _free_name_loads scans them with the enclosing bindings.
        outer_ids = {id(e) for e in _outer_scope_exprs(scope)}
    if isinstance(scope, (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)):
        for comp in scope.generators:
            for n in ast.walk(comp.target):
                if isinstance(n, ast.Name):
                    bound.add(n.id)
    stack = [
        c for c in ast.iter_child_nodes(scope) if id(c) not in outer_ids
    ]
    while stack:
        n = stack.pop()
        if id(n) in outer_ids:
            continue
        children.append(n)
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            bound.add(n.name)
            continue  # nested scope: its own bindings don't leak out
        if isinstance(n, _SCOPE_NODES):
            continue
        if isinstance(n, ast.Name) and isinstance(n.ctx, (ast.Store, ast.Del)):
            bound.add(n.id)
        elif isinstance(n, ast.ExceptHandler) and n.name:
            bound.add(n.name)
        elif isinstance(n, (ast.Global, ast.Nonlocal)):
            unbound.update(n.names)
        stack.extend(ast.iter_child_nodes(n))
    return bound - unbound, children


def _free_name_loads(root: ast.AST) -> list[ast.Name]:
    """Name(Load) nodes inside ``root`` whose identifier is not bound
    anywhere in the enclosing scope chain within ``root`` — i.e. names
    that resolve to module scope under LEGB. Shadowed names (function
    parameters, locals, loop/comprehension targets) are skipped, so a
    parameter that happens to share a module-level def's name no longer
    drags that def into the logic chain (spurious staleness). Class
    scopes are approximated as ordinary enclosing scopes (slightly
    over-shadows for methods; operator modules are function-based)."""
    out: list[ast.Name] = []

    def scan_expr(expr: ast.AST, avail: frozenset[str]) -> None:
        # An enclosing-scope expression (decorator/default/annotation):
        # walk it under `avail`; a nested scope inside it (e.g. a lambda
        # used as a default) opens its own scope from here.
        stack = [expr]
        while stack:
            n = stack.pop()
            if isinstance(n, _SCOPE_NODES):
                visit(n, avail)
                continue
            if (
                isinstance(n, ast.Name)
                and isinstance(n.ctx, ast.Load)
                and n.id not in avail
            ):
                out.append(n)
            stack.extend(ast.iter_child_nodes(n))

    def visit(scope: ast.AST, enclosing: frozenset[str]) -> None:
        if isinstance(
            scope, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)
        ):
            # decorators/defaults/annotations evaluate OUTSIDE the
            # function's own bindings (advice r10: a default naming a
            # module symbol shadowed by a parameter was dropped from
            # the chain — the false-fresh direction).
            for e in _outer_scope_exprs(scope):
                scan_expr(e, enclosing)
        bound, children = _scope_bindings(scope)
        avail = enclosing | bound
        for n in children:
            if isinstance(n, _SCOPE_NODES):
                visit(n, avail)
            elif (
                isinstance(n, ast.Name)
                and isinstance(n.ctx, ast.Load)
                and n.id not in avail
            ):
                out.append(n)

    visit(root, frozenset())
    return out


def query_chain(rev: _Revision, relpath: str, qname: str) -> str | None:
    """Concatenated source segments of query ``qname``'s logic chain at
    one revision, or None when the query/file is absent there."""
    root = rev.index(relpath)
    if root is None or qname not in root.register_of:
        return None
    segments: list[str] = []
    visited: set[tuple[str, str]] = set()

    def include(path: str, name: str) -> None:
        if (
            (path, name) in visited
            or path in _CHAIN_EXCLUDE
            or (path, name) in _NAME_EXCLUDE
        ):
            return
        visited.add((path, name))
        idx = rev.index(path)
        if idx is None:
            return
        if name in idx.defs:
            seg_text, node = idx.defs[name]
            segments.append(f"# {path}:{name}\n" + seg_text)
            # function-LOCAL imports (the deferred-import idiom used to
            # break module cycles, e.g. _cell_scored_half importing
            # clustering.cell_probes inside its body) resolve like
            # module-level ones, shadowing them in this subtree
            local_imports = dict(idx.imports)
            for sub in ast.walk(node):
                if isinstance(sub, ast.ImportFrom) and sub.module and (
                    sub.module.startswith(_PKG)
                ):
                    for alias in sub.names:
                        local_imports[alias.asname or alias.name] = (
                            f"{sub.module}.{alias.name}"
                        )
                elif isinstance(sub, ast.Import):
                    for alias in sub.names:
                        if alias.name.startswith(_PKG):
                            local_imports[alias.asname or alias.name] = (
                                alias.name
                            )
            # scope-aware reference extraction: only Name loads that
            # resolve OUTSIDE the function (module scope under LEGB)
            # count — a parameter or local that shadows a module-level
            # def must not drag that def into the chain (it made rows
            # spuriously stale; never false-fresh, but noisy).
            free = _free_name_loads(node)
            free_ids = {id(nm) for nm in free}
            for nm in free:
                if nm.id in idx.defs:
                    include(path, nm.id)
                elif nm.id in local_imports:
                    tgt = _resolve_import(rev, local_imports[nm.id])
                    if tgt and tgt[1]:
                        include(tgt[0], tgt[1])
            for sub in ast.walk(node):
                if (
                    isinstance(sub, ast.Attribute)
                    and isinstance(sub.value, ast.Name)
                    and id(sub.value) in free_ids
                ):
                    # module.attr where module was imported (and the
                    # module name itself is not shadowed locally)
                    dotted = local_imports.get(sub.value.id)
                    if dotted:
                        tgt = _resolve_import(
                            rev, f"{dotted}.{sub.attr}"
                        )
                        if tgt and tgt[1]:
                            include(tgt[0], tgt[1])

    include(relpath, root.register_of[qname])
    return "".join(segments)


def audit(verbose: bool = False):
    """Classify every registry query's driver evidence. Returns
    (n_registry, no_row, stale, fresh): no_row = [(name, path)],
    stale/fresh = [(name, round, green, path)]."""
    reg = load_all()
    rows = round_rows()
    rcommits = round_commits()
    worktree = _Revision("WORKTREE")
    snapshots: dict[int, _Revision] = {}
    no_row, stale, fresh = [], [], []
    for name, spec in reg.items():
        mod = sys.modules[spec.spark_fn.__module__]
        path = os.path.relpath(mod.__file__, REPO)
        if name not in rows:
            no_row.append((name, path))
            continue
        rnd, green = rows[name]
        if rnd not in rcommits:
            fresh.append((name, rnd, green, path))
            continue
        snap = snapshots.setdefault(rnd, _Revision(rcommits[rnd]))
        now_chain = query_chain(worktree, path, name)
        then_chain = query_chain(snap, path, name)
        is_stale = (
            now_chain is None
            or then_chain is None
            or now_chain != then_chain
        )
        if verbose and is_stale:
            why = (
                "chain unextractable"
                if now_chain is None or then_chain is None
                else f"chain text differs ({len(then_chain)} -> "
                f"{len(now_chain)} chars)"
            )
            print(f"STALE {name}: {why}")
        (stale if is_stale else fresh).append((name, rnd, green, path))
    return len(reg), no_row, stale, fresh


def proposed_window(no_row, stale, fresh, size: int = 50) -> list[str]:
    """The deterministic next driver window (COVERAGE.md 'Rotation
    cadence'): NOT-GREEN rows first unconditionally (a red row enters
    every window until green — even a fresh red row must not wait for
    its fix edit to stale the chain; r10 lesson: the freshness bar is a
    promise about green evidence, not about evidence), then
    never-checked queries, then stale logic chains (oldest evidence
    first), then oldest-evidence fresh rows — name order breaking ties
    throughout."""
    red = sorted(
        {n for n, _, green, _ in list(stale) + list(fresh) if not green}
    )
    window = list(red)
    window += [n for n, _ in sorted(no_row) if n not in red]
    window += [
        n
        for n, _, _, _ in sorted(stale, key=lambda t: (t[1], t[0]))
        if n not in red
    ]
    window += [
        n
        for n, _, _, _ in sorted(fresh, key=lambda t: (t[1], t[0]))
        if n not in red
    ]
    return window[:size]


def main() -> None:
    verbose = "--verbose" in sys.argv
    n_reg, no_row, stale, fresh = audit(verbose=verbose)

    print(f"registry queries: {n_reg}")
    print(f"\n(a) NO driver row ({len(no_row)}):")
    for name, path in sorted(no_row):
        print(f"  {name}  [{path}]")
    print(
        f"\n(b) row STALE — query logic changed after its round"
        f" ({len(stale)}):"
    )
    for name, rnd, green, path in sorted(stale, key=lambda t: (t[1], t[0])):
        mark = "green" if green else "NOT GREEN"
        print(f"  {name}  r{rnd} {mark}  [{path}]")
    not_green = [t for t in fresh if not t[2]]
    if not_green:
        print(f"\n(!) fresh but NOT GREEN ({len(not_green)}):")
        for name, rnd, green, path in not_green:
            print(f"  {name}  r{rnd}  [{path}]")
    by_round: dict[int, int] = {}
    for _, rnd, _, _ in fresh:
        by_round[rnd] = by_round.get(rnd, 0) + 1
    print(f"\n(c) fresh rows by round: {dict(sorted(by_round.items()))}")
    window = proposed_window(no_row, stale, fresh)
    print("\nproposed 50-query window (edit registry.DRIVER_PRIORITY):")
    for i, name in enumerate(window):
        print(f"  {i + 1:2d}. {name}")


if __name__ == "__main__":
    main()

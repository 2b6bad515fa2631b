"""Audit driver-check staleness and propose the next DRIVER_PRIORITY.

The external driver hash-checks only a 50-query prefix of
``ordered_registry()`` per round, so each query's hard correctness
evidence ages whenever its implementation changes after its last
checked round (VERDICT r2, "What's missing" #1). This tool computes,
for every registry query:

- the latest round with a CORRECTNESS_r{N}.json row (and its verdict);
- whether the file defining the query changed in git AFTER that round's
  snapshot commit (=> the row is STALE);

and prints a risk-ordered candidate list for the next round's window:
(a) no driver row at all, (b) row exists but stale, (c) fresh rows by
age. Run it at the start of each round before editing DRIVER_PRIORITY.

Usage: python tools/rotation_audit.py
"""

from __future__ import annotations

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


def round_commit_times() -> dict[int, int]:
    """round -> unix time of the driver's 'round N: verdict/...' commit
    (the snapshot the round's correctness rows describe)."""
    log = subprocess.run(
        ["git", "log", "--format=%ct %s"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    times: dict[int, int] = {}
    for line in log.splitlines():
        ct, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            times[int(m.group(1))] = int(ct)
    return times


def file_last_change(path: str) -> int:
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", path],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    return int(out) if out else 0


_IMPORT_RE = re.compile(
    r"^(?:from|import)\s+(mcp_rag_server_spark[.\w]*)"
    r"(?:\s+import\s+\(?([\w,\s]+)\)?)?",
    re.M,
)


def _module_file(dotted: str) -> str | None:
    """mcp_rag_server_spark.functions.vector -> its repo-relative .py
    path (package __init__ if it names a package)."""
    rel = dotted.replace(".", os.sep)
    for cand in (rel + ".py", os.path.join(rel, "__init__.py")):
        if os.path.exists(os.path.join(REPO, cand)):
            return cand
    return None


#: Excluded from staleness closures: registry.py changes every round by
#: design (the DRIVER_PRIORITY rotation lives there) and its decorator
#: machinery does not touch query results — including it would mark the
#: whole registry permanently stale and destroy the signal.
_CLOSURE_EXCLUDE = {os.path.join("mcp_rag_server_spark", "registry.py")}


def dep_closure(path: str, cache: dict[str, set[str]]) -> set[str]:
    """Transitive in-package import closure of a module file. A query's
    driver row describes the whole code path it executes, so a change to
    catalog.py/session.py/functions/* ages every query that imports them
    (the round-4 lesson: the events.ts encoding change lived in
    catalog.py while every ev_*/st_* row pointed at unchanged files)."""
    if path in _CLOSURE_EXCLUDE:
        return set()
    if path in cache:
        return cache[path]
    cache[path] = {path}  # cycle guard
    closure = {path}
    try:
        with open(os.path.join(REPO, path), encoding="utf-8") as f:
            src = f.read()
    except OSError:
        return closure
    for m in _IMPORT_RE.finditer(src):
        dotted, names = m.group(1), m.group(2)
        targets = [dotted]
        if names:  # "from pkg import a, b" where a/b may be modules
            targets += [
                f"{dotted}.{n.strip()}" for n in names.split(",") if n.strip()
            ]
        for t in targets:
            dep = _module_file(t)
            if dep and dep != path:
                closure |= dep_closure(dep, cache)
    cache[path] = closure
    return closure


def main() -> None:
    reg = load_all()
    rows = round_rows()
    rtimes = round_commit_times()
    changed: dict[str, int] = {}
    closures: dict[str, set[str]] = {}
    no_row, stale, fresh = [], [], []
    for name, spec in reg.items():
        mod = sys.modules[spec.spark_fn.__module__]
        path = os.path.relpath(mod.__file__, REPO)
        if name not in rows:
            no_row.append((name, path))
            continue
        rnd, green = rows[name]
        # A row from round N describes the whole code path at round N's
        # snapshot commit: the query ages when its defining file OR any
        # in-package module it (transitively) imports changed later.
        newest, culprit = 0, path
        for dep in dep_closure(path, closures):
            if dep not in changed:
                changed[dep] = file_last_change(dep)
            if changed[dep] > newest:
                newest, culprit = changed[dep], dep
        is_stale = rnd in rtimes and newest > rtimes[rnd]
        label = path if culprit == path else f"{path} via {culprit}"
        (stale if is_stale else fresh).append((name, rnd, green, label))

    print(f"registry queries: {len(reg)}")
    print(f"\n(a) NO driver row ({len(no_row)}):")
    for name, path in sorted(no_row):
        print(f"  {name}  [{path}]")
    print(f"\n(b) row STALE — file changed after its round ({len(stale)}):")
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
    window = [n for n, _ in sorted(no_row)]
    window += [n for n, _, _, _ in sorted(stale, key=lambda t: (t[1], t[0]))]
    oldest_first = sorted(fresh, key=lambda t: (t[1], t[0]))
    window += [n for n, _, _, _ in oldest_first]
    print("\nproposed 50-query window (edit registry.DRIVER_PRIORITY):")
    for i, name in enumerate(window[:50]):
        print(f"  {i + 1:2d}. {name}")


if __name__ == "__main__":
    main()

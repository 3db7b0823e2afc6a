"""Staleness detection for the driver sweep (verdict r4 #4).

A query whose driver row went green in round N but whose code changed
afterwards carries a STALE green: the recorded pass predates the current
behavior. ``__spark_entry__._coverage_order`` uses this module to put such
queries right after the never-green tier so the driver's first-N sample
re-verifies them.

"Code that earned the green" is recovered from git, no snapshot file
needed: the driver commits ``CORRECTNESS_r{N}.json`` in an artifacts-only
commit, so the PARENT of the commit that last touched that file is exactly
the tree the driver evaluated. A query's digest is the sha256 over its
defining module's bytes plus every first-level
``datamodel_clinicaldata_spark.*`` module that file imports (textual scan
— operator edits must mark their dependent queries stale). Digest at the
green rev != digest in the working tree → stale.

Conservative on failure: any git/IO error marks the name stale (re-verify
rather than trust an unverifiable green).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import subprocess
from functools import lru_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG = "datamodel_clinicaldata_spark"
_IMPORT_RE = re.compile(
    rf"^\s*(?:from\s+({_PKG}(?:\.[\w.]+)?)\s+import|import\s+({_PKG}(?:\.[\w.]+)?))",
    re.M,
)


def _git(*args: str) -> str | None:
    try:
        out = subprocess.run(
            ["git", "-C", REPO, *args],
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    return out.stdout.strip() if out.returncode == 0 else None


@lru_cache(maxsize=None)
def _green_rev(corr_path: str) -> str | None:
    """Rev whose tree the driver evaluated for this CORRECTNESS file:
    parent of the commit that last touched it (the driver's artifacts-only
    commit). Falls back to the touching commit itself if it has no parent."""
    rel = os.path.relpath(corr_path, REPO)
    touch = _git("log", "-1", "--format=%H", "--", rel)
    if not touch:
        return None
    parent = _git("rev-parse", f"{touch}^")
    return parent or touch


@lru_cache(maxsize=None)
def _blob(rev: str | None, relpath: str) -> bytes | None:
    """File bytes at rev (None → working tree)."""
    if rev is None:
        try:
            with open(os.path.join(REPO, relpath), "rb") as f:
                return f.read()
        except OSError:
            return None
    out = subprocess.run(
        ["git", "-C", REPO, "show", f"{rev}:{relpath}"],
        capture_output=True,
        timeout=30,
    )
    return out.stdout if out.returncode == 0 else None


def _module_files(fn) -> list[str] | None:
    """Repo-relative paths: the function's defining module plus its
    first-level intra-package imports (textual scan of the module source,
    resolved at working-tree state — the dependency SET moving is itself a
    change that the main module digest catches)."""
    mod = getattr(fn, "__module__", None)
    if not mod or not mod.startswith(_PKG):
        return None
    main = mod.replace(".", "/") + ".py"
    body = _blob(None, main)
    if body is None:
        return None
    files = {main}
    for m in _IMPORT_RE.finditer(body.decode("utf-8", "replace")):
        name = m.group(1) or m.group(2)
        cand = name.replace(".", "/") + ".py"
        pkg_init = name.replace(".", "/") + "/__init__.py"
        for p in (cand, pkg_init):
            if os.path.exists(os.path.join(REPO, p)):
                files.add(p)
                break
    return sorted(files)


def _drop_functions(text: str, drop: set[str]) -> str:
    """Delete the source segments (including decorators — i.e. the
    @register oracle SQL) of the named top-level functions. Deletion, not
    blanking: an appended unrelated function must not move the digest.
    Falls back to the full text on parse failure (coarser = safer)."""
    import ast

    try:
        tree = ast.parse(text)
    except SyntaxError:
        return text
    lines = text.splitlines(keepends=True)
    kill: set[int] = set()
    for node in tree.body:
        if (
            isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
            and node.name in drop
        ):
            start = min(
                [d.lineno for d in node.decorator_list] + [node.lineno]
            ) - 1
            kill.update(range(start, node.end_lineno))
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            # Top-level import statements are reachability wiring, not
            # behavior: a module-level `from ...joins import asof_join`
            # would put `asof_join` in EVERY query's token set and keep it
            # reachable for queries that never call it. The imported
            # functions' bodies are still digested when a kept function
            # actually references them.
            kill.update(range(node.lineno - 1, node.end_lineno))
    return "".join(l for i, l in enumerate(lines) if i not in kill)


_TOKEN_RE = re.compile(r"[A-Za-z_]\w*")


def _strip_comments_docstrings(text: str) -> str:
    """Drop ``#`` comments and docstrings before hashing: a doc-only edit
    must not mark a query stale (it cannot change behavior), or polish
    burns driver re-verification slots. Oracle SQL is NOT a docstring —
    it is a decorator argument — so it stays in the digest. Comments go
    via tokenize (string-literal-safe); docstrings via ast (the leading
    constant-string statement of a module/function/class body). Falls
    back to the unstripped text on any parse failure."""
    import ast
    import io
    import tokenize

    try:
        toks = [
            t
            for t in tokenize.generate_tokens(io.StringIO(text).readline)
            if t.type != tokenize.COMMENT
        ]
        text = tokenize.untokenize(toks)
        tree = ast.parse(text)
    except (SyntaxError, tokenize.TokenError, ValueError, IndexError):
        return text
    lines = text.splitlines(keepends=True)
    kill: set[int] = set()
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(
                node,
                (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
            )
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            kill.update(range(body[0].lineno - 1, body[0].end_lineno))
    return "".join(l for i, l in enumerate(lines) if i not in kill)


def _reachable_reduction(text: str, tokens: set[str]) -> str:
    """Reduce an imported helper module to the top-level functions
    transitively referenced from ``tokens`` (identifiers appearing in the
    query's own kept source), plus all non-function module-level code.
    An operator edit then stales only the queries that actually reach it,
    not every query in a file that happens to import the module."""
    import ast

    try:
        tree = ast.parse(text)
    except SyntaxError:
        return text
    fns = {
        node.name: node
        for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
    }
    lines = text.splitlines(keepends=True)

    def seg(node) -> str:
        start = min([d.lineno for d in node.decorator_list] + [node.lineno]) - 1
        return "".join(lines[start:node.end_lineno])

    kept: set[str] = set()
    frontier = {n for n in fns if n in tokens}
    while frontier:
        kept |= frontier
        new_tokens: set[str] = set()
        for n in frontier:
            new_tokens |= set(_TOKEN_RE.findall(seg(fns[n])))
        frontier = {n for n in fns if n not in kept and n in new_tokens}
    return _drop_functions(text, set(fns) - kept)


def _digest(
    files: list[str],
    rev: str | None,
    main: str | None = None,
    keep_fn: str | None = None,
    all_fns: set[str] | None = None,
) -> str | None:
    h = hashlib.sha256()
    reduced: dict[str, str] = {}
    main_tokens: set[str] = set()
    for p in files:
        body = _blob(rev, p)
        if body is None:
            return None
        text = body.decode("utf-8", "replace")
        if p == main and keep_fn and all_fns:
            text = _drop_functions(text, all_fns - {keep_fn})
            main_tokens = set(_TOKEN_RE.findall(text))
        reduced[p] = text
    for p in files:
        text = reduced[p]
        if p != main and main_tokens:
            text = _reachable_reduction(text, main_tokens)
        text = _strip_comments_docstrings(text)
        # blank-line normalization: deleted segments leave their separator
        # blank lines behind, which would make an appended unrelated
        # function move the digest
        text = "".join(l for l in text.splitlines(keepends=True) if l.strip())
        h.update(p.encode())
        h.update(b"\0")
        h.update(text.encode())
    return h.hexdigest()


def last_green_rounds() -> dict[str, str]:
    """name -> CORRECTNESS path of its most recent fully-green row."""
    best: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                if name not in best or rnd > best[name][0]:
                    best[name] = (rnd, path)
    return {n: p for n, (_, p) in best.items()}


def stale_greens(queries: dict) -> set[str]:
    """Names with a green row whose code has changed since that green
    (or whose green-time code cannot be recovered)."""
    greens = last_green_rounds()
    # module -> function names of all registered queries defined there
    by_module: dict[str, set[str]] = {}
    for fn in queries.values():
        mod = getattr(fn, "__module__", "")
        if mod.startswith(_PKG):
            by_module.setdefault(mod, set()).add(fn.__name__)
    stale: set[str] = set()
    for name, corr_path in greens.items():
        fn = queries.get(name)
        if fn is None:
            continue
        files = _module_files(fn)
        if files is None:
            stale.add(name)
            continue
        main = fn.__module__.replace(".", "/") + ".py"
        all_fns = by_module.get(fn.__module__, set())
        rev = _green_rev(corr_path)
        then = (
            _digest(files, rev, main, fn.__name__, all_fns) if rev else None
        )
        now = _digest(files, None, main, fn.__name__, all_fns)
        if then is None or now is None or then != now:
            stale.add(name)
    return stale


def coverage_table() -> str:
    """Markdown two-column shadow map for COVERAGE.md: every registered
    query → latest fully-green driver round (``rN``, with ``*`` when the
    code changed since that green) or ``local`` (never driver-green;
    passing the identical gate in tools/oracle_check.py)."""
    import sys

    sys.path.insert(0, REPO)
    from datamodel_clinicaldata_spark.registry import QUERIES

    greens = last_green_rounds()
    stale = stale_greens(dict(QUERIES))

    def cell(name: str) -> str:
        if name not in greens:
            return "local"
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", greens[name])
        tag = f"r{int(m.group(1))}" if m else "r?"
        return tag + ("\\*" if name in stale else "")

    names = sorted(QUERIES)
    half = (len(names) + 1) // 2
    left, right = names[:half], names[half:]
    lines = ["| query | latest green | query | latest green |", "|---|---|---|---|"]
    for i in range(half):
        l = f"| {left[i]} | {cell(left[i])} "
        r = (
            f"| {right[i]} | {cell(right[i])} |"
            if i < len(right)
            else "| | |"
        )
        lines.append(l + r)
    return "\n".join(lines)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, REPO)
    from datamodel_clinicaldata_spark.registry import QUERIES

    if "--coverage-table" in sys.argv:
        print(coverage_table())
        raise SystemExit(0)
    greens = last_green_rounds()
    stale = stale_greens(dict(QUERIES))
    never = [n for n in QUERIES if n not in greens]
    print(f"registered: {len(QUERIES)}")
    print(f"never-green ({len(never)}): {sorted(never)}")
    print(f"stale-green ({len(stale)}): {sorted(stale)}")

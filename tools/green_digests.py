"""Staleness detection for the driver sweep (verdict r4 #4).

A query whose driver row went green in round N but whose code changed
afterwards carries a STALE green: the recorded pass predates the current
behavior. ``__spark_entry__._coverage_order`` uses this module to put such
queries right after the never-green tier so the driver's first-N sample
re-verifies them.

"Code that earned the green" is recovered from git, no snapshot file
needed: the driver commits ``CORRECTNESS_r{N}.json`` in an artifacts-only
commit, so the PARENT of the commit that last touched that file is exactly
the tree the driver evaluated.

Digests are PER QUERY, not per module (verdict r6 #2): the digest hashes
the AST slice reachable from the query's own decorated ``def`` — the
function segment itself (decorators included, so the @register oracle SQL
is in), plus every top-level function / class / module-level constant in
the defining module that the slice transitively references, plus, for each
first-level ``datamodel_clinicaldata_spark.*`` module the defining module
imports, the reachable top-level functions/constants there (helper files
the query never reaches contribute nothing and are skipped entirely).
Imports are resolved at EACH revision's text, so a module gaining a new
import for some other query's benefit does not stale this one. Editing
query A's body therefore never stales query B in the same module (pinned
by tests/test_tools.py). Digest at the green rev != digest in the working
tree → stale.

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
        # Driver artifacts from the in-progress round sit uncommitted in
        # the worktree until the round-close commit; the tree the driver
        # evaluated is HEAD, not "unknown" (VERDICT r7 #3) — without this
        # fallback every name in an uncommitted CORRECTNESS file was
        # conservatively staled.
        if os.path.exists(corr_path):
            return _git("rev-parse", "HEAD")
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


def _import_paths(text: str) -> list[str]:
    """Candidate repo-relative paths of the first-level intra-package
    imports named in ``text`` (both module.py and package/__init__.py
    candidates; existence is checked per-revision by the caller)."""
    out: list[str] = []
    for m in _IMPORT_RE.finditer(text):
        name = m.group(1) or m.group(2)
        out.append(name.replace(".", "/") + ".py")
        out.append(name.replace(".", "/") + "/__init__.py")
    return out


_TOKEN_RE = re.compile(r"[A-Za-z_]\w*")


def _node_names(node) -> set[str]:
    """Top-level names a statement DEFINES (function/class name, assign
    targets). Imports return empty — import wiring is reachability, not
    behavior (the imported functions' bodies are digested via the helper
    file's own reduction when actually referenced)."""
    import ast

    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return {node.name}
    names: set[str] = set()
    if isinstance(node, ast.Assign):
        for t in node.targets:
            for n in ast.walk(t):
                if isinstance(n, ast.Name):
                    names.add(n.id)
    elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
        for n in ast.walk(node.target):
            if isinstance(n, ast.Name):
                names.add(n.id)
    return names


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


def _reachable_slice(text: str, seed: set[str]) -> tuple[str, set[str]]:
    """Reduce a module to the top-level statements transitively reachable
    from ``seed`` (a set of identifiers), by fixpoint: keep a statement
    when a name it defines is in the closure; on keep, add every
    identifier token of its source segment (decorators included — for a
    @register'd query that pulls the oracle SQL into the digest) to the
    closure. Returns (kept source in original order, final closure).

    Token-based reachability over-approximates (a shared identifier keeps
    a statement the query never calls) — safe direction: at worst an
    unrelated edit re-verifies a green, never the reverse. Falls back to
    the full text on parse failure (coarser = safer)."""
    import ast

    try:
        tree = ast.parse(text)
    except SyntaxError:
        return text, set(seed) | set(_TOKEN_RE.findall(text))
    lines = text.splitlines(keepends=True)

    def seg(node) -> str:
        start = min(
            [d.lineno for d in getattr(node, "decorator_list", [])]
            + [node.lineno]
        ) - 1
        return "".join(lines[start:node.end_lineno])

    nodes = [(n, _node_names(n)) for n in tree.body]
    closure = set(seed)
    kept: set[int] = set()
    changed = True
    while changed:
        changed = False
        for i, (node, names) in enumerate(nodes):
            if i in kept or not (names & closure):
                continue
            kept.add(i)
            closure |= set(_TOKEN_RE.findall(seg(node)))
            changed = True
    out = "".join(seg(nodes[i][0]) for i in sorted(kept))
    return out, closure


def _digest_from_texts(fn_name: str, main_path: str, get_text) -> str | None:
    """Per-query digest over a revision snapshot. ``get_text(path)``
    returns that revision's source text or None if absent. The digest
    covers: the query function's reachable slice of its own module, plus
    the slice of each first-level intra-package import that the closure
    actually reaches (unreached helper files contribute nothing, and
    imports are resolved from THIS revision's text — a module gaining an
    import for another query's benefit does not stale this one)."""
    main_text = get_text(main_path)
    if main_text is None:
        return None
    main_kept, closure = _reachable_slice(main_text, {fn_name})
    if not main_kept.strip():
        return None  # query not defined at this revision

    h = hashlib.sha256()

    def add(path: str, text: str) -> None:
        text = _strip_comments_docstrings(text)
        # blank-line normalization: deleted segments leave separator blank
        # lines behind, which would make unrelated layout edits move the
        # digest
        text = "".join(l for l in text.splitlines(keepends=True) if l.strip())
        h.update(path.encode())
        h.update(b"\0")
        h.update(text.encode())

    add(main_path, main_kept)

    # Helper fixpoint (ADVICE r7): a kept helper slice's own closure is
    # fed back as seeds and that helper's imports join the candidate set,
    # so helper1.f -> helper2.g chains (and helpers imported only by
    # helpers) are digested too — previously a one-hop reduction could
    # leave a green digest unchanged under a transitively-reached edit
    # (under-staling, the unsafe direction). Iterates until neither the
    # closure nor the candidate list grows; helper slices are added in
    # sorted-path order so the digest is insertion-order-independent.
    cl = closure - {fn_name}
    candidates: list[str] = []
    for p in _import_paths(main_text):
        if p != main_path and p not in candidates:
            candidates.append(p)
    texts: dict[str, str | None] = {}
    kept_slices: dict[str, str] = {}
    changed = True
    while changed:
        changed = False
        for p in list(candidates):
            if p not in texts:
                texts[p] = get_text(p)
            helper_text = texts[p]
            if helper_text is None:
                continue
            kept, kept_cl = _reachable_slice(helper_text, cl)
            if not kept.strip():
                continue
            if kept_slices.get(p) != kept:
                kept_slices[p] = kept
                changed = True
            new = kept_cl - cl
            if new:
                cl |= new
                changed = True
            for ip in _import_paths(helper_text):
                if ip != main_path and ip not in candidates:
                    candidates.append(ip)
                    changed = True
    for p in sorted(kept_slices):
        add(p, kept_slices[p])
    return h.hexdigest()


def _query_digest(fn, rev: str | None) -> str | None:
    mod = getattr(fn, "__module__", None)
    if not mod or not mod.startswith(_PKG):
        return None
    main = mod.replace(".", "/") + ".py"

    def get_text(path: str) -> str | None:
        body = _blob(rev, path)
        return None if body is None else body.decode("utf-8", "replace")

    return _digest_from_texts(fn.__name__, main, get_text)


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
    stale: set[str] = set()
    for name, corr_path in greens.items():
        fn = queries.get(name)
        if fn is None:
            continue
        rev = _green_rev(corr_path)
        then = _query_digest(fn, rev) if rev else None
        now = _query_digest(fn, None)
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

"""The staleness probe (tools/green_digests.py) decides which already-green
queries the driver re-verifies first, so its reductions must have exactly
the sensitivity they claim: an edit to query X stales X (and only X among
the module's queries); an edit to a helper X reaches stales X; an appended
unrelated function stales nothing."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from green_digests import (  # noqa: E402
    _TOKEN_RE,
    _drop_functions,
    _reachable_reduction,
)

MODULE = '''\
"""docstring"""
from pyspark.sql import functions as F
from datamodel_clinicaldata_spark.operators.joins import asof_join

HELPER_CONST = 7


def _shared_helper(x):
    return x + HELPER_CONST


@register("query_a", "SELECT 1")
def query_a(spark, sf_dir):
    return _shared_helper(1)


@register("query_b", "SELECT 2")
def query_b(spark, sf_dir):
    return asof_join(2)
'''


def _norm(text: str) -> str:
    return "".join(l for l in text.splitlines(keepends=True) if l.strip())


def test_drop_functions_removes_other_query_and_decorator():
    reduced = _drop_functions(MODULE, {"query_b"})
    assert "query_b" not in reduced
    assert "SELECT 2" not in reduced  # decorator (oracle SQL) goes too
    assert "query_a" in reduced and "_shared_helper" in reduced


def test_drop_functions_removes_top_level_imports():
    reduced = _drop_functions(MODULE, set())
    # module-level import wiring must not leak `asof_join` into every
    # query's token set
    assert "from datamodel_clinicaldata_spark" not in reduced
    assert "from pyspark" not in reduced


def test_appended_function_does_not_move_reduction():
    before = _norm(_drop_functions(MODULE, {"query_b"}))
    appended = MODULE + '\n\n@register("query_c", "SELECT 3")\ndef query_c(spark, sf_dir):\n    return 3\n'
    after = _norm(_drop_functions(appended, {"query_b", "query_c"}))
    assert before == after


def test_edit_to_kept_query_moves_reduction():
    edited = MODULE.replace("return _shared_helper(1)", "return _shared_helper(2)")
    assert _drop_functions(MODULE, {"query_b"}) != _drop_functions(
        edited, {"query_b"}
    )


HELPERS = '''\
"""ops module"""


def used_directly(x):
    return used_transitively(x)


def used_transitively(x):
    return x * 2


def unrelated(x):
    return x - 1
'''


def test_reachable_reduction_keeps_transitive_closure():
    main = _drop_functions(MODULE, {"query_b"})
    tokens = set(_TOKEN_RE.findall(main + "\nused_directly"))
    reduced = _reachable_reduction(HELPERS, tokens)
    assert "used_directly" in reduced
    assert "used_transitively" in reduced  # reached via used_directly
    assert "def unrelated" not in reduced


def test_reachable_reduction_drops_everything_unreferenced():
    tokens = {"nothing_here"}
    reduced = _reachable_reduction(HELPERS, tokens)
    assert "def " not in reduced
    assert '"""ops module"""' in reduced  # module-level code stays


def test_strip_comments_and_docstrings():
    from green_digests import _strip_comments_docstrings

    a = '"""module doc"""\n\ndef f(x):\n    """doc v1"""\n    # comment v1\n    return x + 1\n'
    b = '"""module doc CHANGED"""\n\ndef f(x):\n    """doc v2 much longer"""\n    # other comment\n    return x + 1\n'
    c = a.replace("x + 1", "x + 2")
    norm = lambda t: "".join(
        l for l in _strip_comments_docstrings(t).splitlines(keepends=True) if l.strip()
    )
    assert norm(a) == norm(b)  # doc/comment edits invisible
    assert norm(a) != norm(c)  # code edits visible


def test_strip_keeps_oracle_sql_decorator_strings():
    from green_digests import _strip_comments_docstrings

    src = '@register("q", "SELECT 1 AS x")\ndef q(s, d):\n    """doc"""\n    return 1\n'
    out = _strip_comments_docstrings(src)
    assert "SELECT 1 AS x" in out
    assert "doc" not in out

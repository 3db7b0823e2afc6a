"""The staleness probe (tools/green_digests.py) decides which already-green
queries the driver re-verifies first, so its per-query digests must have
exactly the sensitivity they claim: an edit to query A's body stales A and
ONLY A among the module's queries; an edit to a helper A reaches stales A;
doc/comment edits and appended unrelated functions stale nothing; a module
gaining an import for another query's benefit stales nothing."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from green_digests import (  # noqa: E402
    _digest_from_texts,
    _reachable_slice,
    _strip_comments_docstrings,
)

MAIN = "datamodel_clinicaldata_spark/queries_fake.py"
HELPER = "datamodel_clinicaldata_spark/operators/fakeops.py"

MODULE = '''\
"""docstring"""
from pyspark.sql import functions as F
from datamodel_clinicaldata_spark.operators.fakeops import used_directly

HELPER_CONST = 7


def _shared_helper(x):
    return x + HELPER_CONST


@register("query_a", "SELECT 1")
def query_a(spark, sf_dir):
    return _shared_helper(1)


@register("query_b", "SELECT 2")
def query_b(spark, sf_dir):
    return used_directly(2)
'''

HELPERS = '''\
"""ops module"""
import os

_OPS_CONST = 3


def used_directly(x):
    return used_transitively(x)


def used_transitively(x):
    return x * _OPS_CONST


def unrelated(x):
    return x - 1
'''


def _digest(fn_name, texts):
    return _digest_from_texts(fn_name, MAIN, lambda p: texts.get(p))


BASE = {MAIN: MODULE, HELPER: HELPERS}


def test_edit_query_a_stales_only_query_a():
    edited = dict(BASE)
    edited[MAIN] = MODULE.replace(
        "return _shared_helper(1)", "return _shared_helper(2)"
    )
    assert _digest("query_a", BASE) != _digest("query_a", edited)
    # the pin: B's digest must not move when only A's body changed
    assert _digest("query_b", BASE) == _digest("query_b", edited)


def test_edit_oracle_sql_stales_its_query():
    edited = dict(BASE)
    edited[MAIN] = MODULE.replace('"SELECT 1"', '"SELECT 1 AS one"')
    assert _digest("query_a", BASE) != _digest("query_a", edited)
    assert _digest("query_b", BASE) == _digest("query_b", edited)


def test_edit_shared_module_constant_stales_its_users():
    edited = dict(BASE)
    edited[MAIN] = MODULE.replace("HELPER_CONST = 7", "HELPER_CONST = 8")
    # query_a reaches HELPER_CONST via _shared_helper; query_b never does
    assert _digest("query_a", BASE) != _digest("query_a", edited)
    assert _digest("query_b", BASE) == _digest("query_b", edited)


def test_edit_helper_module_stales_only_reaching_query():
    edited = dict(BASE)
    edited[HELPER] = HELPERS.replace("x * _OPS_CONST", "x * _OPS_CONST + 1")
    # used_transitively is reached from query_b via used_directly
    assert _digest("query_b", BASE) != _digest("query_b", edited)
    assert _digest("query_a", BASE) == _digest("query_a", edited)


def test_edit_unreached_helper_function_stales_nothing():
    edited = dict(BASE)
    edited[HELPER] = HELPERS.replace("return x - 1", "return x - 2")
    assert _digest("query_a", BASE) == _digest("query_a", edited)
    assert _digest("query_b", BASE) == _digest("query_b", edited)


def test_appended_query_stales_nothing():
    edited = dict(BASE)
    edited[MAIN] = (
        MODULE
        + '\n\n@register("query_c", "SELECT 3")\ndef query_c(spark, sf_dir):\n'
        "    return 3\n"
    )
    assert _digest("query_a", BASE) == _digest("query_a", edited)
    assert _digest("query_b", BASE) == _digest("query_b", edited)


def test_new_import_for_another_query_stales_nothing():
    # module gains an import (and a new query using it) — existing
    # queries' digests must not move, even though the import line changes
    # the module text and the imported file may not exist at old revs
    edited = dict(BASE)
    edited[MAIN] = MODULE.replace(
        "from datamodel_clinicaldata_spark.operators.fakeops import used_directly",
        "from datamodel_clinicaldata_spark.operators.fakeops import used_directly\n"
        "from datamodel_clinicaldata_spark.operators.newops import brand_new",
    )
    edited["datamodel_clinicaldata_spark/operators/newops.py"] = (
        "def brand_new(x):\n    return x\n"
    )
    assert _digest("query_a", BASE) == _digest("query_a", edited)
    assert _digest("query_b", BASE) == _digest("query_b", edited)


def test_doc_and_comment_edits_stale_nothing():
    edited = dict(BASE)
    edited[MAIN] = MODULE.replace('"""docstring"""', '"""docstring CHANGED"""')
    edited[HELPER] = HELPERS.replace(
        '"""ops module"""', '"""ops module CHANGED"""\n# a new comment'
    )
    assert _digest("query_a", BASE) == _digest("query_a", edited)
    assert _digest("query_b", BASE) == _digest("query_b", edited)


HELPER2 = "datamodel_clinicaldata_spark/operators/fakeops2.py"


def test_helper_to_helper_edit_stales_reaching_query():
    """ADVICE r7 fixpoint pin: helper1.f calls helper2.g (both imported
    by the query module) — an edit to helper2.g must stale the query
    that reaches it through helper1, and only that query."""
    main = MODULE.replace(
        "from datamodel_clinicaldata_spark.operators.fakeops import used_directly",
        "from datamodel_clinicaldata_spark.operators.fakeops import used_directly\n"
        "from datamodel_clinicaldata_spark.operators.fakeops2 import deep_fn",
    )
    helpers1 = HELPERS.replace(
        "return used_transitively(x)", "return deep_fn(used_transitively(x))"
    )
    base = {MAIN: main, HELPER: helpers1, HELPER2: "def deep_fn(x):\n    return x\n"}
    edited = dict(base)
    edited[HELPER2] = "def deep_fn(x):\n    return x + 1\n"
    assert _digest("query_b", base) != _digest("query_b", edited)
    assert _digest("query_a", base) == _digest("query_a", edited)


def test_helper_only_imported_by_helper_is_digested():
    """Transitive-import pin: helper2 is imported ONLY by helper1 (the
    query module never names it) — an edit there must still stale the
    query reaching it through helper1's kept slice."""
    helpers1 = HELPERS.replace(
        "import os",
        "from datamodel_clinicaldata_spark.operators.fakeops2 import deep_fn",
    ).replace("return used_transitively(x)", "return deep_fn(used_transitively(x))")
    base = {MAIN: MODULE, HELPER: helpers1, HELPER2: "def deep_fn(x):\n    return x\n"}
    edited = dict(base)
    edited[HELPER2] = "def deep_fn(x):\n    return x * 3\n"
    assert _digest("query_b", base) != _digest("query_b", edited)
    assert _digest("query_a", base) == _digest("query_a", edited)


def test_missing_main_module_is_none():
    assert _digest("query_a", {HELPER: HELPERS}) is None


def test_undefined_query_is_none():
    assert _digest("query_zzz", BASE) is None


def test_reachable_slice_transitive_closure():
    kept, closure = _reachable_slice(HELPERS, {"used_directly"})
    assert "def used_directly" in kept
    assert "def used_transitively" in kept  # reached via used_directly
    assert "_OPS_CONST = 3" in kept  # constant reached via used_transitively
    assert "def unrelated" not in kept
    assert "import os" not in kept  # import wiring is not behavior


def test_strip_comments_and_docstrings():
    a = '"""module doc"""\n\ndef f(x):\n    """doc v1"""\n    # comment v1\n    return x + 1\n'
    b = '"""module doc CHANGED"""\n\ndef f(x):\n    """doc v2 much longer"""\n    # other\n    return x + 1\n'
    c = a.replace("x + 1", "x + 2")
    norm = lambda t: "".join(
        l
        for l in _strip_comments_docstrings(t).splitlines(keepends=True)
        if l.strip()
    )
    assert norm(a) == norm(b)  # doc/comment edits invisible
    assert norm(a) != norm(c)  # code edits visible


def test_strip_keeps_oracle_sql_decorator_strings():
    src = '@register("q", "SELECT 1 AS x")\ndef q(s, d):\n    """doc"""\n    return 1\n'
    out = _strip_comments_docstrings(src)
    assert "SELECT 1 AS x" in out
    assert "doc" not in out

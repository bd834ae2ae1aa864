"""EquivalenceProperties: classes, constants, orderings
(reference: physical-expr/src/equivalence/properties.rs tests)."""
import numpy as np
import pytest

import datafusion_tpu as df
from datafusion_tpu.physical.equivalence import EquivalenceProperties

A = ("a@0", True, False)
B = ("b@1", True, False)
C = ("c@2", True, False)


def plan_text(ctx, q):
    return "\n".join(ctx.sql("EXPLAIN " + q).to_pydict()["plan"])


def test_class_merge_and_normalize():
    p = EquivalenceProperties()
    p.add_equal("a@0", "b@1")
    p.add_equal("c@2", "d@3")
    p.add_equal("b@1", "c@2")   # merges both classes
    assert len(p.classes) == 1 and len(p.classes[0]) == 4
    assert p.normalize_key("d@3") == p.normalize_key("a@0")


def test_constant_propagates_across_class():
    p = EquivalenceProperties()
    p.add_constant("a@0")
    p.add_equal("a@0", "b@1")
    assert p.is_constant("b@1")
    # and the other direction: equal first, constant second
    p2 = EquivalenceProperties()
    p2.add_equal("x@0", "y@1")
    p2.add_constant("y@1")
    assert p2.is_constant("x@0")


def test_ordering_satisfied_via_class():
    p = EquivalenceProperties(orderings=[[A]])
    p.add_equal("a@0", "b@1")
    assert p.ordering_satisfied([B])
    assert not p.ordering_satisfied([("b@1", False, False)])  # direction


def test_ordering_satisfied_skips_constants():
    p = EquivalenceProperties(orderings=[[B]])
    p.add_constant("a@0")
    assert p.ordering_satisfied([A, B])          # const prefix
    assert p.ordering_satisfied([B, A])          # const suffix
    assert p.satisfied_prefix([A, B, C]) == 2


def test_all_constant_requirement_needs_no_ordering():
    p = EquivalenceProperties()
    p.add_constant("a@0")
    assert p.ordering_satisfied([A])


def test_project_aliases_form_class_and_map_orderings():
    p = EquivalenceProperties(orderings=[[A, B]])
    out = p.project([("a@0", "x@0"), ("a@0", "y@1"), ("b@1", "z@2")])
    assert out.ordering_satisfied([("x@0", True, False), ("z@2", True, False)])
    # duplicate aliases of one source are equal
    assert out.normalize_key("x@0") == out.normalize_key("y@1")
    # key with no surviving alias truncates the ordering (prefix rule)
    out2 = p.project([("b@1", "z@2")])
    assert out2.orderings == []


def test_join_combines_and_shifts():
    left = EquivalenceProperties()
    left.add_constant("a@0")
    right = EquivalenceProperties()
    right.add_equal("u@0", "v@1")
    j = EquivalenceProperties.join(left, right, 2,
                                   on_pairs=[("b@1", "u@2")])
    assert j.is_constant("a@0")
    assert j.normalize_key("b@1") == j.normalize_key("v@3")


# ---- end-to-end: the EnforceSorting analog consults the properties -------

def _ctx():
    ctx = df.SessionContext()
    ctx.register_arrays("t", {"a": np.array([3, 1, 2, 5, 4]),
                              "b": np.array([3, 1, 2, 5, 4]),
                              "c": np.arange(5.0)})
    return ctx


def test_sort_elided_through_filter_equality():
    ctx = _ctx()
    q = ("SELECT * FROM (SELECT a, b, c FROM t WHERE a = b ORDER BY a) "
         "ORDER BY b")
    assert plan_text(ctx, q).count("SortExec") == 1
    assert ctx.sql(q).to_pydict()["b"] == [1, 2, 3, 4, 5]


def test_sort_elided_with_constant_prefix():
    ctx = _ctx()
    q = ("SELECT * FROM (SELECT a, c FROM t WHERE a = 3 ORDER BY c) "
         "ORDER BY a, c")
    assert plan_text(ctx, q).count("SortExec") == 1
    assert ctx.sql(q).to_pydict() == {"a": [3], "c": [0.0]}


def test_sort_elided_through_projection_alias():
    ctx = _ctx()
    q = "SELECT * FROM (SELECT a AS x FROM t ORDER BY a) ORDER BY x"
    assert plan_text(ctx, q).count("SortExec") == 1
    assert ctx.sql(q).to_pydict()["x"] == [1, 2, 3, 4, 5]


def test_direction_mismatch_not_elided():
    ctx = _ctx()
    q = ("SELECT * FROM (SELECT a, b FROM t WHERE a = b ORDER BY a) "
         "ORDER BY b DESC")
    assert plan_text(ctx, q).count("SortExec") == 2
    assert ctx.sql(q).to_pydict()["b"] == [5, 4, 3, 2, 1]

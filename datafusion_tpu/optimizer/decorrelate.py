"""Subquery decorrelation.

Reference parity:
* DecorrelatePredicateSubquery
  (`optimizer/src/decorrelate_predicate_subquery.rs`) — EXISTS / IN
  predicates become LeftSemi / LeftAnti joins whose keys are the pulled-up
  correlated equalities.
* ScalarSubqueryToJoin (`optimizer/src/scalar_subquery_to_join.rs`) —
  correlated scalar subqueries become LEFT joins against the subquery
  re-grouped by its correlation keys; uncorrelated ones become cross joins
  against the single-row result.

The correlation puller walks the subquery, strips `outer_ref(col) = inner`
conjuncts out of its Filters, and threads the inner key columns up through
Projection / Aggregate / SubqueryAlias nodes so the join can reference them
at the subquery root (`optimizer/src/decorrelate.rs` PullUpCorrelatedExpr).
"""
from __future__ import annotations

import itertools
from typing import List, Optional, Tuple

from ..common.errors import PlanError
from ..expr import expr as E
from ..expr import plan as L
from ..expr.operator import Op
from .predicate_utils import conjunction, split_conjunction

_ALIAS_COUNTER = itertools.count()


def _contains_outer(e: E.Expr) -> bool:
    return e.contains(lambda n: isinstance(n, E.OuterRef))


def _strip_outer(e: E.Expr) -> E.Expr:
    def rw(n):
        if isinstance(n, E.OuterRef):
            return n.column
        return n
    return e.transform_up(rw)


class _Correlation:
    """One pulled-up correlated equality: outer_expr = inner_col."""

    def __init__(self, outer: E.Expr, inner: E.Column):
        self.outer = outer
        self.inner = inner


def _pull_correlations(node: L.LogicalPlan) -> Tuple[L.LogicalPlan, List[_Correlation]]:
    """Remove correlated conjuncts from Filters inside `node`; returns the
    rewritten plan and the correlation pairs, with inner key columns made
    visible at the plan's output."""
    if isinstance(node, L.Filter):
        child, pairs = _pull_correlations(node.input)
        keep: List[E.Expr] = []
        for c in split_conjunction(node.predicate):
            if not _contains_outer(c):
                keep.append(c)
                continue
            pair = _as_correlated_equality(c)
            if pair is None:
                raise PlanError(
                    f"unsupported correlated predicate: {c} "
                    "(only equality correlations are supported)")
            pairs = pairs + [pair]
        pred = conjunction(keep)
        new = L.Filter(pred, child) if pred is not None else child
        return new, pairs

    if isinstance(node, L.Projection):
        child, pairs = _pull_correlations(node.input)
        if not pairs:
            return (node if child is node.input
                    else L.Projection(node.exprs, child)), pairs
        exprs = list(node.exprs)
        names = {f.name for f in node.schema.fields}
        for p in pairs:
            if p.inner.name not in names:
                exprs.append(p.inner)
                names.add(p.inner.name)
        return L.Projection(exprs, child), pairs

    if isinstance(node, L.Aggregate):
        child, pairs = _pull_correlations(node.input)
        if not pairs:
            return (node if child is node.input
                    else node.with_inputs([child])), pairs
        groups = list(node.group_exprs)
        existing = {str(g) for g in groups}
        for p in pairs:
            if str(p.inner) not in existing:
                groups.append(p.inner)
                existing.add(str(p.inner))
        return L.Aggregate(groups, node.aggr_exprs, child), pairs

    if isinstance(node, L.SubqueryAlias):
        child, pairs = _pull_correlations(node.input)
        new_pairs = [
            _Correlation(p.outer, E.Column(p.inner.name, node.alias))
            for p in pairs]
        return (node if child is node.input
                else L.SubqueryAlias(child, node.alias)), new_pairs

    if isinstance(node, (L.Sort, L.Limit, L.Distinct)):
        child, pairs = _pull_correlations(node.inputs[0])
        return (node if child is node.inputs[0]
                else node.with_inputs([child])), pairs

    if isinstance(node, (L.Join, L.CrossJoin)):
        new_inputs, all_pairs = [], []
        for i in node.inputs:
            c, p = _pull_correlations(i)
            new_inputs.append(c)
            all_pairs.extend(p)
        if all_pairs:
            # inner key columns must be visible at the join output; joins
            # concatenate child schemas so they already are
            node = node.with_inputs(new_inputs)
            return node, all_pairs
        return (node if all(a is b for a, b in zip(new_inputs, node.inputs))
                else node.with_inputs(new_inputs)), []

    # leaves / unhandled: ensure no correlation remains below
    if _plan_has_outer(node):
        raise PlanError(
            f"correlated reference under unsupported node "
            f"{type(node).__name__}")
    return node, []


def _plan_has_outer(node: L.LogicalPlan) -> bool:
    for e in node.expressions():
        if _contains_outer(e):
            return True
    return any(_plan_has_outer(c) for c in node.inputs)


def _as_correlated_equality(c: E.Expr) -> Optional[_Correlation]:
    if not (isinstance(c, E.BinaryExpr) and c.op == Op.EQ):
        return None
    a, b = c.left, c.right
    a_outer, b_outer = _contains_outer(a), _contains_outer(b)
    if a_outer == b_outer:
        return None
    outer_side, inner_side = (a, b) if a_outer else (b, a)
    if not isinstance(inner_side, E.Column):
        return None
    # the outer side must be purely outer (no inner columns)
    if outer_side.contains(lambda n: isinstance(n, E.Column)) and \
            not isinstance(outer_side, E.OuterRef):
        # allow expressions over outer refs only
        only_outer = not outer_side.contains(
            lambda n: isinstance(n, E.Column) and not isinstance(n, E.OuterRef))
        if not only_outer:
            return None
    return _Correlation(_strip_outer(outer_side), inner_side)


# --------------------------------------------------------------------------
# EXISTS / IN -> semi/anti join
# --------------------------------------------------------------------------

class DecorrelatePredicateSubquery:
    name = "decorrelate_predicate_subquery"

    def rewrite(self, plan):
        def f(node):
            if not isinstance(node, L.Filter):
                return node
            conjuncts = split_conjunction(node.predicate)
            current = node.input
            keep: List[E.Expr] = []
            changed = False
            for c in conjuncts:
                neg = False
                inner = c
                if isinstance(inner, E.Not):
                    inner, neg = inner.expr, True
                if isinstance(inner, E.Exists):
                    current = self._to_join(current, inner.subquery, [],
                                            neg != inner.negated)
                    changed = True
                elif isinstance(inner, E.InSubquery):
                    current = self._to_join(current, inner.subquery,
                                            [inner.expr],
                                            neg != inner.negated)
                    changed = True
                else:
                    keep.append(c)
            if not changed:
                return node
            pred = conjunction(keep)
            return L.Filter(pred, current) if pred is not None else current
        return plan.transform_up(f)

    def _to_join(self, outer: L.LogicalPlan, sub: L.LogicalPlan,
                 in_exprs: List[E.Expr], negated: bool) -> L.LogicalPlan:
        alias = f"__correlated_sq_{next(_ALIAS_COUNTER)}"
        sub_schema_before = sub.schema
        sub2, pairs = _pull_correlations(sub)
        sub2 = L.SubqueryAlias(sub2, alias)
        on: List[Tuple[E.Expr, E.Expr]] = []
        if in_exprs:
            first = sub_schema_before.fields[0]
            on.append((in_exprs[0], E.Column(first.name, alias)))
        for p in pairs:
            inner = p.inner if p.inner.qualifier == alias else \
                E.Column(p.inner.name, alias)
            on.append((p.outer, inner))
        jt = "LEFTANTI" if negated else "LEFTSEMI"
        if not on:
            raise PlanError("EXISTS subquery without correlation is not supported yet")
        return L.Join(outer, sub2, on, None, jt)


# --------------------------------------------------------------------------
# scalar subquery -> left join
# --------------------------------------------------------------------------

class ScalarSubqueryToJoin:
    name = "scalar_subquery_to_join"

    def rewrite(self, plan):
        def f(node):
            if not isinstance(node, L.Filter):
                return node
            subqueries: List[E.ScalarSubquery] = []

            def find(e):
                if isinstance(e, E.ScalarSubquery):
                    subqueries.append(e)
                for ch in e.children():
                    find(ch)
            find(node.predicate)
            if not subqueries:
                return node
            current = node.input
            pred = node.predicate
            for sq in subqueries:
                current, replacement = self._to_join(current, sq)
                pred = _replace_expr(pred, sq, replacement)
            return L.Filter(pred, current)
        return plan.transform_up(f)

    def _to_join(self, outer: L.LogicalPlan, sq: E.ScalarSubquery):
        alias = f"__scalar_sq_{next(_ALIAS_COUNTER)}"
        scalar_field = sq.subquery.schema.fields[0]
        sub2, pairs = _pull_correlations(sq.subquery)
        sub2 = L.SubqueryAlias(sub2, alias)
        replacement = E.Column(scalar_field.name, alias)
        if pairs:
            on = []
            for p in pairs:
                inner = p.inner if p.inner.qualifier == alias else \
                    E.Column(p.inner.name, alias)
                on.append((p.outer, inner))
            join = L.Join(outer, sub2, on, None, "LEFT")
        else:
            join = L.CrossJoin(outer, sub2)
        return join, replacement


def _replace_expr(tree: E.Expr, target: E.Expr, replacement: E.Expr) -> E.Expr:
    def rw(n):
        if n is target:
            return replacement
        return n
    return tree.transform_up(rw)

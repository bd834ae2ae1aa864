"""Subquery decorrelation.

Reference parity:
* DecorrelatePredicateSubquery
  (`optimizer/src/decorrelate_predicate_subquery.rs`) — EXISTS / IN
  predicates become LeftSemi / LeftAnti joins; pulled-up correlated
  equalities become join keys, non-equi correlated conjuncts become the
  join filter.
* ScalarSubqueryToJoin (`optimizer/src/scalar_subquery_to_join.rs`) —
  correlated scalar subqueries become LEFT joins against the subquery
  re-grouped by its correlation keys; uncorrelated ones become cross joins
  against the single-row result.

The correlation puller (`optimizer/src/decorrelate.rs` PullUpCorrelatedExpr
analog) walks the subquery, strips conjuncts containing `outer_ref(...)`
out of its Filters — keeping the OuterRef markers intact so outer vs inner
columns stay distinguishable — and threads the referenced *inner* columns
up through Projection / Aggregate / SubqueryAlias nodes so the join can
evaluate the conjunct at the subquery root.
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


def _inner_columns(e: E.Expr) -> List[E.Column]:
    """Columns of `e` that belong to the subquery (i.e. not under an
    OuterRef marker)."""
    out: List[E.Column] = []

    def walk(n):
        if isinstance(n, E.OuterRef):
            return
        if isinstance(n, E.Column):
            out.append(n)
        for c in n.children():
            walk(c)
    walk(e)
    return out


def _requalify_inner(e: E.Expr, alias: str) -> E.Expr:
    """Rewrite inner columns to the subquery alias; unwrap OuterRefs to the
    outer plan's columns."""
    def rw(n):
        if isinstance(n, E.OuterRef):
            return n.column
        if isinstance(n, E.Column):
            return E.Column(n.name, alias)
        return n
    return e.transform_up(rw)


def _pull_correlations(node: L.LogicalPlan) -> Tuple[L.LogicalPlan, List[E.Expr]]:
    """Remove correlated conjuncts (still containing OuterRef markers) from
    Filters inside `node`, threading their inner columns to the output."""
    if isinstance(node, L.Filter):
        child, pulled = _pull_correlations(node.input)
        keep: List[E.Expr] = []
        for c in split_conjunction(node.predicate):
            if _contains_outer(c):
                pulled = pulled + [c]
            else:
                keep.append(c)
        pred = conjunction(keep)
        new = L.Filter(pred, child) if pred is not None else child
        return new, pulled

    if isinstance(node, L.Projection):
        child, pulled = _pull_correlations(node.input)
        if not pulled:
            return (node if child is node.input
                    else L.Projection(node.exprs, child)), pulled
        exprs = list(node.exprs)
        names = {f.name for f in node.schema.fields}
        for c in pulled:
            for col in _inner_columns(c):
                if col.name not in names:
                    exprs.append(col)
                    names.add(col.name)
        return L.Projection(exprs, child), pulled

    if isinstance(node, L.Aggregate):
        child, pulled = _pull_correlations(node.input)
        if not pulled:
            return (node if child is node.input
                    else node.with_inputs([child])), pulled
        groups = list(node.group_exprs)
        existing = {str(g) for g in groups}
        for c in pulled:
            for col in _inner_columns(c):
                if str(col) not in existing:
                    groups.append(col)
                    existing.add(str(col))
        return L.Aggregate(groups, node.aggr_exprs, child), pulled

    if isinstance(node, L.SubqueryAlias):
        child, pulled = _pull_correlations(node.input)
        if pulled:
            # requalify inner refs to this alias so they resolve above it
            def requal(c):
                def rw(n):
                    if isinstance(n, E.OuterRef):
                        return n
                    if isinstance(n, E.Column):
                        return E.Column(n.name, node.alias)
                    return n
                return _map_skipping_outer(c, rw)
            pulled = [requal(c) for c in pulled]
        return (node if child is node.input
                else L.SubqueryAlias(child, node.alias)), pulled

    if isinstance(node, (L.Sort, L.Limit, L.Distinct)):
        child, pulled = _pull_correlations(node.inputs[0])
        return (node if child is node.inputs[0]
                else node.with_inputs([child])), pulled

    if isinstance(node, (L.Join, L.CrossJoin)):
        new_inputs, all_pulled = [], []
        for i in node.inputs:
            c, p = _pull_correlations(i)
            new_inputs.append(c)
            all_pulled.extend(p)
        changed = any(a is not b for a, b in zip(new_inputs, node.inputs))
        return (node.with_inputs(new_inputs) if changed else node), all_pulled

    if _plan_has_outer(node):
        raise PlanError(
            f"correlated reference under unsupported node "
            f"{type(node).__name__}")
    return node, []


def _map_skipping_outer(e: E.Expr, rw):
    """transform_up that does not descend into OuterRef subtrees."""
    if isinstance(e, E.OuterRef):
        return rw(e)
    children = e.children()
    if children:
        new_children = [_map_skipping_outer(c, rw) for c in children]
        if any(a is not b for a, b in zip(new_children, children)):
            e = e.with_children(new_children)
    return rw(e)


def _plan_has_outer(node: L.LogicalPlan) -> bool:
    for e in node.expressions():
        if _contains_outer(e):
            return True
    return any(_plan_has_outer(c) for c in node.inputs)


def _split_join_conditions(pulled: List[E.Expr], alias: str):
    """Pulled conjuncts -> (on pairs, residual filter exprs), both rewritten
    to reference the outer plan directly and the subquery via `alias`."""
    on: List[Tuple[E.Expr, E.Expr]] = []
    residual: List[E.Expr] = []
    for c in pulled:
        done = False
        if isinstance(c, E.BinaryExpr) and c.op == Op.EQ:
            a, b = c.left, c.right
            a_out, b_out = _contains_outer(a), _contains_outer(b)
            if a_out != b_out:
                outer_side, inner_side = (a, b) if a_out else (b, a)
                pure_outer = not _inner_columns(outer_side)
                if pure_outer and isinstance(inner_side, E.Column):
                    on.append((_requalify_inner(outer_side, alias),
                               E.Column(inner_side.name, alias)))
                    done = True
        if not done:
            residual.append(_requalify_inner(c, alias))
    return on, residual


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
        sub2, pulled = _pull_correlations(sub)
        sub2 = L.SubqueryAlias(sub2, alias)
        on, residual = _split_join_conditions(pulled, alias)
        if in_exprs:
            first = sub_schema_before.fields[0]
            on.insert(0, (in_exprs[0], E.Column(first.name, alias)))
        jt = "LEFTANTI" if negated else "LEFTSEMI"
        if not on and not residual:
            raise PlanError(
                "uncorrelated EXISTS subquery is not supported yet")
        return L.Join(outer, sub2, on, conjunction(residual), jt)


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
        sub2, pulled = _pull_correlations(sq.subquery)
        sub2 = L.SubqueryAlias(sub2, alias)
        replacement = E.Column(scalar_field.name, alias)
        on, residual = _split_join_conditions(pulled, alias)
        if on or residual:
            join = L.Join(outer, sub2, on, conjunction(residual), "LEFT")
        else:
            join = L.CrossJoin(outer, sub2)
        return join, replacement


def _replace_expr(tree: E.Expr, target: E.Expr, replacement: E.Expr) -> E.Expr:
    def rw(n):
        if n is target:
            return replacement
        return n
    return tree.transform_up(rw)

"""OptimizeProjections — prune unused columns at the scans.

Reference parity: `datafusion/optimizer/src/optimize_projections/` (the
reference prunes projections at every node; here we prune the TableScan
projection — where nearly all the win is: it shrinks host->device transfer
and scan decode width).

Safety rule: a scan column is kept if its *name* is referenced anywhere in
the plan's expressions or in the plan's output schema. Matching by bare
name over-retains on cross-table name collisions, which is safe.
"""
from __future__ import annotations

from typing import Set

from ..expr import expr as E
from ..expr import plan as L


def _collect_names(plan: L.LogicalPlan, out: Set[str]) -> None:
    for f in plan.schema.fields:
        pass  # output schema handled by caller at root
    for e in plan.expressions():
        _expr_names(e, out)
    for c in plan.inputs:
        _collect_names(c, out)


def _expr_names(e: E.Expr, out: Set[str]) -> None:
    if isinstance(e, E.Column):
        out.add(e.name)
    if isinstance(e, (E.ScalarSubquery, E.Exists, E.InSubquery)):
        _collect_names(e.subquery, out)
        for f in e.subquery.schema.fields:
            out.add(f.name)
    if isinstance(e, E.OuterRef):
        out.add(e.column.name)
    for c in e.children():
        _expr_names(c, out)


class OptimizeProjections:
    name = "optimize_projections"

    def rewrite(self, plan: L.LogicalPlan) -> L.LogicalPlan:
        required: Set[str] = set()
        _collect_names(plan, required)
        for f in plan.schema.fields:
            required.add(f.name)

        def f(node):
            if isinstance(node, L.TableScan) and node.projection is None:
                schema = node.source.schema()
                keep = [i for i, fld in enumerate(schema.fields)
                        if fld.name in required]
                if len(keep) < len(schema.fields):
                    return L.TableScan(node.name, node.source, keep,
                                       getattr(node, "filters", []) or [],
                                       getattr(node, "fetch", None))
            return node
        return plan.transform_up(f)

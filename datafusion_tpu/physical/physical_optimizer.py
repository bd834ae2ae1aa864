"""Physical optimizer rules.

Reference parity: `datafusion/core/src/physical_optimizer/optimizer.rs:81`
— plan-level rewrites after initial physical planning. Implemented:

* UseDeviceAggregate — fuse AggregateExec(Single) with its Filter /
  Projection input chain into a DeviceGroupAggregateExec (one compiled
  XLA program). This plays the role the reference's operator fusion +
  CombinePartialFinalAggregate play, adapted to the compiled-pipeline
  execution model.
* CoalesceBatches analog is unnecessary: device tiles are re-bucketed at
  staging time.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

from .expressions import PhysicalExpr, rewrite_columns
from .plan.aggregate import AggregateExec, AggregateMode
from .plan.base import ExecutionPlan
from .plan.device_aggregate import DeviceGroupAggregateExec
from .plan.projection import (CoalescePartitionsExec, FilterExec,
                              ProjectionExec)

_DEVICE_AGG_NAMES = {"count", "sum", "min", "max", "avg", "mean"}


class UseDeviceAggregate:
    name = "use_device_aggregate"

    def __init__(self, config=None):
        self.config = config

    def enabled(self) -> bool:
        if self.config is None:
            return True
        try:
            return bool(self.config.get("datafusion.tpu.device_aggregate"))
        except Exception:  # noqa: BLE001
            return True

    def rewrite(self, plan: ExecutionPlan) -> ExecutionPlan:
        if not self.enabled():
            return plan

        def f(node):
            if not isinstance(node, AggregateExec):
                return node
            if node.mode != AggregateMode.SINGLE:
                return node
            for a in node.aggr_exprs:
                if a.name not in _DEVICE_AGG_NAMES or a.distinct or \
                        a.filter is not None:
                    return node
                if a.name in ("min", "max") and a.out_type.is_string:
                    return node
            unwrapped = _unwrap_chain(node)
            if unwrapped is None:
                return node
            source, predicate, groups, aggs = unwrapped
            return DeviceGroupAggregateExec(
                source, predicate, groups, aggs, node.schema(), fallback=node)
        return plan.transform_up(f)


def _unwrap_chain(agg: AggregateExec):
    """Descend through CoalescePartitions/Filter/Projection, inlining
    projections into the aggregate's expressions; returns
    (source, fused predicate, groups, aggs) against the source schema."""
    from .plan.aggregate import PhysAggregateExpr
    from ..expr.operator import Op
    from .expressions import BinaryPhysExpr
    from ..common import dt

    groups = [(e, n) for e, n in agg.group_exprs]
    aggs = list(agg.aggr_exprs)
    predicate: Optional[PhysicalExpr] = None
    node = agg.input
    hops = 0
    try:
        while hops < 32:
            hops += 1
            if isinstance(node, CoalescePartitionsExec):
                node = node.input
                continue
            if isinstance(node, FilterExec):
                p = node.predicate
                predicate = p if predicate is None else \
                    BinaryPhysExpr(predicate, Op.AND, p, dt.BOOL)
                node = node.input
                continue
            if isinstance(node, ProjectionExec):
                repl = node.exprs
                groups = [(rewrite_columns(e, repl), n) for e, n in groups]
                aggs = [PhysAggregateExpr(
                    a.name, [rewrite_columns(x, repl) for x in a.args],
                    a.out_type, a.display, a.distinct,
                    rewrite_columns(a.filter, repl) if a.filter is not None else None,
                    a.count_star) for a in aggs]
                if predicate is not None:
                    predicate = rewrite_columns(predicate, repl)
                node = node.input
                continue
            break
    except Exception:  # noqa: BLE001 — unsupported expr shape: keep host plan
        return None
    return node, predicate, groups, aggs


def default_physical_rules(config=None) -> List:
    return [UseDeviceAggregate(config)]


def optimize_physical(plan: ExecutionPlan, config=None) -> ExecutionPlan:
    for rule in default_physical_rules(config):
        plan = rule.rewrite(plan)
    return plan

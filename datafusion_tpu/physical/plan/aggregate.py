"""AggregateExec — hash aggregation with two-phase modes.

Reference parity: `datafusion/physical-plan/src/aggregates/mod.rs:241`
(AggregateMode Partial/Final/FinalPartitioned/Single `mod.rs:64-84`) and the
GroupedHashAggregateStream hot loop (`aggregates/row_hash.rs:207,524`):
GroupValues::intern maps keys to dense group ids, accumulators scatter-add
with those ids. Here interning is vectorized factorization
(`physical/hashing.py`); accumulator state is dense per-group tensors —
the same layout the TPU segment-reduce path uses.
"""
from __future__ import annotations

import enum
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ...common.batch import Batch
from ...common.column import Column, concat_columns
from ...common.schema import Field, Schema
from ...runtime import BaselineMetrics, TaskContext
from .. import kernels as K
from ..aggregates import CollectingAcc, GroupsAccumulator, create_accumulator
from ..expressions import PhysicalExpr
from ..hashing import factorize
from .base import ExecutionPlan, Partitioning


class AggregateMode(enum.Enum):
    PARTIAL = "Partial"
    FINAL = "Final"
    FINAL_PARTITIONED = "FinalPartitioned"
    SINGLE = "Single"
    SINGLE_PARTITIONED = "SinglePartitioned"

    @property
    def is_first_stage(self) -> bool:
        return self in (AggregateMode.PARTIAL, AggregateMode.SINGLE,
                        AggregateMode.SINGLE_PARTITIONED)

    @property
    def is_final_stage(self) -> bool:
        return self in (AggregateMode.FINAL, AggregateMode.FINAL_PARTITIONED,
                        AggregateMode.SINGLE, AggregateMode.SINGLE_PARTITIONED)


class PhysAggregateExpr:
    """One aggregate call: accumulator factory + bound argument/filter
    expressions (reference: AggregateExpr trait in physical-expr)."""

    def __init__(self, name: str, args: List[PhysicalExpr], out_type,
                 display: str, distinct: bool = False,
                 filter: Optional[PhysicalExpr] = None,
                 count_star: bool = False, order_by=None,
                 ignore_nulls: bool = False):
        self.name = name
        self.args = args
        self.out_type = out_type
        self.display = display
        self.distinct = distinct
        self.filter = filter
        self.count_star = count_star
        self.order_by = order_by or []   # List[PhysSortExpr]
        self.ignore_nulls = ignore_nulls

    def make_accumulator(self) -> GroupsAccumulator:
        acc = create_accumulator(
            self.name, [a.out_type for a in self.args], self.out_type,
            distinct=self.distinct, count_star=self.count_star,
            ignore_nulls=self.ignore_nulls)
        if self.order_by:
            acc.order_specs = [(s.asc, s.nulls_first) for s in self.order_by]
        return acc

    def __str__(self):
        return self.display


class GroupValues:
    """Incremental multi-column key interning with stable first-appearance
    group ids (reference: aggregates/group_values/row.rs)."""

    def __init__(self, num_keys: int):
        self.num_keys = num_keys
        self.uniq: Optional[List[Column]] = None
        self.n_groups = 0

    def intern(self, key_cols: List[Column], n_rows: int) -> np.ndarray:
        if self.num_keys == 0:
            self.n_groups = 1
            return np.zeros(n_rows, np.int64)
        if self.uniq is None:
            ids, first_rows, g = factorize(key_cols, n_rows)
            self.uniq = [c.take_host(first_rows) for c in key_cols]
            self.n_groups = g
            return ids
        prev_g = self.n_groups
        combined = [concat_columns([u, c]) for u, c in zip(self.uniq, key_cols)]
        total = prev_g + n_rows
        ids, first_rows, g = factorize(combined, total)
        if g > prev_g:
            new_rows = first_rows[prev_g:]
            self.uniq = [c.take_host(np.concatenate(
                [np.arange(prev_g), new_rows])) for c in combined]
            self.n_groups = g
        return ids[prev_g:]

    def keys(self) -> List[Column]:
        return self.uniq or []


class AggregateExec(ExecutionPlan):
    def __init__(self, mode: AggregateMode,
                 group_exprs: List[Tuple[PhysicalExpr, str]],
                 aggr_exprs: List[PhysAggregateExpr],
                 input: ExecutionPlan,
                 input_schema: Optional[Schema] = None):
        super().__init__()
        self.mode = mode
        self.group_exprs = group_exprs
        self.aggr_exprs = aggr_exprs
        self.input = input
        fields: List[Field] = []
        in_schema = input.schema()
        for e, name in group_exprs:
            from ..expressions import ColumnExpr
            q = in_schema.field(e.index).qualifier if isinstance(e, ColumnExpr) else None
            fields.append(Field(name, e.out_type, True, qualifier=q))
        if mode == AggregateMode.PARTIAL:
            for a in aggr_exprs:
                acc = a.make_accumulator()
                fields.extend(acc.state_fields(a.display))
        else:
            for a in aggr_exprs:
                fields.append(Field(a.display, a.out_type, True))
        self._schema = Schema(fields)

    def schema(self):
        return self._schema

    def children(self):
        return [self.input]

    def with_children(self, c):
        return AggregateExec(self.mode, self.group_exprs, self.aggr_exprs, c[0])

    def output_partitioning(self):
        if self.mode in (AggregateMode.PARTIAL,):
            return self.input.output_partitioning()
        return Partitioning.unknown(self.input.output_partitioning().n)

    def execute(self, partition: int, ctx: TaskContext) -> Iterator[Batch]:
        m = BaselineMetrics(self.metrics, partition)
        gv = GroupValues(len(self.group_exprs))
        accs = [a.make_accumulator() for a in self.aggr_exprs]
        saw_input = False

        final_merge = self.mode in (AggregateMode.FINAL,
                                    AggregateMode.FINAL_PARTITIONED)
        for batch in self.input.execute(partition, ctx):
            saw_input = True
            with m.elapsed_compute:
                if final_merge:
                    self._merge_batch(batch, gv, accs)
                else:
                    self._update_batch(batch, gv, accs)

        with m.elapsed_compute:
            n_groups = gv.n_groups
            if len(self.group_exprs) == 0:
                n_groups = 1   # scalar aggregate: one output row even on empty input
            if n_groups == 0:
                return
            cols: List[Column] = []
            if self.group_exprs:
                keys = gv.keys()
                if not keys:
                    return
                cols.extend(keys)
            if self.mode == AggregateMode.PARTIAL:
                for acc in accs:
                    cols.extend(acc.state(n_groups))
            else:
                for acc in accs:
                    cols.append(acc.evaluate(n_groups))
            out = Batch(self._schema, cols, n_groups)
        m.record_output(out.num_rows)
        del saw_input
        yield out

    # ---- first stage: raw input -------------------------------------------
    def _update_batch(self, batch: Batch, gv: GroupValues,
                      accs: List[GroupsAccumulator]):
        keys = [e.evaluate(batch) for e, _ in self.group_exprs]
        ids = gv.intern(keys, batch.num_rows)
        n_groups = gv.n_groups if self.group_exprs else 1
        for a, acc in zip(self.aggr_exprs, accs):
            vals = [arg.evaluate(batch) for arg in a.args]
            ocols = [s.expr.evaluate(batch) for s in a.order_by] \
                if a.order_by and isinstance(acc, CollectingAcc) else None
            use_ids = ids
            if a.filter is not None:
                fmask = K.true_mask(a.filter.evaluate(batch))
                use_ids = ids[fmask]
                vals = [v.filter_host(fmask) for v in vals]
                if ocols:
                    ocols = [o.filter_host(fmask) for o in ocols]
            if ocols:
                acc.update(vals, use_ids, n_groups, order_cols=ocols)
            else:
                acc.update(vals, use_ids, n_groups)

    # ---- final stage: merge partial state ------------------------------------
    def _merge_batch(self, batch: Batch, gv: GroupValues,
                     accs: List[GroupsAccumulator]):
        k = len(self.group_exprs)
        keys = [e.evaluate(batch) for e, _ in self.group_exprs]
        ids = gv.intern(keys, batch.num_rows)
        n_groups = gv.n_groups if self.group_exprs else 1
        col_idx = k
        for a, acc in zip(self.aggr_exprs, accs):
            n_state = len(acc.state_fields(a.display))
            states = batch.columns[col_idx: col_idx + n_state]
            col_idx += n_state
            acc.merge(states, ids, n_groups)

    def display_line(self):
        gb = ", ".join(f"{n}" for _, n in self.group_exprs)
        ag = ", ".join(str(a) for a in self.aggr_exprs)
        return f"AggregateExec: mode={self.mode.value}, gby=[{gb}], aggr=[{ag}]"

"""SortExec / TopK / SortPreservingMergeExec.

Reference parity: `sorts/sort.rs:668` (ExternalSorter), `topk/mod.rs:75`
(ORDER BY + LIMIT k), `sorts/sort_preserving_merge.rs:67`.

TPU-first detail: every sort key column is first encoded into a *monotonic
uint64 order key* (sign-flip for ints, IEEE total-order trick for floats —
NaN sorts greatest like the reference, dictionary codes for strings,
bit-inversion for DESC, a leading null-rank word for NULLS FIRST/LAST).
After encoding, any comparison sort / bitonic device sort / radix partition
works on plain unsigned integers — no per-type comparators in the hot loop.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional

import numpy as np

from ...common.batch import Batch, concat_batches
from ...common.schema import Schema
from ...runtime import BaselineMetrics, TaskContext
from .. import kernels as K
from ..expressions import PhysicalExpr
from .base import ExecutionPlan, Partitioning


@dataclasses.dataclass
class PhysSortExpr:
    expr: PhysicalExpr
    asc: bool = True
    nulls_first: bool = False

    def __str__(self):
        s = f"{self.expr} {'ASC' if self.asc else 'DESC'}"
        if self.nulls_first:
            s += " NULLS FIRST"
        return s


def encode_order_key(col, asc: bool, nulls_first: bool) -> np.ndarray:
    """Column -> uint64 such that np.sort order == SQL order."""
    data = col.data_host()
    if data.dtype.kind == "f":
        bits = data.astype(np.float64).view(np.uint64).copy()
        neg = (bits >> np.uint64(63)) == 1
        bits = np.where(neg, ~bits, bits | np.uint64(1 << 63))
        # NaN: IEEE trick already puts +NaN above +inf; normalize -NaN
        nan = np.isnan(data)
        bits = np.where(nan, np.uint64(0xFFFFFFFFFFFFFFFF), bits)
        key = bits
    elif data.dtype == np.bool_:
        key = data.astype(np.uint64)
    else:
        key = (data.astype(np.int64).view(np.uint64)
               ^ np.uint64(1 << 63))  # sign flip -> unsigned monotonic
    if not asc:
        key = ~key
    v = col.validity_host()
    if v is not None:
        # shift everything into [1, 2^63] band and put nulls at an extreme
        key = (key >> np.uint64(1)) + np.uint64(1)
        null_key = np.uint64(0) if nulls_first else np.uint64(0xFFFFFFFFFFFFFFFF)
        key = np.where(v, key, null_key)
    return key


def sort_indices(batch: Batch, sort_exprs: List[PhysSortExpr],
                 limit: Optional[int] = None) -> np.ndarray:
    """Row permutation realizing the sort order (stable)."""
    keys = []
    for se in sort_exprs:
        col = se.expr.evaluate(batch)
        keys.append(encode_order_key(col, se.asc, se.nulls_first))
    # np.lexsort: last key is primary
    order = np.lexsort(tuple(reversed(keys)))
    if limit is not None:
        order = order[:limit]
    return order


class SortExec(ExecutionPlan):
    """Full per-partition sort; `fetch` switches to top-k
    (reference: sorts/sort.rs:668 + topk/mod.rs:75)."""

    def __init__(self, sort_exprs: List[PhysSortExpr], input: ExecutionPlan,
                 fetch: Optional[int] = None, preserve_partitioning: bool = False):
        super().__init__()
        self.sort_exprs = sort_exprs
        self.input = input
        self.fetch = fetch
        self.preserve_partitioning = preserve_partitioning

    def schema(self):
        return self.input.schema()

    def children(self):
        return [self.input]

    def with_children(self, c):
        return SortExec(self.sort_exprs, c[0], self.fetch,
                        self.preserve_partitioning)

    def output_partitioning(self):
        if self.preserve_partitioning:
            return self.input.output_partitioning()
        return Partitioning.unknown(1)

    def maintains_input_order(self):
        return False

    def execute(self, partition: int, ctx: TaskContext) -> Iterator[Batch]:
        m = BaselineMetrics(self.metrics, partition)
        from ...runtime import MemoryReservation
        reservation = MemoryReservation("SortExec", ctx.memory_pool,
                                        can_spill=True)
        if self.preserve_partitioning:
            source = self.input.execute(partition, ctx)
        else:
            assert partition == 0
            from .base import execute_stream
            source = execute_stream(self.input, ctx)
        batches = []
        for b in source:
            reservation.try_grow(b.nbytes())
            batches.append(b)
        with m.elapsed_compute:
            if self.fetch is not None and len(batches) > 1:
                # top-k per batch, then final top-k over survivors: bounds
                # memory like the reference's TopK heap
                pruned = []
                for b in batches:
                    if b.num_rows > self.fetch:
                        idx = sort_indices(b, self.sort_exprs, self.fetch)
                        b = b.take_host(idx)
                    pruned.append(b)
                batches = pruned
            merged = concat_batches(self.schema(), batches)
            if merged.num_rows == 0:
                return
            idx = sort_indices(merged, self.sort_exprs, self.fetch)
            out = merged.take_host(idx)
        m.record_output(out.num_rows)
        yield out

    def display_line(self):
        ex = ", ".join(map(str, self.sort_exprs))
        f = f", fetch={self.fetch}" if self.fetch is not None else ""
        return f"SortExec: expr=[{ex}]{f}"


class SortPreservingMergeExec(ExecutionPlan):
    """N sorted partitions -> 1 sorted stream
    (reference: sorts/sort_preserving_merge.rs:67). Host path: gather and
    merge via stable sort on the encoded order keys (k-way loser tree on
    already-sorted runs is a later optimization)."""

    def __init__(self, sort_exprs: List[PhysSortExpr], input: ExecutionPlan,
                 fetch: Optional[int] = None):
        super().__init__()
        self.sort_exprs = sort_exprs
        self.input = input
        self.fetch = fetch

    def schema(self):
        return self.input.schema()

    def children(self):
        return [self.input]

    def with_children(self, c):
        return SortPreservingMergeExec(self.sort_exprs, c[0], self.fetch)

    def output_partitioning(self):
        return Partitioning.unknown(1)

    def maintains_input_order(self):
        return True

    def execute(self, partition: int, ctx: TaskContext) -> Iterator[Batch]:
        assert partition == 0
        m = BaselineMetrics(self.metrics, partition)
        n = self.input.output_partitioning().n
        batches = []
        for p in range(n):
            batches.extend(self.input.execute(p, ctx))
        with m.elapsed_compute:
            merged = concat_batches(self.schema(), batches)
            if merged.num_rows == 0:
                return
            idx = sort_indices(merged, self.sort_exprs, self.fetch)
            out = merged.take_host(idx)
        m.record_output(out.num_rows)
        yield out

    def display_line(self):
        ex = ", ".join(map(str, self.sort_exprs))
        return f"SortPreservingMergeExec: [{ex}]"

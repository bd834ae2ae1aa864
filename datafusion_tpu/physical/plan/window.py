"""WindowExec — window function evaluation.

Reference parity: `windows/window_agg_exec.rs:173` (full-buffer evaluation;
the incremental BoundedWindowAggExec is a later optimization), built-in
window exprs (`physical-expr/src/window/` rank.rs, lead_lag.rs,
nth_value.rs, row_number.rs, cume_dist.rs, ntile.rs) and the frame spec
(`expr/src/window_frame.rs:41`).

Host path: the input is buffered, rows are ordered by (partition keys,
order keys) once, every function is computed vectorized over that ordering
(ranks via run-length/dedup scans, frame aggregates via prefix sums —
the same scan-based formulation the TPU path uses with lax cumsums), and
results are scattered back to original row order.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ...common import dt
from ...common.batch import Batch
from ...common.column import Column
from ...common.errors import ExecutionError
from ...common.schema import Field, Schema
from ...expr.expr import WindowFrame
from ...runtime import BaselineMetrics, TaskContext
from .. import kernels as K
from ..expressions import PhysicalExpr
from ..hashing import factorize, factorize_column
from .base import ExecutionPlan, Partitioning
from .sort import PhysSortExpr, encode_order_key, order_keys


@dataclasses.dataclass
class PhysWindowExpr:
    name: str
    args: List[PhysicalExpr]
    partition_by: List[PhysicalExpr]
    order_by: List[PhysSortExpr]
    frame: WindowFrame
    out_type: object
    display: str


class WindowExec(ExecutionPlan):
    def __init__(self, window_exprs: List[PhysWindowExpr], input: ExecutionPlan):
        super().__init__()
        self.window_exprs = window_exprs
        self.input = input
        fields = list(input.schema().fields)
        for w in window_exprs:
            fields.append(Field(w.display, w.out_type, True))
        self._schema = Schema(fields)

    def schema(self):
        return self._schema

    def children(self):
        return [self.input]

    def with_children(self, c):
        return WindowExec(self.window_exprs, c[0])

    def output_partitioning(self):
        return Partitioning.unknown(1)

    def execute(self, partition: int, ctx: TaskContext) -> Iterator[Batch]:
        from .base import collect_batch
        m = BaselineMetrics(self.metrics, partition)
        batch = collect_batch(self.input, ctx)
        if batch.num_rows == 0:
            return
        with m.elapsed_compute:
            cols = list(batch.columns)
            for w in self.window_exprs:
                cols.append(_eval_window(w, batch))
            out = Batch(self._schema, cols, batch.num_rows)
        m.record_output(out.num_rows)
        yield out

    def display_line(self):
        return "WindowExec: " + ", ".join(w.display for w in self.window_exprs)


class BoundedWindowExec(WindowExec):
    """Bounded-memory window over input SORTED by the shared partition
    keys: rows buffer only until the partition-key run ends, then the run
    evaluates and streams out (reference:
    windows/bounded_window_agg_exec.rs). Requires every window expr to
    share the same non-empty PARTITION BY; the planner inserts the
    partition-key sort below."""

    def __init__(self, window_exprs: List[PhysWindowExpr], input: ExecutionPlan):
        super().__init__(window_exprs, input)
        pb = window_exprs[0].partition_by
        assert pb and all(
            [str(e) for e in w.partition_by] == [str(e) for e in pb]
            for w in window_exprs), "BoundedWindowExec needs a shared PARTITION BY"

    def with_children(self, c):
        return BoundedWindowExec(self.window_exprs, c[0])

    def maintains_input_order(self):
        return True

    def execute(self, partition: int, ctx: TaskContext) -> Iterator[Batch]:
        from ...common.batch import concat_batches
        from .base import execute_stream
        m = BaselineMetrics(self.metrics, partition)
        pb_exprs = self.window_exprs[0].partition_by
        pending: List[Batch] = []
        pending_key = None

        def run_out(run_batches):
            merged = run_batches[0] if len(run_batches) == 1 else \
                concat_batches(self.input.schema(), run_batches)
            cols = list(merged.columns)
            for w in self.window_exprs:
                cols.append(_eval_window(w, merged))
            return Batch(self._schema, cols, merged.num_rows)

        for b in execute_stream(self.input, ctx):
            if not b.num_rows:
                continue
            with m.elapsed_compute:
                keys = [factorize_column(e.evaluate(b)) for e in pb_exprs]
                change = np.zeros(b.num_rows, bool)
                for k in keys:
                    change[1:] |= k[1:] != k[:-1]
                first = tuple(
                    e.evaluate(b).to_pylist(1)[0] for e in pb_exprs)
                if pending_key is not None and first != pending_key:
                    change[0] = True
                bounds = np.nonzero(change)[0]
                outs = []
                start = 0
                for cut in bounds:
                    if cut > start:
                        pending.append(b.take_host(np.arange(start, cut)))
                    if pending:
                        outs.append(run_out(pending))
                    pending = []
                    start = cut
                pending.append(b.take_host(np.arange(start, b.num_rows)))
                last_i = b.num_rows - 1
                pending_key = tuple(
                    e.evaluate(b).to_pylist(b.num_rows)[last_i]
                    for e in pb_exprs)
            for o in outs:
                m.record_output(o.num_rows)
                yield o
        if pending:
            with m.elapsed_compute:
                out = run_out(pending)
            m.record_output(out.num_rows)
            yield out

    def display_line(self):
        return "BoundedWindowAggExec: " + \
            ", ".join(w.display for w in self.window_exprs)


# --------------------------------------------------------------------------
# evaluation
# --------------------------------------------------------------------------

def _eval_window(w: PhysWindowExpr, batch: Batch) -> Column:
    n = batch.num_rows
    # partition ids
    if w.partition_by:
        pcols = [e.evaluate(batch) for e in w.partition_by]
        pids, _, _ = factorize(pcols, n)
    else:
        pids = np.zeros(n, np.int64)
    # global ordering: partition-major, then order keys (stable)
    keys = [pids.astype(np.uint64)]
    for se in w.order_by:
        rank, key = order_keys(se.expr.evaluate(batch), se.asc,
                               se.nulls_first)
        keys.insert(0, rank)
        keys.insert(0, key)
    order = np.lexsort(tuple(keys))
    sp = pids[order]                       # sorted partition ids
    # partition boundaries in sorted space
    part_start_mask = np.empty(n, bool)
    part_start_mask[0] = True
    part_start_mask[1:] = sp[1:] != sp[:-1]
    part_start = np.maximum.accumulate(np.where(part_start_mask, np.arange(n), 0))
    # index of the last row of each partition (nearest-next backward fill)
    last_mask = np.empty(n, bool)
    last_mask[-1] = True
    last_mask[:-1] = sp[1:] != sp[:-1]
    idx = np.arange(n)
    part_end = np.flip(_segmented_ffill(np.flip(np.where(last_mask, idx, 0)),
                                        np.flip(last_mask)))
    row_in_part = idx - part_start
    part_len = part_end - part_start + 1

    # peer groups (rows equal on order keys within partition)
    if w.order_by:
        okeys = [w_[order] for se in w.order_by
                 for w_ in order_keys(se.expr.evaluate(batch), se.asc,
                                      se.nulls_first)]
        new_peer = part_start_mask.copy()
        for k in okeys:
            new_peer |= np.concatenate([[True], k[1:] != k[:-1]])
    else:
        new_peer = part_start_mask.copy()

    name = w.name
    sorted_out: Column

    if name == "row_number":
        sorted_out = Column(dt.INT64, row_in_part + 1)
    elif name == "rank":
        rank_at_peer = np.where(new_peer, row_in_part + 1, 0)
        sorted_out = Column(dt.INT64, _segmented_ffill(rank_at_peer, new_peer))
    elif name == "dense_rank":
        incr = new_peer & ~part_start_mask
        dr = np.cumsum(incr) + 1
        base = _segmented_ffill(np.where(part_start_mask, dr, 0), part_start_mask)
        sorted_out = Column(dt.INT64, dr - base + 1)
    elif name == "percent_rank":
        rank = _segmented_ffill(np.where(new_peer, row_in_part + 1, 0), new_peer)
        denom = np.maximum(part_len - 1, 1).astype(np.float64)
        sorted_out = Column(dt.FLOAT64, (rank - 1) / denom)
    elif name == "cume_dist":
        # rows <= current peer group (peer-group end position) / partition size
        peer_end = _peer_group_end(new_peer, idx, n)
        sorted_out = Column(dt.FLOAT64,
                            (peer_end - part_start + 1) / part_len.astype(np.float64))
    elif name == "ntile":
        k = int(w.args[0].evaluate(batch).data_host()[0]) if w.args else 1
        pl = part_len.astype(np.float64)
        sorted_out = Column(dt.INT64,
                            np.minimum((row_in_part * k // np.maximum(part_len, 1)) + 1,
                                       k).astype(np.int64))
        del pl
    elif name in ("lag", "lead"):
        c = w.args[0].evaluate(batch).take_host(order)
        off = 1
        if len(w.args) > 1:
            off = int(w.args[1].evaluate(batch).data_host()[0])
        default = w.args[2].evaluate(batch).take_host(order) if len(w.args) > 2 else None
        shift = -off if name == "lag" else off
        src = idx + shift
        in_part = (src >= part_start) & (src <= part_end)
        safe = np.clip(src, 0, n - 1)
        data = c.data_host()[safe]
        v = K.valid_mask(c)[safe]
        if default is not None:
            ddata = default.data_host()
            dv = K.valid_mask(default)
            if c.dtype.is_string and default.dtype.is_string:
                cc, dd = K.unify_dictionaries(c, default)
                data = cc.data_host()[safe]
                ddata = dd.data_host()
                c = cc
            data = np.where(in_part, data, ddata)
            v = np.where(in_part, v, dv)
        else:
            v = v & in_part
        sorted_out = Column(c.dtype, data, None if v.all() else v, c.dictionary)
    elif name in ("first_value", "last_value", "nth_value"):
        c = w.args[0].evaluate(batch).take_host(order)
        if name == "first_value":
            src = part_start
        elif name == "last_value":
            # default frame ends at current peer group; reference's
            # last_value over default frame returns the current peer's last
            src = _peer_group_end(new_peer, idx, n)
        else:
            k = int(w.args[1].evaluate(batch).data_host()[0])
            src = part_start + (k - 1)
        in_part = (src >= part_start) & (src <= part_end)
        safe = np.clip(src, 0, n - 1)
        data = c.data_host()[safe]
        v = K.valid_mask(c)[safe] & in_part
        sorted_out = Column(c.dtype, data, None if v.all() else v, c.dictionary)
    else:
        from ...functions.udf import WINDOW_UDFS
        udwf = WINDOW_UDFS.get(name)
        if udwf is not None:
            # PartitionEvaluator protocol (reference:
            # expr/src/partition_evaluator.rs:89): args in sorted order +
            # partition bounds -> values in sorted order
            args_sorted = [w_arg.evaluate(batch).take_host(order).data_host()
                           for w_arg in w.args]
            vals = np.asarray(udwf.evaluator(args_sorted, part_start, part_end))
            sorted_out = Column(w.out_type, vals.astype(
                w.out_type.device_dtype()))
        else:
            sorted_out = _eval_window_aggregate(w, batch, order, pids,
                                                part_start, part_end, new_peer)

    # scatter back to original row order
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    return sorted_out.take_host(inv)


def _shift_bool(new_peer: np.ndarray) -> np.ndarray:
    """Mask of 'last row of its peer group'."""
    out = np.empty(len(new_peer), bool)
    out[:-1] = new_peer[1:]
    out[-1] = True
    return out


def _peer_group_end(new_peer, idx, n):
    last_of_peer = _shift_bool(new_peer)
    return np.flip(_segmented_ffill(np.flip(np.where(last_of_peer, idx, 0)),
                                    np.flip(last_of_peer)))


def _segmented_ffill(vals: np.ndarray, set_mask: np.ndarray) -> np.ndarray:
    """Forward-fill vals from positions where set_mask is True."""
    idx = np.where(set_mask, np.arange(len(vals)), 0)
    idx = np.maximum.accumulate(idx)
    return vals[idx]


def _eval_window_aggregate(w: PhysWindowExpr, batch: Batch, order, pids,
                           part_start, part_end, new_peer) -> Column:
    """Aggregate function over a window frame, computed with prefix sums in
    sorted space."""
    n = batch.num_rows
    idx = np.arange(n)
    name = w.name
    frame = w.frame

    # frame bounds [lo, hi] inclusive, in sorted-row space
    if frame.units == "ROWS":
        lo = _bound_rows(frame.start, idx, part_start, part_end, True)
        hi = _bound_rows(frame.end, idx, part_start, part_end, False)
    elif frame.units == "GROUPS":
        # offsets counted in peer groups (reference: window_frame.rs GROUPS)
        peer_idx = np.cumsum(new_peer) - 1

        def off(b):
            return int(b.offset.value) if b.offset is not None and \
                b.offset.value is not None else 0
        if frame.start.kind == "UNBOUNDED_PRECEDING":
            lo = part_start.copy()
        else:
            delta = -off(frame.start) if frame.start.kind == "PRECEDING" else \
                (off(frame.start) if frame.start.kind == "FOLLOWING" else 0)
            target = peer_idx + delta
            lo = np.searchsorted(peer_idx, target, side="left")
        if frame.end.kind == "UNBOUNDED_FOLLOWING":
            hi = part_end.copy()
        else:
            delta = -off(frame.end) if frame.end.kind == "PRECEDING" else \
                (off(frame.end) if frame.end.kind == "FOLLOWING" else 0)
            target = peer_idx + delta
            hi = np.searchsorted(peer_idx, target, side="right") - 1
    else:  # RANGE approximated by peer groups for UNBOUNDED/CURRENT
        peer_start = _segmented_ffill(np.where(new_peer, idx, 0), new_peer)
        peer_end = _peer_group_end(new_peer, idx, n)
        lo = np.where(
            frame.start.kind == "UNBOUNDED_PRECEDING", part_start,
            np.where(frame.start.kind == "CURRENT", peer_start, part_start))
        hi = np.where(
            frame.end.kind == "UNBOUNDED_FOLLOWING", part_end,
            np.where(frame.end.kind == "CURRENT", peer_end, part_end))
        if frame.start.kind in ("PRECEDING", "FOLLOWING") or \
           frame.end.kind in ("PRECEDING", "FOLLOWING"):
            if not w.order_by:
                raise ExecutionError("RANGE with offset requires ORDER BY")
            lo, hi = _range_offset_bounds(w, batch, order, part_start, part_end)
    lo = np.maximum(lo, part_start)
    hi = np.minimum(hi, part_end)
    empty = lo > hi

    if not w.args:
        vals = None
        valid = np.ones(n, bool)
        xtype = dt.INT64
    else:
        c = w.args[0].evaluate(batch).take_host(order)
        valid = K.valid_mask(c)
        xtype = c.dtype
        vals = c

    if name == "count":
        cnt = _frame_sum(valid.astype(np.int64), lo, hi)
        cnt = np.where(empty, 0, cnt)
        return Column(dt.INT64, cnt)
    if name in ("sum", "avg", "mean"):
        x = K.cast_column(vals, dt.FLOAT64).data_host() if not w.out_type.is_decimal \
            else vals.data_host().astype(np.int64)
        x = np.where(valid, x, 0)
        s = _frame_sum(x, lo, hi)
        cnt = _frame_sum(valid.astype(np.int64), lo, hi)
        has = (cnt > 0) & ~empty
        if name == "sum":
            if w.out_type.is_decimal or w.out_type.is_integer:
                return Column(w.out_type, s.astype(w.out_type.device_dtype()),
                              None if has.all() else has)
            return Column(dt.FLOAT64, s.astype(np.float64),
                          None if has.all() else has)
        safe = np.where(has, cnt, 1)
        if w.out_type.is_decimal:
            shift = 10 ** (w.out_type.scale - xtype.scale)
            num = s.astype(object) * int(shift)
            q = np.sign(num) * ((np.abs(num) + safe // 2) // safe)
            return Column(w.out_type, q.astype(np.int64), None if has.all() else has)
        return Column(dt.FLOAT64, s / safe, None if has.all() else has)
    if name in ("min", "max"):
        # O(n log n) sparse-table sliding min/max
        x = vals.data_host()
        key = encode_order_key(vals, name == "min", False)
        res_idx = _range_argopt(key, lo, hi)
        data = x[res_idx]
        v = valid[res_idx] & ~empty
        return Column(xtype, data, None if v.all() else v, vals.dictionary)
    # generic fallback: run the aggregate's accumulator over each row's
    # frame slice (reference: WindowExpr aggregate evaluation; O(n*frame)
    # but covers every aggregate — regr_*, var, corr, median, ...)
    from ..aggregates import create_accumulator
    from ...functions.registry import aggregate_return_type
    arg_cols = [a.evaluate(batch).take_host(order) for a in w.args]
    out_type = w.out_type
    outs = []
    for i in range(n):
        acc = create_accumulator(
            name, [c.dtype for c in arg_cols], out_type)
        if not empty[i]:
            s, e = int(lo[i]), int(hi[i]) + 1
            sl = [c.slice_host(s, e - s) for c in arg_cols]
            acc.update(sl, np.zeros(e - s, np.int64), 1)
        col1 = acc.evaluate(1)
        outs.append(col1.to_pylist(1)[0])
    from ...common.column import Column as _C
    data = np.zeros(n, out_type.device_dtype())
    validity = np.ones(n, bool)
    dic = None
    if out_type.is_dict_coded:
        from ...common.column import Dictionary as _D
        vals = sorted({o for o in outs if o is not None})
        dic = _D(np.array(vals, dtype=object))
        data = np.array([dic.lookup(o) if o is not None else 0
                         for o in outs], np.int32)
    else:
        for i, o in enumerate(outs):
            if o is None:
                validity[i] = False
            else:
                data[i] = _scalar_to_device(o, out_type)
    return Column(out_type, data, None if validity.all() else validity, dic)


def _bound_rows(b, idx, part_start, part_end, is_start):
    if b.kind == "UNBOUNDED_PRECEDING":
        return part_start.copy()
    if b.kind == "UNBOUNDED_FOLLOWING":
        return part_end.copy()
    if b.kind == "CURRENT":
        return idx.copy()
    off = int(b.offset.value) if b.offset is not None and b.offset.value is not None else 0
    if b.kind == "PRECEDING":
        return idx - off
    return idx + off


def _range_offset_bounds(w, batch, order, part_start, part_end):
    """RANGE BETWEEN x PRECEDING AND y FOLLOWING over a single numeric order
    key: binary search value windows."""
    if len(w.order_by) != 1:
        raise ExecutionError("RANGE offset frame requires exactly one ORDER BY key")
    se = w.order_by[0]
    c = se.expr.evaluate(batch).take_host(order)
    x = K.cast_column(c, dt.FLOAT64).data_host()
    n = len(x)
    frame = w.frame
    def off(b):
        return float(b.offset.value) if b.offset is not None and b.offset.value is not None else 0.0
    sgn = 1.0 if se.asc else -1.0
    lo_val = x - sgn * off(frame.start) if frame.start.kind == "PRECEDING" else \
        (x + sgn * off(frame.start) if frame.start.kind == "FOLLOWING" else None)
    hi_val = x + sgn * off(frame.end) if frame.end.kind == "FOLLOWING" else \
        (x - sgn * off(frame.end) if frame.end.kind == "PRECEDING" else None)
    idx = np.arange(n)
    # per-partition searchsorted: x is sorted within partitions (by order key)
    lo = part_start.copy() if lo_val is None else _part_searchsorted(
        x, lo_val, part_start, part_end, "left", se.asc)
    hi = part_end.copy() if hi_val is None else _part_searchsorted(
        x, hi_val, part_start, part_end, "right", se.asc) - 1
    if frame.start.kind == "UNBOUNDED_PRECEDING":
        lo = part_start.copy()
    if frame.end.kind == "UNBOUNDED_FOLLOWING":
        hi = part_end.copy()
    if frame.start.kind == "CURRENT":
        lo = _part_searchsorted(x, x, part_start, part_end, "left", se.asc)
    if frame.end.kind == "CURRENT":
        hi = _part_searchsorted(x, x, part_start, part_end, "right", se.asc) - 1
    del idx
    return lo, hi


def _part_searchsorted(x, targets, part_start, part_end, side, asc):
    out = np.empty(len(x), np.int64)
    # loop per partition run (few partitions expected); vectorized within
    starts = np.unique(part_start)
    for s in starts:
        e = int(part_end[s]) + 1
        seg = x[s:e] if asc else -x[s:e]
        t = targets[s:e] if asc else -targets[s:e]
        out[s:e] = s + np.searchsorted(seg, t, side=side)
    return out


def _frame_sum(x: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    ps = np.concatenate([[0], np.cumsum(x)])
    return ps[np.clip(hi + 1, 0, len(x))] - ps[np.clip(lo, 0, len(x))]


def _range_argopt(key: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """argmin of `key` over [lo, hi] per row — sparse table (O(n log n))."""
    n = len(key)
    if n == 0:
        return np.zeros(0, np.int64)
    levels = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    table = np.zeros((levels, n), np.int64)
    table[0] = np.arange(n)
    length = 1
    for l in range(1, levels):
        prev = table[l - 1]
        shifted = np.concatenate([prev[length:], prev[-length:]]) if length < n \
            else prev
        better = key[shifted] < key[prev]
        table[l] = np.where(better, shifted, prev)
        length *= 2
    width = np.maximum(hi - lo + 1, 1)
    lvl = np.floor(np.log2(width)).astype(np.int64)
    half = (1 << lvl)
    a = table[lvl, np.clip(lo, 0, n - 1)]
    b = table[lvl, np.clip(hi - half + 1, 0, n - 1)]
    return np.where(key[b] < key[a], b, a)


def _scalar_to_device(v, out_type):
    """Python value from Column.to_pylist back to the device repr."""
    from decimal import Decimal as _Dec
    import datetime as _d
    if isinstance(v, _Dec):
        return int(v.scaleb(out_type.scale))
    if isinstance(v, _d.date) and not isinstance(v, _d.datetime):
        return (v - _d.date(1970, 1, 1)).days
    if isinstance(v, np.datetime64):
        return int(v.astype("int64"))
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float, np.integer, np.floating)):
        return v
    raise ExecutionError(f"unsupported window aggregate value {type(v)}")

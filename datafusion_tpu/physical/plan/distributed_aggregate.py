"""Distributed (multi-chip) aggregation through the SQL planner.

Reference parity: the reference scales aggregation by hash-repartitioning
partial states between tasks (`RepartitionExec` + AggregateMode
Partial/FinalPartitioned, SURVEY.md §2.6.3-4).  On TPU the exchange is an
ICI collective instead of a channel: rows are sharded over a
`jax.sharding.Mesh`, every shard computes a fixed-size partial group
table, the tables `all_gather` over the mesh, and each shard reduces the
groups it owns (hash % n_shards) — see `parallel/distributed.py`.

`DistributedAggregateExec` is the planner-visible operator: enabled with
``SET datafusion.tpu.mesh_devices = N`` (N > 1).  Group keys and
aggregate arguments are evaluated with the host expression kernels, rows
are padded to a multiple of the mesh size, and the SPMD program does the
grouping, reduction, and exchange.  Anything it cannot shard falls back
to the single-device / host paths like every other device operator.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ...common import dt
from ...common.batch import Batch, concat_batches
from ...runtime import BaselineMetrics, TaskContext
from .. import kernels as K
from .base import execute_stream
from .device_aggregate import (
    DeviceGroupAggregateExec, DeviceLoweringUnsupported, _PackPlan,
)

_MAX_KEY_BITS = 62


class DistributedAggregateExec(DeviceGroupAggregateExec):
    """Single-phase aggregate executed SPMD over an N-device mesh."""

    def __init__(self, *args, mesh_devices: int = 0, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh_devices = mesh_devices

    def with_children(self, c):
        return DistributedAggregateExec(
            c[0], self.predicate, self.group_exprs, self.aggs, self._schema,
            self.fallback, self.max_groups, mesh_devices=self.mesh_devices)

    # ------------------------------------------------------------------
    def _execute_device(self, partition: int, ctx: TaskContext) -> Optional[Batch]:
        from ...parallel.distributed import (
            distributed_group_aggregate, make_mesh,
        )

        m = BaselineMetrics(self.metrics, partition)
        batches = [b for b in execute_stream(self.source, ctx) if b.num_rows]
        if not batches:
            batch = None
        elif len(batches) == 1:
            batch = batches[0]
        else:
            batch = concat_batches(batches[0].schema, batches)

        n = batch.num_rows if batch is not None else 0

        # ---- host evaluation of keys / predicate / agg args --------------
        if batch is not None:
            row_valid = np.ones(n, bool)
            if self.predicate is not None:
                row_valid = K.true_mask(self.predicate.evaluate(batch))
            key_cols = [e.evaluate(batch) for e, _ in self.group_exprs]
        else:
            row_valid = np.zeros(0, bool)
            key_cols = []

        plan = self._host_pack_plan(key_cols)
        packed = self._host_pack(key_cols, plan, n)

        # ---- slot layout (same dedup scheme as the fused device exec) ----
        slot_defs = {}     # slot -> (kind, arg expr or None)
        slot_map = {}
        uniq: Dict[tuple, str] = {}

        def _slot(cat, sig, suffix, arg):
            key = (cat, sig)
            if key not in uniq:
                uniq[key] = f"v{len(uniq)}{suffix}"
                slot_defs[uniq[key]] = (cat, arg)
            return uniq[key]

        for a in self.aggs:
            kind = "avg" if a.name == "mean" else a.name
            if kind not in ("count", "sum", "avg", "min", "max"):
                raise DeviceLoweringUnsupported(kind)
            if a.filter is not None or a.distinct:
                raise DeviceLoweringUnsupported("agg FILTER/DISTINCT")
            if kind in ("min", "max") and a.out_type.is_string:
                raise DeviceLoweringUnsupported("string min/max")
            arg = a.args[0] if a.args else None
            sig = str(a.args[0]) if a.args else "*"
            m_ = {}
            if kind in ("sum", "avg"):
                m_["s"] = _slot("sum", sig, "#s", arg)
                m_["c"] = _slot("cnt", sig, "#c", arg)
            elif kind == "count":
                m_["c"] = _slot("cnt", sig, "#c", arg)
            elif kind == "min":
                m_["n"] = _slot("min", sig, "#n", arg)
                m_["c"] = _slot("cnt", sig, "#c", arg)
            else:
                m_["x"] = _slot("max", sig, "#x", arg)
                m_["c"] = _slot("cnt", sig, "#c", arg)
            slot_map[a.display] = m_

        values: Dict[str, tuple] = {}
        for slot, (cat, arg) in slot_defs.items():
            if arg is None:
                values[slot] = ("count", np.zeros(n, np.int64))
                continue
            c = arg.evaluate(batch) if batch is not None else None
            av = K.valid_mask(c) if c is not None else np.zeros(0, bool)
            data = c.data_host() if c is not None else np.zeros(0)
            if cat in ("sum", "cnt"):
                if cat == "cnt":
                    values[slot] = ("sum", av.astype(np.int64))
                else:
                    x = data.astype(np.int64) if c.dtype.is_decimal else \
                        data.astype(np.float64)
                    values[slot] = ("sum", np.where(av, x, 0))
            else:
                x = data.astype(np.float64) if not c.dtype.is_decimal else \
                    data.astype(np.int64)
                if x.dtype.kind == "f":
                    sentinel = np.inf if cat == "min" else -np.inf
                else:
                    info = np.iinfo(np.int64)
                    sentinel = info.max if cat == "min" else info.min
                values[slot] = (cat, np.where(av, x, sentinel))

        # ---- shard: pad rows to a multiple of the mesh size ---------------
        n_dev = self.mesh_devices
        pad = (-n) % n_dev if n else n_dev
        if pad:
            packed = np.concatenate([packed, np.full(pad, -1, np.int64)])
            row_valid = np.concatenate([row_valid, np.zeros(pad, bool)])
            values = {s: (k, np.concatenate([a, np.zeros(pad, a.dtype)]))
                      for s, (k, a) in values.items()}

        key_space = 1 << sum(plan.bits)
        if key_space > self.max_groups:
            # a shard-local table overflow would drop groups silently;
            # only run when the exact key space fits the fixed slots
            raise DeviceLoweringUnsupported(
                f"key space {key_space} exceeds mesh group table")
        max_groups = key_space

        mesh = make_mesh(n_dev)
        with m.elapsed_compute:
            gk, gv, aggs = distributed_group_aggregate(
                mesh, packed, row_valid, values, max_groups)
        keys_np = np.asarray(gk)
        valid_np = np.asarray(gv)
        aggs_np = {s: np.asarray(a) for s, a in aggs.items()}

        if n == 0:
            keys_np = None
            valid_np = None
            aggs_np = {}
        out = self._emit_arrays(keys_np, valid_np, aggs_np, plan, slot_map, m)
        if out is not None:
            m.record_output(out.num_rows)
        return out

    # ------------------------------------------------------------------
    def _host_pack_plan(self, key_cols) -> _PackPlan:
        offsets, bits, types, dicts = [], [], [], []
        for c in key_cols:
            types.append(c.dtype)
            if c.dtype.is_string:
                size = len(c.dictionary.values) if c.dictionary is not None else 0
                offsets.append(0)
                bits.append(max(int(size + 1).bit_length(), 1))
                dicts.append(c.dictionary)
                continue
            dicts.append(None)
            if c.dtype.is_boolean:
                offsets.append(0)
                bits.append(2)
                continue
            if not (c.dtype.is_integer or c.dtype.is_decimal or
                    c.dtype.id.value in ("date", "timestamp", "time")):
                raise DeviceLoweringUnsupported(
                    f"group key type {c.dtype} on mesh")
            data = c.data_host()
            v = c.validity_host()
            vals = data[v] if v is not None else data
            lo = int(vals.min()) if len(vals) else 0
            hi = int(vals.max()) if len(vals) else 0
            offsets.append(lo)
            bits.append(max(int(hi - lo + 1).bit_length() + 1, 2))
        if sum(bits) > _MAX_KEY_BITS:
            raise DeviceLoweringUnsupported("group key space too wide")
        return _PackPlan(offsets, bits, types, dicts)

    def _host_pack(self, key_cols, plan: _PackPlan, n: int) -> np.ndarray:
        packed = np.zeros(n, np.int64)
        shift = 0
        for i, c in enumerate(key_cols):
            data = c.data_host()
            v = c.validity_host()
            if c.dtype.is_string:
                raw = data.astype(np.int64) + 1
            elif c.dtype.is_boolean:
                raw = data.astype(np.int64) + 1
            else:
                raw = data.astype(np.int64) - plan.offsets[i] + 1
            if v is not None:
                raw = np.where(v, raw, 0)
            packed |= raw << shift
            shift += plan.bits[i]
        return packed

    def display_line(self):
        base = super().display_line()
        return base.replace("DeviceGroupAggregate",
                            f"DistributedAggregate(mesh={self.mesh_devices})")

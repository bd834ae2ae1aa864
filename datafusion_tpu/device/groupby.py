"""Traceable grouped aggregation (the device GroupedHashAggregateStream).

Reference parity: `aggregates/row_hash.rs:524` `group_aggregate_batch` —
intern keys to dense ids, scatter-reduce per accumulator. On a
static-shape machine interning is done *sort-based*: argsort the packed
key word, mark run boundaries, prefix-sum to dense ids, then
`segment_sum`/`segment_min`/... into a fixed `max_groups`-slot state.
Everything here is jit-traceable: no data-dependent shapes; invalid rows
are masked, unused group slots are reported invalid.

This is also the per-shard "partial" stage of the distributed two-phase
aggregation (`parallel/distributed.py`).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

_SUPPORTED = ("sum", "count", "min", "max")


def pack_keys(key_cols: List[jnp.ndarray], bits: List[int]) -> jnp.ndarray:
    """Pack multiple small-domain key columns into one int64 word
    (dictionary codes / small ints). `bits[i]` is the width reserved for
    column i; caller guarantees the values fit."""
    packed = jnp.zeros(key_cols[0].shape, jnp.int64)
    shift = 0
    for col, b in zip(key_cols, bits):
        packed = packed | (col.astype(jnp.int64) << shift)
        shift += b
    return packed


def device_group_aggregate(
    keys: jnp.ndarray,            # [n] packed int64 key word
    row_valid: jnp.ndarray,       # [n] bool — rows to aggregate
    values: Dict[str, Tuple[str, jnp.ndarray]],
    max_groups: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (group_keys [max_groups], group_valid [max_groups],
    {name: aggregate [max_groups]}).

    values: {output_name: (agg_kind, value_array [n])}; agg kinds:
    sum/count/min/max. Rows with row_valid=False contribute nothing;
    they are sorted to a sentinel slot and masked out of every segment
    reduction.
    """
    n = keys.shape[0]
    sentinel = jnp.int64(0x7FFFFFFFFFFFFFFF)
    k = jnp.where(row_valid, keys, sentinel)
    order = jnp.argsort(k)
    ks = k[order]
    valid_s = row_valid[order]

    new_group = jnp.concatenate([jnp.array([True]), ks[1:] != ks[:-1]])
    new_group = new_group & valid_s
    # dense ids; invalid rows get id max_groups (an overflow slot)
    ids = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    ids = jnp.where(valid_s, ids, max_groups)
    ids = jnp.minimum(ids, max_groups)  # clamp overflow into the trash slot

    num_segments = max_groups + 1
    out: Dict[str, jnp.ndarray] = {}
    for name, (kind, arr) in values.items():
        a = arr[order]
        if kind == "count":
            seg = jax.ops.segment_sum(valid_s.astype(jnp.int64), ids,
                                      num_segments=num_segments)
        elif kind == "sum":
            seg = jax.ops.segment_sum(jnp.where(valid_s, a, 0), ids,
                                      num_segments=num_segments)
        elif kind == "min":
            big = jnp.asarray(jnp.inf if jnp.issubdtype(a.dtype, jnp.floating)
                              else jnp.iinfo(a.dtype).max, a.dtype)
            seg = jax.ops.segment_min(jnp.where(valid_s, a, big), ids,
                                      num_segments=num_segments)
        elif kind == "max":
            small = jnp.asarray(-jnp.inf if jnp.issubdtype(a.dtype, jnp.floating)
                                else jnp.iinfo(a.dtype).min, a.dtype)
            seg = jax.ops.segment_max(jnp.where(valid_s, a, small), ids,
                                      num_segments=num_segments)
        else:
            raise ValueError(f"unsupported device aggregate '{kind}'")
        out[name] = seg[:max_groups]

    group_keys = jax.ops.segment_max(
        jnp.where(valid_s, ks, jnp.int64(-1)), ids,
        num_segments=num_segments)[:max_groups]
    counts = jax.ops.segment_sum(valid_s.astype(jnp.int32), ids,
                                 num_segments=num_segments)[:max_groups]
    group_valid = counts > 0
    return group_keys, group_valid, out


@partial(jax.jit, static_argnames=("max_groups",))
def _jit_group_aggregate(keys, row_valid, names, kinds, arrays, max_groups):
    values = {n: (k, a) for n, k, a in zip(names, kinds, arrays)}
    return device_group_aggregate(keys, row_valid, values, max_groups)


def device_filter_reduce(pred_cols: List[jnp.ndarray],
                         reduce_expr: jnp.ndarray) -> jnp.ndarray:
    """Fused filter + scalar sum (TPC-H Q6 shape): sum(reduce_expr) over
    rows where all pred_cols are True. One pass, fully fusable by XLA."""
    mask = pred_cols[0]
    for p in pred_cols[1:]:
        mask = mask & p
    return jnp.sum(jnp.where(mask, reduce_expr, 0))

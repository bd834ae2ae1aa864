"""All-to-all shuffle exchange + distributed partitioned hash join.

The TPU-native RepartitionExec(Hash) (reference:
physical-plan/src/repartition/mod.rs:391) and PartitionMode::Partitioned
hash join (reference: joins/hash_join.rs:421-503, planner rule
enforce_distribution.rs:1037-1142), re-designed for the XLA collectives
model: instead of channel-per-partition row streams, rows/slots move in
ONE `lax.all_to_all` inside a compiled SPMD program over the mesh's ICI.

Two exchanges live here:

* owned-slot aggregation exchange (`distributed_shuffle_group_aggregate`):
  each shard partially aggregates its rows into L slots, then ships each
  slot to the shard that OWNS its key (hash(key) % n_shards) via
  all_to_all, and the owner merges into its F final slots. Global group
  capacity is n_shards * F — it SCALES with the mesh, unlike the
  broadcast (`all_gather`) exchange in distributed.py whose global
  capacity is one table. Hot keys collapse to one slot per shard before
  any byte moves, so aggregation skew needs no salting.

* row exchange + partitioned join (`distributed_partitioned_join_aggregate`):
  when NEITHER side fits a broadcast, both sides' rows shuffle by key
  owner, each shard sort-merges its partition locally (build argsort +
  searchsorted probe — the measured-fast primitives from BENCH_NOTES),
  and the joined pairs fold straight into the owned-slot aggregation
  exchange. Probe-side key skew is handled by SALTING (SURVEY §5.7,
  deliberately beyond the reference): with salt factor S, build rows
  replicate S ways keyed on (key, s), probe rows pick s = row % S, and
  the join key becomes (key, salt) — a hot key's pairs spread over S
  shards.

Capacities are static (XLA needs static shapes): callers pass per-stage
caps; every stage reports an overflow flag and the host retries with a
larger cap (the DeviceCapacityRetry pattern used by the fused join).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..device.groupby import device_group_aggregate
from .distributed import _splitmix64_jnp


def _owner(keys: jnp.ndarray, n_shards: int,
           salt: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Destination shard of a key (optionally salted): matches the host
    partitioner (physical/hashing.py splitmix64) so host and device
    shuffles agree."""
    x = keys.astype(jnp.uint64)
    if salt is not None:
        # fold the salt in BEFORE the finalizer so (key, s) spreads
        x = x * jnp.uint64(0x100000001B3) + salt.astype(jnp.uint64)
    return (_splitmix64_jnp(x) % jnp.uint64(n_shards)).astype(jnp.int32)


def _all_to_all_rows(axis: str, n_shards: int, owner: jnp.ndarray,
                     valid: jnp.ndarray, arrays, cap: int):
    """Inside-shard_map row exchange: each local row goes to shard
    `owner[i]`. Returns (recv_arrays, recv_valid [n_shards*cap], overflow).

    Rows bucket into n_shards blocks of `cap` slots by a single stable
    argsort on the destination (no scatter — sort + gathers only, per the
    v5e primitive costs), then one lax.all_to_all ships block d to shard d.
    """
    n = owner.shape[0]
    own = jnp.where(valid, owner.astype(jnp.int32), jnp.int32(n_shards))
    order = jnp.argsort(own, stable=True)
    own_s = own[order]
    dests = jnp.arange(n_shards, dtype=own_s.dtype)
    starts = jnp.searchsorted(own_s, dests, side="left", method="sort")
    lens = jnp.searchsorted(own_s, dests, side="right",
                            method="sort") - starts
    overflow = jnp.max(lens) > cap

    j = jnp.arange(n_shards * cap)
    dest = j // cap
    within = j % cap
    src = jnp.clip(starts[dest] + within, 0, max(n - 1, 0))
    slot_valid = within < lens[dest]
    rows = order[src]

    def ship(a):
        block = a[rows].reshape(n_shards, cap, *a.shape[1:])
        recv = jax.lax.all_to_all(block, axis, split_axis=0, concat_axis=0)
        return recv.reshape(n_shards * cap, *a.shape[1:])

    def ship_mask(m):
        # the mask is NOT a row gather (it is positional); ship it as int8
        block = m.astype(jnp.int8).reshape(n_shards, cap)
        recv = jax.lax.all_to_all(block, axis, split_axis=0, concat_axis=0)
        return recv.reshape(n_shards * cap).astype(bool)

    recv_valid = ship_mask(slot_valid)
    recv_arrays = [ship(a) for a in arrays]
    # every shard must agree on overflow so the host sees one flag
    overflow = jax.lax.pmax(overflow.astype(jnp.int32), axis)
    return recv_arrays, recv_valid, overflow


def distributed_shuffle_group_aggregate(
    mesh: Mesh,
    keys: jnp.ndarray,                     # [n] packed int64, row-sharded
    row_valid: jnp.ndarray,                # [n] bool
    values: Dict[str, Tuple[str, jnp.ndarray]],
    partial_groups: int,                   # L: per-shard partial table
    final_groups_per_shard: int,           # F: per-shard owned table
    slot_cap: Optional[int] = None,        # per-destination slot capacity
    axis: str = "dp",
):
    """Owned-slot all_to_all aggregation (VERDICT round-1 item 1a).

    partial (L slots/shard) -> all_to_all slots by key owner ->
    final merge (F slots/shard) -> all_gather the owned tables.

    Global group capacity = n_shards * F. Returns
    (group_keys, group_valid, {name: agg}, overflow) with the first three
    replicated [n_shards * F]; `overflow` > 0 means a capacity was
    exceeded (partial table, slot cap, or final table) and the caller
    must retry with larger capacities.
    """
    names = tuple(values.keys())
    kinds = tuple(k for k, _ in values.values())
    arrays = [a for _, a in values.values()]
    n_shards = mesh.shape[axis]
    if slot_cap is None:
        # expected L/n per destination; 4x slack absorbs imbalance
        slot_cap = max(1, min(partial_groups, 4 * partial_groups // n_shards))

    def step(keys_l, valid_l, *arrays_l):
        vals = {n: (k, a) for n, k, a in zip(names, kinds, arrays_l)}
        gk, gv, partials, ng = device_group_aggregate(
            keys_l, valid_l, vals, partial_groups)
        ovf_partial = (ng > partial_groups).astype(jnp.int32)

        own = _owner(gk, n_shards)
        ship = [gk] + [partials[n] for n in names]
        recv, recv_valid, ovf_slots = _all_to_all_rows(
            axis, n_shards, own, gv, ship, slot_cap)
        rk = recv[0]
        merge_vals = {}
        for i, n in enumerate(names):
            kind = "sum" if kinds[i] in ("sum", "count") else kinds[i]
            merge_vals[n] = (kind, recv[1 + i])
        fk, fv, faggs, ng2 = device_group_aggregate(
            rk, recv_valid, merge_vals, final_groups_per_shard)
        ovf_final = (ng2 > final_groups_per_shard).astype(jnp.int32)
        ovf = jax.lax.pmax(ovf_partial + ovf_final, axis) + ovf_slots

        fk_all = jax.lax.all_gather(fk, axis).reshape(-1)
        fv_all = jax.lax.all_gather(fv, axis).reshape(-1)
        faggs_all = {n: jax.lax.all_gather(a, axis).reshape(-1)
                     for n, a in faggs.items()}
        return fk_all, fv_all, faggs_all, ovf

    from jax import shard_map
    in_specs = (P(axis), P(axis)) + tuple(P(axis) for _ in arrays)
    out_specs = (P(), P(), {n: P() for n in names}, P())
    fn = shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    shd = NamedSharding(mesh, P(axis))
    keys = jax.device_put(keys, shd)
    row_valid = jax.device_put(row_valid, shd)
    arrays = [jax.device_put(a, shd) for a in arrays]
    gk, gv, aggs, ovf = jax.jit(fn)(keys, row_valid, *arrays)
    return gk, gv, aggs, int(np.asarray(ovf).reshape(-1)[0])


def distributed_partitioned_join_aggregate(
    mesh: Mesh,
    build_keys: jnp.ndarray,        # [nb] int64, ROW-SHARDED (large build)
    build_valid: jnp.ndarray,       # [nb] bool
    build_group: jnp.ndarray,       # [nb] int64 build-side group-key part
    build_values: Dict[str, jnp.ndarray],
    probe_keys: jnp.ndarray,        # [np] int64, row-sharded
    probe_valid: jnp.ndarray,       # [np] bool
    probe_group: jnp.ndarray,       # [np] int64 probe-side group-key part
    probe_values: Dict[str, jnp.ndarray],
    kinds: Dict[str, str],          # slot -> "sum" | "count" | "min" | "max"
    fills: Dict[str, float],        # value for non-matching pair lanes
    final_groups_per_shard: int,
    build_cap: int,                 # received build rows per shard
    probe_cap: int,                 # received probe rows per shard
    fanout_cap: int,                # max build matches per probe row
    partial_groups: Optional[int] = None,
    slot_cap: Optional[int] = None,
    salt: int = 1,                  # skew salt factor S (SURVEY §5.7)
    axis: str = "dp",
):
    """Distributed PARTITIONED hash join + aggregation, one SPMD program
    (VERDICT round-1 item 1b): neither side is replicated. Both sides'
    rows shuffle to the shard owning hash(key[, salt]); each shard
    argsorts its build partition, probes with two searchsorted calls,
    expands matches into rows*fanout lanes, partially aggregates, and the
    group slots take the owned-slot exchange.

    With `salt` = S > 1, build rows replicate S ways on (key, s) and each
    probe row picks s = local_row % S, so one hot key spreads over S
    shards (the skew strategy the reference lacks).

    Returns (group_keys, group_valid, {slot: agg}, overflow) — replicated
    tables of n_shards * final_groups_per_shard slots.
    """
    slot_names = tuple(sorted(set(build_values) | set(probe_values)))
    b_names = tuple(n for n in slot_names if n in build_values)
    p_names = tuple(n for n in slot_names if n in probe_values)
    n_shards = mesh.shape[axis]
    if partial_groups is None:
        partial_groups = final_groups_per_shard * n_shards
    if slot_cap is None:
        slot_cap = max(1, min(partial_groups, 4 * partial_groups // n_shards))

    def step(bk, bv, bg, pk, pv_, pg, b_arrs, p_arrs):
        # ---- exchange the build side (salted: replicate S ways) --------
        if salt > 1:
            reps = jnp.arange(salt, dtype=jnp.uint64)
            bk_s = jnp.tile(bk, salt)
            bv_s = jnp.tile(bv, salt)
            bsalt = jnp.repeat(reps, bk.shape[0])
            own_b = _owner(bk_s, n_shards, bsalt)
            ship_b = [bk_s, bsalt.astype(jnp.int64), jnp.tile(bg, salt)] + \
                [jnp.tile(a, salt) for a in b_arrs]
            recv_b, rb_valid, ovf_b = _all_to_all_rows(
                axis, n_shards, own_b, bv_s, ship_b, build_cap)
            rbk, rbsalt, rbg = recv_b[0], recv_b[1], recv_b[2]
            rb_arrs = recv_b[3:]
            # join on (key, salt): pack the salt into the compare word's
            # low bits via a second sort key — simpler: offset the key
            # (keys are packed group-intern codes, far below 2**60)
            rbk = rbk * jnp.int64(salt) + rbsalt.astype(jnp.int64)
        else:
            own_b = _owner(bk, n_shards)
            ship_b = [bk, bg] + list(b_arrs)
            recv_b, rb_valid, ovf_b = _all_to_all_rows(
                axis, n_shards, own_b, bv, ship_b, build_cap)
            rbk, rbg = recv_b[0], recv_b[1]
            rb_arrs = recv_b[2:]

        # ---- exchange the probe side ------------------------------------
        if salt > 1:
            psalt = (jnp.arange(pk.shape[0]) % salt).astype(jnp.uint64)
            own_p = _owner(pk, n_shards, psalt)
            ship_p = [pk * jnp.int64(salt) + psalt.astype(jnp.int64), pg] + \
                list(p_arrs)
        else:
            own_p = _owner(pk, n_shards)
            ship_p = [pk, pg] + list(p_arrs)
        recv_p, rp_valid, ovf_p = _all_to_all_rows(
            axis, n_shards, own_p, pv_, ship_p, probe_cap)
        rpk, rpg = recv_p[0], recv_p[1]
        rp_arrs = recv_p[2:]

        # ---- local sorted-build + searchsorted probe --------------------
        sentinel = jnp.int64(0x7FFFFFFFFFFFFFFF)
        bkey = jnp.where(rb_valid, rbk, sentinel)
        bord = jnp.argsort(bkey)
        sbk = bkey[bord]
        pkey = jnp.where(rp_valid, rpk, sentinel - 1)
        lo = jnp.searchsorted(sbk, pkey, side="left", method="sort")
        hi = jnp.searchsorted(sbk, pkey, side="right", method="sort")
        counts = jnp.where(rp_valid, jnp.minimum(hi - lo, fanout_cap), 0)
        ovf_fan = jax.lax.pmax(
            (jnp.max(jnp.where(rp_valid, hi - lo, 0)) > fanout_cap)
            .astype(jnp.int32), axis)
        offs = jnp.cumsum(counts)
        n_loc = pkey.shape[0]
        cap_pairs = n_loc * fanout_cap
        j = jnp.arange(cap_pairs)
        prow = jnp.clip(jnp.searchsorted(offs, j, side="right",
                                         method="sort"), 0, n_loc - 1)
        within = j - (offs[prow] - counts[prow])
        bpos = jnp.clip(lo[prow] + within, 0, sbk.shape[0] - 1)
        pair_valid = (j < offs[-1]) & (sbk[bpos] == pkey[prow])
        bsrc = bord[bpos]
        pair_group = jnp.where(pair_valid, rpg[prow] | rbg[bsrc], 0)

        vals = {}
        for name in slot_names:
            if name in p_names:
                v = rp_arrs[p_names.index(name)][prow]
            else:
                v = rb_arrs[b_names.index(name)][bsrc]
            v = jnp.where(pair_valid, v, jnp.asarray(fills[name], v.dtype))
            vals[name] = (kinds[name], v)

        # ---- partial group table + owned-slot exchange -------------------
        gk, gv, partials, ng = device_group_aggregate(
            pair_group, pair_valid, vals, partial_groups)
        ovf_partial = (ng > partial_groups).astype(jnp.int32)
        own_g = _owner(gk, n_shards)
        ship_g = [gk] + [partials[n] for n in slot_names]
        recv_g, rg_valid, ovf_slots = _all_to_all_rows(
            axis, n_shards, own_g, gv, ship_g, slot_cap)
        merge_vals = {}
        for i, n in enumerate(slot_names):
            kind = "sum" if kinds[n] in ("sum", "count") else kinds[n]
            merge_vals[n] = (kind, recv_g[1 + i])
        fk, fv, faggs, ng2 = device_group_aggregate(
            recv_g[0], rg_valid, merge_vals, final_groups_per_shard)
        ovf_final = (ng2 > final_groups_per_shard).astype(jnp.int32)
        ovf = (ovf_b + ovf_p + ovf_slots + ovf_fan
               + jax.lax.pmax(ovf_partial + ovf_final, axis))

        return (jax.lax.all_gather(fk, axis).reshape(-1),
                jax.lax.all_gather(fv, axis).reshape(-1),
                {n: jax.lax.all_gather(a, axis).reshape(-1)
                 for n, a in faggs.items()},
                ovf)

    from jax import shard_map
    in_specs = (P(axis),) * 3 + (P(axis),) * 3 + (
        tuple(P(axis) for _ in b_names), tuple(P(axis) for _ in p_names))
    # reorder: (bk, bv, bg, pk, pv, pg, b_arrs, p_arrs)
    in_specs = (P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                tuple(P(axis) for _ in b_names),
                tuple(P(axis) for _ in p_names))
    out_specs = (P(), P(), {n: P() for n in slot_names}, P())
    fn = shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    shd = NamedSharding(mesh, P(axis))
    args = (jax.device_put(build_keys, shd), jax.device_put(build_valid, shd),
            jax.device_put(build_group, shd),
            jax.device_put(probe_keys, shd), jax.device_put(probe_valid, shd),
            jax.device_put(probe_group, shd),
            tuple(jax.device_put(build_values[n], shd) for n in b_names),
            tuple(jax.device_put(probe_values[n], shd) for n in p_names))
    gk, gv, aggs, ovf = jax.jit(fn)(*args)
    return gk, gv, aggs, int(np.asarray(ovf).reshape(-1)[0])

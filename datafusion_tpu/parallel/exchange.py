"""All-to-all shuffle exchange + distributed partitioned hash join.

The TPU-native RepartitionExec(Hash) (reference:
physical-plan/src/repartition/mod.rs:391) and PartitionMode::Partitioned
hash join (reference: joins/hash_join.rs:421-503, planner rule
enforce_distribution.rs:1037-1142), re-designed for the XLA collectives
model: instead of channel-per-partition row streams, rows/slots move in
`lax.all_to_all` collectives inside ONE compiled SPMD program over the
mesh's ICI.

The exchange is OVERFLOW-CHAINED (the static-shape analog of the
reference's credit-based `distributor_channels.rs:18-40`, which never
reallocates): every round ships a FIXED number of slots per destination
and the receiver immediately FOLDS what arrived into fixed-size state
(a group table), so nothing unbounded ever materializes. A
`lax.while_loop` inside the compiled program repeats rounds until every
shard has shipped everything — skewed destinations simply take more
rounds of the same program, never a recompile. Capacity retry ladders
(the round-2/3 `[(2,1),(8,1),(8,4),(32,8)]` slack/salt ladder) are gone.

Two exchanges live here:

* owned-slot aggregation exchange (`distributed_shuffle_group_aggregate`):
  each shard partially aggregates its rows into L slots (L >= local rows,
  so the partial table cannot overflow), then ships slots to the shard
  that OWNS their key (hash(key) % n_shards) in chained rounds; the owner
  merges each round into its F final slots. Global group capacity is
  n_shards * F — it SCALES with the mesh. Hot keys collapse to one slot
  per shard before any byte moves, so aggregation skew needs no salting.

* row exchange + partitioned join (`distributed_partitioned_join_aggregate`):
  when NEITHER side fits a broadcast, the build side's rows shuffle once
  to their key owner (capacity computed EXACTLY on the host from the
  keys — the host packs them anyway), the probe side streams through
  chained rounds, each round joining against the local sorted build
  partition and folding the pairs straight into the shard's group table.
  A probe-side hot key costs extra rounds on its owner shard, never a
  bigger buffer. SALTING (SURVEY §5.7) remains available for load
  balance: with salt factor S, build rows replicate S ways keyed on
  (key, s) and probe rows pick s = row % S, spreading a hot key's JOIN
  WORK over S shards.

The only remaining overflow flags are genuine capacity limits — final
group tables (global distinct > n_shards * F) and join fanout — which
callers treat as "this plan does not fit the mesh" (fall back), never as
"retry bigger".
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..device.groupby import device_group_aggregate
from .distributed import _splitmix64_jnp


# compiled exchange programs, cached by their full static configuration:
# calling the same exchange shape twice (even with different data) traces
# and compiles exactly once. TRACE_LOG records one entry per (re)trace —
# tests assert "one compile per program shape" against it.
_JIT_CACHE: dict = {}
TRACE_LOG: list = []


def _mesh_key(mesh: Mesh, axis: str):
    return (axis, tuple(d.id for d in mesh.devices.flat))


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


def host_owner(keys: np.ndarray, n_shards: int,
               salt: Optional[np.ndarray] = None) -> np.ndarray:
    """Host twin of `_owner` — lets planners size receive buffers EXACTLY
    from the (host-resident) keys instead of guessing capacities."""
    from ..physical.hashing import _splitmix64
    x = keys.astype(np.uint64)
    if salt is not None:
        x = x * np.uint64(0x100000001B3) + salt.astype(np.uint64)
    return (_splitmix64(x) % np.uint64(n_shards)).astype(np.int32)


def _all_to_all_rows(axis: str, n_shards: int, owner: jnp.ndarray,
                     valid: jnp.ndarray, arrays, cap: int):
    """Inside-shard_map ONE-SHOT row exchange: each local row goes to
    shard `owner[i]`. Returns (recv_arrays, recv_valid [n_shards*cap],
    overflow). Used where the receiver must MATERIALIZE the rows (join
    build side) and the caller sized `cap` exactly from host data.

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


def _all_to_all_chained(axis: str, n_shards: int, owner: jnp.ndarray,
                        valid: jnp.ndarray, arrays, cap: int, fold, carry):
    """CHAINED row exchange: ships `valid` rows to `owner[i]` in rounds
    of at most `cap` slots per destination; after each round the receiver
    folds the arrivals into `carry` (fixed-shape state) via
    `fold(carry, recv_arrays, recv_valid) -> carry`. A `lax.while_loop`
    repeats until every shard has shipped everything — overflow is
    IMPOSSIBLE by construction (the second-round pass of SURVEY §7's
    "fixed-size bucket slots + overflow rounds"; reference contrast:
    repartition/distributor_channels.rs never reallocates either).

    Returns (carry, rounds_executed). One compile per shape; skew only
    adds rounds.
    """
    n = owner.shape[0]

    def round_ship(pending):
        """One round: pick <= cap pending rows per destination, ship.
        Returns (recv_arrays, recv_valid, sent_mask, any_left)."""
        own = jnp.where(pending, owner.astype(jnp.int32), jnp.int32(n_shards))
        order = jnp.argsort(own, stable=True)
        inv = jnp.argsort(order)          # row -> its sorted position
        own_s = own[order]
        dests = jnp.arange(n_shards, dtype=own_s.dtype)
        starts = jnp.searchsorted(own_s, dests, side="left", method="sort")
        lens = jnp.searchsorted(own_s, dests, side="right",
                                method="sort") - starts
        j = jnp.arange(n_shards * cap)
        dest = j // cap
        within = j % cap
        src = jnp.clip(starts[dest] + within, 0, max(n - 1, 0))
        slot_valid = within < jnp.minimum(lens[dest], cap)
        rows = order[src]

        def ship(a):
            block = a[rows].reshape(n_shards, cap, *a.shape[1:])
            recv = jax.lax.all_to_all(block, axis, split_axis=0,
                                      concat_axis=0)
            return recv.reshape(n_shards * cap, *a.shape[1:])

        def ship_mask(m):
            block = m.astype(jnp.int8).reshape(n_shards, cap)
            recv = jax.lax.all_to_all(block, axis, split_axis=0,
                                      concat_axis=0)
            return recv.reshape(n_shards * cap).astype(bool)

        recv_valid = ship_mask(slot_valid)
        recv_arrays = [ship(a) for a in arrays]
        # a row was shipped iff its rank within its destination < cap
        pos = jnp.arange(n)
        rank = inv - starts[jnp.clip(own, 0, n_shards - 1)]
        sent = pending & (rank < cap)
        del pos
        left = jnp.any(pending & ~sent)
        return recv_arrays, recv_valid, sent, left

    # `go` is computed collectively in the BODY (cond must stay local)
    go0 = jax.lax.pmax(jnp.any(valid).astype(jnp.int32), axis)

    def cond(state):
        _pending, _carry, go, _r = state
        return go > 0

    def body(state):
        pending, carry_, _go, r = state
        recv_arrays, recv_valid, sent, left = round_ship(pending)
        carry_ = fold(carry_, recv_arrays, recv_valid)
        go_next = jax.lax.pmax(left.astype(jnp.int32), axis)
        return (pending & ~sent, carry_, go_next, r + 1)

    pending0 = valid
    state = jax.lax.while_loop(
        cond, body, (pending0, carry, go0, jnp.int32(0)))
    return state[1], state[3]


def _merge_fold(names, merge_kinds, final_groups):
    """fold(carry, recv, recv_valid): merge received (key, slot-values)
    entries into a fixed final_groups table. carry = (fk, fv, {aggs},
    ovf int32); recv[0] = keys, recv[1+i] = slot i."""
    def fold(carry, recv, recv_valid):
        fk, fv, faggs, ovf = carry
        ck = jnp.concatenate([fk, recv[0]])
        cv = jnp.concatenate([fv, recv_valid])
        mv = {}
        for i, n_ in enumerate(names):
            mv[n_] = (merge_kinds[i],
                      jnp.concatenate([faggs[n_], recv[1 + i]]))
        nk, nv, na, ng = device_group_aggregate(ck, cv, mv, final_groups)
        ovf = jnp.maximum(ovf, (ng > final_groups).astype(jnp.int32))
        return (nk, nv, na, ovf)
    return fold


def _empty_table(names, final_groups, dtypes):
    return (jnp.full(final_groups, -1, jnp.int64),
            jnp.zeros(final_groups, bool),
            {n_: jnp.zeros(final_groups, dtypes[n_]) for n_ in names},
            jnp.int32(0))


def distributed_shuffle_group_aggregate(
    mesh: Mesh,
    keys: jnp.ndarray,                     # [n] packed int64, row-sharded
    row_valid: jnp.ndarray,                # [n] bool
    values: Dict[str, Tuple[str, jnp.ndarray]],
    partial_groups: int,                   # L: per-shard partial table
    final_groups_per_shard: int,           # F: per-shard owned table
    slot_cap: Optional[int] = None,        # per-destination slots PER ROUND
    axis: str = "dp",
):
    """Owned-slot chained all_to_all aggregation.

    partial (L slots/shard) -> chained all_to_all slots by key owner,
    folding each round into the owner's F-slot table -> all_gather.

    Global group capacity = n_shards * F. Returns
    (group_keys, group_valid, {name: agg}, overflow) with the first three
    replicated [n_shards * F]. `overflow` > 0 means the FINAL table's
    capacity was genuinely exceeded (more distinct groups owned by a
    shard than F) — the caller falls back; slot transport can no longer
    overflow (chained rounds).
    """
    names = tuple(values.keys())
    kinds = tuple(k for k, _ in values.values())
    merge_kinds = tuple("sum" if k in ("sum", "count") else k for k in kinds)
    arrays = [a for _, a in values.values()]
    n_shards = mesh.shape[axis]
    if slot_cap is None:
        # expected L/n per destination; 4x slack makes 1 round typical,
        # skew just adds rounds
        slot_cap = max(1, min(partial_groups, 4 * partial_groups // n_shards))

    cache_key = ("shuffle", _mesh_key(mesh, axis), names, kinds,
                 partial_groups, final_groups_per_shard, slot_cap,
                 keys.shape, tuple((a.shape, str(a.dtype)) for a in arrays))

    def step(keys_l, valid_l, *arrays_l):
        TRACE_LOG.append(cache_key)
        vals = {n: (k, a) for n, k, a in zip(names, kinds, arrays_l)}
        gk, gv, partials, ng = device_group_aggregate(
            keys_l, valid_l, vals, partial_groups)
        # L >= distinct local keys (callers size L >= local rows or the
        # key space), so this flag is defensive
        ovf_partial = (ng > partial_groups).astype(jnp.int32)

        own = _owner(gk, n_shards)
        ship = [gk] + [partials[n] for n in names]
        dtypes = {n: partials[n].dtype for n in names}
        table0 = _empty_table(names, final_groups_per_shard, dtypes)
        fold = _merge_fold(names, merge_kinds, final_groups_per_shard)
        (fk, fv, faggs, ovf_final), _rounds = _all_to_all_chained(
            axis, n_shards, own, gv, ship, slot_cap, fold, table0)
        ovf = jax.lax.pmax(ovf_partial + ovf_final, axis)

        fk_all = jax.lax.all_gather(fk, axis).reshape(-1)
        fv_all = jax.lax.all_gather(fv, axis).reshape(-1)
        faggs_all = {n: jax.lax.all_gather(a, axis).reshape(-1)
                     for n, a in faggs.items()}
        return fk_all, fv_all, faggs_all, ovf

    jitted = _JIT_CACHE.get(cache_key)
    if jitted is None:
        from jax import shard_map
        in_specs = (P(axis), P(axis)) + tuple(P(axis) for _ in arrays)
        out_specs = (P(), P(), {n: P() for n in names}, P())
        fn = shard_map(step, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        jitted = _JIT_CACHE[cache_key] = jax.jit(fn)
    shd = NamedSharding(mesh, P(axis))
    keys = jax.device_put(keys, shd)
    row_valid = jax.device_put(row_valid, shd)
    arrays = [jax.device_put(a, shd) for a in arrays]
    gk, gv, aggs, ovf = jitted(keys, row_valid, *arrays)
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
    build_cap: int,                 # received build rows per shard (EXACT —
    #                                 compute from host keys via host_owner)
    probe_cap: int,                 # probe rows shipped per dest PER ROUND
    fanout_cap: int,                # max build matches per probe row
    partial_groups: Optional[int] = None,
    slot_cap: Optional[int] = None,
    salt: int = 1,                  # skew salt factor S (SURVEY §5.7)
    axis: str = "dp",
):
    """Distributed PARTITIONED hash join + aggregation, one SPMD program:
    neither side is replicated. The build side shuffles ONCE to the shard
    owning hash(key[, salt]) — its receive buffer is sized exactly on the
    host (the packed keys are host-resident). The probe side streams
    through CHAINED rounds: each round ships <= probe_cap rows per
    destination, the receiver joins them against its sorted build
    partition (two searchsorted calls + bounded-fanout pair expansion)
    and folds the pairs straight into its group table — so probe-side
    skew costs rounds, never capacity. The partial group tables then take
    the chained owned-slot exchange into the final F-slot tables.

    With `salt` = S > 1, build rows replicate S ways on (key, s) and each
    probe row picks s = local_row % S, spreading one hot key's JOIN WORK
    over S shards (pure load balance now — capacity no longer needs it).

    Returns (group_keys, group_valid, {slot: agg}, overflow) — replicated
    tables of n_shards * final_groups_per_shard slots. overflow > 0 only
    for genuine capacity limits: build_cap missized, fanout beyond
    fanout_cap, or group tables too small — callers fall back, they do
    NOT retry with bigger shapes.
    """
    slot_names = tuple(sorted(set(build_values) | set(probe_values)))
    b_names = tuple(n for n in slot_names if n in build_values)
    p_names = tuple(n for n in slot_names if n in probe_values)
    merge_kinds = {n: ("sum" if kinds[n] in ("sum", "count") else kinds[n])
                   for n in slot_names}
    n_shards = mesh.shape[axis]
    if partial_groups is None:
        partial_groups = final_groups_per_shard * n_shards
    if slot_cap is None:
        slot_cap = max(1, min(partial_groups, 4 * partial_groups // n_shards))

    cache_key = (
        "pjoin", _mesh_key(mesh, axis), slot_names, b_names, p_names,
        tuple(sorted(kinds.items())), tuple(sorted(fills.items())),
        final_groups_per_shard, build_cap, probe_cap, fanout_cap,
        partial_groups, slot_cap, salt,
        build_keys.shape, probe_keys.shape,
        tuple((build_values[n].shape, str(build_values[n].dtype))
              for n in b_names),
        tuple((probe_values[n].shape, str(probe_values[n].dtype))
              for n in p_names))

    def step(bk, bv, bg, pk, pv_, pg, b_arrs, p_arrs):
        TRACE_LOG.append(cache_key)
        # ---- exchange the build side ONCE (salted: replicate S ways) ----
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
            # join on (key, salt): keys are packed group-intern codes far
            # below 2**60, so the salt folds into the low bits
            rbk = rbk * jnp.int64(salt) + rbsalt.astype(jnp.int64)
        else:
            own_b = _owner(bk, n_shards)
            ship_b = [bk, bg] + list(b_arrs)
            recv_b, rb_valid, ovf_b = _all_to_all_rows(
                axis, n_shards, own_b, bv, ship_b, build_cap)
            rbk, rbg = recv_b[0], recv_b[1]
            rb_arrs = recv_b[2:]

        # ---- sort the local build partition once (loop-invariant) -------
        sentinel = jnp.int64(0x7FFFFFFFFFFFFFFF)
        bkey = jnp.where(rb_valid, rbk, sentinel)
        bord = jnp.argsort(bkey)
        sbk = bkey[bord]

        # ---- probe side: CHAINED rounds, join + fold each round ----------
        if salt > 1:
            psalt = (jnp.arange(pk.shape[0]) % salt).astype(jnp.uint64)
            own_p = _owner(pk, n_shards, psalt)
            ship_p = [pk * jnp.int64(salt) + psalt.astype(jnp.int64), pg] + \
                list(p_arrs)
        else:
            own_p = _owner(pk, n_shards)
            ship_p = [pk, pg] + list(p_arrs)

        pair_dtypes = {}
        for name in slot_names:
            src = p_arrs[p_names.index(name)] if name in p_names \
                else b_arrs[b_names.index(name)]
            pair_dtypes[name] = src.dtype
        ptable0 = _empty_table(slot_names, partial_groups, pair_dtypes)
        # extra carry lane: fanout overflow
        carry0 = ptable0 + (jnp.int32(0),)

        def fold_probe(carry, recv, recv_valid):
            tk, tv, taggs, ovf_t, ovf_fan = carry
            rpk, rpg = recv[0], recv[1]
            rp_arrs = recv[2:]
            pkey = jnp.where(recv_valid, rpk, sentinel - 1)
            lo = jnp.searchsorted(sbk, pkey, side="left", method="sort")
            hi = jnp.searchsorted(sbk, pkey, side="right", method="sort")
            counts = jnp.where(recv_valid,
                               jnp.minimum(hi - lo, fanout_cap), 0)
            ovf_fan = jnp.maximum(ovf_fan, (jnp.max(jnp.where(
                recv_valid, hi - lo, 0)) > fanout_cap).astype(jnp.int32))
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

            ck = jnp.concatenate([tk, pair_group])
            cv = jnp.concatenate([tv, pair_valid])
            mv = {}
            for name in slot_names:
                if name in p_names:
                    v = rp_arrs[p_names.index(name)][prow]
                else:
                    v = rb_arrs[b_names.index(name)][bsrc]
                v = jnp.where(pair_valid, v,
                              jnp.asarray(fills[name], v.dtype))
                mv[name] = (merge_kinds[name],
                            jnp.concatenate([taggs[name], v]))
            nk, nv, na, ng = device_group_aggregate(ck, cv, mv,
                                                    partial_groups)
            ovf_t = jnp.maximum(ovf_t, (ng > partial_groups)
                                .astype(jnp.int32))
            return (nk, nv, na, ovf_t, ovf_fan)

        (tk, tv, taggs, ovf_partial, ovf_fan), _rounds = _all_to_all_chained(
            axis, n_shards, own_p, pv_, ship_p, probe_cap, fold_probe,
            carry0)

        # ---- chained owned-slot exchange of the partial tables -----------
        own_g = _owner(tk, n_shards)
        ship_g = [tk] + [taggs[n] for n in slot_names]
        ftable0 = _empty_table(slot_names, final_groups_per_shard,
                               {n: taggs[n].dtype for n in slot_names})
        fold_g = _merge_fold(slot_names,
                             tuple(merge_kinds[n] for n in slot_names),
                             final_groups_per_shard)
        (fk, fv, faggs, ovf_final), _r2 = _all_to_all_chained(
            axis, n_shards, own_g, tv, ship_g, slot_cap, fold_g, ftable0)

        ovf = ovf_b + jax.lax.pmax(
            ovf_partial + ovf_final + ovf_fan, axis)
        return (jax.lax.all_gather(fk, axis).reshape(-1),
                jax.lax.all_gather(fv, axis).reshape(-1),
                {n: jax.lax.all_gather(a, axis).reshape(-1)
                 for n, a in faggs.items()},
                ovf)

    jitted = _JIT_CACHE.get(cache_key)
    if jitted is None:
        from jax import shard_map
        in_specs = (P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                    tuple(P(axis) for _ in b_names),
                    tuple(P(axis) for _ in p_names))
        out_specs = (P(), P(), {n: P() for n in slot_names}, P())
        fn = shard_map(step, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        jitted = _JIT_CACHE[cache_key] = jax.jit(fn)
    shd = NamedSharding(mesh, P(axis))
    args = (jax.device_put(build_keys, shd), jax.device_put(build_valid, shd),
            jax.device_put(build_group, shd),
            jax.device_put(probe_keys, shd), jax.device_put(probe_valid, shd),
            jax.device_put(probe_group, shd),
            tuple(jax.device_put(build_values[n], shd) for n in b_names),
            tuple(jax.device_put(probe_values[n], shd) for n in p_names))
    gk, gv, aggs, ovf = jitted(*args)
    return gk, gv, aggs, int(np.asarray(ovf).reshape(-1)[0])

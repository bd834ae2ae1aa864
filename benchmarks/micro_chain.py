"""Microbenchmark the Q3-shaped chain-step primitives on the real chip.

Times each phase of the fused chain program separately (block_until_ready
after warm compile): filter, LUT gathers, key packing, sorted-group-agg
pieces (cummax/cumsum/segment_ends), and the full composed step.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 23          # 8M spine capacity
NROWS = 6_001_215
MAXG = 1 << 22       # 4M group slots
LUT1 = 1 << 21       # orders LUT span (1.5M keys -> 2^21)
LUT2 = 1 << 18       # customer LUT span (150k)


def _sync(out):
    """Force real completion: fetch one scalar D2H (block_until_ready does
    not actually block through the axon tunnel)."""
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "block_until_ready")]
    for x in leaves:
        x.block_until_ready()
    if leaves:
        # one scalar fetch forces the program to have finished
        _ = np.asarray(leaves[0].ravel()[:1])


def bench(name, fn, *args, iters=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn_j(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {min(ts)*1000:9.2f} ms", flush=True)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    # spine columns (Q3 lineitem: orderkey sorted, price, discount, shipdate)
    okey = np.sort(rng.integers(0, 1_500_000, N)).astype(np.int64)
    price = rng.integers(90_000, 10_500_000, N).astype(np.int64)
    disc = rng.integers(0, 11, N).astype(np.int64)
    ship = rng.integers(8035, 10471, N).astype(np.int32)
    lut1 = rng.integers(-1, 1_500_000, LUT1).astype(np.int32)
    lut2 = rng.integers(-1, 150_000, LUT2).astype(np.int32)
    ckey = rng.integers(0, 150_000, LUT1).astype(np.int32)  # o_custkey payload

    d_okey = jnp.asarray(okey)
    d_price = jnp.asarray(price)
    d_disc = jnp.asarray(disc)
    d_ship = jnp.asarray(ship)
    d_lut1 = jnp.asarray(lut1)
    d_lut2 = jnp.asarray(lut2)
    d_ckey = jnp.asarray(ckey)
    for a in (d_okey, d_price, d_disc, d_ship, d_lut1, d_lut2, d_ckey):
        a.block_until_ready()

    # --- phase 1: filter + 2 LUT gathers + residual -----------------------
    def phase_probe(okey, ship, lut1, ckey, lut2):
        valid = ship > 9204
        pos1 = jnp.clip(okey, 0, lut1.shape[0] - 1)
        b1 = lut1[pos1]
        valid = valid & (b1 >= 0)
        brow = jnp.maximum(b1, 0)
        cust = ckey[brow]                     # payload gather
        pos2 = jnp.clip(cust.astype(jnp.int64), 0, lut2.shape[0] - 1)
        b2 = lut2[pos2]
        valid = valid & (b2 >= 0)
        return valid

    bench("probe: filter+2 LUT gathers", phase_probe,
          d_okey, d_ship, d_lut1, d_ckey, d_lut2)

    valid = jax.jit(phase_probe)(d_okey, d_ship, d_lut1, d_ckey, d_lut2)
    valid.block_until_ready()

    # --- value expr: price * (100 - disc) ---------------------------------
    def phase_val(price, disc, valid):
        return jnp.where(valid, price * (100 - disc), 0)

    bench("value expr int64 mul", phase_val, d_price, d_disc, valid)
    vals = jax.jit(phase_val)(d_price, d_disc, valid)

    # --- sorted-group-agg pieces ------------------------------------------
    def p_cummax(okey, valid):
        neg = jnp.int64(np.iinfo(np.int64).min)
        return jax.lax.cummax(jnp.where(valid, okey, neg))

    bench("cummax int64 8M", p_cummax, d_okey, valid)

    def p_cumsum64(vals):
        return jnp.cumsum(vals)

    bench("cumsum int64 8M", p_cumsum64, vals)

    def p_cumsum32(vals):
        return jnp.cumsum(vals.astype(jnp.int32))

    bench("cumsum int32 8M", p_cumsum32, vals)

    def p_cumsum_f32(vals):
        return jnp.cumsum(vals.astype(jnp.float32))

    bench("cumsum f32 8M", p_cumsum_f32, vals)

    def p_ids(okey, valid):
        neg = jnp.int64(np.iinfo(np.int64).min)
        lastk = jax.lax.cummax(jnp.where(valid, okey, neg))
        prev = jnp.concatenate([jnp.full(1, neg, jnp.int64), lastk[:-1]])
        new_group = valid & (okey != prev)
        ids = jnp.cumsum(new_group.astype(jnp.int64)) - 1
        return jnp.clip(ids, 0, MAXG - 1)

    bench("ids: cummax+cumsum+clip", p_ids, d_okey, valid)
    ids = jax.jit(p_ids)(d_okey, valid)
    ids.block_until_ready()

    def p_segends(ids):
        return jnp.searchsorted(ids, jnp.arange(MAXG),
                                side="right", method="sort") - 1

    bench("segment_ends searchsorted(8M,4M) sort", p_segends, ids)

    def p_segends_scan(ids):
        return jnp.searchsorted(ids, jnp.arange(MAXG), side="right") - 1

    bench("segment_ends searchsorted(8M,4M) scan", p_segends_scan, ids)

    ends = jax.jit(p_segends)(ids)
    ends.block_until_ready()

    def p_segsum(vals, ends):
        cs = jnp.cumsum(vals)
        at_end = jnp.where(ends >= 0, cs[jnp.clip(ends, 0, None)], 0)
        prev = jnp.concatenate([jnp.zeros(1, at_end.dtype), at_end[:-1]])
        return at_end - prev

    bench("seg_sum: cumsum+gather(4M)", p_segsum, vals, ends)

    # --- argsort path (the non-sorted table path) -------------------------
    def p_argsort(okey, valid):
        sent = jnp.int64(0x7FFFFFFFFFFFFFFF)
        k = jnp.where(valid, okey, sent)
        return jnp.argsort(k)

    bench("argsort int64 8M", p_argsort, d_okey, valid, iters=2)

    def p_sort2(okey, vals):
        return jax.lax.sort((okey, vals), num_keys=2)

    bench("lax.sort 2-key int64 8M", p_sort2, d_okey, vals, iters=2)

    # --- gather from 8M at 4M indices (emit pattern) ----------------------
    idx4 = jnp.asarray(rng.integers(0, N, MAXG).astype(np.int64))

    def p_gather(vals, idx):
        return vals[idx]

    bench("gather 8M->4M int64", p_gather, vals, idx4)

    def p_gather32(ship, idx):
        return ship[idx]

    bench("gather 8M->4M int32", p_gather32, d_ship, idx4)

    # --- full composed Q3-like step ---------------------------------------
    def full_step(okey, price, disc, ship, lut1, ckey, lut2):
        valid = phase_probe(okey, ship, lut1, ckey, lut2)
        vals = jnp.where(valid, price * (100 - disc), 0)
        neg = jnp.int64(np.iinfo(np.int64).min)
        lastk = jax.lax.cummax(jnp.where(valid, okey, neg))
        prev = jnp.concatenate([jnp.full(1, neg, jnp.int64), lastk[:-1]])
        new_group = valid & (okey != prev)
        ids = jnp.clip(jnp.cumsum(new_group.astype(jnp.int64)) - 1,
                       0, MAXG - 1)
        ends = jnp.searchsorted(ids, jnp.arange(MAXG),
                                side="right", method="sort") - 1
        s = p_segsum(vals, ends)
        cnt = p_segsum(valid.astype(jnp.int64), ends)
        rid = jnp.where(valid, jnp.arange(N, dtype=jnp.int64), neg)
        rep = jax.lax.cummax(rid)[jnp.clip(ends, 0, None)]
        gk = jnp.where(cnt > 0, lastk[jnp.clip(ends, 0, None)],
                       jnp.int64(-1))
        return gk, s, cnt, rep

    bench("FULL Q3-like step", full_step, d_okey, d_price, d_disc,
          d_ship, d_lut1, d_ckey, d_lut2, iters=3)


if __name__ == "__main__":
    main()

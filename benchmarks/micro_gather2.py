"""Round 2: index dtype, 2D scatter, cummax-broadcast run trick."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "block_until_ready")]
    for x in leaves:
        x.block_until_ready()
    if leaves:
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
    print(f"{name:52s} {min(ts)*1000:9.2f} ms", flush=True)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    N = 1 << 23
    tbl = jnp.asarray(rng.integers(0, 1 << 30, 1 << 21).astype(np.int32))
    idx32 = jnp.asarray(rng.integers(0, 1 << 21, N).astype(np.int32))
    idx64 = idx32.astype(jnp.int64)

    bench("gather idx i32", lambda t, i: t[i], tbl, idx32)
    bench("gather idx i64", lambda t, i: t[i], tbl, idx64)
    bench("gather idx i64->i32 cast in-program",
          lambda t, i: t[i.astype(jnp.int32)], tbl, idx64)

    # 2D gather with i64 table as 2 x i32 lanes
    tbl64 = jnp.asarray(rng.integers(0, 1 << 60, 1 << 21))
    tbl2l = jnp.stack([(tbl64 >> 32).astype(jnp.int32),
                       tbl64.astype(jnp.uint32).astype(jnp.int32)], axis=1)

    def g64(t, i):
        return t[i]

    def g2l(t, i):
        r = t[i]
        return (r[:, 0].astype(jnp.int64) << 32) | \
            (r[:, 1].astype(jnp.int64) & 0xFFFFFFFF)

    bench("gather i64 direct", g64, tbl64, idx32)
    bench("gather i64 as [*,2] i32 rows + recombine", g2l, tbl2l, idx32)

    # 2D scatter rows
    uidx = jnp.asarray(rng.permutation(1 << 21)[:1 << 21].astype(np.int32))
    vals2d = jnp.asarray(
        rng.integers(0, 1 << 30, (1 << 21, 4)).astype(np.int32))
    bench("scatter rows [2^21,4] unique",
          lambda i, v: jnp.zeros((1 << 21, 4), jnp.int32).at[i].set(v),
          uidx, vals2d)
    v1 = vals2d[:, 0]
    bench("scatter 1D 2^21 unique",
          lambda i, v: jnp.zeros(1 << 21, jnp.int32).at[i].set(v),
          uidx, v1)
    # scatter 1.5M into 8M row space
    sidx = jnp.asarray(
        np.sort(rng.choice(N, 1 << 21, replace=False)).astype(np.int32))
    bench("scatter 2^21 unique into 8M 1D",
          lambda i, v: jnp.zeros(N, jnp.int32).at[i].set(v), sidx, v1)

    # cummax i64 8M (run-broadcast trick)
    w = jnp.asarray(rng.integers(0, 1 << 50, N))
    bench("cummax i64 8M", lambda x: jax.lax.cummax(x), w)
    w32 = w.astype(jnp.int32)
    bench("cummax i32 8M", lambda x: jax.lax.cummax(x), w32)

    # searchsorted i32 sort method: (8M ids, 4M iota)
    ids = jnp.asarray(np.sort(rng.integers(0, 1 << 22, N)).astype(np.int32))
    bench("searchsorted i32 (8M,4M) sort",
          lambda a: jnp.searchsorted(a, jnp.arange(1 << 22, dtype=jnp.int32),
                                     side="right", method="sort") - 1, ids)
    ids64 = ids.astype(jnp.int64)
    bench("searchsorted i64 (8M,4M) sort",
          lambda a: jnp.searchsorted(a, jnp.arange(1 << 22, dtype=jnp.int64),
                                     side="right", method="sort") - 1, ids64)

    # compact: cumsum + searchsorted(cs, iota) pattern at 2M out
    mask = jnp.asarray(rng.random(N) < 0.25)
    OUT = 1 << 21

    def compact(mask, c0, c1, c2, c3):
        cs = jnp.cumsum(mask.astype(jnp.int32))
        j = jnp.arange(OUT, dtype=jnp.int32)
        rid = jnp.searchsorted(cs, j, side="right", method="sort")
        ridc = jnp.clip(rid, 0, N - 1).astype(jnp.int32)
        st = jnp.stack([c0, c1, c2, c3], axis=1)
        return st[ridc]

    c0 = idx32
    c1 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    bench("compact 8M->2M 4 lanes (cumsum+ss+rowgather)",
          compact, mask, c0, c1, c0, c1)

    # stack cost alone (is jnp.stack a copy?)
    bench("stack 4 lanes 8M", lambda a, b: jnp.stack([a, b, a, b], axis=1),
          c0, c1)


if __name__ == "__main__":
    main()

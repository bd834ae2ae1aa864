"""Gather cost model on the real chip: how do TPU gather costs scale with
lookup count, table size, element width, 2D row width, and index order?
Also measures the per-dispatch floor through the tunnel."""
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

    one = jnp.asarray(np.ones(8, np.int32))
    bench("FLOOR: 8-elem add", lambda x: x + 1, one)
    bench("FLOOR: 8-elem add (again)", lambda x: x + 2, one)

    x8m = jnp.asarray(rng.integers(0, 1 << 20, 1 << 23).astype(np.int32))
    bench("elementwise mul 8M i32", lambda x: x * 3 + 1, x8m)

    tbl21 = jnp.asarray(rng.integers(0, 1 << 30, 1 << 21).astype(np.int32))
    tbl17 = jnp.asarray(rng.integers(0, 1 << 30, 1 << 17).astype(np.int32))
    tbl12 = jnp.asarray(rng.integers(0, 1 << 30, 1 << 12).astype(np.int32))

    idx_rand = {n: jnp.asarray(
        rng.integers(0, 1 << 21, 1 << n).astype(np.int32))
        for n in (20, 22, 23)}
    idx_sorted = jnp.asarray(
        np.sort(rng.integers(0, 1 << 21, 1 << 23)).astype(np.int32))

    for n in (20, 22, 23):
        bench(f"gather tbl=2^21 idx=2^{n} rand i32",
              lambda t, i: t[i], tbl21, idx_rand[n])
    bench("gather tbl=2^21 idx=2^23 SORTED i32",
          lambda t, i: t[i], tbl21, idx_sorted)
    i17 = jnp.asarray(rng.integers(0, 1 << 17, 1 << 23).astype(np.int32))
    i12 = jnp.asarray(rng.integers(0, 1 << 12, 1 << 23).astype(np.int32))
    bench("gather tbl=2^17 idx=2^23 rand i32",
          lambda t, i: t[i], tbl17, i17)
    bench("gather tbl=2^12 idx=2^23 rand i32",
          lambda t, i: t[i], tbl12, i12)

    tbl21_64 = tbl21.astype(jnp.int64)
    bench("gather tbl=2^21 idx=2^23 rand i64",
          lambda t, i: t[i], tbl21_64, idx_rand[23])

    # 2D row gather: same indices, wider rows — lane vectorization?
    for w in (2, 4, 8):
        tbl2d = jnp.asarray(
            rng.integers(0, 1 << 30, (1 << 21, w)).astype(np.int32))
        bench(f"gather rows [2^21,{w}] idx=2^23 rand i32",
              lambda t, i: t[i], tbl2d, idx_rand[23])

    # multiple gathers in ONE program with same indices
    t2 = jnp.asarray(rng.integers(0, 1 << 30, 1 << 21).astype(np.int32))
    bench("2 gathers same idx, 2 tables, one program",
          lambda a, b, i: (a[i], b[i]), tbl21, t2, idx_rand[23])

    # take_along_axis on a reshaped [64, 2^17] block-local gather
    blk = jnp.asarray(
        rng.integers(0, 1 << 30, (1 << 6, 1 << 17)).astype(np.int32))
    bidx = jnp.asarray(
        rng.integers(0, 1 << 17, (1 << 6, 1 << 17)).astype(np.int32))
    bench("take_along_axis [64,2^17] per-row",
          lambda t, i: jnp.take_along_axis(t, i, axis=1), blk, bidx)

    # one-hot matmul gather for small tables (bf16 MXU)
    smalltbl = jnp.asarray(rng.integers(0, 127, 1 << 12).astype(np.int32))

    def onehot_gather(t, i):
        oh = jax.nn.one_hot(i.reshape(-1, 128) % (1 << 12), 1 << 12,
                            dtype=jnp.bfloat16)
        return (oh @ t.astype(jnp.bfloat16)[:, None]).astype(jnp.int32)

    bench("one-hot matmul gather tbl=2^12 idx=2^23",
          onehot_gather, smalltbl, i12, iters=2)

    # scatter cost for comparison (unique indices, drop mode)
    uidx = jnp.asarray(rng.permutation(1 << 21).astype(np.int32))
    vals21 = jnp.asarray(rng.integers(0, 1 << 30, 1 << 21).astype(np.int32))
    bench("scatter-set 2^21 unique into 2^21",
          lambda i, v: jnp.zeros(1 << 21, jnp.int32).at[i].set(v),
          uidx, vals21)

    # sort costs
    k8 = jnp.asarray(rng.integers(0, 1 << 40, 1 << 23))
    bench("sort i64 8M", lambda x: jnp.sort(x), k8, iters=2)
    bench("sort i32 8M", lambda x: jnp.sort(x.astype(jnp.int32)), x8m,
          iters=2)
    bench("argsort i32 8M", lambda x: jnp.argsort(x), x8m, iters=2)

    # cumsum variants
    bench("cumsum i32 8M", lambda x: jnp.cumsum(x), x8m)
    x2d = x8m.reshape(1 << 10, 1 << 13)
    bench("cumsum i32 [2^10,2^13] axis=1", lambda x: jnp.cumsum(x, axis=1),
          x2d)


if __name__ == "__main__":
    main()

"""Round 3: masked big-index-vector scatters, few-query searchsorted."""
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
    print(f"{name:56s} {min(ts)*1000:9.2f} ms", flush=True)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    N = 1 << 23
    G = 1 << 22

    # masked scatter: 8M index vector, ~1.5M live unique targets into [4M]
    ids = np.sort(rng.integers(0, G, N)).astype(np.int32)
    is_end = np.concatenate([ids[1:] != ids[:-1], [True]])
    idx_masked = np.where(is_end, ids, G).astype(np.int32)
    d_idx = jnp.asarray(idx_masked)
    d_i = jnp.asarray(np.arange(N, dtype=np.int32))

    bench("scatter [4M] idxvec=8M masked-unique drop",
          lambda i, v: jnp.full(G, -1, jnp.int32).at[i].set(v, mode="drop"),
          d_idx, d_i)

    bench("scatter [8M] idxvec=8M masked-unique drop",
          lambda i, v: jnp.full(N, -1, jnp.int32).at[i].set(v, mode="drop"),
          d_idx, d_i)

    small = jnp.asarray(
        np.where(is_end, np.minimum(ids, (1 << 16) - 1), 1 << 16)
        .astype(np.int32))
    bench("scatter [64k] idxvec=8M masked drop",
          lambda i, v: jnp.full(1 << 16, -1, jnp.int32)
          .at[i].set(v, mode="drop"), small, d_i)

    # scatter-ADD with 8M idx vector, duplicate indices (histogram-like)
    dup = jnp.asarray(rng.integers(0, G, N).astype(np.int32))
    bench("scatter-add [4M] idxvec=8M duplicates",
          lambda i: jnp.zeros(G, jnp.int32).at[i].add(1, mode="drop"),
          dup, iters=1)

    # few-query default searchsorted (binary scan): (8M, Q)
    cs = jnp.asarray(np.cumsum(rng.random(N) < 0.004).astype(np.int32))
    for q in (12, 15, 17):
        bench(f"searchsorted scan (8M, 2^{q})",
              lambda c, qq=q: jnp.searchsorted(
                  c, jnp.arange(1 << qq, dtype=jnp.int32), side="right"),
              cs)
    bench("searchsorted sort (8M, 2^17)",
          lambda c: jnp.searchsorted(
              c, jnp.arange(1 << 17, dtype=jnp.int32), side="right",
              method="sort"), cs)

    # gather at few indices (out_cap-sized row gather from 8M)
    st = jnp.asarray(rng.integers(0, 1 << 30, (N, 4)).astype(np.int32))
    fi = jnp.asarray(rng.integers(0, N, 1 << 15).astype(np.int32))
    bench("row-gather [8M,4] at 2^15 idx", lambda t, i: t[i], st, fi)

    # i64 cumsum as value lanes
    v = jnp.asarray(rng.integers(-(1 << 40), 1 << 40, N))
    bench("cumsum i64 8M", lambda x: jnp.cumsum(x), v)
    bench("4x cumsum i64 8M one program",
          lambda x: (jnp.cumsum(x), jnp.cumsum(x * 2), jnp.cumsum(x + 1),
                     jnp.cumsum(x - 3)), v)


if __name__ == "__main__":
    main()

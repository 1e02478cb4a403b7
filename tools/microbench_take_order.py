"""Microbench: XLA take throughput vs source size and index order.

Decides the round-4 scattered-transport layout (sparse/ranges.py): the
tier-major table exists because r2 measured per-tier takes as the fast
path; if a single big-source take in TILE-major (window) order is close,
the kernel's per-step scattered staging collapses to a few contiguous
block DMAs instead of ~2M 32-row chunk copies (the measured r3
staging bottleneck, PROFILE_r03.md section 7).

    python tools/microbench_take_order.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/ofs_jax"))

    rng = np.random.default_rng(0)
    M = 2_449_029          # ogbn-products rows
    NIDX = 8_000_000       # scattered rows per segment (~products scale)
    TILE_SCAT = 3500       # per-tile scattered rows (window-order runs)
    TS = 32768

    xs = jnp.asarray(rng.standard_normal((M, 128)).astype(np.float32))

    # tile-major order: per tile, sorted random cols (the window layout)
    n_tiles = NIDX // TILE_SCAT
    idx_tile = np.sort(
        rng.integers(0, M, size=(n_tiles, TILE_SCAT)), axis=1).ravel()
    # tier-major order: same multiset grouped by 32K tier then tile
    tiers = idx_tile // TS
    order = np.argsort(tiers, kind="stable")
    idx_tier = idx_tile[order]

    def pack(g):
        hi = g.astype(jnp.bfloat16)
        lo = (g - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, lo], axis=1)

    @jax.jit
    def take_big(xs, idx):
        return pack(jnp.take(xs, idx, axis=0, mode="clip"))

    import functools

    @functools.partial(jax.jit, static_argnames=("ptr",))
    def take_tiered(xs, idx, ptr):
        outs = []
        for t in range(len(ptr) - 1):
            if ptr[t + 1] == ptr[t]:
                continue
            sl = jax.lax.slice_in_dim(idx, ptr[t], ptr[t + 1])
            lo_r = min(t * TS, xs.shape[0] - 1)
            hi_r = min((t + 1) * TS, xs.shape[0])
            xt = jax.lax.slice_in_dim(xs, lo_r, hi_r, axis=0)
            outs.append(jnp.take(xt, sl - lo_r, axis=0, mode="clip"))
        return pack(jnp.concatenate(outs, axis=0))

    ptr = [0]
    bnd = np.nonzero(np.diff(tiers[order]))[0] + 1
    # per-tier ptr over idx_tier
    tptr = np.zeros(M // TS + 2, np.int64)
    cnt = np.bincount(tiers, minlength=M // TS + 1)
    np.cumsum(cnt, out=tptr[1:])
    ptr = tuple(int(v) for v in tptr)

    idx_tile_d = jnp.asarray(idx_tile.astype(np.int32))
    idx_tier_d = jnp.asarray(idx_tier.astype(np.int32))

    def timeit(f, *args, iters=6):
        # scalar-fetch sync: block_until_ready acks early on the
        # tunneled chip (utils/roofline.py time_chained rationale)
        float(jnp.asarray(f(*args)[0, 0], jnp.float32))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jnp.asarray(f(*args)[0, 0], jnp.float32))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    s_big_tile = timeit(take_big, xs, idx_tile_d)
    s_big_tier = timeit(take_big, xs, idx_tier_d)
    s_tiered = timeit(take_tiered, xs, idx_tier_d, ptr)
    gb = NIDX * (512 + 512) / 2**30
    for name, s in (("big-src tile-order", s_big_tile),
                    ("big-src tier-order", s_big_tier),
                    ("tiered  tier-order", s_tiered)):
        log(f"{name}: {s*1e3:8.1f} ms  {NIDX/s/1e6:7.0f} Mrows/s  "
            f"{gb/s:6.1f} GB/s")


if __name__ == "__main__":
    main()

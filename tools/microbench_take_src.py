"""Microbench: XLA take rate vs SOURCE size (shuffled indices).

The r4 take-order bench compared big-source vs 32K-sliced takes with
per-tile SORTED indices — the order the r4 shuffle finding later showed
is the slow one (banded ~10 ns/row vs shuffled ~4.4). This isolates the
source-size axis at fixed (shuffled) order, deciding whether a
block-sectioned take phase (positions grouped by X block, one take per
block slice) can beat the single big-source take.

DCE-proof: every output row feeds a lane-wise sum (the reduction cannot
be sliced; calibrate against the known materialized big-take rate).

    python tools/microbench_take_src.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/ofs_jax"))

    rng = np.random.default_rng(0)
    M = 2_449_029
    NIDX = 4_194_304

    xs = jnp.asarray(rng.standard_normal((M, 128)).astype(np.float32))

    def timeit(f, *args, iters=6):
        float(jnp.asarray(f(*args).ravel()[0], jnp.float32))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jnp.asarray(f(*args).ravel()[0], jnp.float32))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    @jax.jit
    def take_sum(xs, idx):
        return jnp.take(xs, idx, axis=0, mode="clip").sum(axis=0)

    @jax.jit
    def take_mat(xs, idx):
        # materialized variant: identity-ish consumer that keeps the
        # (NIDX,128) result real (copy through optimization_barrier)
        y = jnp.take(xs, idx, axis=0, mode="clip")
        y = jax.lax.optimization_barrier(y)
        return y[:8].sum(axis=0)

    # 1. big source, shuffled
    idx_big = rng.integers(0, M, NIDX).astype(np.int32)
    s = timeit(take_sum, xs, jnp.asarray(idx_big))
    log(f"big-src shuffled (sum-fused):   {s*1e3:7.1f} ms  "
        f"{s/NIDX*1e9:5.2f} ns/row")
    s = timeit(take_mat, xs, jnp.asarray(idx_big))
    log(f"big-src shuffled (materialized):{s*1e3:7.1f} ms  "
        f"{s/NIDX*1e9:5.2f} ns/row")

    # 2. big source, block-sorted (shuffled within 64K blocks)
    for C in (16384, 65536, 262144):
        blk = idx_big // C
        order = np.argsort(blk, kind="stable")
        idx_bs = idx_big[order]
        s = timeit(take_mat, xs, jnp.asarray(idx_bs))
        log(f"big-src block{C//1024}K-sorted (mat): {s*1e3:7.1f} ms  "
            f"{s/NIDX*1e9:5.2f} ns/row")

    # 3. small-source takes (one slice), shuffled local indices
    for C in (8192, 16384, 65536, 262144):
        idx_s = rng.integers(0, C, NIDX).astype(np.int32)
        xsl = xs[:C]

        s = timeit(take_mat, xsl, jnp.asarray(idx_s))
        log(f"small-src C={C:7d} (mat):      {s*1e3:7.1f} ms  "
            f"{s/NIDX*1e9:5.2f} ns/row")

    # 4. sectioned: loop of per-block takes from slices (block-major
    #    positions), shuffled within block — the real phase shape
    for C in (65536, 262144):
        nb = -(-M // C)
        per = NIDX // nb
        idxs = []
        for b in range(nb):
            hi = min(C, M - b * C)
            idxs.append(rng.integers(0, hi, per).astype(np.int32))
        ptr = tuple(int(v) for v in np.arange(nb + 1) * per)
        idx_cat = jnp.asarray(np.concatenate(idxs))

        @functools.partial(jax.jit, static_argnames=("C", "ptr"))
        def take_sect(xs, idx, C, ptr):
            outs = []
            nb = len(ptr) - 1
            for b in range(nb):
                sl = jax.lax.slice_in_dim(idx, ptr[b], ptr[b + 1])
                lo = min(b * C, xs.shape[0] - 1)
                hi = min((b + 1) * C, xs.shape[0])
                xt = jax.lax.slice_in_dim(xs, lo, hi, axis=0)
                outs.append(jnp.take(xt, sl, axis=0, mode="clip"))
            y = jnp.concatenate(outs, axis=0)
            y = jax.lax.optimization_barrier(y)
            return y[:8].sum(axis=0)

        s = timeit(take_sect, xs, idx_cat, C, ptr)
        log(f"sectioned C={C:7d} x{nb:3d} (mat): {s*1e3:7.1f} ms  "
            f"{(ptr[-1]) and s/ptr[-1]*1e9:5.2f} ns/row")


if __name__ == "__main__":
    main()

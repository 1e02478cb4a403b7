"""XLA take cost vs row width and index arity (r5 experiment).

Q1: is per-row gather cost flat in row width (W=64/128/256)?
Q2: does a 2-D index gather — jnp.take(x, idx.reshape(N//k, k)) giving
    (N//k, k, W) — amortize per-slice cost over the outer dim?
Full-output jitted takes, scalar fetch outside jit (DCE-proof method of
tools/microbench_take_order.py).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 245_000
N = 5_200_000
rng = np.random.default_rng(0)
xbig = rng.standard_normal((M, 256)).astype(np.float32)
idx_np = rng.integers(0, M, N, dtype=np.int32)


def timeit(f, *args, iters=5):
    float(jnp.asarray(f(*args).ravel()[0], jnp.float32))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.asarray(f(*args).ravel()[0], jnp.float32))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


@jax.jit
def take(x, i):
    return jnp.take(x, i, axis=0, mode="clip")


for W in (64, 128, 256):
    x = jnp.asarray(xbig[:, :W])
    idx = jnp.asarray(idx_np)
    s = timeit(take, x, idx)
    print(f"flat  W={W:4d}: {s*1e3:8.1f} ms  {s/N*1e9:6.2f} ns/row  "
          f"{(N*W*4*2)/s/1e9:6.1f} GB/s(rw)", flush=True)
    del x, idx

x = jnp.asarray(xbig[:, :128])
for k in (2, 4, 8, 32):
    idx = jnp.asarray(idx_np.reshape(N // k, k))
    s = timeit(take, x, idx)
    print(f"2d  k={k:4d} W=128: {s*1e3:8.1f} ms  {s/N*1e9:6.2f} ns/row  "
          f"{(N*128*4*2)/s/1e9:6.1f} GB/s(rw)", flush=True)
    del idx

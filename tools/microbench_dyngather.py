"""Probe Mosaic's in-VMEM dynamic gather support + rates on the attached chip.

Forms tested (all: table (C,128) f32 in VMEM, want T gathered rows):
  tala_eq    jnp.take_along_axis(table, idx2d, axis=0) with T == C
  tala_ne    same with T != C (output shape != table shape)
  tala_bcast idx shape (T,1) broadcast across lanes
  perlane    per-lane independent indices (T,128) arbitrary
  vmem_cap   probe usable VMEM: biggest resident f32 scratch that compiles

Each prints Mrows/s of d=128 f32 rows (512 B) gathered from VMEM.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 128


def delta(f, *args, k=8):
    f(*args)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(k):
        r = f(*args)
    r[0].block_until_ready()
    return (time.perf_counter() - t0) / k


def _run(name, C, T, idx_shape, steps=256):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((C, D), np.float32))
    if idx_shape == "eq":
        idx = rng.integers(0, C, (C, D)).astype(np.int32)
        Tn = C
    elif idx_shape == "ne":
        idx = rng.integers(0, C, (T, D)).astype(np.int32)
        Tn = T
    elif idx_shape == "bcast":
        idx = np.broadcast_to(
            rng.integers(0, C, (T, 1)).astype(np.int32), (T, D)).copy()
        Tn = T
    idx = jnp.asarray(idx)

    def kernel(idx_ref, tab_ref, out_ref):
        g = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
        out_ref[:] = g

    f = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((Tn, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tn, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tn, D), jnp.float32),
    )
    fj = jax.jit(lambda a, b: (f(a, b),))
    try:
        t = delta(fj, idx, table)
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] C={C} T={Tn}: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}")
        return
    mrows = Tn * steps / t / 1e6
    print(f"[{name}] C={C} T={Tn}: {t*1e6:8.1f} us -> {mrows:7.0f} Mrows/s "
          f"({mrows*512/1e3:6.1f} GB/s VMEM-side)")


def vmem_cap():
    for mb in (100, 96, 80, 64, 48, 32, 16):
        rows = mb * 1024 * 1024 // (D * 4)

        def kernel(x_ref, out_ref, scratch):
            scratch[0:8, :] = x_ref[:]
            out_ref[:] = scratch[0:8, :]

        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rows, D), jnp.float32)],
        )
        try:
            r = jax.jit(f)(jnp.ones((8, D), jnp.float32))
            r.block_until_ready()
            print(f"[vmem_cap] {mb} MB scratch: OK")
            return
        except Exception as e:  # noqa: BLE001
            print(f"[vmem_cap] {mb} MB scratch: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")


def main(names):
    if not names or "tala_eq" in names:
        _run("tala_eq", 2048, 2048, "eq")
    if not names or "tala_ne" in names:
        _run("tala_ne", 2048, 1024, "ne")
        _run("tala_ne", 8192, 1024, "ne")
    if not names or "tala_bcast" in names:
        for C in (512, 2048, 8192, 32768):
            _run("tala_bcast", C, 1024, "bcast")
    if not names or "perlane" in names:
        _run("perlane", 2048, 1024, "ne")
    if "vmem_cap" in names or not names:
        vmem_cap()
    print("done")


if __name__ == "__main__":
    main(sys.argv[1:])

"""Microbench: what dominates the fused-kernel per-step compute cost?

Round-2 finding (v5e, tunneled): 'raw' (8 one-hot gather matmuls, 34
MMAC/step) runs at the SAME per-step cost as the full gather+scatter
chain (168 MMAC/step) — the marginal MXU rate of the extra 134 MMAC is
~100 TMAC/s. The matmuls are nearly free; a fixed per-step cost
dominates. Variants below isolate it:

  noop     — fetch lane streams, add constant, write acc (floor)
  winread  — 8 dynamic-offset (128,256) VMEM reads + VPU add (no MXU)
  winstat  — same reads at STATIC offsets g*128
  rawdyn   — one-hot gather matmuls over dynamic windows (current kernel)
  rawstat  — one-hot gather matmuls over static windows
  chain2   — full per-group gather->scatter chains, 2 accumulators
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_L = 128
_DN = (((1,), (0,)), ((), ()))


def _force(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


def run(variant, S=2000, G=8, R=512):
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((64 * _L, 256)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    lidx = jnp.asarray(rng.integers(0, _L, (S * G, _L)).astype(np.int32))
    lrow = jnp.asarray(rng.integers(0, R, (S * G, _L)).astype(np.int32))
    blk = jnp.asarray(rng.integers(0, 64, (S, 1, G)).astype(np.int32))

    def kernel(blk_ref, lidx_ref, lrow_ref, win_ref, o_ref):
        RS = _L if variant in ("noop", "winread", "winstat", "rawdyn",
                               "rawstat") else R
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, _L), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (_L, _L), 1)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        if variant == "noop":
            acc = lidx_ref[0, :].reshape(1, _L).astype(jnp.float32)
            o_ref[0:1, 0:_L] = o_ref[0:1, 0:_L] + acc
            return
        acc0 = acc1 = None
        for g in range(G):
            if variant in ("winstat", "rawstat"):
                w = win_ref[pl.ds(g * _L, _L), :]
            else:
                b = blk_ref[0, 0, g]
                w = win_ref[pl.ds(pl.multiple_of(b * _L, _L), _L), :]
            if variant in ("winread", "winstat"):
                s = w.astype(jnp.float32)
            else:
                oh = (lidx_ref[g, :].reshape(_L, 1) == col_iota
                      ).astype(jnp.bfloat16)
                gath = jax.lax.dot_general(
                    oh, w, _DN, preferred_element_type=jnp.float32)
                if variant == "chain2":
                    roh = (row_iota == lrow_ref[g, :].reshape(1, _L)
                           ).astype(jnp.bfloat16)
                    s = jax.lax.dot_general(
                        roh, gath.astype(jnp.bfloat16), _DN,
                        preferred_element_type=jnp.float32)
                else:
                    s = gath
            if g % 2 == 0:
                acc0 = s if acc0 is None else acc0 + s
            else:
                acc1 = s if acc1 is None else acc1 + s
        acc = acc0 + acc1
        o_ref[:] = o_ref[:] + acc[:, :_L] + acc[:, _L:]

    RS = R if variant == "chain2" else _L
    out = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 1, G), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((G, _L), lambda i: (i, 0)),
            pl.BlockSpec((G, _L), lambda i: (i, 0)),
            pl.BlockSpec((64 * _L, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((RS, _L), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((RS, _L), jnp.float32),
    )
    f = jax.jit(lambda *a: out(*a).sum())
    args = (blk, lidx, lrow, win)
    _force(f(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _force(f(*args))
        ts.append(time.perf_counter() - t0)
    sec = sorted(ts)[2]
    print(f"{variant:8s}: {sec/S*1e6:7.2f} us/step", flush=True)


if __name__ == "__main__":
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "noop", "winread", "winstat", "rawdyn", "rawstat", "chain2"]
    for v in variants:
        run(v, S=S)

"""Prototype + rate measurement for the fused SpMM engine (design for r2).

One Pallas kernel per call: per output tile (R rows), staging row-DMAs for
tile t+1 are issued in waves interleaved with tile t's one-hot compute
(gather from staged windows + scatter into the tile), so the DMA engines
run concurrently with the MXU instead of a separate XLA staging pass.

Modes (ms for a synthetic uniform-tile workload, real chip):
  compute  one-hot gather+scatter matmuls only (staged prefilled)
  dma      staging row-DMA issue/wait only
  fused    both interleaved (the design point)

Projects ogbn-products totals: lanes=124e6/pad_eff, staged=78.5e6 (or less
with a hot cache). Run: python tools/proto_fused.py [R T S TILES]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_L = 128
_DN_G = (((1,), (0,)), ((), ()))   # oh (L,128) x win (128,256)
_DN_S = (((1,), (0,)), ((), ()))   # roh (R,T) x gbuf (T,256)


def _kernel(scols_ref, lidx_ref, lrow_ref, blk_ref, xp_ref, o_ref,
            stage, hilo, gbuf, sem, *, R, T, S, SPT, DELTA, W, NSEM, mode):
    i = pl.program_id(0)
    G = T // _L
    k = i % SPT                     # step within tile
    parity_next = ((i // SPT) + 1) % 2
    parity_cur = (i // SPT) % 2
    NWAVE = DELTA // W

    def dma(j_static, wave, base_pos, par, slot):
        g = wave * W + j_static
        c = scols_ref[0, g // (DELTA // 8), g % (DELTA // 8)]
        return pltpu.make_async_copy(
            xp_ref.at[c], stage.at[par, base_pos + wave * W + j_static],
            sem.at[slot])

    def dma_wait(j_static, wave, base_pos, par, slot):
        # wait reconstructs shape-identical copy (src identity irrelevant)
        return pltpu.make_async_copy(
            xp_ref.at[0], stage.at[par, base_pos + wave * W + j_static],
            sem.at[slot])

    if mode in ("dma", "fused"):
        base = k * DELTA
        prev_k = (i - 1) % SPT
        prev_base = prev_k * DELTA
        prev_parity = jnp.where(k == 0, parity_cur, parity_next)
        # wave pipeline across the step boundary: issue this step's waves,
        # wait the previous step's (keeps <= 2*W outstanding per sem ring)
        for w in range(NWAVE):
            for j in range(W):
                dma(j, w, base, parity_next, (w * W + j) % NSEM).start()

            @pl.when(i > 0)
            def _(w=w):
                for j in range(W):
                    dma_wait(j, w, prev_base, prev_parity,
                             (w * W + j) % NSEM).wait()

    if mode in ("compute", "fused"):
        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
            # split this tile's staged f32 rows into packed [hi|lo] bf16
            w = stage[parity_cur]
            hi = w.astype(jnp.bfloat16)
            lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            hilo[:, 0:_L] = hi
            hilo[:, _L:2 * _L] = lo

        for g in range(G):
            lanes = lidx_ref[g, :].reshape(_L, 1)
            blk = blk_ref[0, 0, g]
            oh = (
                lanes == jax.lax.broadcasted_iota(jnp.int32, (_L, _L), 1)
            ).astype(jnp.bfloat16)
            win = hilo[pl.ds(blk * _L, _L), :]
            gbuf[g * _L:(g + 1) * _L, :] = jax.lax.dot_general(
                oh, win, _DN_G, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
        roh = (
            jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
            == lrow_ref[:].reshape(1, T)
        ).astype(jnp.bfloat16)  # lrow block is (G, 128) -> (1, T)
        s = jax.lax.dot_general(roh, gbuf[:], _DN_S,
                                preferred_element_type=jnp.float32)
        o_ref[:] = o_ref[:] + s[:, :_L] + s[:, _L:]
    elif mode == "dma":
        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)


def build(N, R, T, S, TILES, SPT, mode, W=64, NSEM=16, seed=0):
    rng = np.random.default_rng(seed)
    G = T // _L
    steps = TILES * SPT
    DELTA = S // SPT
    assert DELTA % W == 0 and DELTA % 8 == 0, (DELTA, W)
    xp = jnp.asarray(rng.random((N, _L), np.float32))
    scols = jnp.asarray(
        rng.integers(0, N, (steps, 8, DELTA // 8)).astype(np.int32))
    lidx = jnp.asarray(rng.integers(0, _L, (steps * G, _L)).astype(np.int32))
    lrow = jnp.asarray(rng.integers(0, R, (steps * G, _L)).astype(np.int32))
    blk = jnp.asarray(
        rng.integers(0, S // _L, (steps, 1, G)).astype(np.int32))

    kernel = functools.partial(_kernel, R=R, T=T, S=S, SPT=SPT, DELTA=DELTA,
                               W=W, NSEM=NSEM, mode=mode)
    f = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, 8, DELTA // 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((G, _L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, _L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((R, _L), lambda i: (i // SPT, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILES * R, _L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, S, _L), jnp.float32),
            pltpu.VMEM((S, 256), jnp.bfloat16),
            pltpu.VMEM((T, 256), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    fj = jax.jit(lambda *a: f(*a))
    return fj, (scols, lidx, lrow, blk, xp)


def measure(fj, args, k=8):
    fj(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(k):
        r = fj(*args)
    r.block_until_ready()
    return (time.perf_counter() - t0) / k


def main():
    N = 2449024
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 16000
    TILES = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    SPT = 25
    S = (S // (SPT * 64)) * SPT * 64  # DELTA multiple of W
    lanes_step = T
    for mode in ("compute", "dma", "fused"):
        try:
            fj, args = build(N, R, T, S, TILES, SPT, mode)
            t = measure(fj, args)
        except Exception as e:  # noqa: BLE001
            print(f"[{mode}] FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        steps = TILES * SPT
        us_step = t / steps * 1e6
        lane_rate = lanes_step * steps / t / 1e6
        dma_rate = (S // SPT) * steps / t / 1e6
        # projection to ogbn-products: 124e6 lanes at pad_eff .9, staged
        # 78.5e6 (no hot cache)
        proj = max(124e6 / 0.9 / (lane_rate * 1e6),
                   78.5e6 / (dma_rate * 1e6)) if mode == "fused" else (
            124e6 / 0.9 / (lane_rate * 1e6) if mode == "compute"
            else 78.5e6 / (dma_rate * 1e6))
        print(f"[{mode}] R={R} T={T} S={S}: {t*1e3:8.2f} ms "
              f"({us_step:6.2f} us/step, lanes {lane_rate:6.0f} M/s, "
              f"dma {dma_rate:5.0f} M/s) -> ogbn proj {proj*1e3:6.0f} ms "
              f"roofline {0.0803/proj:.3f}")


if __name__ == "__main__":
    main()

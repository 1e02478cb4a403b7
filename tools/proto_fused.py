"""Prototype + rate measurement for the fused SpMM engine (design for r2).

One Pallas kernel per call: per output tile (R rows), staging row-DMAs for
the NEXT tile are issued in waves interleaved with the current tile's
one-hot compute (gather from staged windows + scatter into the tile), so
the DMA engines run concurrently with the MXU instead of a separate XLA
staging pass. Staged rows arrive as f32 (single-row bf16 DMAs crash the
Mosaic compiler); a per-tile VPU pass splits them into packed [hi|lo]
bf16 for the exact-selection one-hot matmuls.

Grid = (TILES+1)*SPT steps: the first SPT steps are a pure staging
prologue for tile 0; step i stages chunk i%SPT of tile i//SPT (suppressed
once past the last tile) and computes tile i//SPT - 1. Waits run one step
behind issues on a parity-split semaphore ring so a wait can only consume
its own step's completions; every DMA is waited before the grid ends.

Modes: compute / dma / fused.
Run: python tools/proto_fused.py [R T S TILES] [--check]
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
_DN = (((1,), (0,)), ((), ()))


def _kernel(scols_ref, lidx_ref, lrow_ref, blk_ref, xp_ref, o_ref,
            stage, hilo, gbuf, sem, *, R, T, S, SPT, TILES, DELTA, W, NSEM,
            mode):
    i = pl.program_id(0)
    G = T // _L
    k = i % SPT
    tile_stage = i // SPT            # tile being staged by this step
    tile_comp = tile_stage - 1       # tile being computed
    par_stage = tile_stage % 2
    par_comp = jnp.abs(tile_comp % 2)
    NWAVE = DELTA // W
    HALF = NSEM // 2

    def mkdma(j_static, wave, base_pos, par, step_parity):
        g = wave * W + j_static
        c = scols_ref[0, g // (DELTA // 8), g % (DELTA // 8)]
        slot = (g % HALF) + HALF * step_parity
        return pltpu.make_async_copy(
            xp_ref.at[c], stage.at[par, base_pos + g], sem.at[slot])

    do_stage = tile_stage < TILES
    do_comp = tile_comp >= 0

    if mode in ("dma", "fused"):
        prev_base = ((i - 1) % SPT) * DELTA
        prev_par = ((i - 1) // SPT) % 2
        prev_issued = jnp.logical_and(i > 0, (i - 1) // SPT < TILES)

        for w in range(NWAVE):
            @pl.when(do_stage)
            def _(w=w):
                for j in range(W):
                    mkdma(j, w, k * DELTA, par_stage, i % 2).start()

            @pl.when(prev_issued)
            def _(w=w):
                for j in range(W):
                    mkdma(j, w, prev_base, prev_par, (i - 1) % 2).wait()

    if mode in ("compute", "fused"):
        @pl.when(jnp.logical_and(do_comp, k == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
            w = stage[par_comp]
            hi = w.astype(jnp.bfloat16)
            lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            hilo[:, 0:_L] = hi
            hilo[:, _L:2 * _L] = lo

        @pl.when(do_comp)
        def _():
            for g in range(G):
                lanes = lidx_ref[g, :].reshape(_L, 1)
                blk = blk_ref[0, 0, g]
                oh = (
                    lanes
                    == jax.lax.broadcasted_iota(jnp.int32, (_L, _L), 1)
                ).astype(jnp.bfloat16)
                win = hilo[pl.ds(blk * _L, _L), :]
                gbuf[g * _L:(g + 1) * _L, :] = jax.lax.dot_general(
                    oh, win, _DN, preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)
            roh = (
                jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
                == lrow_ref[:].reshape(1, T)
            ).astype(jnp.bfloat16)
            s = jax.lax.dot_general(roh, gbuf[:], _DN,
                                    preferred_element_type=jnp.float32)
            o_ref[:] = o_ref[:] + s[:, :_L] + s[:, _L:]
    elif mode == "dma":
        @pl.when(jnp.logical_and(do_comp, k == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)


def build(N, R, T, S, TILES, SPT, mode, W=64, NSEM=16, seed=0):
    rng = np.random.default_rng(seed)
    G = T // _L
    steps = (TILES + 1) * SPT
    DELTA = S // SPT
    assert DELTA % W == 0 and DELTA % 8 == 0, (DELTA, W)
    xp = jnp.asarray(rng.random((N, _L), np.float32))
    # scols[i] = staging chunk i%SPT of tile i//SPT (tail rows unused)
    scols = jnp.asarray(
        rng.integers(0, N, (steps, 8, DELTA // 8)).astype(np.int32))
    # lane metadata indexed by step (prologue rows unused)
    lidx = jnp.asarray(
        rng.integers(0, _L, (steps * G, _L)).astype(np.int32))
    lrow = jnp.asarray(
        rng.integers(0, R, (steps * G, _L)).astype(np.int32))
    blk = jnp.asarray(
        rng.integers(0, S // _L, (steps, 1, G)).astype(np.int32))

    kernel = functools.partial(_kernel, R=R, T=T, S=S, SPT=SPT, TILES=TILES,
                               DELTA=DELTA, W=W, NSEM=NSEM, mode=mode)
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
        out_specs=pl.BlockSpec(
            (R, _L),
            lambda i: (jnp.maximum(i // SPT - 1, 0), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILES * R, _L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, S, _L), jnp.float32),
            pltpu.VMEM((S, 256), jnp.bfloat16),
            pltpu.VMEM((T, 256), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    fj = jax.jit(lambda *a: f(*a))
    return fj, (scols, lidx, lrow, blk, xp)


def reference(args, R, T, S, TILES, SPT):
    """Numpy oracle of the kernel's semantics (hi/lo split staging)."""
    scols, lidx, lrow, blk, xp = [np.asarray(a) for a in args]
    G = T // _L
    DELTA = S // SPT
    out = np.zeros((TILES * R, _L), np.float32)
    for t in range(TILES):
        staged = np.zeros((S, _L), np.float32)
        for k in range(SPT):
            i = t * SPT + k
            cols = scols[i].reshape(-1)
            staged[k * DELTA:(k + 1) * DELTA] = xp[cols]
        hi = np.asarray(jnp.asarray(staged).astype(jnp.bfloat16))
        lo = np.asarray(
            jnp.asarray(staged - hi.astype(np.float32)).astype(jnp.bfloat16))
        hilo = np.concatenate(
            [hi.astype(np.float32), lo.astype(np.float32)], 1)
        for k in range(SPT):
            i = (t + 1) * SPT + k
            for g in range(G):
                b = blk[i, 0, g]
                win = hilo[b * _L:(b + 1) * _L]
                gath = win[lidx[i * G + g]]
                np.add.at(out, t * R + lrow[i * G + g],
                          gath[:, :_L] + gath[:, _L:])
    return out


def measure(fj, args, k=8):
    fj(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(k):
        r = fj(*args)
    r.block_until_ready()
    return (time.perf_counter() - t0) / k


def main():
    N = 2449024
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    R = int(argv[0]) if len(argv) > 0 else 512
    T = int(argv[1]) if len(argv) > 1 else 1024
    S = int(argv[2]) if len(argv) > 2 else 16000
    TILES = int(argv[3]) if len(argv) > 3 else 128
    check = "--check" in sys.argv
    SPT = 25
    S = (S // (SPT * 64)) * SPT * 64
    modes = [m.split("=")[1] for m in sys.argv if m.startswith("--modes=")]
    modes = modes[0].split(",") if modes else ["compute", "dma", "fused"]
    for mode in modes:
        try:
            fj, args = build(N, R, T, S, TILES, SPT, mode)
            t = measure(fj, args)
            if check and mode == "fused":
                got = np.asarray(fj(*args))
                want = reference(args, R, T, S, TILES, SPT)
                err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
                print(f"  fused rel err: {err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"[{mode}] FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        steps = TILES * SPT
        us_step = t / steps * 1e6
        lane_rate = T * steps / t / 1e6
        dma_rate = (S // SPT) * steps / t / 1e6
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

"""Does Mosaic support lax.cond-with-results around MXU groups, and
what does predication cost / save?

Kernel: G mask-decode+matmul groups per step (the panel compute block).
Variants:
  nocond    static unroll (current kernel shape) — baseline
  cond_all  per-SUB-block lax.cond, g_cnt = G  (overhead when all run)
  cond_half per-SUB-block lax.cond, g_cnt = G/2 (savings when half skip)
  when_all/when_half  sub-block pl.when + o_ref += per block (fallback)

    python tools/microbench_cond.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_L = 128
G = 32
SUB = 4
STEPS = 2048


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _group(masks_ref, win, g):
    mw = masks_ref[pl.ds(g, 1)].reshape(4, _L)
    rep = jnp.repeat(mw, 32, axis=0)
    sh = jax.lax.broadcasted_iota(jnp.int32, (_L, _L), 0) % 32
    ohT = jnp.right_shift(rep, sh) & 1
    return jax.lax.dot_general(
        ohT.astype(jnp.bfloat16), win, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def make(mode):
    def kernel(gcnt_ref, masks_ref, win_ref, o_ref):
        win = win_ref[:]
        g_cnt = gcnt_ref[0]

        if mode.startswith("cond"):
            def sub(s0):
                def yes():
                    acc = None
                    for g in range(s0, s0 + SUB):
                        s = _group(masks_ref, win, g)
                        acc = s if acc is None else acc + s
                    return acc

                return jax.lax.cond(
                    g_cnt > s0, yes,
                    lambda: jnp.zeros((_L, 2 * _L), jnp.float32))

            acc0 = acc1 = None
            for s0 in range(0, G, SUB):
                s = sub(s0)
                if (s0 // SUB) % 2 == 0:
                    acc0 = s if acc0 is None else acc0 + s
                else:
                    acc1 = s if acc1 is None else acc1 + s
            acc = acc0 + acc1
            o_ref[:] = acc[:, :_L] + acc[:, _L:]
        elif mode.startswith("when"):
            o_ref[:] = jnp.zeros_like(o_ref)
            for s0 in range(0, G, SUB):
                @pl.when(g_cnt > s0)
                def _(s0=s0):
                    acc = None
                    for g in range(s0, s0 + SUB):
                        s = _group(masks_ref, win, g)
                        acc = s if acc is None else acc + s
                    o_ref[:] = o_ref[:] + acc[:, :_L] + acc[:, _L:]
        else:
            acc0 = acc1 = None
            for g in range(G):
                s = _group(masks_ref, win, g)
                if g % 2 == 0:
                    acc0 = s if acc0 is None else acc0 + s
                else:
                    acc1 = s if acc1 is None else acc1 + s
            acc = acc0 + acc1
            o_ref[:] = acc[:, :_L] + acc[:, _L:]

    return kernel


def run(mode, frac):
    rng = np.random.default_rng(0)
    masks = rng.integers(0, 2**31, (STEPS * G, 4, _L)).astype(np.int32)
    win = rng.standard_normal((_L, 2 * _L)).astype(np.float32).astype(
        jnp.bfloat16)
    gcnt = np.full(STEPS, int(G * frac), np.int32)

    f = pl.pallas_call(
        make(mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((G, 4, _L), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_L, 2 * _L), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_L, _L), lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((_L, _L), jnp.float32),
    )
    fj = jax.jit(lambda g, m, w: f(g, m, w))
    try:
        r = fj(jnp.asarray(gcnt), jnp.asarray(masks), win)
        float(jnp.asarray(r[0, 0], jnp.float32))
    except Exception as e:  # noqa: BLE001
        log(f"[{mode} frac={frac}] FAILED {type(e).__name__}: "
            f"{str(e)[:200]}")
        return
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(jnp.asarray(fj(jnp.asarray(gcnt), jnp.asarray(masks),
                             win)[0, 0], jnp.float32))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[len(ts) // 2]
    log(f"[{mode} frac={frac}] {t*1e3:7.2f} ms  "
        f"{t/STEPS/G*1e9:6.1f} ns/slot  {t/STEPS*1e6:5.2f} us/step")


def main():
    run("nocond", 1.0)
    run("cond_all", 1.0)
    run("cond_half", 0.5)
    run("when_all", 1.0)
    run("when_half", 0.5)


if __name__ == "__main__":
    main()

"""Numpy interpreter of a RangesPlan — the kernel's step-exact oracle.

Replays exactly what ops/pallas/ranges.py does per step (scattered row
DMAs, range block copies with parity ping-pong, hi/lo splits at
first-of-range / first-of-tile, multi-hot gathers over the unified
[hot | range | scattered] window, scatter into the tile), so kernel bugs
separate cleanly from plan bugs. Mirrors sparse/fused_sim.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from of_spmm_tpu.sparse.ranges import _L, RangesPlan


def _hilo(a: np.ndarray) -> np.ndarray:
    hi = np.asarray(jnp.asarray(a).astype(jnp.bfloat16))
    lo = np.asarray(
        jnp.asarray(a - hi.astype(np.float32)).astype(jnp.bfloat16))
    return np.concatenate([hi.astype(np.float32), lo.astype(np.float32)], 1)


def simulate(plan: RangesPlan, x: np.ndarray) -> np.ndarray:
    n, m = plan.shape
    d = x.shape[1]
    R, T, RC, RQ = plan.R, plan.T, plan.RC, plan.RQ
    G = T // _L
    xs = np.asarray(x, np.float32)
    if plan.col_scale is not None:
        xs = xs * np.asarray(plan.col_scale)[:, None]
    target = max(-(-m // _L) * _L, RC)
    if target > m:
        xs = np.concatenate([xs, np.zeros((target - m, d), np.float32)])
    hot = xs[np.asarray(plan.hot_ids)] if plan.n_hot else \
        np.zeros((0, d), np.float32)
    hot_hilo = _hilo(hot) if plan.n_hot else np.zeros((0, 2 * d), np.float32)
    H_blocks = plan.n_hot // _L
    RCB = RC // _L

    out_tiles = []
    for seg in plan.segments:
        ctrl = np.asarray(seg.ctrl)
        scols = np.asarray(seg.scols)       # (steps, 2, DMAX) chunk pairs
        rcopy = np.asarray(seg.rcopy)
        lidx = np.asarray(seg.lidx)
        lrow = np.asarray(seg.lrow)
        blk = np.asarray(seg.blk)
        cq = plan.cq
        # XLA take phase: tier-major packed hi|lo scattered table
        TS = plan.stage_tier
        ptr = seg.stage_tier_ptr
        take = np.asarray(seg.stage_take)
        parts = []
        for t in range(len(ptr) - 1):
            if ptr[t + 1] == ptr[t]:
                continue
            xt = xs[t * TS:min((t + 1) * TS, xs.shape[0])]
            idx = np.minimum(take[ptr[t]:ptr[t + 1]], xt.shape[0] - 1)
            parts.append(xt[idx])
        table = (_hilo(np.concatenate(parts))
                 if parts else np.zeros((_L, 2 * d), np.float32))
        range_f32 = np.zeros((2 * RC, d), np.float32)
        # window: [hot | range p0 | range p1 | scat p0 | scat p1]
        hilo = np.zeros(
            (H_blocks * _L + 2 * RC + 2 * plan.S_buf, 2 * d), np.float32)
        hilo[:H_blocks * _L] = hot_hilo
        SCAT0 = H_blocks * _L + 2 * RC
        out = np.zeros((seg.n_tiles * R, d), np.float32)
        for i in range(seg.n_steps):
            (tile, _first, _sp, s_cnt, r_cnt, s_read, _pc, _sp7,
             _sp8, zero_out, r_first, r_read, _prc) = ctrl[i, 0, :13]
            for k in range(s_cnt):
                sb, db = scols[i, 0, k], scols[i, 1, k]
                hilo[SCAT0 + db * cq:SCAT0 + (db + 1) * cq] = \
                    table[sb * cq:(sb + 1) * cq]
            for k in range(r_cnt):
                src, dst = rcopy[i, 0, k], rcopy[i, 1, k]
                range_f32[dst:dst + RQ] = xs[src:src + RQ]
            if tile >= 0 and zero_out:
                out[tile * R:(tile + 1) * R] = 0.0
            if tile >= 0 and r_first:
                hilo[H_blocks * _L + r_read:
                     H_blocks * _L + r_read + RC] = _hilo(
                    range_f32[r_read:r_read + RC])
            if tile < 0:
                continue
            for g in range(G):
                b = blk[i, 0, g]
                if b < H_blocks:
                    off = b * _L
                elif b < H_blocks + RCB:
                    off = b * _L + r_read
                else:
                    off = b * _L + RC + s_read
                win = hilo[off:off + _L]
                rows = lrow[i * G + g]
                if plan.multihot:
                    mw = lidx[i * G + g].astype(np.uint32)
                    rep = np.repeat(mw, 32, axis=0)
                    shift = (np.arange(_L) % 32)[:, None]
                    ohT = ((rep >> shift) & 1).astype(np.float32)
                    gath = ohT.T @ win
                else:
                    gath = win[lidx[i * G + g]]
                if seg.val_hi is None:
                    contrib = gath[:, :d] + gath[:, d:]
                else:
                    vh = np.asarray(seg.val_hi[i * G + g],
                                    np.float32)[:, None]
                    vl = np.asarray(seg.val_lo[i * G + g],
                                    np.float32)[:, None]
                    contrib = (vh * (gath[:, :d] + gath[:, d:])
                               + vl * gath[:, :d])
                valid = rows < R
                np.add.at(out, tile * R + np.where(valid, rows, 0),
                          np.where(valid[:, None], contrib, 0.0))
        out_tiles.append(out)
    y = np.concatenate(out_tiles, axis=0)[:n]
    if plan.row_scale is not None:
        y = y * np.asarray(plan.row_scale)[:, None]
    return y

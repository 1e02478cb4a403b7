"""Numpy interpreter of a FusedPlan — the kernel's step-exact oracle.

Replays exactly what ops/pallas/fused.py does per step (staging DMAs into
the parity buffers, hi/lo split at first-step-of-tile, one-hot gather from
the unified [hot | staged] window space, scatter into the tile), so kernel
bugs separate cleanly from plan bugs. Used by tests and by the engine's
interpret fallback on CPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from of_spmm_tpu.sparse.fused import _L, FusedPlan


def _hilo(a: np.ndarray) -> np.ndarray:
    hi = np.asarray(jnp.asarray(a).astype(jnp.bfloat16))
    lo = np.asarray(
        jnp.asarray(a - hi.astype(np.float32)).astype(jnp.bfloat16))
    return np.concatenate([hi.astype(np.float32), lo.astype(np.float32)], 1)


def simulate(plan: FusedPlan, x: np.ndarray) -> np.ndarray:
    n, m = plan.shape
    d = x.shape[1]
    R, T = plan.R, plan.T
    G = T // _L
    xs = np.asarray(x, np.float32)
    if plan.col_scale is not None:
        xs = xs * np.asarray(plan.col_scale)[:, None]
    hot = xs[np.asarray(plan.hot_ids)] if plan.n_hot else \
        np.zeros((0, d), np.float32)
    hot_hilo = _hilo(hot) if plan.n_hot else np.zeros((0, 2 * d), np.float32)
    H_blocks = plan.n_hot // _L

    chunks = plan.staging == "chunks"
    out_tiles = []
    for seg in plan.segments:
        ctrl = np.asarray(seg.ctrl)
        if chunks:
            chunk_arr = np.asarray(seg.scols)       # (steps, 2, CMAX)
            # XLA staging phase: per-tier takes -> tier-major hilo table
            TS = plan.stage_tier
            ptr = seg.stage_tier_ptr
            take = np.asarray(seg.stage_take)
            parts = []
            for t in range(len(ptr) - 1):
                if ptr[t + 1] == ptr[t]:
                    continue
                xt = xs[t * TS:min((t + 1) * TS, m)]
                idx = np.minimum(take[ptr[t]:ptr[t + 1]],
                                 xt.shape[0] - 1)
                parts.append(xt[idx])
            table = (_hilo(np.concatenate(parts))
                     if parts else np.zeros((_L, 2 * d), np.float32))
        else:
            scols = np.asarray(seg.scols).reshape(seg.n_steps, -1)
        lidx = np.asarray(seg.lidx)
        lrow = np.asarray(seg.lrow)
        blk = np.asarray(seg.blk)
        stage = np.zeros((2 * plan.S_buf, d), np.float32)
        hilo = np.zeros((2 * plan.S_buf, 2 * d), np.float32)
        out = np.zeros((seg.n_tiles * R, d), np.float32)
        for i in range(seg.n_steps):
            tile, first, base, cnt, _, split_base = ctrl[i, 0, :6]
            zero_out = ctrl[i, 0, 9]
            if cnt:
                if chunks:
                    for k in range(cnt):
                        sb, db = chunk_arr[i, 0, k], chunk_arr[i, 1, k]
                        cq = plan.cq
                        hilo[db * cq:(db + 1) * cq] = \
                            table[sb * cq:(sb + 1) * cq]
                else:
                    stage[base:base + cnt] = xs[scols[i, :cnt]]
            if tile >= 0 and first and zero_out:
                out[tile * R:(tile + 1) * R] = 0.0
            if tile >= 0 and first and not chunks:
                hilo[:plan.S_buf] = _hilo(
                    stage[split_base:split_base + plan.S_buf])
            if tile >= 0:
                for g in range(G):
                    b = blk[i, 0, g]
                    if b < H_blocks:
                        win = hot_hilo[b * _L:(b + 1) * _L]
                    else:
                        sb = b - H_blocks
                        if chunks:
                            sb += split_base // _L  # read-parity region
                        win = hilo[sb * _L:(sb + 1) * _L]
                    rows = lrow[i * G + g]
                    if plan.multihot:
                        mw = lidx[i * G + g].astype(np.uint32)  # (4, 128)
                        rep = np.repeat(mw, 32, axis=0)         # (128,128)
                        shift = (np.arange(_L) % 32)[:, None]
                        ohT = ((rep >> shift) & 1).astype(np.float32)
                        gath = ohT.T @ win                       # (128, 2d)
                    else:
                        gath = win[lidx[i * G + g]]
                    if seg.val_hi is None:
                        contrib = gath[:, :d] + gath[:, d:]
                    else:
                        vh = np.asarray(seg.val_hi[i * G + g],
                                        np.float32)[:, None]
                        vl = np.asarray(seg.val_lo[i * G + g],
                                        np.float32)[:, None]
                        # kernel numerics: vh*(ghi+glo) + vl*ghi
                        contrib = (vh * (gath[:, :d] + gath[:, d:])
                                   + vl * gath[:, :d])
                    if plan.window:
                        # dst-window-homogeneous step: local rows land at
                        # the step's 128-row window inside the tile
                        dst0 = tile * R + ctrl[i, 0, 10] * _L
                        valid = rows < _L
                    else:
                        dst0 = tile * R
                        valid = rows < R
                    np.add.at(out, dst0 + np.where(valid, rows, 0),
                              np.where(valid[:, None], contrib, 0.0))
        out_tiles.append(out)
    y = np.concatenate(out_tiles, axis=0)[:n]
    if plan.row_scale is not None:
        y = y * np.asarray(plan.row_scale)[:, None]
    return y

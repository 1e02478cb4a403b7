"""Flash attention: fused online-softmax attention Pallas kernel.

Parity target: the reference's fused attention CUDA kernels
(oneflow/user/kernels/fused_self_attention_query_mul_key_and_value_kernel.cu,
fused_multi_head_attention_inference_*), re-designed for the TPU memory
hierarchy: the (T, T) score matrix never exists — each (block_q, block_k)
tile lives only in VMEM, folded into running (m, l, acc) statistics
(online softmax), so activation memory is O(T*d) instead of O(T^2).

Grid: (batch*heads, T_q/block_q, T_kv/block_k) with the KV dimension
"arbitrary" (sequential reduction) and the rest parallel. Causal tiles
strictly above the diagonal are skipped entirely (@pl.when), halving the
work. Statistics are f32 regardless of input dtype.

Backward: recompute-based custom_vjp — the forward saves only (q, k, v)
and the backward re-derives gradients with the standard XLA attention
(O(T^2) transient inside the bwd, rematerialized per block by XLA). This
trades backward FLOPs for the forward's O(T*d) memory — the same
policy as jax.checkpoint, and the reference's checkpointing pass
(oneflow/core/job_rewriter/checkpointing_pass.cpp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale, causal, bq, bk, nk):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # causal: skip KV tiles strictly above the diagonal
    run = (ki * bk <= qi * bq + bq - 1) if causal else True

    @pl.when(run)
    def _():
        q = q_ref[0]  # (bq, d)
        k = k_ref[0]  # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (bq, bk)
        if causal:
            qpos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            kpos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(kpos <= qpos, s, _NEG_INF)
        m_prev = m_ref[:, :1]  # (bq, 1)
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)  # (bq, 1); -inf only before any tile
        alpha = jnp.where(m_next == -jnp.inf, 1.0, alpha)
        p = jnp.exp(s - jnp.where(m_next == -jnp.inf, 0.0, m_next))
        if causal:
            p = jnp.where(kpos <= qpos, p, 0.0)
        l_next = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = alpha * acc_ref[:] + jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0],
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_next, l_ref.shape)

    @pl.when(ki == nk - 1)
    def _():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret"))
def _flash_fwd(q, k, v, causal, block_q, block_k, interpret):
    BH, Tq, d = q.shape
    Tk = k.shape[1]
    bq = min(block_q, Tq)
    bk = min(block_k, Tk)
    if Tq % bq or Tk % bk:
        raise ValueError(
            f"sequence lengths ({Tq}, {Tk}) must be divisible by the "
            f"block sizes ({bq}, {bk})")
    nk = Tk // bk
    scale = 1.0 / np.sqrt(d)
    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, bq=bq, bk=bk, nk=nk)
    return pl.pallas_call(
        kernel,
        grid=(BH, Tq // bq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Tq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, causal, block_q, block_k, interpret):
    return _flash_fwd(q, k, v, causal, block_q, block_k, interpret)


def _flash_vjp_fwd(q, k, v, causal, block_q, block_k, interpret):
    return _flash_fwd(q, k, v, causal, block_q, block_k, interpret), (q, k, v)


def _flash_vjp_bwd(causal, block_q, block_k, interpret, res, g):
    q, k, v = res

    def ref_attn(q, k, v):
        from of_spmm_tpu.nn.attention import scaled_dot_product_attention

        return scaled_dot_product_attention(q, k, v, is_causal=causal)

    _, vjp = jax.vjp(ref_attn, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q, k, v, *, is_causal: bool = False, block_q: int = 256,
                    block_k: int = 256, interpret=None) -> jnp.ndarray:
    """(..., T, d) fused attention; leading dims are batch/head.

    Same semantics as nn.attention.scaled_dot_product_attention (without
    an explicit mask); O(T*d) forward activation memory.
    """
    from of_spmm_tpu.utils.config import pallas_interpret_default

    if interpret is None:
        interpret = pallas_interpret_default()
    lead = q.shape[:-2]
    Tq, d = q.shape[-2:]
    Tk = k.shape[-2]
    qf = q.reshape(-1, Tq, d)
    kf = k.reshape(-1, Tk, d)
    vf = v.reshape(-1, Tk, d)
    out = _flash(qf, kf, vf, is_causal, block_q, block_k, interpret)
    return out.reshape(*lead, Tq, d)

"""Pipeline parallelism: GPipe microbatch schedule over a mesh axis.

The reference builds pipelines from per-block stage scopes
(nn/graph/block_config.py:54), grad-accumulation microbatching
(nn/graph/graph_config.py:219, job_conf.proto:240) and a job pass that
inserts stage-crossing buffer ops (job_rewriter/pipeline_buffer_pass.cpp:
80-113); the 1F1B schedule *emerges* from actor regst backpressure rather
than an explicit scheduler. The TPU-native re-expression: every stage is
one slice of a `stage` mesh axis inside shard_map; a lax.scan advances the
pipeline one tick at a time, moving activations to the next stage with a
single ppermute per tick. Reverse-mode AD transposes the ppermute chain,
so the backward pipeline schedule (cool-down mirror of the warm-up) is
derived by jax.grad — the same way the reference derives it from dataflow,
not from an explicit schedule.

Constraints (classic GPipe-on-SPMD):
- all stages map activations of one shape to the same shape (put
  embed/head projections inside the first/last stage functions);
- ``stage_params`` is a pytree whose leaves are stacked along a leading
  stage axis (use ``stack_stage_params``), sharded S(0) over the stage
  axis so each device holds only its own stage's weights.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(per_stage: Sequence[Any]) -> Any:
    """Stack per-stage param pytrees along a new leading stage axis.

    All stages must share one tree structure and leaf shapes (the shape-
    uniform GPipe constraint applied to parameters).
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_stage)


def _local_stage_slice(stacked: Any) -> Any:
    """Inside shard_map the S(0)-sharded stack has local leading dim 1."""
    return jax.tree_util.tree_map(lambda x: x[0], stacked)


def gpipe_spmd(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    n_stages: int,
    n_micro: int,
    axis: str = "stage",
    remat: bool = True,
):
    """Build the SPMD pipeline body: (stacked_params_local, x_micro) -> y.

    Returns a function to be called INSIDE shard_map over ``axis``:
    input x_micro is (n_micro, ...) microbatched activations (replicated
    across the stage axis; only stage 0 reads them), output is the
    (n_micro, ...) last-stage results (valid on the last stage; other
    stages return zeros — combine with a psum or a masked loss).
    """
    if remat:
        stage_fn = jax.checkpoint(stage_fn)

    fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

    def body(stacked_local: Any, x_micro: jnp.ndarray) -> jnp.ndarray:
        params = _local_stage_slice(stacked_local)
        sidx = jax.lax.axis_index(axis)
        is_first = sidx == 0
        is_last = sidx == n_stages - 1
        ticks = n_micro + n_stages - 1

        def tick(carry, t):
            cur = carry
            y = stage_fn(params, cur)
            moved = (
                jax.lax.ppermute(y, axis, fwd_perm)
                if n_stages > 1
                else jnp.zeros_like(y)
            )
            # stage 0's next input is microbatch t+1 (clamped; extras are
            # pipeline-drain junk that is never written to the output)
            nxt_idx = jnp.minimum(t + 1, n_micro - 1)
            nxt_in = jax.lax.dynamic_index_in_dim(x_micro, nxt_idx, 0,
                                                  keepdims=False)
            nxt = jnp.where(is_first, nxt_in, moved)
            return nxt, y

        first_in = x_micro[0]
        init = jnp.where(is_first, first_in, jnp.zeros_like(first_in))
        _, ys = jax.lax.scan(tick, init, jnp.arange(ticks))
        # last stage emitted microbatch m at tick m + n_stages - 1
        out = ys[n_stages - 1:]
        return jnp.where(is_last, out, jnp.zeros_like(out))

    return body


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x_micro: jnp.ndarray,
    mesh: Mesh,
    axis: str = "stage",
    n_micro: Optional[int] = None,
    remat: bool = True,
) -> jnp.ndarray:
    """Run the pipeline end-to-end; returns (n_micro, ...) outputs.

    ``stacked_params`` leaves are (n_stages, ...) and get S(0)-sharded over
    ``axis``; activations are replicated (microbatch-major). Differentiable:
    jax.grad produces the transposed (backward) pipeline schedule.
    """
    n_stages = mesh.shape[axis]
    if n_micro is None:
        n_micro = x_micro.shape[0]
    body = gpipe_spmd(stage_fn, n_stages, n_micro, axis=axis, remat=remat)

    def spmd(params, x):
        y = body(params, x)
        # replicate the last stage's result to every stage slice so the
        # caller sees one logical array (cheap: one psum over zeros+result)
        return jax.lax.psum(y, axis)

    pspec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    return jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
        check_vma=False,
    )(stacked_params, x_micro)


@dataclasses.dataclass(frozen=True)
class PipelineModule:
    """Module-flavored wrapper: a Sequential split into shape-uniform stages.

    The analog of assigning nn.Graph blocks to stages with
    ``block.config.set_stage`` (block_config.py:32-114): here each stage is
    an explicit (init, apply) module (e.g. nn.Sequential slices).
    """

    stages: tuple
    axis: str = "stage"
    remat: bool = True

    def init(self, key) -> Any:
        keys = jax.random.split(key, len(self.stages))
        return stack_stage_params(
            [s.init(k) for s, k in zip(self.stages, keys)]
        )

    def _stage_fn(self):
        # all stages must share a pytree structure; dispatch by index is
        # impossible under S(0) stacking, so stages must be homogeneous
        # modules. Heterogeneous pipelines use gpipe_spmd directly with a
        # hand-written stage_fn switching on axis_index.
        s0 = self.stages[0]
        return lambda p, x: s0.apply(p, x)

    def apply(self, stacked_params, x_micro, mesh: Mesh) -> jnp.ndarray:
        return pipeline_apply(
            self._stage_fn(), stacked_params, x_micro, mesh,
            axis=self.axis, remat=self.remat,
        )

"""Model export/serving — the C++ inference-API analog (oneflow/api/cpp).

The reference ships a C++ inference API that loads a saved graph and runs
it without Python (oneflow/api/cpp/, tests in api/cpp/tests/). The XLA
ecosystem's equivalent artifact is a serialized StableHLO module
(jax.export): a compiled, Python-free program any PJRT runtime (C++, Go,
serving systems like TF-Serving/IFRT) can load and execute. This module
wraps that into a save/load surface:

- ``export_model(fn, example_args, path)``: trace + lower ``fn`` and write
  a self-contained artifact directory (serialized StableHLO bytes +
  metadata + optional parameter arrays).
- ``load_model(path)``: rehydrate into a callable (in-process
  deserialization — the same bytes feed a C++ PJRT loader out-of-process).
- ``export_stablehlo_text``: human-readable IR dump, the analog of the
  reference's job-proto/.dot debugging dumps (SURVEY.md §5 observability).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as jexport


def export_model(
    fn: Callable,
    example_args: Sequence[Any],
    path: str,
    params: Optional[Any] = None,
    name: str = "model",
) -> str:
    """Serialize jit(fn) at the example shapes into ``path``.

    Writes: ``module.bin`` (portable serialized artifact), ``meta.json``
    (shapes/dtypes for the serving side), and ``params.npz`` when a
    parameter pytree is given (the saved-variable analog).
    """
    os.makedirs(path, exist_ok=True)
    exported = jexport.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    with open(os.path.join(path, "module.bin"), "wb") as f:
        f.write(blob)
    meta = {
        "name": name,
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "platforms": list(exported.platforms),
        "nr_devices": exported.nr_devices,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    if params is not None:
        leaves, treedef = jax.tree_util.tree_flatten(params)
        np.savez(
            os.path.join(path, "params.npz"),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
        )
        with open(os.path.join(path, "treedef.txt"), "w") as f:
            f.write(str(treedef))
    return path


def load_model(path: str) -> Callable:
    """Deserialize an exported artifact into a callable."""
    with open(os.path.join(path, "module.bin"), "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def load_params(path: str, treedef_like: Any) -> Any:
    """Rehydrate params.npz into the structure of ``treedef_like``."""
    data = np.load(os.path.join(path, "params.npz"))
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    _, treedef = jax.tree_util.tree_flatten(treedef_like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def export_stablehlo_text(fn: Callable, example_args: Sequence[Any]) -> str:
    """Readable StableHLO for inspection/debugging (the reference's
    TeePersistentLogStream job/plan dumps, compiler.cpp:54-58)."""
    return jax.jit(fn).lower(*example_args).as_text()


def ir_stats(fn: Callable, example_args: Sequence[Any]) -> dict:
    """Op histogram of the lowered module — a cheap plan-inspection tool
    (the analog of plan memory/op logs, PlanUtil::PlanMemoryLog)."""
    text = export_stablehlo_text(fn, example_args)
    import re

    ops: dict = {}
    for m in re.finditer(r"=\s*\"?([a-z_]+\.[a-z_0-9]+)", text):
        ops[m.group(1)] = ops.get(m.group(1), 0) + 1
    return {"n_lines": text.count("\n"), "ops": ops}

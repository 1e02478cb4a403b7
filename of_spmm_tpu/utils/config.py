"""Typed environment-variable flag system.

TPU-native analog of the reference's env flag tiers
(oneflow/core/common/env_var/env_var.h:26-48: DEFINE_ENV_BOOL/INTEGER with
defaults, read lazily at use sites). Flags are declared once with a type and
default, read from the process environment on first access, and can be
overridden programmatically for tests.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

_TRUE = frozenset({"1", "true", "yes", "on"})
_FALSE = frozenset({"0", "false", "no", "off"})


def _parse_bool(s: str) -> bool:
    v = s.strip().lower()
    if v in _TRUE:
        return True
    if v in _FALSE:
        return False
    raise ValueError(f"cannot parse boolean flag value {s!r}")


@dataclass
class _Flag:
    name: str
    default: Any
    parser: Callable[[str], Any]
    doc: str = ""


class FlagRegistry:
    """Process-wide registry of typed env flags with test overrides."""

    def __init__(self) -> None:
        self._flags: Dict[str, _Flag] = {}
        self._overrides: Dict[str, Any] = {}
        self._lock = threading.Lock()

    def define(self, name: str, default: Any, parser: Callable[[str], Any], doc: str = "") -> None:
        with self._lock:
            if name in self._flags:
                raise ValueError(f"flag {name} already defined")
            self._flags[name] = _Flag(name, default, parser, doc)

    def define_bool(self, name: str, default: bool, doc: str = "") -> None:
        self.define(name, default, _parse_bool, doc)

    def define_int(self, name: str, default: int, doc: str = "") -> None:
        self.define(name, default, int, doc)

    def define_str(self, name: str, default: str, doc: str = "") -> None:
        self.define(name, default, str, doc)

    def get(self, name: str) -> Any:
        with self._lock:
            if name in self._overrides:
                return self._overrides[name]
            flag = self._flags[name]
        raw = os.environ.get(name)
        if raw is None:
            return flag.default
        return flag.parser(raw)

    def override(self, name: str, value: Optional[Any]) -> None:
        """Set (or clear, with None) a programmatic override. For tests."""
        with self._lock:
            if name not in self._flags:
                raise KeyError(f"unknown flag {name}")
            if value is None:
                self._overrides.pop(name, None)
            else:
                self._overrides[name] = value

    def all_flags(self) -> Dict[str, Any]:
        with self._lock:
            names = list(self._flags)
        return {n: self.get(n) for n in names}


FLAGS = FlagRegistry()

# ---------------------------------------------------------------------------
# Framework flags.
# ---------------------------------------------------------------------------
FLAGS.define_bool(
    "OFS_FORCE_PALLAS_INTERPRET",
    False,
    "Run all Pallas kernels in interpreter mode (for CPU debugging).",
)
FLAGS.define_int(
    "OFS_SPMM_ROW_CHUNK",
    1024,
    "Row-chunk size for the chunked XLA SpMM fallback (memory / recompile tradeoff).",
)
FLAGS.define_int(
    "OFS_MAX_ELL_WIDTH",
    256,
    "Maximum ELL bucket width; rows with more nnz are split (load balancing).",
)
FLAGS.define_bool(
    "OFS_DEBUG_BOXING",
    False,
    "Log halo-exchange / resharding decisions (analog of ONEFLOW eager boxing logger).",
)
FLAGS.define_int(
    "OFS_SPMM_MAX_GATHER_SLOTS",
    2 * 1024 * 1024,
    "Max (rows*width) slots one tiered-spmm bucket may gather at once; "
    "larger buckets chunk via lax.map (bounds the materialized block: "
    "slots * d * 4 bytes of HBM).",
)
FLAGS.define_str(
    "OFS_DEFAULT_IMPL",
    "auto",
    "Default op implementation: auto | xla | pallas.",
)
FLAGS.define_int(
    "OFS_TIERED_SCATTER_BYTES",
    1_500_000_000,
    "Tiered-spmm combine strategy cutoff: plans whose ELL-row results "
    "exceed this many bytes combine by per-bucket sorted scatter-add "
    "(O(out + one bucket) memory) instead of the finish-gather over the "
    "full concat (2x concat bytes, faster for small plans).",
)
FLAGS.define_int(
    "OFS_DMA_WAVE",
    64,
    "Row-DMA wave width for Pallas gather kernels: W copies issued per "
    "wave, pipelined two waves deep (measured optimum on v5: 346 Mrows/s "
    "at W=64 vs 73 at W=16 unpipelined; tools/microbench_gather2.py).",
)
FLAGS.define_int(
    "OFS_DMA_NSEM",
    8,
    "Number of DMA semaphores the row-DMA waves cycle through.",
)
FLAGS.define_int(
    "OFS_FUSED_T",
    0,
    "Force the staging-engine lanes-per-step T; applies to the fused "
    "engine (sparse/fused.py), the ranges engine (sparse/ranges.py), "
    "AND the panel engine (sparse/panels.py; bench.py's panels plan "
    "cache key also reads it). 0 = adaptive: fused always picks 1024 "
    "(its measured best); ranges picks 2048 for graphs >= 8M nnz, "
    "else 1024; panels picks 8192 for graphs >= 8M nnz, else 1024.",
)
FLAGS.define_int(
    "OFS_TAKE_ARITY",
    8,
    "Index arity k for the panel engine's staging gather "
    "(ops/pallas/panels.py): the linear take table is gathered with "
    "(rows/k, k)-shaped indices instead of a flat vector, nudging the "
    "XLA TPU gather emitter onto its batched path (~5% take-phase win "
    "in situ, r5). The produced table layout is identical. "
    "1 = flat (r4 behavior).",
)
FLAGS.define_int(
    "OFS_HBM_BYTES",
    0,
    "Per-chip HBM bytes for the fused-plan memory budget "
    "(sparse/fused.py plan_memory_report); 0 = auto-detect from the "
    "device (CPU plan-build hosts assume the v5e 16 GB target).",
)


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU-like device."""
    import jax

    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    return dev.platform in ("tpu", "axon")


def pallas_interpret_default() -> bool:
    """Interpret Pallas kernels unless running on real TPU hardware."""
    if FLAGS.get("OFS_FORCE_PALLAS_INTERPRET"):
        return True
    return not on_tpu()

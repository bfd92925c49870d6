"""Size-based auto-dispatch between the fused Pallas MMD path and the
dense jnp oracle (VERDICT round-1 item 5).

The fused kernel's win is avoiding HBM traffic for the (m, n) Gram
matrix; below a problem-size crossover the dense XLA path is at least
as fast (measured sweep in BASELINE.md: at d=128 the fused grad path
wins from ~8k rows, the forward from ~16k; both win decisively at 32k,
2.0x on grad).  ``use_pallas = "auto"`` (the config default) picks the
fused path exactly when the Gram rows each pair-sum call will see reach
``pallas_min_rows`` — so the kernel is load-bearing in the
large-global-batch / ring configurations where it wins, and never a
regression at the reference's B=64.

Decisions are made at TRACE time from static shapes (no runtime cost,
no dynamic control flow under jit).
"""

from __future__ import annotations

from typing import Optional, Union

import jax

# Measured crossover (TPU v5e, RQ mixture, value+grad, round-2 sweep in
# BASELINE.md): fused ~parity at 4096 rows (0.92-1.10x across d=16/128)
# and winning above (1.56x at 8192/d=128, 2.0x grad at 32k in round 1).
# Overridable per-config via ``pallas_min_rows``.
DEFAULT_MIN_ROWS = 4096

_PALLAS_KERNELS = ("gaussian", "rq", "distance", "dot")


def should_use_pallas(mode: Union[str, bool], kernel: str, m: int, n: int,
                      min_rows: int = DEFAULT_MIN_ROWS,
                      platform: Optional[str] = None) -> bool:
    """Static dispatch decision for one pair-sum of an (m, n) Gram block.

    mode: "on" | "off" | "auto" (Config normalizes bools to on/off).
    platform: override for tests; defaults to the active JAX backend.
    The fused path serves every kernel in the loss surface — the
    mixtures, their mix_rq_dot extension, and the pure dot kernel (the
    degenerate empty-mixture case; mmd_kernel.canon_kernel).
    """
    if kernel not in _PALLAS_KERNELS:
        return False
    if mode in (True, "on"):
        return True
    if mode in (False, "off"):
        return False
    if mode != "auto":
        raise ValueError(f"use_pallas must be on/off/auto, got {mode!r}")
    if platform is None:
        platform = jax.default_backend()
    if platform == "cpu":
        # interpret-mode Pallas is a debugging path, never a win
        return False
    return max(m, n) >= min_rows

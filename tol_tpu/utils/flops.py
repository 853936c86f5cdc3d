"""FLOP accounting / utilization reporting for the bench.

``program_flops`` asks XLA's compiled-module cost analysis for the flop
count of a jitted program.  For a ``lax.while_loop`` solver program the
analysis counts the loop body ONCE (HLO cost analysis has no trip
counts), so on the bench programs the returned number is, to first
order, the cost of one batched solver iteration plus the (small)
init/report epilogue — exactly the "flops per iteration" figure the
utilization accounting needs (VERDICT r03 ask #2).

``peak_flops`` maps the local device kind to its published dense peak
(bf16 for TPUs; the solver's f32-highest matmuls pass the MXU at half
that, but the bf16 number is the conventional MFU denominator and the
conservative choice).
"""

from __future__ import annotations

import jax

# Published dense bf16 peak FLOP/s per chip.
_PEAKS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e (Trillium)
    "TPU v6e": 918e12,
}


def program_flops(jitted_fn, *args, **kwargs) -> float:
    """Total flops XLA attributes to one execution of the compiled module
    (loop bodies counted once — see module docstring).  NaN when the
    backend exposes no cost analysis."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def peak_flops(device=None) -> float | None:
    """Dense bf16 peak of the local accelerator, or None if unknown."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for name, peak in _PEAKS.items():
        if kind.startswith(name):
            return peak
    return None

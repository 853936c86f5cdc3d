from tol_tpu.solver.canonical import CanonicalNLP, canonicalize
from tol_tpu.solver.ipm import IPMOptions, IPMResult, solve as ipm_solve

__all__ = [
    "CanonicalNLP",
    "canonicalize",
    "IPMOptions",
    "IPMResult",
    "ipm_solve",
]

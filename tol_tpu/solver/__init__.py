from tol_tpu.solver.alm import ALMOptions, ALMResult, solve as alm_solve
from tol_tpu.solver.canonical import CanonicalNLP, canonicalize
from tol_tpu.solver.kkt_condensed import make_condensed_kkt
from tol_tpu.solver.kkt_dense import make_dense_kkt
from tol_tpu.solver.kkt_structured import make_structured_kkt

__all__ = [
    "CanonicalNLP",
    "canonicalize",
    "ALMOptions",
    "ALMResult",
    "alm_solve",
    "make_condensed_kkt",
    "make_dense_kkt",
    "make_structured_kkt",
]

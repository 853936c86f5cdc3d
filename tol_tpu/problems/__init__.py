from tol_tpu.problems.base import CollocationNLP, build_nlp
from tol_tpu.problems.layout import flatten_decision, unflatten_decision

__all__ = [
    "CollocationNLP",
    "build_nlp",
    "flatten_decision",
    "unflatten_decision",
]

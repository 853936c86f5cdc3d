from tol_tpu.problems.base import CollocationNLP, build_nlp

__all__ = [
    "CollocationNLP",
    "build_nlp",
]

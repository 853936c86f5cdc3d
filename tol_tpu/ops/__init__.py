from tol_tpu.ops.smallalg import chol_unrolled, spd_inverse, tri_solve_unrolled

__all__ = ["chol_unrolled", "tri_solve_unrolled", "spd_inverse"]

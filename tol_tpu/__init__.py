"""tol_tpu — a TPU-native trajectory-optimization framework for fixed-wing UAVs.

A from-scratch re-design of the capabilities of ``lingaqing/tol`` (the EA-DDDAS
"Trajectory Optimization Layer", reference mounted at ``/root/reference``) as a
stack of pure functions over JAX pytrees:

    problem definition  ->  automatic differentiation  ->  batched NLP solver
    ->  sharded execution over device meshes  ->  receding-horizon missions.

Where the reference is one mutable C++ class (``src/problem.cpp``) driving the
commercial SNOPT Fortran solver, this framework expresses the same
direct-collocation NLPs (missions G7 / S10 over a 3-D point-mass aircraft in a
wind field) as differentiable residual functions, and solves thousands of them
per chip with a batched primal-dual interior-point method whose KKT systems
are factorized with a time-structured block elimination.

Layout (maps SURVEY.md section 2's component inventory):
    tol_tpu.config     typed config pytrees  (ref: include/parameters.h)
    tol_tpu.io         .param / JSON readers-writers (ref: src/parameters.cpp,
                       problem::writeJSON)
    tol_tpu.models     aircraft dynamics + wind models (ref: problem::
                       dynamicConstraints, problem::modelWind)
    tol_tpu.problems   mission NLP specs G7/S10 (ref: src/problemG7.cpp,
                       src/problemS10.cpp)
    tol_tpu.solver     batched interior-point NLP solver (replaces SNOPT)
    tol_tpu.ops        batched small-matrix linear algebra + Pallas kernels
    tol_tpu.parallel   jax.sharding meshes, scenario DP, collectives
    tol_tpu.mission    receding-horizon mission layer (ref: msl/)
"""

from tol_tpu.version import __version__

__all__ = ["__version__"]

from tol_tpu.models.dynamics import state_derivatives
from tol_tpu.models.wind import WindConfig, WindGrid, wind_ned, wind_with_gradient_ned

__all__ = [
    "state_derivatives",
    "WindConfig",
    "WindGrid",
    "wind_ned",
    "wind_with_gradient_ned",
]

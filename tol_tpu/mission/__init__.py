from tol_tpu.mission.trajectory import Trajectory
from tol_tpu.mission.autopilot import Autopilot, FakeAutopilot
from tol_tpu.mission.mission import Mission, MissionConfig

__all__ = ["Trajectory", "Autopilot", "FakeAutopilot", "Mission", "MissionConfig"]

from .controller import Controller
from .fake_env import FakeDrivingEnv, ReplayEnv
from .interact_agent import InteractAgent
from .leaderboard_agent import DiffusionAgent, get_entry_point
from .pid import PIDController
from .plan import DiffusionPlanner, process_next_waypoint, way_point_to_pixel
from .planner import RoutePlanner
from .statistics import aggregate, cal_std

__all__ = [
    "PIDController",
    "Controller",
    "RoutePlanner",
    "DiffusionPlanner",
    "process_next_waypoint",
    "way_point_to_pixel",
    "InteractAgent",
    "DiffusionAgent",
    "get_entry_point",
    "FakeDrivingEnv",
    "ReplayEnv",
    "aggregate",
    "cal_std",
]

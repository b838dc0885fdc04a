"""Simulator-side glue (host-only; the CARLA server stays an external process).

Per the rebuild contract (BASELINE.json north star), the simulator remains
host-side behind the agent APIs. This package provides the first-party pieces:
server lifecycle, the expert-driven dataset collector, and the crash-restart
supervisor. The vendored carla-roach gym environment itself (reference
carla_gym/, ~7.5k LoC of CARLA RPC glue) is intentionally not re-shipped here;
any env exposing the RlCameraWrapper observation dict plugs into the agents
and collector (see driving.fake_env for the contract).
"""

from .birdview import BirdviewRenderer
from .map_raster import LaneStrip, rasterize_map, save_h5, strips_from_carla_map
from .collector import DataCollector, count_current_saved, world_to_agent
from .collect_loop import collect_loop, collect_sharded, merge_shards
from .create_agent import ENV_FACTORIES, create_env, create_server, register_env_factory
from .criteria import (
    Blocked,
    CollisionTracker,
    EncounterLight,
    OutsideRouteLaneTracker,
    RouteDeviation,
    RunRedLight,
    RunStopSign,
)
from .expert import ExpertPID, LocalPlanner, RoadOption, expert_control
from .noiser import ExpertNoiser
from .obs_handler import OBS_MODULES, ObsHandler, register_obs_module
from .obs import (
    ActorState,
    control_obs,
    object_finder_obs,
    process_obs,
    speed_obs,
    velocity_obs,
)
from .reward import (
    ValeoActionReward,
    desired_speed_from_hazards,
    lbc_hazard_vehicle,
    lbc_hazard_walker,
)
from .route_planner import (
    GlobalRoutePlanner,
    RouteTracker,
    downsample_route,
    location_route_to_gps,
    location_to_gps,
)
from .scenario_actors import (
    BasicAgent,
    ConstantSpeedAgent,
    ScenarioActorHandler,
    ScenarioVehicle,
)
from .server_utils import CarlaServerManager, kill_carla
from .suites import (
    SUITES,
    TransformSpec,
    build_corl2017_tasks,
    build_endless_tasks,
    build_leaderboard_tasks,
    build_nocrash_tasks,
    build_suite_tasks,
    parse_suite_routes,
)
from .terminal import (
    LeaderboardDaggerTerminal,
    LeaderboardTerminal,
    ValeoStuckTerminal,
    ValeoTerminal,
)
from .traffic_lights import (
    LaneObservation,
    StopSignRegistry,
    TrafficLightRegistry,
    lane_observation,
)
from .weather import DynamicWeather, Storm, Sun

__all__ = [
    "DataCollector",
    "count_current_saved",
    "world_to_agent",
    "collect_loop",
    "collect_sharded",
    "merge_shards",
    "CarlaServerManager",
    "kill_carla",
    "create_server",
    "create_env",
    "register_env_factory",
    "ENV_FACTORIES",
    "Blocked",
    "CollisionTracker",
    "EncounterLight",
    "OutsideRouteLaneTracker",
    "RouteDeviation",
    "RunRedLight",
    "RunStopSign",
    "ValeoActionReward",
    "desired_speed_from_hazards",
    "lbc_hazard_vehicle",
    "lbc_hazard_walker",
    "ValeoTerminal",
    "ValeoStuckTerminal",
    "LeaderboardTerminal",
    "LeaderboardDaggerTerminal",
    "ExpertNoiser",
    "ObsHandler",
    "OBS_MODULES",
    "register_obs_module",
    "DynamicWeather",
    "Sun",
    "Storm",
    "ExpertPID",
    "LocalPlanner",
    "RoadOption",
    "expert_control",
    "ActorState",
    "speed_obs",
    "control_obs",
    "velocity_obs",
    "object_finder_obs",
    "process_obs",
    "ScenarioActorHandler",
    "ScenarioVehicle",
    "ConstantSpeedAgent",
    "BasicAgent",
    "SUITES",
    "TransformSpec",
    "build_endless_tasks",
    "build_nocrash_tasks",
    "build_corl2017_tasks",
    "build_leaderboard_tasks",
    "build_suite_tasks",
    "parse_suite_routes",
    "GlobalRoutePlanner",
    "RouteTracker",
    "downsample_route",
    "location_route_to_gps",
    "location_to_gps",
    "TrafficLightRegistry",
    "StopSignRegistry",
    "LaneObservation",
    "lane_observation",
    "BirdviewRenderer",
    "LaneStrip",
    "rasterize_map",
    "save_h5",
    "strips_from_carla_map",
]

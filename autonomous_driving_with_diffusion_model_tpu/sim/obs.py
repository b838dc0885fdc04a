"""Observation computation, simulator-independent.

Pure-function versions of the obs managers the pipeline consumes (reference:
carla_gym/core/obs_manager/actor_state/{speed,control,velocity}.py,
object_finder/{vehicle,pedestrian}.py) plus the RlCameraWrapper state-vector
assembly (env_agents/rl_camera/utils/rl_camera_wrapper.py:213-265). An env
adapter supplies raw actor states; these produce the exact dict layouts the
agents, collector, and hazard predicates expect.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "ActorState",
    "speed_obs",
    "control_obs",
    "velocity_obs",
    "object_finder_obs",
    "process_obs",
]


@dataclass
class ActorState:
    """World-frame state of a surrounding actor."""

    actor_id: int
    location: Tuple[float, float, float]
    rotation: Tuple[float, float, float]  # roll, pitch, yaw (deg)
    velocity: Tuple[float, float, float]
    extent: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    road_id: int = 0
    lane_id: int = 0
    on_sidewalk: bool = False


def speed_obs(velocity_xyz, forward_vec, yaw_deg: float) -> Dict[str, np.ndarray]:
    """reference: actor_state/speed.py:33-51."""
    v = np.asarray(velocity_xyz, np.float64)
    f = np.asarray(forward_vec, np.float64)
    return {
        "speed": np.array([np.linalg.norm(v)], np.float32),
        "speed_xy": np.array([np.linalg.norm(v[:2])], np.float32),
        "forward_speed": np.array([float(np.dot(v, f))], np.float32),
        "yaw": np.array([yaw_deg], np.float32),
    }


def control_obs(throttle, steer, brake, gear, speed_limit=0.0) -> Dict[str, np.ndarray]:
    """reference: actor_state/control.py."""
    return {
        "throttle": np.array([throttle], np.float32),
        "steer": np.array([steer], np.float32),
        "brake": np.array([brake], np.float32),
        "gear": np.array([gear], np.float32),
        "speed_limit": np.array([speed_limit], np.float32),
    }


def _rotate_to_ego(vec_xy, ego_yaw_deg: float) -> np.ndarray:
    yaw = np.deg2rad(ego_yaw_deg)
    c, s = np.cos(-yaw), np.sin(-yaw)
    v = np.asarray(vec_xy, np.float64)
    return np.array([c * v[0] - s * v[1], s * v[0] + c * v[1]])


def velocity_obs(vel_xyz, acc_xyz, ang_vel_z, ego_yaw_deg: float) -> Dict[str, np.ndarray]:
    """Ego-frame velocity/acceleration (reference: actor_state/velocity.py)."""
    return {
        "vel_xy": _rotate_to_ego(np.asarray(vel_xyz)[:2], ego_yaw_deg).astype(np.float32),
        "acc_xy": _rotate_to_ego(np.asarray(acc_xyz)[:2], ego_yaw_deg).astype(np.float32),
        "vel_ang_z": np.array([ang_vel_z], np.float32),
    }


def object_finder_obs(
    ego_location,
    ego_yaw_deg: float,
    actors: Sequence[ActorState],
    distance_threshold: float = 15.0,
    max_detection_number: int = 10,
    frame: int = 0,
) -> Dict[str, np.ndarray]:
    """Nearby-actor observation in the ego frame (reference:
    object_finder/vehicle.py:76-128): filter by distance, sort by distance,
    transform loc/rot/vel into the ego frame, pad with a binary mask. The
    layout feeds ``sim.reward.lbc_hazard_*`` directly."""
    ego_loc = np.asarray(ego_location, np.float64)

    def dist(a: ActorState) -> float:
        return float(np.linalg.norm(np.asarray(a.location) - ego_loc))

    nearby = sorted((a for a in actors if dist(a) <= distance_threshold), key=dist)
    nearby = nearby[:max_detection_number]

    location, rotation, velocity = [], [], []
    binary_mask, extent, road_id, lane_id, on_sidewalk = [], [], [], [], []
    for a in nearby:
        delta = np.asarray(a.location, np.float64) - ego_loc
        loc_ev = _rotate_to_ego(delta[:2], ego_yaw_deg)
        location.append([loc_ev[0], loc_ev[1], delta[2]])
        roll, pitch, yaw = a.rotation
        rotation.append([roll, pitch, ((yaw - ego_yaw_deg + 180.0) % 360.0) - 180.0])
        vel_ev = _rotate_to_ego(np.asarray(a.velocity)[:2], ego_yaw_deg)
        velocity.append([vel_ev[0], vel_ev[1], a.velocity[2]])
        binary_mask.append(1)
        extent.append(list(a.extent))
        road_id.append(a.road_id)
        lane_id.append(a.lane_id)
        on_sidewalk.append(int(a.on_sidewalk))
    for _ in range(max_detection_number - len(binary_mask)):
        binary_mask.append(0)
        location.append([0, 0, 0])
        rotation.append([0, 0, 0])
        velocity.append([0, 0, 0])
        extent.append([0, 0, 0])
        road_id.append(0)
        lane_id.append(0)
        on_sidewalk.append(0)

    return {
        "frame": frame,
        "binary_mask": np.array(binary_mask, np.int8),
        "location": np.array(location, np.float32),
        "rotation": np.array(rotation, np.float32),
        "extent": np.array(extent, np.float32),
        "absolute_velocity": np.array(velocity, np.float32),
        "road_id": np.array(road_id, np.int16),
        "lane_id": np.array(lane_id, np.int8),
        "on_sidewalk": np.array(on_sidewalk, np.int8),
    }


def process_obs(obs: Dict, input_states: Sequence[str], train: bool = True) -> Dict:
    """Canonical agent observation dict (reference:
    rl_camera_wrapper.py:213-265): the state vector is concatenated in the
    fixed key order yaw, speed_norm, speed, speed_limit, control(4), acc_xy,
    vel_xy, vel_ang_z — gated by ``input_states``."""
    state_list = []
    if "yaw" in input_states:
        state_list.append(obs["speed"]["yaw"])
    if "speed_norm" in input_states:
        state_list.append(obs["speed"]["speed"])
    if "speed" in input_states:
        state_list.append(obs["speed"]["speed_xy"])
    if "speed_limit" in input_states:
        state_list.append(obs["control"]["speed_limit"])
    if "control" in input_states:
        state_list.append(obs["control"]["throttle"])
        state_list.append(obs["control"]["steer"])
        state_list.append(obs["control"]["brake"])
        state_list.append(obs["control"]["gear"] / 5.0)
    if "acc_xy" in input_states:
        state_list.append(obs["velocity"]["acc_xy"])
    if "vel_xy" in input_states:
        state_list.append(obs["velocity"]["vel_xy"])
    if "vel_ang_z" in input_states:
        state_list.append(obs["velocity"]["vel_ang_z"])
    state = np.concatenate(state_list)

    camera = obs["camera"]["data"]
    target_waypoint = obs["target_waypoint"]
    next_waypoint = obs["next_waypoint"]
    next_command = obs["next_command"]
    if not train:
        camera = np.expand_dims(camera, 0)
        state = np.expand_dims(state, 0)
        target_waypoint = np.expand_dims(target_waypoint, 0)
        next_waypoint = np.expand_dims(next_waypoint, 0)
        next_command = np.expand_dims(next_command, 0)

    return {
        "state": state.astype(np.float32),
        "camera": camera,
        "bev": obs["camera"]["bev_data"],
        "at_red_light": obs["traffic_light"]["at_red_light"],
        "compass": obs["camera"]["compass"],
        "target_waypoint": target_waypoint,
        "cur_waypoint": obs["cur_waypoint"],
        "next_waypoint": next_waypoint,
        "next_command": next_command,
    }

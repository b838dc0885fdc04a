"""Scripted scenario actors (adversarial vehicles on fixed routes).

First-party equivalent of the reference's scenario-actor stack (reference:
carla_gym/core/task_actor/scenario_actor/scenario_actor_handler.py:1-58 +
agents/basic_agent.py:1-112 + agents/constant_speed_agent.py:1-41): vehicles
spawned from a task's ``scenario_actors`` route/actor configs, each driven by
a scripted agent every tick — ``ConstantSpeedAgent`` follows its route at a
fixed speed and brakes at the destination; ``BasicAgent`` additionally yields
to vehicle/walker hazards (the same LBC cones as the reward stack) and red
lights.

Route following reuses the framework's tested pieces: ``sim.route_planner``
traces the actor's fixed route; ``sim.expert.LocalPlanner`` is the
window-PID controller; ``sim.reward`` provides the hazard cones.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import numpy as np

from .expert import LocalPlanner
from .obs import ActorState, object_finder_obs
from .reward import lbc_hazard_vehicle, lbc_hazard_walker

log = logging.getLogger(__name__)

__all__ = ["ScenarioVehicle", "ConstantSpeedAgent", "BasicAgent", "ScenarioActorHandler"]


class ScenarioVehicle:
    """A spawned scenario vehicle + its fixed traced route
    (the navigation half of the reference's TaskVehicle for scenario actors)."""

    def __init__(self, vehicle, route_xy, dest_xy):
        self.vehicle = vehicle
        self.route_xy = list(route_xy)  # [((x, y), command)]
        self.dest_xy = np.asarray(dest_xy, np.float64)

    def tick(self):
        """Pop passed waypoints (keep a short tail for the PID window)."""
        loc = self.vehicle.get_location()
        pos = np.array([loc.x, loc.y])
        while (
            len(self.route_xy) > 2
            and np.linalg.norm(np.asarray(self.route_xy[0][0]) - pos) < 5.0
        ):
            self.route_xy.pop(0)

    def apply_control(self, action):
        import carla

        throttle, steer, brake = (float(v) for v in action)
        self.vehicle.apply_control(
            carla.VehicleControl(
                throttle=max(0.0, min(1.0, throttle)),
                steer=max(-1.0, min(1.0, steer)),
                brake=max(0.0, min(1.0, brake)),
            )
        )

    def clean(self):
        try:
            self.vehicle.destroy()
        except RuntimeError:
            pass


class ConstantSpeedAgent:
    """Route follower at a fixed target speed; full brake within
    ``success_dist`` of the destination (constant_speed_agent.py:5-41)."""

    def __init__(self, scenario_vehicle: ScenarioVehicle, target_speed: float = 0.0,
                 success_dist: float = 5.0, **_):
        self.sv = scenario_vehicle
        self._success_dist = success_dist
        self._planner = LocalPlanner(target_speed=target_speed)

    def _drive(self) -> np.ndarray:
        tf = self.sv.vehicle.get_transform()
        vel = self.sv.vehicle.get_velocity()
        fwd = tf.get_forward_vector()
        forward_speed = float(vel.x * fwd.x + vel.y * fwd.y + vel.z * fwd.z)
        throttle, steer, brake = self._planner.run_step(
            self.sv.route_xy, (tf.location.x, tf.location.y), tf.rotation.yaw,
            forward_speed,
        )
        return np.array([throttle, steer, brake], np.float64)

    def _at_destination(self) -> bool:
        loc = self.sv.vehicle.get_location()
        return (
            float(np.hypot(loc.x - self.sv.dest_xy[0], loc.y - self.sv.dest_xy[1]))
            < self._success_dist
        )

    def get_action(self) -> np.ndarray:
        if self._at_destination():
            return np.array([0.0, 0.0, 1.0])
        return self._drive()


class BasicAgent(ConstantSpeedAgent):
    """ConstantSpeed + hazard yielding (basic_agent.py:27-112): brakes for
    vehicles ahead (yaw diff <= 150, 45-degree cone), walkers on the road
    (distance-modulated cone), and an affecting red light."""

    def __init__(self, scenario_vehicle, world, tl_registry=None,
                 target_speed: float = 0.0, success_dist: float = 5.0,
                 proximity_threshold: float = 9.5, **_):
        super().__init__(scenario_vehicle, target_speed, success_dist)
        self._world = world
        self._tl_registry = tl_registry
        self._proximity = proximity_threshold

    def _surrounding(self, pattern: str) -> Sequence[ActorState]:
        me = self.sv.vehicle.id
        out = []
        for actor in self._world.get_actors().filter(pattern):
            if actor.id == me:
                continue
            loc = actor.get_location()
            rot = actor.get_transform().rotation
            vel = actor.get_velocity()
            out.append(
                ActorState(
                    actor_id=actor.id,
                    location=(loc.x, loc.y, loc.z),
                    rotation=(rot.roll, rot.pitch, rot.yaw),
                    velocity=(vel.x, vel.y, vel.z),
                )
            )
        return out

    def get_action(self) -> np.ndarray:
        tf = self.sv.vehicle.get_transform()
        loc3 = (tf.location.x, tf.location.y, tf.location.z)
        vehicles = object_finder_obs(loc3, tf.rotation.yaw, self._surrounding("vehicle.*"))
        walkers = object_finder_obs(
            loc3, tf.rotation.yaw, self._surrounding("walker.pedestrian.*")
        )
        hazard = (
            lbc_hazard_vehicle(vehicles, self._proximity) is not None
            or lbc_hazard_walker(walkers, self._proximity) is not None
            or (
                self._tl_registry is not None
                and self._tl_registry.at_red_light(tf)
            )
            or self._at_destination()
        )
        if hazard:
            return np.array([0.0, 0.0, 1.0])
        return self._drive()


AGENT_ENTRY_POINTS = {
    "constant_speed_agent:ConstantSpeedAgent": ConstantSpeedAgent,
    "basic_agent:BasicAgent": BasicAgent,
}


class ScenarioActorHandler:
    """Spawn + drive a task's scenario actors (scenario_actor_handler.py:6-58)."""

    def __init__(self, world, carla_map, route_planner=None, tl_registry=None,
                 rng: Optional[np.random.Generator] = None):
        self._world = world
        self._map = carla_map
        self._route_planner = route_planner
        self._tl_registry = tl_registry
        self.rng = rng or np.random.default_rng(0)
        self.actors: Dict[str, ScenarioVehicle] = {}
        self.agents: Dict[str, object] = {}

    def reset(self, scenario_routes: Dict, scenario_configs: Dict):
        """scenario_routes: {id: [TransformSpec, ...]} (first = spawn);
        scenario_configs: {id: {"model", "agent_entry_point", "agent_kwargs"}}."""
        import carla

        self.clean()
        for sa_id, config in scenario_configs.items():
            route = scenario_routes.get(sa_id, [])
            if not route:
                log.warning("scenario actor %s has no route; skipped", sa_id)
                continue
            lib = self._world.get_blueprint_library()
            bps = list(lib.filter(config.get("model", "vehicle.*"))) or [
                lib.find("vehicle.lincoln.mkz2017")
            ]
            bp = bps[int(self.rng.integers(len(bps)))]
            bp.set_attribute("role_name", sa_id)
            spawn = route[0].as_carla() if hasattr(route[0], "as_carla") else route[0]
            try:
                vehicle = self._world.spawn_actor(bp, spawn)
            except RuntimeError as exc:
                log.warning("scenario actor %s spawn failed: %s", sa_id, exc)
                continue

            # trace the actor's fixed route (straight-line without a planner)
            dest = route[-1]
            if self._route_planner is not None and len(route) > 1:
                route_xy = []
                cur = spawn.location
                for target in route[1:]:
                    loc = carla.Location(target.x, target.y, getattr(target, "z", 0.0))
                    try:
                        trace = self._route_planner.trace_route(cur, loc)
                    except ValueError:
                        continue
                    route_xy += [
                        ((wp.transform.location.x, wp.transform.location.y),
                         int(opt.value))
                        for wp, opt in trace
                    ]
                    cur = loc
            else:
                pts = np.linspace(
                    [spawn.location.x, spawn.location.y], [dest.x, dest.y], 100
                )
                route_xy = [((float(x), float(y)), 4) for x, y in pts]
            sv = ScenarioVehicle(vehicle, route_xy, (dest.x, dest.y))
            entry = config.get(
                "agent_entry_point", "constant_speed_agent:ConstantSpeedAgent"
            )
            agent_cls = AGENT_ENTRY_POINTS.get(entry)
            if agent_cls is None:
                log.warning("unknown scenario agent %s; using ConstantSpeed", entry)
                agent_cls = ConstantSpeedAgent
            kwargs = dict(config.get("agent_kwargs", {}))
            if agent_cls is BasicAgent:
                agent = agent_cls(sv, self._world, self._tl_registry, **kwargs)
            else:
                agent = agent_cls(sv, **kwargs)
            self.actors[sa_id] = sv
            self.agents[sa_id] = agent

    def tick(self):
        for sa_id, sv in self.actors.items():
            sv.apply_control(self.agents[sa_id].get_action())
            sv.tick()

    def clean(self):
        for sv in self.actors.values():
            sv.clean()
        self.actors = {}
        self.agents = {}

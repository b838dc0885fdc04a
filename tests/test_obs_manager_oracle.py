"""EXECUTED-reference oracles for the obs_manager family.

Each test runs the reference's real ObsManager classes
(carla_gym/core/obs_manager/...) over mock carla and reconciles our pure
functions in ``sim/obs.py`` field-by-field on randomized scenarios:

- actor_state speed/control/velocity (speed.py:33-51, control.py:30-40,
  velocity.py:29-44)
- object_finder vehicle/pedestrian (vehicle.py:76-128, pedestrian.py:77-139),
  including padding, ego exclusion, on_sidewalk, and the reference's
  oversize-when-crowded and int8-road_id quirks (pinned explicitly)
- navigation waypoint_plan (waypoint_plan.py:46-80) and actor_state route
  (route.py:35-89)
- navigation gnss target tracking (gnss.py:89-142) vs GnssPlanTracker over a
  scripted lane-change route
- object_finder stop_sign (stop_sign.py:20-34)

The ValeoAction reward oracle (tests/test_sim_logic.py) already executes the
object finders indirectly through the hazard predicates; these pin the full
obs dicts directly.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.sim.obs import (
    ActorState,
    GnssPlanTracker,
    control_obs,
    object_finder_obs,
    route_obs,
    speed_obs,
    stop_sign_obs,
    velocity_obs,
    waypoint_plan_obs,
)


@pytest.fixture
def ref(monkeypatch):
    if not os.path.isdir("/root/reference/carla_gym"):
        pytest.skip("reference not mounted")
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    monkeypatch.syspath_prepend("/root/reference")
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    return mock_carla


class _DuckVehicle:
    """Minimal carla-vehicle surface the actor_state managers read."""

    def __init__(self, mc, loc, yaw, vel, acc, ang_z, control, speed_limit):
        self._tf = mc.Transform(mc.Location(*loc), mc.Rotation(yaw=yaw))
        self._vel = SimpleNamespace(x=vel[0], y=vel[1], z=vel[2])
        self._acc = SimpleNamespace(x=acc[0], y=acc[1], z=acc[2])
        self._ang = SimpleNamespace(x=0.0, y=0.0, z=ang_z)
        self._control = control
        self._speed_limit = speed_limit
        self.id = 999
        self.bounding_box = mc.BoundingBox(extent=mc.Vector3D(2.45, 1.06, 0.75))

    def get_transform(self):
        return self._tf

    def get_location(self):
        return self._tf.location

    def get_velocity(self):
        return self._vel

    def get_acceleration(self):
        return self._acc

    def get_angular_velocity(self):
        return self._ang

    def get_control(self):
        return self._control

    def get_speed_limit(self):
        return self._speed_limit

    def get_world(self):
        return None  # only stored by attach_ego_vehicle, never read in-test


def test_actor_state_obs_parity(ref, rng):
    """speed/control/velocity managers vs our pure functions, 25 random ego
    states (flat ground: the mock transform is yaw-only, matching our
    yaw-only ego frame; the full 3D rotation matrix itself is reconciled in
    tests/test_traffic_lights.py::test_rotation_matrix_matches_reference)."""
    mc = ref
    from carla_gym.core.obs_manager.actor_state.control import (
        ObsManager as OmControl,
    )
    from carla_gym.core.obs_manager.actor_state.speed import ObsManager as OmSpeed
    from carla_gym.core.obs_manager.actor_state.velocity import (
        ObsManager as OmVelocity,
    )

    for trial in range(25):
        yaw = float(rng.uniform(-180, 180))
        vel = rng.uniform(-10, 10, 3)
        acc = rng.uniform(-5, 5, 3)
        ang_z = float(rng.uniform(-2, 2))
        ctrl = mc.VehicleControl(
            throttle=float(rng.uniform(0, 1)),
            steer=float(rng.uniform(-1, 1)),
            brake=float(rng.uniform(0, 1)),
        )
        ctrl.gear = int(rng.integers(0, 6))
        limit = float(rng.uniform(20, 90))
        veh = _DuckVehicle(mc, (0, 0, 0), yaw, vel, acc, ang_z, ctrl, limit)
        parent = SimpleNamespace(vehicle=veh)

        for om_cls in (OmSpeed, OmControl, OmVelocity):
            om = om_cls({})
            om.attach_ego_vehicle(parent)
            r = om.get_observation()
            if om_cls is OmSpeed:
                fwd = veh.get_transform().get_forward_vector()
                o = speed_obs(vel, (fwd.x, fwd.y, fwd.z), yaw)
            elif om_cls is OmControl:
                o = control_obs(
                    ctrl.throttle, ctrl.steer, ctrl.brake, ctrl.gear,
                    speed_limit=limit / 3.6 * 0.8,
                )
            else:
                o = velocity_obs(vel, acc, ang_z, yaw)
            assert set(r) == set(o), om_cls
            for k in r:
                assert np.allclose(r[k], o[k], atol=1e-5), (trial, om_cls, k)


def _spawn(mc, world, kind, x, y, yaw=0.0, speed=0.0):
    if kind == "vehicle":
        a = mc._Vehicle(world, mc.Transform(mc.Location(x, y), mc.Rotation(yaw=yaw)))
        a.speed = speed
    else:
        a = mc._Walker(world, mc.Transform(mc.Location(x, y)))
        if speed:
            a.apply_control(
                mc.WalkerControl(direction=mc.Vector3D(1.0, 0.0, 0.0), speed=speed)
            )
        a.transform.rotation.yaw = yaw
    world.actors.append(a)
    return a


def _actor_states(mc, world, ego, kind, carla_map):
    """ActorStates the way a full env adapter gathers them (extent from the
    bbox, road/lane from the map, on_sidewalk from the Driving-lane query)."""
    pattern = {"vehicle": "vehicle.*", "walker": "walker.pedestrian.*"}[kind]
    out = []
    for a in world.get_actors().filter(pattern):
        if a.id == ego.id:
            continue
        loc = a.get_location()
        rot = a.get_transform().rotation
        vel = a.get_velocity()
        wp = carla_map.get_waypoint(loc)
        side_wp = carla_map.get_waypoint(
            loc, project_to_road=False, lane_type=mc.LaneType.Driving
        )
        out.append(
            ActorState(
                actor_id=a.id,
                location=(loc.x, loc.y, loc.z),
                rotation=(rot.roll, rot.pitch, rot.yaw),
                velocity=(vel.x, vel.y, vel.z),
                extent=(
                    a.bounding_box.extent.x,
                    a.bounding_box.extent.y,
                    a.bounding_box.extent.z,
                ),
                road_id=wp.road_id,
                lane_id=wp.lane_id,
                on_sidewalk=side_wp is None,
            )
        )
    return out


def _compare_finder(r, o, *, keys):
    for k in keys:
        if k == "frame":
            assert int(r[k]) == int(o[k])
        elif k in ("binary_mask", "on_sidewalk", "road_id", "lane_id"):
            assert np.array_equal(
                np.asarray(r[k], np.int64), np.asarray(o[k], np.int64)
            ), k
        else:
            assert np.allclose(r[k], o[k], atol=1e-4), k


def test_object_finder_vehicle_parity(ref, rng):
    mc = ref
    from carla_gym.core.obs_manager.object_finder.vehicle import (
        ObsManager as OmVehicle,
    )

    for trial in range(10):
        world = mc._World()
        ego = _spawn(mc, world, "vehicle", 50.0, 0.0, yaw=float(rng.uniform(-180, 180)))
        n = int(rng.integers(2, 7))
        for _ in range(n):
            _spawn(
                mc, world, "vehicle",
                x=50.0 + float(rng.uniform(-25, 25)),
                y=float(rng.uniform(-8, 8)),
                yaw=float(rng.uniform(-180, 180)),
                speed=float(rng.uniform(0, 9)),
            )
        world.frame = int(rng.integers(1, 9999))

        om = OmVehicle({"max_detection_number": 10, "distance_threshold": 15})
        om.attach_ego_vehicle(SimpleNamespace(vehicle=ego))
        r = om.get_observation()

        tf = ego.get_transform()
        o = object_finder_obs(
            (tf.location.x, tf.location.y, tf.location.z),
            tf.rotation.yaw,
            _actor_states(mc, world, ego, "vehicle", world.get_map()),
            distance_threshold=15.0,
            max_detection_number=10,
            frame=world.frame,
        )
        _compare_finder(
            r, o,
            keys=("frame", "binary_mask", "location", "rotation", "extent",
                  "absolute_velocity", "road_id", "lane_id"),
        )


def test_object_finder_pedestrian_parity(ref, rng):
    """Walkers incl. the on_sidewalk flag (pedestrian.py:106-112: a walker
    with no Driving-lane waypoint under it counts as on the sidewalk)."""
    mc = ref
    from carla_gym.core.obs_manager.object_finder.pedestrian import (
        ObsManager as OmPedestrian,
    )

    class _SidewalkMap(mc._Map):
        # off-lane (|y| > 2) has no Driving lane when not projecting
        def get_waypoint(self, location, lane_type=None, project_to_road=True):
            if not project_to_road and abs(location.y) > 2.0:
                return None
            return super().get_waypoint(location, lane_type, project_to_road)

    for trial in range(10):
        world = mc._World()
        world._map = _SidewalkMap()
        ego = _spawn(mc, world, "vehicle", 50.0, 0.0, yaw=float(rng.uniform(-90, 90)))
        for _ in range(int(rng.integers(1, 6))):
            _spawn(
                mc, world, "walker",
                x=50.0 + float(rng.uniform(-20, 20)),
                y=float(rng.uniform(-5, 5)),  # some on the road, some off
                yaw=float(rng.uniform(-180, 180)),
                speed=float(rng.uniform(0, 3)),
            )
        om = OmPedestrian({"max_detection_number": 10, "distance_threshold": 15})
        om.attach_ego_vehicle(SimpleNamespace(vehicle=ego))
        r = om.get_observation()

        tf = ego.get_transform()
        o = object_finder_obs(
            (tf.location.x, tf.location.y, tf.location.z),
            tf.rotation.yaw,
            _actor_states(mc, world, ego, "walker", world.get_map()),
            distance_threshold=15.0,
            max_detection_number=10,
            frame=world.frame,
        )
        _compare_finder(
            r, o,
            keys=("binary_mask", "location", "rotation", "extent",
                  "absolute_velocity", "on_sidewalk", "road_id", "lane_id"),
        )


def test_object_finder_reference_quirks_pinned(ref):
    """Two reference quirks we intentionally do NOT reproduce (consumers gate
    every row read on binary_mask, so both are inert in the pipeline):

    1. Crowded scenes overflow: location/rotation/velocity come from
       get_loc_rot_vel_in_ev over ALL in-range actors while binary_mask stops
       at max_detection_number (vehicle.py:93-116) — the arrays exceed the
       manager's own declared obs space. Ours truncates to max.
    2. road_id is declared int16 in the space (vehicle.py:56-61) but cast to
       int8 in the output (vehicle.py:125), wrapping real towns' road ids
       >127. Ours keeps int16.
    """
    mc = ref
    from carla_gym.core.obs_manager.object_finder.vehicle import (
        ObsManager as OmVehicle,
    )

    world = mc._World()
    ego = _spawn(mc, world, "vehicle", 50.0, 0.0)
    for i in range(5):
        _spawn(mc, world, "vehicle", x=54.0 + 2.0 * i, y=1.0)

    om = OmVehicle({"max_detection_number": 3, "distance_threshold": 15})
    om.attach_ego_vehicle(SimpleNamespace(vehicle=ego))
    r = om.get_observation()
    # the reference's oversize quirk, executed
    assert r["location"].shape == (5, 3)
    assert r["binary_mask"].shape == (3,)

    tf = ego.get_transform()
    o = object_finder_obs(
        (tf.location.x, tf.location.y, tf.location.z),
        tf.rotation.yaw,
        _actor_states(mc, world, ego, "vehicle", world.get_map()),
        distance_threshold=15.0,
        max_detection_number=3,
    )
    assert o["location"].shape == (3, 3)
    # the unmasked prefix agrees
    assert np.allclose(r["location"][:3], o["location"], atol=1e-4)

    # int8 road_id, executed: road ids >127 break the reference — its
    # deployed numpy 1.x wrapped silently (300 -> 44), numpy 2 (here) raises
    big_map = SimpleNamespace(
        get_waypoint=lambda loc, lane_type=None, project_to_road=True: (
            SimpleNamespace(road_id=300, lane_id=-2)
        )
    )
    om._map = big_map
    with pytest.raises(OverflowError):
        om.get_observation()
    states = _actor_states(mc, world, ego, "vehicle", world.get_map())
    for s in states:
        s.road_id = 300
    o2 = object_finder_obs(
        (tf.location.x, tf.location.y, tf.location.z), tf.rotation.yaw, states,
        distance_threshold=15.0, max_detection_number=3,
    )
    assert o2["road_id"][0] == 300  # intended divergence: int16, no wrap


def _route_plan(mc, RoadOption, rng, n=12):
    opts = [RoadOption.LANEFOLLOW] * n
    opts[min(3, n - 1)] = RoadOption.LEFT
    opts[min(7, n - 1)] = RoadOption.CHANGELANELEFT
    plan = []
    x, y = 10.0, 0.0
    for i in range(n):
        x += float(rng.uniform(1.5, 3.0))
        y += float(rng.uniform(-0.5, 0.5))
        wp = SimpleNamespace(
            transform=mc.Transform(
                mc.Location(x, y), mc.Rotation(yaw=float(rng.uniform(-20, 20)))
            ),
            road_id=int(rng.integers(1, 90)),
            lane_id=int(rng.integers(-3, 4)),
            is_junction=bool(rng.integers(0, 2)),
        )
        plan.append((wp, opts[i]))
    return plan


def test_waypoint_plan_and_route_obs_parity(ref, rng):
    mc = ref
    from carla_gym.core.obs_manager.actor_state.route import ObsManager as OmRoute
    from carla_gym.core.obs_manager.navigation.waypoint_plan import (
        ObsManager as OmPlan,
    )
    from carla_gym.core.task_actor.common.navigation.map_utils import RoadOption

    for trial in range(10):
        plan = _route_plan(mc, RoadOption, rng, n=int(rng.integers(3, 14)))
        ego = _DuckVehicle(
            mc,
            (float(rng.uniform(0, 20)), float(rng.uniform(-3, 3)), 0.0),
            float(rng.uniform(-180, 180)),
            (0, 0, 0), (0, 0, 0), 0.0, mc.VehicleControl(), 30.0,
        )
        parent = SimpleNamespace(
            vehicle=ego, route_plan=plan,
            route_length=1000.0, route_completed=float(rng.uniform(0, 900)),
        )
        tf = ego.get_transform()
        loc_xy = (tf.location.x, tf.location.y)

        # OmPlan.__init__ declares command as Box(low=-1, dtype=uint8)
        # (waypoint_plan.py:28-31) — legal on the reference's gym, rejected
        # by gymnasium 1.2; bypass only the space declaration
        om = OmPlan.__new__(OmPlan)
        om._steps = 20
        om._parent_actor = None
        om.attach_ego_vehicle(parent)
        r = om.get_observation()
        o = waypoint_plan_obs(loc_xy, tf.rotation.yaw, plan, steps=20)
        for k in ("command", "road_id", "lane_id", "is_junction"):
            assert np.array_equal(
                np.asarray(r[k], np.int64), np.asarray(o[k], np.int64)
            ), (trial, k)
        assert np.allclose(r["location"], o["location"], atol=1e-4), trial

        om2 = OmRoute({})
        om2.attach_ego_vehicle(parent)
        r2 = om2.get_observation()
        o2 = route_obs(
            loc_xy, tf.rotation.yaw, plan,
            route_remaining_m=parent.route_length - parent.route_completed,
        )
        for k in ("lateral_dist", "angle_diff", "route_locs", "dist_remaining"):
            assert np.allclose(r2[k], o2[k], atol=1e-4), (trial, k)


def test_gnss_tracker_parity(ref):
    """The gnss target/command tracker (gnss.py:108-142) vs GnssPlanTracker:
    scripted drive along a plan with a lane-change pair — index advance
    (12 m + behind-ego gate), idx clamp, and the change-command deferral must
    agree tick by tick."""
    mc = ref
    import queue as _q

    from carla_gym.core.obs_manager.navigation.gnss import ObsManager as OmGnss
    from carla_gym.core.task_actor.common.navigation.map_utils import RoadOption
    from carla_gym.core.task_actor.common.navigation.route_manipulation import (
        location_to_gps,
    )

    # plan: every 10 m along +x, with a CHANGELANELEFT pair mid-route
    opts = [RoadOption.LANEFOLLOW] * 10
    opts[4] = RoadOption.CHANGELANELEFT
    opts[5] = RoadOption.CHANGELANELEFT
    plan_ref, plan_ours = [], []
    for i, opt in enumerate(opts):
        gps = location_to_gps(mc.Location(10.0 + 10.0 * i, 0.0))
        plan_ref.append((gps, opt))
        plan_ours.append((tuple(gps), int(opt.value)))

    world = mc._World()
    om = OmGnss({})
    om._world = world
    om._parent_actor = SimpleNamespace(global_plan_gps=plan_ref)
    om._idx = -1
    om._queue_timeout = 0.1
    ours = GnssPlanTracker(plan_ours)

    # ego drives +x at 2 m/tick, heading east (compass = pi/2 + yaw(0) = pi/2)
    compass = np.pi / 2.0
    for t in range(55):
        x = 2.0 * t
        gnss = np.array(location_to_gps(mc.Location(x, 0.0)), np.float32)
        imu = np.array([0, 0, 9.81, 0, 0, 0, compass], np.float32)
        om._gnss_queue = _q.Queue()
        om._imu_queue = _q.Queue()
        om._gnss_queue.put((world.frame, gnss))
        om._imu_queue.put((world.frame, imu))
        r = om.get_observation()
        o = ours.tick(gnss, imu)
        assert int(r["command"][0]) == int(o["command"][0]), t
        assert np.allclose(r["target_gps"], o["target_gps"], atol=1e-7), t
        assert om._idx == ours._idx, t
    assert om._idx == len(plan_ref) - 2  # clamped at the end of the plan


def test_stop_sign_obs_parity(ref):
    mc = ref
    from carla_gym.core.obs_manager.object_finder.stop_sign import (
        ObsManager as OmStop,
    )

    sign = mc.StopSign(x=30.0, extent=2.0)
    sign._transform = mc.Transform(mc.Location(30.0, 3.0), mc.Rotation(yaw=75.0))
    sign.trigger_volume = SimpleNamespace(
        location=mc.Location(1.0, -0.5, 0.0),
        extent=SimpleNamespace(x=2.0, y=2.0, z=1.0),
    )
    trans = sign.get_transform()
    center = trans.transform(sign.trigger_volume.location)

    om = OmStop({"distance_threshold": 4.0})
    for x in np.arange(20.0, 38.0, 1.3):
        for completed in (False, True):
            ego = _DuckVehicle(
                mc, (float(x), 2.0, 0.0), 0.0, (0, 0, 0), (0, 0, 0), 0.0,
                mc.VehicleControl(), 30.0,
            )
            om.attach_ego_vehicle(
                SimpleNamespace(
                    vehicle=ego,
                    criteria_stop=SimpleNamespace(
                        _target_stop_sign=sign, _stop_completed=completed
                    ),
                )
            )
            r = om.get_observation()
            o = stop_sign_obs(
                (float(x), 2.0), (center.x, center.y), completed,
                distance_threshold=4.0,
            )
            assert r["at_stop_sign"] == o["at_stop_sign"], (x, completed)
    # the sweep must have crossed the threshold both ways
    om.attach_ego_vehicle(
        SimpleNamespace(
            vehicle=_DuckVehicle(mc, (center.x, center.y, 0.0), 0.0, (0, 0, 0),
                                 (0, 0, 0), 0.0, mc.VehicleControl(), 30.0),
            criteria_stop=SimpleNamespace(
                _target_stop_sign=sign, _stop_completed=False
            ),
        )
    )
    assert om.get_observation()["at_stop_sign"] == 1

"""Sim-layer pure logic: criteria, reward, terminal, weather, expert —
oracle-tested against importable reference modules, invariants elsewhere."""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from autonomous_driving_with_diffusion_model_tpu.sim import (
    Blocked,
    CollisionTracker,
    DynamicWeather,
    EncounterLight,
    ExpertPID,
    LocalPlanner,
    OutsideRouteLaneTracker,
    RouteDeviation,
    RunRedLight,
    RunStopSign,
    Storm,
    ValeoActionReward,
    ValeoTerminal,
    desired_speed_from_hazards,
    lbc_hazard_vehicle,
    lbc_hazard_walker,
)
from autonomous_driving_with_diffusion_model_tpu.sim.criteria import (
    LightObservation,
    StopLine,
    segments_intersect,
)


class FakeLoc:
    def __init__(self, x, y, z=0.0):
        self.x, self.y, self.z = x, y, z

    def distance(self, other):
        return float(
            np.linalg.norm([self.x - other.x, self.y - other.y, self.z - other.z])
        )


def fake_vehicle(x=0.0, y=0.0, vx=0.0, vy=0.0):
    return SimpleNamespace(
        get_velocity=lambda: SimpleNamespace(x=vx, y=vy, z=0.0),
        get_location=lambda: FakeLoc(x, y),
    )


def test_blocked_parity_vs_reference():
    from carla_gym.core.task_actor.common.criteria.blocked import Blocked as RefBlocked

    ref = RefBlocked()
    ours = Blocked()
    # stationary for 100 s: both must fire after >90 s past the last valid state
    fired_ref = fired_ours = None
    for step, t in enumerate(np.arange(0.0, 120.0, 1.0)):
        ts = {"relative_simulation_time": float(t), "step": step}
        speed = 1.0 if t < 5 else 0.0  # moving first, then blocked
        r = ref.tick(fake_vehicle(vx=speed), ts)
        o = ours.tick(speed, float(t), step, ev_loc=(0.0, 0.0, 0.0))
        if r is not None and fired_ref is None:
            fired_ref = t
        if o is not None and fired_ours is None:
            fired_ours = t
    assert fired_ref is not None
    assert fired_ours == fired_ref


def test_route_deviation_parity_vs_reference():
    from carla_gym.core.task_actor.common.criteria.route_deviation import (
        RouteDeviation as RefRD,
    )

    ref, ours = RefRD(), RouteDeviation()
    route_length = 100.0
    for step in range(40):
        # drift away from the reference waypoint
        dist = step * 1.0
        vehicle = fake_vehicle(x=dist)
        wp = SimpleNamespace(transform=SimpleNamespace(location=FakeLoc(0.0, 0.0)))
        ts = {"relative_simulation_time": float(step), "step": step}
        r = ref.tick(vehicle, ts, wp, distance_traveled=1.0, route_length=route_length)
        o = ours.tick(
            (dist, 0.0, 0.0), (0.0, 0.0), 1.0, route_length, float(step), step
        )
        assert (r is None) == (o is None)
        if r is not None:
            assert r["off_route_max"] == o["off_route_max"]
            assert r["off_route_min"] == o["off_route_min"]


def test_hazard_predicates_parity_vs_reference(rng):
    from carla_gym.utils.hazard_actor import lbc_hazard_vehicle as ref_veh
    from carla_gym.utils.hazard_actor import lbc_hazard_walker as ref_walk

    for _ in range(20):
        n = 5
        obs = {
            "binary_mask": rng.integers(0, 2, n),
            "rotation": rng.uniform(-180, 180, (n, 3)),
            "location": rng.uniform(-12, 12, (n, 3)),
            "on_sidewalk": rng.integers(0, 2, n),
        }
        r = ref_veh(obs)
        o = lbc_hazard_vehicle(obs)
        assert (r is None) == (o is None)
        if r is not None:
            np.testing.assert_allclose(o, r)
        r2, o2 = ref_walk(obs), lbc_hazard_walker(obs)
        assert (r2 is None) == (o2 is None)


def test_expert_pid_parity_vs_reference(rng):
    from carla_gym.core.task_actor.scenario_actor.agents.utils.controller import (
        PIDController as RefPID,
    )

    ref = RefPID([0.5, 0.025, 0.1])
    ours = ExpertPID([0.5, 0.025, 0.1])
    for e in rng.standard_normal(60):
        assert ours.step(float(e)) == pytest.approx(ref.step(float(e)), rel=1e-12)


def test_collision_tracker_dedup():
    c = CollisionTracker()
    c.on_collision((0, 0, 0), 42, "vehicle.audi.tt", (10, 0, 0), frame=5, timestamp=1.0)
    info = c.tick((0, 0, 0), 1.0)
    assert info["collision_type"] == CollisionTracker.TYPE_VEHICLE
    # same actor id within 5 s: ignored
    c.on_collision((0.1, 0, 0), 42, "vehicle.audi.tt", (10, 0, 0), frame=6, timestamp=2.0)
    assert c.tick((0.1, 0, 0), 2.0) is None
    # micro-collision near a registered location: ignored even for a new id
    c.on_collision((1.0, 0, 0), 99, "walker.ped.1", (10, 0, 0), frame=7, timestamp=3.0)
    assert c.tick((1.0, 0, 0), 3.0) is None
    # far away + id memory expired (a tick clears the 5 s id memory before the
    # next sensor callback, as in the sim's callback-then-criteria ordering)
    assert c.tick((50, 0, 0), 8.5) is None
    c.on_collision((50, 0, 0), 42, "static.prop.wall", (10, 0, 0), frame=9, timestamp=9.0)
    info = c.tick((50, 0, 0), 9.0)
    assert info is not None and info["collision_type"] == CollisionTracker.TYPE_STATIC


def test_run_red_light_geometry():
    crit = RunRedLight()
    stop = StopLine(wp_forward=(1, 0), road_id=1, lane_id=2, left=(5, -2), right=(5, 2))
    light = LightObservation(id=7, is_red=True, trigger_loc=(5, 0), stop_lines=[stop])
    # tail segment crossing the stop line, same lane, same direction
    info = crit.tick(
        ev_loc=(5, 0), ev_dir=(1, 0), tail_close_pt=(4.5, 0), tail_far_pt=(5.5, 0),
        tail_road_id=1, tail_lane_id=2, lights=[light],
    )
    assert info is not None and info["id"] == 7
    # same light never fires twice
    assert crit.tick((5, 0), (1, 0), (4.5, 0), (5.5, 0), 1, 2, [light]) is None
    # green light never fires
    crit2 = RunRedLight()
    light_green = LightObservation(id=8, is_red=False, trigger_loc=(5, 0), stop_lines=[stop])
    assert crit2.tick((5, 0), (1, 0), (4.5, 0), (5.5, 0), 1, 2, [light_green]) is None
    # wrong direction (dot <= 0) never fires
    assert crit2.tick((5, 0), (-1, 0), (4.5, 0), (5.5, 0), 1, 2, [light]) is None


def test_segments_intersect():
    assert segments_intersect(((0, 0), (2, 0)), ((1, -1), (1, 1)))
    assert not segments_intersect(((0, 0), (2, 0)), ((3, -1), (3, 1)))
    assert segments_intersect(((0, 0), (2, 2)), ((0, 2), (2, 0)))


def test_run_stop_sign_state_machine():
    c = RunStopSign()
    # encounter
    info = c.tick((0, 0), 5.0, affecting_stop_id=3, inside_trigger=False,
                  still_affected=True, stop_loc=(10, 0))
    assert info["event"] == "encounter"
    # drive through the trigger without stopping, then leave -> "run"
    c.tick((5, 0), 5.0, 3, inside_trigger=True, still_affected=True)
    info = c.tick((20, 0), 5.0, None, inside_trigger=False, still_affected=False)
    assert info["event"] == "run"
    # next sign: stop properly inside -> no violation
    c.tick((0, 0), 5.0, 4, False, True)
    c.tick((5, 0), 0.05, 4, True, True)  # stopped inside trigger
    assert c.tick((20, 0), 5.0, None, False, False) is None


def test_outside_lane_tracker():
    t = OutsideRouteLaneTracker()
    # inside lane: nothing
    assert t.tick((0, 0), 0.0, 0.5, 3.5, 1, 1, 0.0, False, 1.0) is None
    # outside lane: fires with distance accounting
    info = t.tick((0, 0), 0.0, 4.0, 3.5, 1, 1, 0.0, False, 2.0)
    assert info["outside_lane"] and info["distance_traveled"] == 2.0


def test_desired_speed_and_reward():
    assert desired_speed_from_hazards() == 6.0
    # vehicle 9 m ahead: dist-8 = 1 -> 6 * 1/5 = 1.2
    assert desired_speed_from_hazards(hazard_vehicle_loc=(9.0, 0.0)) == pytest.approx(1.2)
    # red light 20 m: dist-5 = 15, clipped 5 -> full speed
    assert desired_speed_from_hazards(red_light_loc=(20.0, 0.0)) == pytest.approx(6.0)

    r = ValeoActionReward()
    reward, dbg = r.get(
        ev_speed=6.0, ev_loc=(0, 0), ev_yaw=0.0, steer=0.0,
        wp_loc=(0, 0), wp_yaw=0.0, desired_speed=6.0,
    )
    assert reward == pytest.approx(1.0)  # perfect: r_speed 1, others 0
    # steer jerk penalty on change > 0.01
    reward2, _ = r.get(6.0, (0, 0), 0.0, 0.5, (0, 0), 0.0, 6.0)
    assert reward2 == pytest.approx(0.9)
    # lateral offset of 2 m right of a north-pointing waypoint
    reward3, dbg3 = r.get(6.0, (0, 2.0), 0.0, 0.5, (0, 0), 0.0, 6.0)
    assert dbg3["r_position"] == pytest.approx(-1.0)


def test_valeo_terminal():
    t = ValeoTerminal()
    done, timeout, tr, dbg = t.get(
        sim_time=10.0, ev_loc=(0, 0), ev_speed=3.0, wp_loc=(0, 0), wp_yaw=0.0,
        next_waypoint_loc=(5, 0), info_blocked=None, info_run_red_light=None,
        info_collision=None, info_run_stop_sign=None,
    )
    assert not done and tr == 0.0
    done, _, tr, dbg = t.get(
        10.0, (0, 0), 3.0, (0, 0), 0.0, (5, 0),
        info_blocked=None, info_run_red_light={"id": 1}, info_collision=None,
        info_run_stop_sign=None,
    )
    assert done and tr == pytest.approx(-1.0 - 3.0)
    assert dbg["exploration_suggest"]["suggest"] == ("stop", "")
    # eval mode: timeout at 1200 s means done
    te = ValeoTerminal(eval_mode=True)
    done, timeout, tr, _ = te.get(
        1300.0, (0, 0), 0.0, (0, 0), 0.0, (5, 0), None, None, None, None
    )
    assert done and timeout


def test_dynamic_weather_evolution():
    w = DynamicWeather.from_config_name("dynamic_2.0", precipitation=0.0,
                                        rng=np.random.default_rng(0))
    assert w.speed_factor == 2.0
    p1 = w.tick(0.1)
    for _ in range(1000):
        p = w.tick(0.1)
    assert 0 <= p["cloudiness"] <= 90
    assert 0 <= p["precipitation"] <= 80
    assert -90 <= p["sun_altitude_angle"] <= 50
    assert p != p1  # actually evolving

    s = Storm(0.0)
    s.tick(1.0)
    # formulas from dynamic_weather.py:57-66
    assert s.rain == pytest.approx(max(0.0, min(-50.0 + 1.3, 80.0)))
    assert s.clouds == pytest.approx(max(0.0, min(-50.0 + 1.3 + 40.0, 90.0)))


def test_local_planner_drives_toward_waypoint():
    lp = LocalPlanner(target_speed=6.0)
    route = [((float(i * 2 + 2), 0.0), 4) for i in range(25)]
    throttle, steer, brake = lp.run_step(route, (0.0, 0.0), 0.0, 0.0)
    assert throttle > 0 and brake == 0.0
    assert abs(steer) < 0.05  # straight ahead
    # waypoint to the left (+y with yaw 0 => positive theta => steer > 0)
    lp2 = LocalPlanner(target_speed=6.0)
    throttle2, steer2, _ = lp2.run_step([((5.0, 5.0), 4)], (0.0, 0.0), 0.0, 6.0)
    assert steer2 > 0.1
    # strict mode (default) reproduces the reference's enum-vs-int quirk:
    # 0.75x target speed on EVERY command (PARITY.md reproduced-quirk #7),
    # so lanefollow and turn behave identically
    lp3 = LocalPlanner(target_speed=6.0)
    t_lane, _, _ = lp3.run_step([((5.0, 0.0), 4)], (0.0, 0.0), 0.0, 5.5)
    lp4 = LocalPlanner(target_speed=6.0)
    t_turn, _, _ = lp4.run_step([((5.0, 0.0), 1)], (0.0, 0.0), 0.0, 5.5)
    assert t_turn == t_lane
    # the intended turns-only slowdown is available as strict_reference=False:
    # at 5.5 m/s actual, lanefollow target 6.0 accelerates, turn 4.5 doesn't
    lp5 = LocalPlanner(target_speed=6.0, strict_reference=False)
    t_lane_i, _, _ = lp5.run_step([((5.0, 0.0), 4)], (0.0, 0.0), 0.0, 5.5)
    lp6 = LocalPlanner(target_speed=6.0, strict_reference=False)
    t_turn_i, _, _ = lp6.run_step([((5.0, 0.0), 1)], (0.0, 0.0), 0.0, 5.5)
    assert t_turn_i < t_lane_i


def test_collision_dedup_matches_reference(monkeypatch, rng):
    """CollisionTracker == the reference Collision criterion (imported
    read-only, driven through its real _on_collision/tick) over a randomized
    event/tick sequence — same-id memory, micro-collision area register/
    forget, intensity threshold, and type classification all agree
    (reference collision.py:6-134)."""
    import os
    import sys
    import weakref
    from types import SimpleNamespace

    if not os.path.isdir("/root/reference/carla_gym"):
        pytest.skip("reference not mounted")
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    monkeypatch.syspath_prepend("/root/reference")
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    from carla_gym.core.task_actor.common.criteria.collision import (
        Collision as RefCollision,
    )

    from autonomous_driving_with_diffusion_model_tpu.sim.criteria import (
        CollisionTracker,
    )

    world = mock_carla._World()
    vehicle = mock_carla._Vehicle(world, mock_carla.Transform())
    world.actors.append(vehicle)
    ref = RefCollision(vehicle, world)
    ours = CollisionTracker()

    def actor_ns(aid, type_id, x, y):
        tf = mock_carla.Transform(mock_carla.Location(x, y))
        return SimpleNamespace(
            id=aid,
            type_id=type_id,
            get_transform=lambda tf=tf: tf,
            get_velocity=lambda: SimpleNamespace(x=0.0, y=0.0, z=0.0),
        )

    types = [
        "vehicle.audi.a2", "walker.pedestrian.0001", "static.prop.container",
        "traffic.traffic_light", "static.sidewalk",
    ]
    t = 0.0
    events = 0
    for step in range(120):
        t += 0.1
        ex = float(step) * 0.8  # the ego advances
        vehicle.transform = mock_carla.Transform(mock_carla.Location(ex, 0.0))
        if rng.random() < 0.4:
            events += 1
            aid = int(rng.integers(0, 6))  # small id pool -> same-id repeats
            type_id = types[int(rng.integers(len(types)))]
            ox = ex + float(rng.uniform(-2, 2))
            imp = (float(rng.uniform(0, 50)), 0.0, 0.0)
            event = SimpleNamespace(
                frame=step,
                timestamp=t,
                actor=vehicle,
                other_actor=actor_ns(aid, type_id, ox, 1.0),
                normal_impulse=SimpleNamespace(x=imp[0], y=imp[1], z=imp[2]),
                transform=vehicle.get_transform(),
            )
            RefCollision._on_collision(weakref.ref(ref), event)
            ours.on_collision((ex, 0.0, 0.0), aid, type_id, imp, step, t)

        ref_info = ref.tick(vehicle, {
            "relative_simulation_time": t,
            "start_frame": 0,
            "start_simulation_time": 0.0,
        })
        our_info = ours.tick((ex, 0.0, 0.0), t)
        assert (ref_info is None) == (our_info is None), f"step {step}"
        if ref_info is not None:
            for key in ("step", "simulation_time", "collision_type",
                        "other_actor_id", "other_actor_type_id", "intensity"):
                assert our_info[key] == pytest.approx(ref_info[key]), (step, key)
    assert events > 20  # the sequence actually exercised the dedup rules


def test_outside_wrong_lane_matches_reference(monkeypatch):
    """OutsideRouteLaneTracker (+ lane_observation) == the reference
    OutsideRouteLane criterion driven over the SAME duck-typed map and a
    scripted trajectory covering: clean driving, off-road drift, an
    opposite-lane invasion (direction-flip toggle), the return toggle, a
    junction traversal, and a wrong-direction junction exit
    (reference outside_route_lane.py:6-119)."""
    import os
    import sys
    from types import SimpleNamespace

    if not os.path.isdir("/root/reference/carla_gym"):
        pytest.skip("reference not mounted")
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    monkeypatch.syspath_prepend("/root/reference")
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    from carla_gym.core.task_actor.common.criteria.outside_route_lane import (
        OutsideRouteLane as RefOutside,
    )

    from autonomous_driving_with_diffusion_model_tpu.sim.criteria import (
        OutsideRouteLaneTracker,
    )
    from autonomous_driving_with_diffusion_model_tpu.sim.traffic_lights import (
        lane_observation,
    )

    JUNCTION = (60.0, 70.0)

    class _WP:
        def __init__(self, x, y, yaw, lane_id):
            self.transform = mock_carla.Transform(
                mock_carla.Location(x, y), mock_carla.Rotation(yaw=yaw)
            )
            self.lane_width = 3.5
            self.lane_id = lane_id
            self.is_junction = JUNCTION[0] <= x < JUNCTION[1]
            self.is_intersection = self.is_junction
            self.road_id = 2 if self.is_junction else (1 if x < JUNCTION[0] else 3)

    class _ORMap:
        """Two opposite driving lanes (y=0 yaw 0 / y=-3.5 yaw 180) + a
        parking lane at y=8."""

        def get_waypoint(self, loc, lane_type=None, project_to_road=True):
            if lane_type == mock_carla.LaneType.Parking:
                return _WP(loc.x, 8.0, 0.0, -9)
            lane = min(((0.0, 0.0, -1), (-3.5, 180.0, 1)),
                       key=lambda l: abs(loc.y - l[0]))
            return _WP(loc.x, lane[0], lane[1], lane[2])

    fake_map = _ORMap()

    # (x, y, yaw): clean -> off-road drift -> opposite lane -> back ->
    # junction -> wrong-direction exit
    script = (
        [(3.0 * i, 0.0, 0.0) for i in range(8)]            # clean, x to 21
        + [(24.0 + 3 * i, 4.2, 0.0) for i in range(3)]     # off-road (dist > 3.05 to both)
        + [(33.0 + 3 * i, 0.0, 0.0) for i in range(2)]     # back in lane
        + [(39.0 + 3 * i, -3.5, 0.0) for i in range(3)]    # opposite lane: toggle wrong
        + [(48.0 + 3 * i, 0.0, 0.0) for i in range(3)]     # back: toggle off
        + [(62.0 + 2 * i, 0.0, 0.0) for i in range(4)]     # junction (wrong forced off)
        + [(71.0 + 3 * i, -3.5, 0.0) for i in range(3)]    # exit against traffic
        + [(80.0 + 3 * i, 0.0, 0.0) for i in range(2)]     # recover
    )

    start = mock_carla.Location(0.0, 0.0)
    ref = RefOutside(fake_map, start)
    ours = OutsideRouteLaneTracker()

    flags = []
    for step, (x, y, yaw) in enumerate(script):
        loc = mock_carla.Location(x, y)
        vehicle = SimpleNamespace(
            get_location=lambda loc=loc: loc,
            get_transform=lambda loc=loc, yaw=yaw: mock_carla.Transform(
                loc, mock_carla.Rotation(yaw=yaw)
            ),
        )
        ref_info = ref.tick(
            vehicle,
            {"step": step, "relative_simulation_time": 0.1 * step},
            distance_traveled=3.0,
        )
        obs = lane_observation(fake_map, loc)
        our_info = ours.tick(
            (x, y, 0.0), yaw,
            lane_distance=obs.distance,
            lane_width=obs.lane_width,
            road_id=obs.road_id,
            lane_id=obs.lane_id,
            wp_yaw=obs.wp_yaw,
            is_junction=obs.is_junction,
            distance_traveled=3.0,
            sim_time=0.1 * step,
            step=step,
        )
        assert (ref_info is None) == (our_info is None), f"step {step} ({x},{y})"
        if ref_info is not None:
            assert our_info["outside_lane"] == ref_info["outside_lane"], step
            assert our_info["wrong_lane"] == ref_info["wrong_lane"], step
            flags.append((step, ref_info["outside_lane"], ref_info["wrong_lane"]))

    # every scripted phase actually fired
    assert any(o for _s, o, _w in flags), "off-road phase never flagged"
    assert any(w for _s, _o, w in flags), "wrong-lane phase never flagged"

def test_valeo_reward_parity_vs_reference(monkeypatch, rng):
    """EXECUTE the reference's full ``ValeoAction.get`` (valeo_action.py:
    31-166) over mock carla on randomized scripted scenarios and reconcile
    our pure-function pipeline (lbc hazards -> desired_speed_from_hazards ->
    ValeoActionReward) to float tolerance: hazard standoffs (8/6/5/5 m),
    5 m linear ramps, min-composition, red/yellow light handling, stop-sign
    branch, r_position/r_rotation geometry, and the stateful steer-jerk
    penalty across steps."""
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    import carla_gym.utils.traffic_light as ref_tl
    import carla_gym.utils.transforms as trans_utils
    from carla_gym.core.task_actor.ego_vehicle.reward.valeo_action import (
        ValeoAction,
    )

    light_box = {}
    monkeypatch.setattr(
        ref_tl.TrafficLightHandler,
        "get_light_state",
        staticmethod(lambda vehicle, offset=0.0, dist_threshold=15.0: light_box["v"]),
    )

    def rand_obs(n=4):
        return {
            "binary_mask": rng.integers(0, 2, n),
            "rotation": rng.uniform(-180, 180, (n, 3)),
            "location": rng.uniform(-12, 12, (n, 3)),
            "on_sidewalk": rng.integers(0, 2, n),
        }

    for case in range(25):
        veh_obs, ped_obs = rand_obs(), rand_obs()
        state_pick = ["Red", "Yellow", "Green", None][case % 4]
        if state_pick is None:
            light_box["v"] = (None, None, None)
        else:
            light_box["v"] = (
                getattr(mock_carla.TrafficLightState, state_pick),
                np.asarray(rng.uniform(-10, 10, 3), np.float32),
                None,
            )
        # one deterministic stop-sign case exercises the 4th speed source
        stop_sign = None
        if case == 7:
            stop_sign = SimpleNamespace(
                get_transform=lambda: mock_carla.Transform(
                    mock_carla.Location(6.0, 1.0), mock_carla.Rotation(yaw=30.0)
                ),
                trigger_volume=SimpleNamespace(
                    location=mock_carla.Location(1.0, 0.5)
                ),
            )
        ev_xy = rng.uniform(-5, 5, 2)
        ev_yaw = float(rng.uniform(-180, 180))
        wp_xy = ev_xy + rng.uniform(-2, 2, 2)
        wp_yaw = float(rng.uniform(-180, 180))
        vel = rng.uniform(-7, 7, 2)
        steers = rng.uniform(-0.5, 0.5, 3)

        holder = {"steer": 0.0}
        ego = SimpleNamespace(
            vehicle=SimpleNamespace(
                get_transform=lambda: mock_carla.Transform(
                    mock_carla.Location(*ev_xy), mock_carla.Rotation(yaw=ev_yaw)
                ),
                get_control=lambda: mock_carla.VehicleControl(
                    steer=holder["steer"]
                ),
                get_velocity=lambda: SimpleNamespace(
                    x=float(vel[0]), y=float(vel[1]), z=0.0
                ),
            ),
            criteria_stop=SimpleNamespace(
                _target_stop_sign=stop_sign, _stop_completed=False
            ),
            get_route_transform=lambda: mock_carla.Transform(
                mock_carla.Location(*wp_xy), mock_carla.Rotation(yaw=wp_yaw)
            ),
        )
        ref = ValeoAction.__new__(ValeoAction)
        ref._ego_vehicle = ego
        ref.om_vehicle = SimpleNamespace(get_observation=lambda: veh_obs)
        ref.om_pedestrian = SimpleNamespace(get_observation=lambda: ped_obs)
        ref._maxium_speed = 6.0
        ref._last_steer = 0.0
        ref._tl_offset = -1.5

        ours = ValeoActionReward()
        terminal_reward = float(rng.uniform(-1, 1))
        for steer in steers:  # multi-step: the jerk penalty is stateful
            holder["steer"] = float(steer)
            ref_reward, _ = ref.get(terminal_reward)

            h_veh = lbc_hazard_vehicle(veh_obs)
            h_ped = lbc_hazard_walker(ped_obs)
            red_loc = None
            if light_box["v"][0] in ("Red", "Yellow"):
                red_loc = light_box["v"][1][:2]
            stop_loc = None
            if stop_sign is not None:
                # ego-frame stop location: shared input spec, computed with
                # the reference's own transform util (also mock-executed)
                loc_w = stop_sign.get_transform().transform(
                    stop_sign.trigger_volume.location
                )
                loc_ev = trans_utils.loc_global_to_ref(
                    loc_w, ego.vehicle.get_transform()
                )
                stop_loc = np.array([loc_ev.x, loc_ev.y])
            ds = desired_speed_from_hazards(
                hazard_vehicle_loc=h_veh,
                hazard_ped_loc=h_ped,
                red_light_loc=red_loc,
                stop_sign_loc=stop_loc,
            )
            our_reward, _ = ours.get(
                float(np.linalg.norm(vel)),
                ev_xy,
                ev_yaw,
                float(steer),
                wp_xy,
                wp_yaw,
                ds,
                terminal_reward,
            )
            assert our_reward == pytest.approx(ref_reward, rel=1e-6, abs=1e-6), (
                case,
                steer,
            )


def test_valeo_terminal_parity_vs_reference(monkeypatch, rng):
    """EXECUTE the reference's ``ValeoNoDetPx.get`` (terminal/
    valeo_no_det_px.py:21-140) over mock carla on randomized stateful
    episodes and reconcile our ``ValeoTerminal``: the done mask (blocked /
    red-light / collision / collision_px / eval timeout — lat-dist and
    run-stop commented out upstream), the -1 - speed terminal reward with
    the leave-target distance penalty, the lat-dist growth hysteresis, the
    leave-target waypoint tracker, and the RL exploration suggestions."""
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    from carla_gym.core.task_actor.ego_vehicle.terminal.valeo_no_det_px import (
        ValeoNoDetPx,
    )

    for episode in range(10):
        eval_mode = episode % 2 == 1
        ref = ValeoNoDetPx.__new__(ValeoNoDetPx)
        ref._exploration_suggest = True
        ref._last_lat_dist = 0.0
        ref._min_thresh_lat_dist = 3.5
        ref._eval_mode = eval_mode
        ref._eval_time = 1200
        ref.prev_next_waypoint = None
        ref.prev_distance = None
        ours = ValeoTerminal(exploration_suggest=True, eval_mode=eval_mode)

        ev_xy = rng.uniform(-5, 5, 2)
        nwp_xy = ev_xy + rng.uniform(-8, 8, 2)
        for step in range(12):
            # random walk; occasional big jumps exercise the hysteresis branch
            ev_xy = ev_xy + rng.uniform(-1, 1, 2) * (5.0 if step % 5 == 4 else 1.0)
            wp_xy = ev_xy + rng.uniform(-4, 4, 2)
            wp_yaw = float(rng.uniform(-180, 180))
            vel = rng.uniform(-6, 6, 2)
            # hold the next waypoint for a few steps (leave-target tracker's
            # same-waypoint branch), then move it (reset branch)
            if step % 4 == 3:
                nwp_xy = ev_xy + rng.uniform(-8, 8, 2)
            info = {
                "blocked": {"step": step} if rng.uniform() < 0.08 else None,
                "run_red_light": {"step": step} if rng.uniform() < 0.08 else None,
                "collision": {"step": step} if rng.uniform() < 0.08 else None,
                "run_stop_sign": (
                    {"event": "run" if rng.uniform() < 0.5 else "stop"}
                    if rng.uniform() < 0.15
                    else None
                ),
            }
            collision_px = bool(rng.uniform() < 0.06)
            # cross the eval timeout inside the episode
            sim_time = 1195.0 + step * 1.0 if eval_mode else 0.1 * step

            ref._ego_vehicle = SimpleNamespace(
                info_criteria=info,
                collision_px=collision_px,
                vehicle=SimpleNamespace(
                    get_location=lambda xy=ev_xy: mock_carla.Location(*xy),
                    get_velocity=lambda v=vel: SimpleNamespace(
                        x=float(v[0]), y=float(v[1]), z=0.0
                    ),
                ),
                get_route_transform=lambda xy=wp_xy, yaw=wp_yaw: mock_carla.Transform(
                    mock_carla.Location(*xy), mock_carla.Rotation(yaw=yaw)
                ),
                get_next_location=[
                    SimpleNamespace(
                        transform=SimpleNamespace(
                            location=mock_carla.Location(*nwp_xy)
                        )
                    )
                ],
            )
            ref_done, ref_timeout, ref_reward, ref_debug = ref.get(
                {"relative_simulation_time": sim_time}
            )
            our_done, our_timeout, our_reward, our_debug = ours.get(
                sim_time,
                (float(ev_xy[0]), float(ev_xy[1]), 0.0),
                float(np.linalg.norm(vel)),
                (float(wp_xy[0]), float(wp_xy[1])),
                wp_yaw,
                (float(nwp_xy[0]), float(nwp_xy[1])),
                info["blocked"],
                info["run_red_light"],
                info["collision"],
                info["run_stop_sign"],
                collision_px=collision_px,
            )
            key = (episode, step)
            assert our_done == ref_done, key
            assert our_timeout == ref_timeout, key
            assert our_reward == pytest.approx(ref_reward, rel=1e-5, abs=1e-5), key
            assert (
                our_debug["exploration_suggest"]
                == ref_debug["exploration_suggest"]
            ), key
            # lat-dist flag + value from the reference's debug text
            # ("latd:{int(c_lat_dist)}, {lat_dist:.2f}/{thresh:.2f}")
            latd_txt = ref_debug["debug_texts"][2]
            ref_lat_flag = bool(int(latd_txt.split("latd:")[1][0]))
            ref_lat_val = float(latd_txt.split(", ")[1].split("/")[0])
            assert our_debug["c_lat_dist"] == ref_lat_flag, key
            assert our_debug["lat_dist"] == pytest.approx(ref_lat_val, abs=6e-3), key


def test_weather_handler_parity_vs_reference(monkeypatch):
    """EXECUTE the reference's ``WeatherHandler`` + ``Sun``/``Storm``
    (dynamic_weather.py:28-124) over mock carla for 300 ticks at
    speed-factor 2.0 and reconcile our ``DynamicWeather``'s parameter dict
    each tick — covers the storm's +100 / -250 direction flips, the puddle
    delay asymmetry, the wind step function, and the sun phase wrap."""
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    import carla_gym.utils.dynamic_weather as ref_dw

    preset = mock_carla.WeatherParameters(
        sun_azimuth_angle=10.0, sun_altitude_angle=30.0, precipitation=20.0
    )
    monkeypatch.setattr(np.random, "choice", lambda seq: preset)
    monkeypatch.setattr(np.random, "uniform", lambda a, b: 1.234)

    captured = {}
    world = SimpleNamespace(set_weather=lambda w: captured.update(w=w))
    ref = ref_dw.WeatherHandler(world)
    ref.reset("dynamic_2.0")  # ticks 0.1 once internally

    fixed_rng = SimpleNamespace(uniform=lambda a, b: 1.234)
    ours = DynamicWeather.from_config_name(
        "dynamic_2.0", sun_azimuth=10.0, sun_altitude=30.0,
        precipitation=20.0, rng=fixed_rng,
    )
    params = ours.tick(0.1)  # mirror the reset tick

    def check(tick_i):
        w = captured["w"]
        for k, v in params.items():
            assert getattr(w, k) == pytest.approx(v, rel=1e-9, abs=1e-9), (tick_i, k)

    check(-1)
    directions = set()
    # storm _t moves 1.3 * 0.1 s * speed 2.0 = 0.26/tick: the +100 flip from
    # _t=20 needs ~308 ticks, the -250 flip ~1346 more — 1800 covers both
    for i in range(1800):
        ref.tick(0.1)
        params = ours.tick(0.1)
        check(i)
        directions.add(ours.storm._increasing)
    # both direction flips actually happened in-window
    assert directions == {True, False}


def test_valeo_stuck_terminal_parity_vs_reference(monkeypatch, rng):
    """EXECUTE the reference's ``Valeo.get`` (terminal/valeo.py:13-170 — the
    RL variant that replaces the 90 s Blocked with a 100-tick free-road
    stuck counter and puts lat-dist in the done mask) over mock carla on
    randomized stateful episodes, and reconcile our ``ValeoStuckTerminal``:
    the free-road gate (lbc hazards @9.5 m + non-green light), the 10-tick
    mean-speed stuck counter, done/timeout/terminal-reward, and the
    exploration suggestions (("go","")/("","turn")/("stop",""))."""
    from collections import deque

    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    import carla_gym.utils.traffic_light as ref_tl
    from carla_gym.core.task_actor.ego_vehicle.terminal.valeo import Valeo

    light_box = {}
    monkeypatch.setattr(
        ref_tl.TrafficLightHandler,
        "get_light_state",
        staticmethod(lambda vehicle, offset=0.0, dist_threshold=18.0: light_box["v"]),
    )
    from autonomous_driving_with_diffusion_model_tpu.sim.terminal import (
        ValeoStuckTerminal,
    )

    def rand_obs(n=4):
        return {
            "binary_mask": rng.integers(0, 2, n),
            "rotation": rng.uniform(-180, 180, (n, 3)),
            "location": rng.uniform(-12, 12, (n, 3)),
            "on_sidewalk": rng.integers(0, 2, n),
        }

    for episode in range(8):
        eval_mode = episode % 2 == 1
        obs_box = {}
        ref = Valeo.__new__(Valeo)
        ref._exploration_suggest = True
        ref.om_vehicle = SimpleNamespace(get_observation=lambda: obs_box["veh"])
        ref.om_pedestrian = SimpleNamespace(get_observation=lambda: obs_box["ped"])
        ref._vehicle_stuck_step = 6  # shrink 100 so the stuck done fires
        ref._vehicle_stuck_counter = 0
        ref._speed_queue = deque(maxlen=10)
        ref._tl_offset = -1.9
        ref._last_lat_dist = 0.0
        ref._min_thresh_lat_dist = 3.5
        ref._eval_mode = eval_mode
        ref._eval_time = 1200
        ours = ValeoStuckTerminal(
            exploration_suggest=True, eval_mode=eval_mode, stuck_steps=6
        )

        ev_xy = rng.uniform(-5, 5, 2)
        for step in range(16):
            # crawl (speeds mostly < 1 m/s) so the stuck counter advances,
            # with occasional bursts that reset it
            speed_scale = 0.4 if step % 7 else 3.0
            vel = rng.uniform(-1, 1, 2) * speed_scale
            ev_xy = ev_xy + rng.uniform(-0.3, 0.3, 2)
            wp_xy = ev_xy + rng.uniform(-4, 4, 2)
            wp_yaw = float(rng.uniform(-180, 180))
            obs_box["veh"], obs_box["ped"] = rand_obs(), rand_obs()
            state_pick = ["Red", "Green", None, "Yellow"][step % 4]
            if state_pick is None:
                light_box["v"] = (None, None, None)
            else:
                light_box["v"] = (
                    getattr(mock_carla.TrafficLightState, state_pick),
                    np.asarray(rng.uniform(-10, 10, 3), np.float32),
                    None,
                )
            info = {
                "blocked": {"step": step} if rng.uniform() < 0.05 else None,
                "run_red_light": {"step": step} if rng.uniform() < 0.05 else None,
                "collision": {"step": step} if rng.uniform() < 0.05 else None,
                "run_stop_sign": (
                    {"event": "run" if rng.uniform() < 0.5 else "stop"}
                    if rng.uniform() < 0.1
                    else None
                ),
            }
            sim_time = 1192.0 + step * 1.0 if eval_mode else 0.1 * step

            ref._ego_vehicle = SimpleNamespace(
                info_criteria=info,
                vehicle=SimpleNamespace(
                    get_location=lambda xy=ev_xy: mock_carla.Location(*xy),
                    get_velocity=lambda v=vel: SimpleNamespace(
                        x=float(v[0]), y=float(v[1]), z=0.0
                    ),
                ),
                get_route_transform=lambda xy=wp_xy, yaw=wp_yaw: mock_carla.Transform(
                    mock_carla.Location(*xy), mock_carla.Rotation(yaw=yaw)
                ),
            )
            ref_done, ref_timeout, ref_reward, ref_debug = ref.get(
                {"relative_simulation_time": sim_time}
            )

            # our input spec: free road from the same tested hazard cones
            h_veh = lbc_hazard_vehicle(obs_box["veh"], proximity_threshold=9.5)
            h_ped = lbc_hazard_walker(obs_box["ped"], proximity_threshold=9.5)
            is_free_road = (
                h_veh is None
                and h_ped is None
                and (state_pick is None or state_pick == "Green")
            )
            our_done, our_timeout, our_reward, our_debug = ours.get(
                sim_time,
                (float(ev_xy[0]), float(ev_xy[1]), 0.0),
                float(np.linalg.norm(vel)),
                (float(wp_xy[0]), float(wp_xy[1])),
                wp_yaw,
                is_free_road,
                info["blocked"],
                info["run_red_light"],
                info["collision"],
                info["run_stop_sign"],
            )
            key = (episode, step)
            assert our_done == ref_done, key
            assert our_timeout == ref_timeout, key
            assert our_reward == pytest.approx(ref_reward, rel=1e-5, abs=1e-5), key
            assert (
                our_debug["exploration_suggest"]
                == ref_debug["exploration_suggest"]
            ), key
            # stuck counter + free-road flag from the reference debug text
            # ("{counter:3}/{step} fre:X stu:Y blo:Z")
            t0 = ref_debug["debug_texts"][0]
            assert our_debug["stuck_counter"] == int(t0.split("/")[0]), key
            assert int(t0.split("fre:")[1][0]) == int(is_free_road), key
            latd_txt = ref_debug["debug_texts"][3]
            assert our_debug["c_lat_dist"] == bool(int(latd_txt.split("latd:")[1][0])), key


def test_leaderboard_terminals_parity_vs_reference(monkeypatch, rng):
    """EXECUTE the reference's ``Leaderboard`` and ``LeaderboardDagger``
    terminals (terminal/leaderboard.py:1-36, leaderboard_dagger.py:1-67)
    over mock info_criteria on randomized cases and reconcile ours,
    including the per-infraction gating flags and max-time handling."""
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    from carla_gym.core.task_actor.ego_vehicle.terminal.leaderboard import (
        Leaderboard,
    )
    from carla_gym.core.task_actor.ego_vehicle.terminal.leaderboard_dagger import (
        LeaderboardDagger,
    )
    from autonomous_driving_with_diffusion_model_tpu.sim.terminal import (
        LeaderboardDaggerTerminal,
        LeaderboardTerminal,
    )

    for case in range(60):
        info = {
            "route_completion": {
                "is_route_completed": bool(rng.uniform() < 0.2)
            },
            "blocked": {"s": case} if rng.uniform() < 0.2 else None,
            "route_deviation": {"s": case} if rng.uniform() < 0.2 else None,
            "collision": {"s": case} if rng.uniform() < 0.2 else None,
            "run_red_light": {"s": case} if rng.uniform() < 0.2 else None,
            "run_stop_sign": (
                {"event": "run" if rng.uniform() < 0.5 else "stop"}
                if rng.uniform() < 0.3
                else None
            ),
        }
        ego = SimpleNamespace(info_criteria=info)
        max_time = [None, 100.0][case % 2]
        sim_time = float(rng.uniform(0, 200))
        ts = {"relative_simulation_time": sim_time}

        ref_lb = Leaderboard(ego, max_time=max_time)
        our_lb = LeaderboardTerminal(max_time=max_time)
        r = ref_lb.get(ts)
        o = our_lb.get(
            sim_time,
            info["route_completion"]["is_route_completed"],
            info["blocked"],
            info["route_deviation"],
        )
        assert o[:3] == r[:3], case
        assert o[3]["blocked"] == r[3]["blocked"], case
        assert o[3]["route_deviation"] == r[3]["route_deviation"], case

        gates = dict(
            no_collision=bool(rng.uniform() < 0.7),
            no_run_rl=bool(rng.uniform() < 0.7),
            no_run_stop=bool(rng.uniform() < 0.7),
        )
        ref_dg = LeaderboardDagger(ego, max_time=150.0, **gates)
        our_dg = LeaderboardDaggerTerminal(max_time=150.0, **gates)
        r = ref_dg.get(ts)
        o = our_dg.get(
            sim_time,
            info["blocked"],
            info["route_deviation"],
            info["collision"],
            info["run_red_light"],
            info["run_stop_sign"],
        )
        assert o[:3] == r[:3], case
        for k in ("traffic_rule_violated", "blocked", "route_deviation"):
            assert o[3][k] == r[3][k], (case, k)


def test_encounter_light_parity_vs_reference(monkeypatch, rng):
    """EXECUTE the reference's ``EncounterLight.tick`` (criteria/
    encounter_light.py:4-26) with a scripted light-state sequence and
    reconcile our dedup-by-last-id semantics and info records stepwise."""
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    import carla_gym.utils.traffic_light as ref_tl
    from carla_gym.core.task_actor.common.criteria.encounter_light import (
        EncounterLight as RefEncounterLight,
    )

    light_box = {}
    monkeypatch.setattr(
        ref_tl.TrafficLightHandler,
        "get_light_state",
        staticmethod(lambda vehicle, offset=0.0, dist_threshold=7.5: light_box["v"]),
    )

    ref = RefEncounterLight()
    ours = EncounterLight()
    # same light twice, a gap, a new light, back to the first: dedup fires
    # on every CHANGE of affecting light id, not just the first encounter
    script = [7, 7, None, 7, 9, 9, None, None, 9, 7]
    for step, lid in enumerate(script):
        if lid is None:
            light_box["v"] = (None, None, None)
        else:
            light_box["v"] = (
                mock_carla.TrafficLightState.Red,
                np.asarray(rng.uniform(-10, 10, 3), np.float32),
                lid,
            )
        ts = {"relative_simulation_time": 0.1 * step, "step": step}
        r = ref.tick(SimpleNamespace(), ts)
        o = ours.tick(
            lid,
            light_box["v"][1],
            sim_time=0.1 * step,
            step=step,
        )
        assert (r is None) == (o is None), (step, lid)
        if r is not None:
            assert o["id"] == r["id"] and o["step"] == r["step"], step
            np.testing.assert_allclose(o["tl_loc"], r["tl_loc"])


def test_local_planner_parity_vs_reference(monkeypatch, rng):
    """EXECUTE the reference expert's ``LocalPlanner.run_step``
    (scenario_actor/agents/utils/local_planner.py:23-82 — the controller
    that produced the training dataset) over mock carla on randomized
    stateful episodes and reconcile throttle/steer stepwise: the
    command-aware 7.5/5.0 m waypoint-passing thresholds, the sticky
    ``_last_command``, ego-frame arctan2 steering through the reference's
    own transform util, the 0.75x turn speed, and both stateful PIDs."""
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    from carla_gym.core.task_actor.scenario_actor.agents.utils.local_planner import (
        LocalPlanner as RefLocalPlanner,
        RoadOption,
    )

    opts = {1: RoadOption.LEFT, 2: RoadOption.RIGHT,
            3: RoadOption.STRAIGHT, 4: RoadOption.LANEFOLLOW}

    for episode in range(6):
        # a forward route with a turn segment in the middle
        n = 25
        xs = np.cumsum(rng.uniform(1.5, 3.0, n))
        ys = np.cumsum(rng.uniform(-0.5, 0.5, n))
        cmds = [4] * n
        turn_cmd = int(rng.integers(1, 4))
        turn_at = int(rng.integers(5, 15))
        for j in range(turn_at, min(turn_at + 5, n)):
            cmds[j] = turn_cmd

        ref = RefLocalPlanner(target_speed=6.0)
        ours = LocalPlanner(target_speed=6.0)

        pos = np.array([0.0, 0.0])
        route_idx = 0
        for step in range(14):
            # advance the actor along the route with noise so waypoints pass
            # in and out of both thresholds
            pos = pos + np.array([rng.uniform(1.0, 4.0), rng.uniform(-1.0, 1.0)])
            yaw = float(rng.uniform(-30, 30))
            speed = float(rng.uniform(0.0, 8.0))
            # both sides consume the same remaining-route window
            route_idx = min(route_idx + int(rng.integers(0, 2)), n - 3)
            window = list(range(route_idx, n))
            ref_plan = [
                (
                    SimpleNamespace(
                        transform=mock_carla.Transform(
                            mock_carla.Location(float(xs[j]), float(ys[j]))
                        )
                    ),
                    opts[cmds[j]],
                )
                for j in window
            ]
            our_plan = [((float(xs[j]), float(ys[j])), cmds[j]) for j in window]

            actor_tf = mock_carla.Transform(
                mock_carla.Location(float(pos[0]), float(pos[1])),
                mock_carla.Rotation(yaw=yaw),
            )
            r_thr, r_steer, r_brake = ref.run_step(ref_plan, actor_tf, speed)
            o_thr, o_steer, o_brake = ours.run_step(
                our_plan, (float(pos[0]), float(pos[1])), yaw, speed
            )
            key = (episode, step)
            assert o_thr == pytest.approx(float(r_thr), rel=1e-6, abs=1e-9), key
            assert o_steer == pytest.approx(float(r_steer), rel=1e-6, abs=1e-9), key
            assert o_brake == r_brake == 0.0, key
            assert ours._last_command == ref._last_command, key


def test_run_red_light_parity_vs_reference(monkeypatch, rng):
    """EXECUTE the reference's ``RunRedLight.tick`` (criteria/
    run_red_light.py:6-64) over mock carla with a populated
    TrafficLightHandler registry and a scripted drive, and reconcile our
    criterion stepwise: the 30 m trigger-distance gate, the red filter,
    dedup by last light id, road/lane + direction matching of the tail
    waypoint, the tail-segment stop-line crossing, and the info record.
    shapely (absent from this image) is stubbed with an INDEPENDENT
    segment-intersection (2x2 linear solve), so the geometry predicate is
    not our own ``segments_intersect``."""
    import types

    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)

    class _LineString:
        def __init__(self, pts):
            self.p = np.asarray(pts, np.float64)

        def intersection(self, other):
            p0, p1 = self.p
            q0, q1 = other.p
            a = np.array([p1 - p0, q0 - q1]).T
            b = q0 - p0
            det = np.linalg.det(a)
            if abs(det) < 1e-12:
                return SimpleNamespace(is_empty=True)  # parallel: scripted
            t, u = np.linalg.solve(a, b)
            hit = -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12
            return SimpleNamespace(is_empty=not hit)

    shp = types.ModuleType("shapely")
    shp_geom = types.ModuleType("shapely.geometry")
    shp_geom.LineString = _LineString
    shp.geometry = shp_geom
    monkeypatch.setitem(sys.modules, "shapely", shp)
    monkeypatch.setitem(sys.modules, "shapely.geometry", shp_geom)
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    import carla_gym.utils.traffic_light as ref_tl
    from carla_gym.core.task_actor.common.criteria.run_red_light import (
        RunRedLight as RefRunRedLight,
    )

    def make_light(lid, x_stop, state, trigger_xy):
        actor = SimpleNamespace(
            id=lid,
            state=state,
            get_location=lambda xy=trigger_xy: mock_carla.Location(*xy),
        )
        wp = SimpleNamespace(
            transform=mock_carla.Transform(
                mock_carla.Location(x_stop, 0.0), mock_carla.Rotation(yaw=0.0)
            ),
            road_id=1,
            lane_id=2,
        )
        vtx = (mock_carla.Location(x_stop, -3.0), mock_carla.Location(x_stop, 3.0))
        return actor, mock_carla.Location(*trigger_xy), [wp], [vtx]

    red = mock_carla.TrafficLightState.Red
    green = mock_carla.TrafficLightState.Green
    # light 7: stop line at x=12; light 9: stop line at x=40
    lights = [make_light(7, 12.0, red, (12.0, 0.0)),
              make_light(9, 40.0, red, (40.0, 0.0))]
    for attr, vals in (
        ("num_tl", len(lights)),
        ("list_tl_actor", [l[0] for l in lights]),
        ("list_tv_loc", [l[1] for l in lights]),
        ("list_stopline_wps", [l[2] for l in lights]),
        ("list_stopline_vtx", [l[3] for l in lights]),
    ):
        monkeypatch.setattr(ref_tl.TrafficLightHandler, attr, vals, raising=False)

    lane_box = {"road": 1, "lane": 2}
    carla_map = SimpleNamespace(
        get_waypoint=lambda loc: SimpleNamespace(
            road_id=lane_box["road"], lane_id=lane_box["lane"]
        )
    )
    ref = RefRunRedLight(carla_map)
    ours = RunRedLight()
    extent = 2.0

    fired = []
    # drive past both stop lines; step 2 flips light 7 green briefly (before
    # the tail crosses its line at ev_x in [13.6, 15]); step 6 puts the ego
    # on the wrong lane for a step
    for step, ev_x in enumerate(np.arange(8.0, 46.0, 1.6)):
        lights[0][0].state = green if step == 2 else red
        lane_box["lane"] = 3 if step == 6 else 2
        tf = mock_carla.Transform(
            mock_carla.Location(float(ev_x), 0.0), mock_carla.Rotation(yaw=0.0)
        )
        vehicle = SimpleNamespace(
            get_transform=lambda t=tf: t,
            bounding_box=SimpleNamespace(extent=SimpleNamespace(x=extent)),
        )
        ts = {"step": step, "relative_simulation_time": 0.1 * step}
        r = ref.tick(vehicle, ts)

        # our input spec: the same registry rendered as LightObservations,
        # tail points through the same (mock-executed) transform math
        tail_close = tf.transform(mock_carla.Location(x=-0.8 * extent))
        tail_far = tf.transform(mock_carla.Location(x=-extent - 1.0))
        obs_lights = []
        for actor, tv_loc, wps, vtxs in lights:
            obs_lights.append(
                LightObservation(
                    id=actor.id,
                    is_red=actor.state == red,
                    trigger_loc=(tv_loc.x, tv_loc.y),
                    stop_lines=[
                        StopLine(
                            wp_forward=(1.0, 0.0),
                            road_id=wp.road_id,
                            lane_id=wp.lane_id,
                            left=(v[0].x, v[0].y),
                            right=(v[1].x, v[1].y),
                        )
                        for wp, v in zip(wps, vtxs)
                    ],
                    loc=(tv_loc.x, tv_loc.y, 0.0),
                )
            )
        o = ours.tick(
            (float(ev_x), 0.0, 0.0),
            (1.0, 0.0),
            (tail_close.x, tail_close.y),
            (tail_far.x, tail_far.y),
            lane_box["road"],
            lane_box["lane"],
            obs_lights,
            sim_time=0.1 * step,
            step=step,
        )
        assert (r is None) == (o is None), (step, float(ev_x), r, o)
        if r is not None:
            assert o["id"] == r["id"] and o["step"] == r["step"], step
            np.testing.assert_allclose(o["tl_loc"], r["tl_loc"])
            np.testing.assert_allclose(o["ev_loc"], r["ev_loc"])
            fired.append(r["id"])
    # both lights actually fired exactly once each, in order
    assert fired == [7, 9]


def test_process_obs_parity_vs_reference(monkeypatch, rng):
    """EXECUTE the reference's ``RlCameraWrapper.process_obs``
    (env_agents/rl_camera/utils/rl_camera_wrapper.py:213-265 — the obs
    contract every agent consumes) on randomized nested obs dicts across
    input_states subsets and both train/eval modes, and reconcile our
    ``sim.obs.process_obs`` key by key."""
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    for name in list(sys.modules):
        if name.startswith("env_agents") or name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    from env_agents.rl_camera.utils.rl_camera_wrapper import RlCameraWrapper

    from autonomous_driving_with_diffusion_model_tpu.sim.obs import process_obs

    all_states = ["yaw", "speed_norm", "speed", "speed_limit", "control",
                  "acc_xy", "vel_xy", "vel_ang_z"]
    # the collector config's actual gate set, plus randomized subsets
    subsets = [
        ["speed", "control", "vel_xy"],
        all_states,
    ] + [
        [s for s in all_states if rng.uniform() < 0.5] or ["speed"]
        for _ in range(6)
    ]
    for i, input_states in enumerate(subsets):
        obs = {
            "speed": {
                "yaw": rng.uniform(-np.pi, np.pi, 1).astype(np.float32),
                "speed": rng.uniform(0, 10, 1).astype(np.float32),
                "speed_xy": rng.uniform(0, 10, 1).astype(np.float32),
            },
            "control": {
                "speed_limit": rng.uniform(0, 1, 1).astype(np.float32),
                "throttle": rng.uniform(0, 1, 1).astype(np.float32),
                "steer": rng.uniform(-1, 1, 1).astype(np.float32),
                "brake": rng.uniform(0, 1, 1).astype(np.float32),
                "gear": np.asarray([float(rng.integers(0, 6))], np.float32),
            },
            "velocity": {
                "acc_xy": rng.uniform(-5, 5, 2).astype(np.float32),
                "vel_xy": rng.uniform(-10, 10, 2).astype(np.float32),
                "vel_ang_z": rng.uniform(-1, 1, 1).astype(np.float32),
            },
            "camera": {
                "data": rng.integers(0, 255, (8, 12, 3)).astype(np.uint8),
                "bev_data": rng.integers(0, 255, (8, 8, 3)).astype(np.uint8),
                "compass": rng.uniform(0, 2 * np.pi, 1).astype(np.float32),
            },
            "traffic_light": {"at_red_light": int(rng.integers(0, 2))},
            "cur_waypoint": rng.uniform(-100, 100, 2).astype(np.float32),
            "target_waypoint": rng.uniform(-100, 100, 2).astype(np.float32),
            "next_waypoint": rng.uniform(-100, 100, 2).astype(np.float32),
            "next_command": np.asarray(int(rng.integers(0, 7))),
        }
        for train in (True, False):
            r = RlCameraWrapper.process_obs(obs, input_states, train=train)
            o = process_obs(obs, input_states, train=train)
            assert set(o) == set(r), (i, train)
            for k in r:
                np.testing.assert_array_equal(
                    np.asarray(o[k]), np.asarray(r[k]), err_msg=f"{i}/{train}/{k}"
                )
                assert np.asarray(o[k]).dtype == np.asarray(r[k]).dtype, (i, train, k)

"""First-party global route planner: topology graph, A*, RoadOption commands,
leaderboard plan manipulation, endless route tracking, env integration —
plus an executed-reference oracle (the reference's networkx GlobalRoutePlanner
run over the same mock map, reference:
carla_gym/core/task_actor/common/navigation/global_route_planner.py)."""

import sys

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture
def mock(monkeypatch):
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    return mock_carla


@pytest.fixture
def planner(mock):
    from autonomous_driving_with_diffusion_model_tpu.sim.route_planner import (
        GlobalRoutePlanner,
    )

    return GlobalRoutePlanner(mock._Map(), resolution=1.0)


def test_trace_route_through_junction(mock, planner):
    from autonomous_driving_with_diffusion_model_tpu.sim.expert import RoadOption

    route = planner.trace_route(mock.Location(x=5.0), mock.Location(x=85.0))
    assert len(route) > 60
    xs = [wp.transform.location.x for wp, _ in route]
    # monotone progress from origin to destination
    assert xs[0] == pytest.approx(5.0, abs=2.0)
    assert xs[-1] == pytest.approx(85.0, abs=3.0)
    assert all(b >= a for a, b in zip(xs, xs[1:]))
    options = [opt for _, opt in route]
    # straight-through junction is classified STRAIGHT, the rest LANEFOLLOW
    assert RoadOption.STRAIGHT in options
    assert options[0] == RoadOption.LANEFOLLOW
    straight_xs = [
        wp.transform.location.x for wp, o in route if o == RoadOption.STRAIGHT
    ]
    assert min(straight_xs) >= mock.JUNCTION_X[0] - 1.0


def test_no_backwards_route(mock, planner):
    with pytest.raises(ValueError):
        planner.trace_route(mock.Location(x=120.0), mock.Location(x=5.0))


def test_abstract_route_plan(mock, planner):
    from autonomous_driving_with_diffusion_model_tpu.sim.expert import RoadOption

    plan = planner.abstract_route_plan(mock.Location(x=5.0), mock.Location(x=85.0))
    assert plan[0] == RoadOption.LANEFOLLOW
    assert RoadOption.STRAIGHT in plan


def test_downsample_and_gps_plan(mock, planner):
    from autonomous_driving_with_diffusion_model_tpu.driving.gps import gps2xyz
    from autonomous_driving_with_diffusion_model_tpu.sim.route_planner import (
        downsample_route,
        location_route_to_gps,
    )

    route = planner.trace_route(mock.Location(x=5.0), mock.Location(x=140.0))
    ids = downsample_route(route, 50.0)
    assert ids[0] == 0 and ids[-1] == len(route) - 1
    assert len(ids) < len(route) / 10  # actually sparse
    # consecutive same-command samples are <= ~51 m apart
    xs = [route[i][0].transform.location.x for i in ids]
    assert max(np.diff(xs)) < 55.0

    gps = location_route_to_gps(route)
    lat, lon, z = gps[0][0]
    x, y, _ = gps2xyz(lat, lon, z, lat_ref=0.0, lon_ref=0.0)
    loc = route[0][0].transform.location
    assert x == pytest.approx(loc.x, abs=1e-6)
    assert y == pytest.approx(loc.y, abs=1e-6)


def test_route_tracker_truncate_and_completion(mock, planner):
    from autonomous_driving_with_diffusion_model_tpu.sim.route_planner import RouteTracker

    tracker = RouteTracker(planner, mock._Map())
    tracker.trace_to_targets(mock.Location(x=5.0), [mock.Location(x=100.0)])
    total = tracker.route_length
    assert 85.0 < total < 105.0
    assert tracker.plan_gps and tracker.plan_world

    # drive 30 m: waypoints behind are popped, completion accumulates
    traveled = tracker.truncate((35.0, 0.0))
    assert traveled == pytest.approx(30.0, abs=8.0)
    assert tracker.route_completed == traveled
    assert tracker.route[0][0].transform.location.x >= 25.0
    assert not tracker.is_completed(mock.Location(x=35.0), mock.Location(x=100.0))

    # walk the rest tick-by-tick (truncation has a 50 m look-ahead window,
    # matching the reference's per-tick usage) and drive past the end
    for x in np.arange(36.0, 106.0, 2.0):
        tracker.truncate((float(x), 0.0))
    assert tracker.route_completed == pytest.approx(total, abs=1.0)
    assert tracker.is_completed(mock.Location(x=99.5), mock.Location(x=100.0))


def test_route_tracker_endless_extension(mock, planner):
    from autonomous_driving_with_diffusion_model_tpu.sim.route_planner import RouteTracker

    spawn = [
        (mock.Waypoint(t.location.x).road_id, t)
        for t in mock._Map().get_spawn_points()
    ]
    tracker = RouteTracker(planner, mock._Map())
    # the mock road is a finite directed line (max reachable ~84 m from x=5);
    # unreachable (backward) targets are skipped, reachable ones chained
    tracker.extend_random(
        mock.Location(x=5.0), spawn, np.random.default_rng(0), min_length=70.0
    )
    assert tracker.route_length >= 70.0
    xs = [wp.transform.location.x for wp, _ in tracker.route]
    assert all(b >= a - 1e-9 for a, b in zip(xs, xs[1:]))  # forward-only chain


# ---------------------------------------------------------------------------
# Executed-reference oracle: the reference's networkx planner over the SAME
# mock map must produce the SAME waypoint trace and RoadOption commands as
# the first-party heapq-A* planner (reference global_route_planner.py:431-497).


@pytest.fixture
def ref_planner(mock, monkeypatch):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # fresh import so the reference modules bind to the mocked carla
    for name in list(sys.modules):
        if name == "carla_gym" or name.startswith("carla_gym."):
            monkeypatch.delitem(sys.modules, name, raising=False)
    from carla_gym.core.task_actor.common.navigation.global_route_planner import (
        GlobalRoutePlanner as RefGRP,
    )

    return RefGRP(mock._Map(), resolution=1.0)


def _xy(route):
    return [
        (round(wp.transform.location.x, 6), round(wp.transform.location.y, 6))
        for wp, _ in route
    ]


def _cmds(route):
    return [opt.name for _, opt in route]


@pytest.mark.parametrize(
    "ox,dx",
    [
        (5.0, 85.0),  # through the junction
        (5.0, 140.0),  # near the far road end
        (40.0, 120.0),  # mid-road start
        (66.0, 140.0),  # origin inside the junction
        (5.0, 63.0),  # destination inside the junction
        (80.0, 95.0),  # short hop on the exit road
    ],
)
def test_trace_route_oracle_vs_reference(mock, planner, ref_planner, ox, dx):
    ref_route = ref_planner.trace_route(mock.Location(x=ox), mock.Location(x=dx))
    our_route = planner.trace_route(mock.Location(x=ox), mock.Location(x=dx))
    assert _xy(our_route) == _xy(ref_route)
    assert _cmds(our_route) == _cmds(ref_route)


def test_abstract_route_plan_oracle_vs_reference(mock, planner, ref_planner):
    for ox, dx in [(5.0, 85.0), (40.0, 140.0)]:
        ref_plan = ref_planner.abstract_route_plan(
            mock.Location(x=ox), mock.Location(x=dx)
        )
        our_plan = planner.abstract_route_plan(
            mock.Location(x=ox), mock.Location(x=dx)
        )
        assert [o.name for o in our_plan] == [o.name for o in ref_plan]


def test_env_uses_first_party_planner(mock, monkeypatch):
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import CarlaDrivingEnv

    env = CarlaDrivingEnv(seed=11, route_min_length=60.0)  # ego spawns at x=10
    obs = env.reset()
    assert env.tracker is not None  # planner built from mock topology
    assert len(env.route) > 10
    # commands on the route come from RoadOption turn decisions (4=LANEFOLLOW)
    cmds = {cmd for _, cmd in env.route}
    assert cmds <= {1, 2, 3, 4, 5, 6}
    for _ in range(20):
        obs, reward, done, info = env.step({0: np.array([0.8, 0.0, 0.0])})
    assert env.completed_m > 0.5  # route-based distance accounting
    assert np.isfinite(reward)


def test_downsample_and_gps_route_parity_vs_reference(mock, monkeypatch, rng):
    """EXECUTE the reference's downsample_route + location_route_to_gps
    (route_manipulation.py:75-165) over randomized routes with mixed
    commands and reconcile our sim.route_planner versions: identical kept
    indices (lane-change keeps, command-transition keeps, distance
    accumulation, tail keep) and matching GPS plans."""
    import os

    if not os.path.isdir(f"{REF}/carla_gym"):
        pytest.skip("reference not mounted")
    monkeypatch.syspath_prepend(REF)
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    from types import SimpleNamespace

    import mock_carla
    from carla_gym.core.task_actor.common.navigation import (
        route_manipulation as ref_rm,
    )
    from carla_gym.core.task_actor.common.navigation.map_utils import (
        RoadOption as RefOption,
    )

    from autonomous_driving_with_diffusion_model_tpu.sim.route_planner import (
        RoadOption,
        downsample_route,
        location_route_to_gps,
    )

    for trial in range(8):
        n = int(rng.integers(5, 120))
        x, y = 0.0, 0.0
        ref_route, our_route = [], []
        opt_pool = [4, 4, 4, 4, 1, 2, 3, 5, 6]  # mostly LANEFOLLOW
        for i in range(n):
            x += float(rng.uniform(0.5, 4.0))
            y += float(rng.uniform(-1.0, 1.0))
            v = int(opt_pool[int(rng.integers(0, len(opt_pool)))])
            wp = SimpleNamespace(
                transform=mock_carla.Transform(mock_carla.Location(x, y))
            )
            ref_route.append((wp, RefOption(v)))
            our_route.append((wp, RoadOption(v)))

        for factor in (5.0, 50.0):
            ref_ids = ref_rm.downsample_route(ref_route, factor)
            our_ids = downsample_route(our_route, factor)
            assert ref_ids == our_ids, (trial, factor)

        ref_gps = ref_rm.location_route_to_gps(ref_route)
        our_gps = location_route_to_gps(our_route)
        assert len(ref_gps) == len(our_gps)
        for (rg, ro), (og, oo) in zip(ref_gps, our_gps):
            assert np.allclose(rg, og, atol=1e-9), trial
            assert ro.value == oo.value, trial


def test_route_tracking_parity_vs_reference_task_vehicle(mock, monkeypatch, rng):
    """EXECUTE the reference TaskVehicle's production route tracking
    (task_vehicle.py:115-196, 373-383: _compute_route_length, the
    cumulative-distance truncation with its farthest-in-range pop,
    _is_route_completed, and get_route_transform's last-passed-location
    anchor) over a scripted noisy drive along a curvy route, and reconcile
    our RouteTracker tick by tick: meters traveled, completion accumulator,
    remaining route, the completion test, and the reward/terminal anchor
    transform."""
    import os

    if not os.path.isdir(f"{REF}/carla_gym"):
        pytest.skip("reference not mounted")
    monkeypatch.syspath_prepend(REF)
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    from types import SimpleNamespace

    import mock_carla

    # task_vehicle imports the criteria package, which pulls shapely (absent
    # from this image); geometry is never exercised here — stub the import
    import types as _types

    shp = _types.ModuleType("shapely")
    shp_geom = _types.ModuleType("shapely.geometry")
    shp_geom.LineString = object
    shp.geometry = shp_geom
    monkeypatch.setitem(sys.modules, "shapely", shp)
    monkeypatch.setitem(sys.modules, "shapely.geometry", shp_geom)
    from carla_gym.core.task_actor.common.task_vehicle import TaskVehicle

    from autonomous_driving_with_diffusion_model_tpu.sim.route_planner import (
        RoadOption,
        RouteTracker,
    )

    # curvy route, ~1 m spacing
    n = 140
    t_par = np.linspace(0, 1, n)
    xs = 10.0 + 130.0 * t_par
    ys = 5.0 * np.sin(t_par * 6.0) + 2.0 * t_par
    route = [
        (
            SimpleNamespace(
                transform=mock_carla.Transform(
                    mock_carla.Location(float(x), float(y)),
                    mock_carla.Rotation(yaw=float(rng.uniform(-10, 10))),
                )
            ),
            RoadOption.LANEFOLLOW,
        )
        for x, y in zip(xs, ys)
    ]
    spawn = (float(xs[0]), float(ys[0]))
    final = mock_carla.Location(float(xs[-1]), float(ys[-1]))

    ego_pos = {"xy": np.array(spawn)}
    vehicle = SimpleNamespace(
        get_location=lambda: mock_carla.Location(*ego_pos["xy"])
    )
    tv = TaskVehicle.__new__(TaskVehicle)
    tv.vehicle = vehicle
    tv._global_route = list(route)
    tv._route_completed = 0.0
    tv._route_length = TaskVehicle._compute_route_length(route)
    tv._last_route_location = mock_carla.Location(*spawn)
    tv._target_transforms = [SimpleNamespace(location=final)]

    ours = RouteTracker(
        planner=None,
        carla_map=None,
        route=list(route),
        route_length=RouteTracker._segment_length(route),
        last_route_location=spawn,
    )
    assert ours.route_length == pytest.approx(tv._route_length)

    completed_seen = False
    for step in range(90):
        # noisy drive roughly along the route at a varying pace
        frac = min(1.0, step / 70.0)
        idx = min(n - 1, int(frac * (n - 1)))
        ego_pos["xy"] = np.array(
            [
                xs[idx] + float(rng.uniform(-1.0, 1.0)),
                ys[idx] + float(rng.uniform(-1.0, 1.0)),
            ]
        )
        d_ref = tv._truncate_global_route_till_cumulative_distance()
        d_our = ours.truncate(tuple(ego_pos["xy"]))
        assert d_our == pytest.approx(float(d_ref), abs=1e-9), step
        assert ours.route_completed == pytest.approx(tv._route_completed), step
        assert len(ours.route) == len(tv._global_route), step
        assert ours.route[0][0] is tv._global_route[0][0], step

        ref_tf = tv.get_route_transform()
        (ox, oy), oyaw = ours.route_transform()
        assert ox == pytest.approx(ref_tf.location.x), step
        assert oy == pytest.approx(ref_tf.location.y), step
        assert oyaw == pytest.approx(float(ref_tf.rotation.yaw), abs=1e-9), step

        ref_done = tv._is_route_completed()
        our_done = ours.is_completed(vehicle.get_location(), final)
        assert ref_done == our_done, step
        completed_seen |= ref_done

    assert completed_seen  # the drive actually finished the route
    assert ours.route_completed > 0.9 * ours.route_length

    # --- get_route_transform branch coverage the drive can't reach --------
    def _pair(anchor_xyz, head_xy, head_yaw):
        wp = SimpleNamespace(
            transform=mock_carla.Transform(
                mock_carla.Location(head_xy[0], head_xy[1]),
                mock_carla.Rotation(yaw=head_yaw),
            )
        )
        tv2 = TaskVehicle.__new__(TaskVehicle)
        tv2._global_route = [(wp, RoadOption.LANEFOLLOW)]
        tv2._last_route_location = mock_carla.Location(*anchor_xyz)
        ours2 = RouteTracker(
            planner=None, carla_map=None,
            route=[(wp, RoadOption.LANEFOLLOW)],
            last_route_location=anchor_xyz,
        )
        return tv2, ours2

    # z-lifted spawn anchor at (almost) the head's xy: the reference's 3D
    # distance keeps the arctan2 branch and yields the erratic near-zero-xy
    # yaw — we must reproduce it, not fall back to the head's own yaw
    tv2, ours2 = _pair((50.0, 8.0, 0.45), (50.01, 8.02), head_yaw=37.0)
    ref_tf = tv2.get_route_transform()
    (ox, oy), oyaw = ours2.route_transform()
    assert (ox, oy) == (pytest.approx(ref_tf.location.x), pytest.approx(ref_tf.location.y))
    assert oyaw == pytest.approx(float(ref_tf.rotation.yaw), abs=1e-9)
    assert oyaw != pytest.approx(37.0)  # really the arctan2 branch

    # true 3D coincidence: both take the head's own yaw
    tv3, ours3 = _pair((50.0, 8.0, 0.0), (50.0, 8.0), head_yaw=37.0)
    assert float(tv3.get_route_transform().rotation.yaw) == 37.0
    assert ours3.route_transform()[1] == 37.0

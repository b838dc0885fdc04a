"""EXECUTED-reference oracle for the chauffeurnet birdview.

Runs the reference's real ``birdview.chauffeurnet.ObsManager``
(carla_gym/core/obs_manager/birdview/chauffeurnet.py:39-411) over mock carla
with the reference's own Town01.h5 global masks, a populated
TrafficLightHandler registry, moving vehicles/walkers, a targeted stop sign,
and a route plan — 20 scripted ticks, ego turning mid-episode — and
reconciles our ``BirdviewRenderer`` EXACTLY (uint8-equal rendered image,
uint8-equal mask stack, equal collision_px) with the inputs gathered through
the same adapter logic ``sim/carla_env.py`` uses (stop composition via the
real ``CarlaDrivingEnv._birdview_stops``, stop-line filtering via the real
``TrafficLightRegistry.get_stopline_vtx``).

cv2 note: the reference passes raw float pixel coords to ``cv.line`` for stop
lines (chauffeurnet.py:313-320). Its deployed opencv-python==4.2.0.32
(leaderboard/requirements.txt:3) converted them through ``__int__`` — a
truncation toward zero; opencv 5.x (this image) rejects floats outright. The
reference module is executed with a shim whose ``line`` reproduces the 4.2
conversion; everything else delegates to the real cv2. Our renderer
truncates the same way (reproduced quirk, docs/PARITY.md).
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

TOWN01_H5 = "/root/reference/carla_gym/core/obs_manager/birdview/maps/Town01.h5"

OBS_CONFIGS = {
    # configs/agent/obs_configs/birdview.yaml (the deployed collection config:
    # scale_bbox true pairs with scale_mask_col 1.0 there, not the code
    # default 1.1)
    "width_in_pixels": 192,
    "pixels_ev_to_bottom": 40,
    "pixels_per_meter": 5.0,
    "history_idx": [-16, -11, -6, -1],
    "scale_bbox": True,
    "scale_mask_col": 1.0,
}


class _Cv42:
    """cv2 facade reproducing the 4.2 binding's float->int point coercion for
    ``line`` (everything else is the real cv2)."""

    def __getattr__(self, name):
        import cv2

        return getattr(cv2, name)

    @staticmethod
    def line(img, pt1, pt2, **kw):
        import cv2

        return cv2.line(
            img, (int(pt1[0]), int(pt1[1])), (int(pt2[0]), int(pt2[1])), **kw
        )


@pytest.fixture
def ref_mod(monkeypatch):
    if not os.path.isdir("/root/reference/carla_gym"):
        pytest.skip("reference not mounted")
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    monkeypatch.syspath_prepend("/root/reference")
    for name in list(sys.modules):
        if name.startswith("carla_gym"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    import carla_gym.core.obs_manager.birdview.chauffeurnet as ref_chauffeurnet
    import carla_gym.utils.traffic_light as ref_tl

    monkeypatch.setattr(ref_chauffeurnet, "cv", _Cv42())
    return ref_chauffeurnet, ref_tl, mock_carla


def _make_light(mc, lid, tv_xy, vtx_pairs, state):
    actor = SimpleNamespace(
        id=lid,
        state=state,
        get_location=lambda xy=tv_xy: mc.Location(xy[0], xy[1]),
    )
    tv_loc = mc.Location(tv_xy[0], tv_xy[1])
    vtx = [
        (mc.Location(a[0], a[1]), mc.Location(b[0], b[1])) for a, b in vtx_pairs
    ]
    return actor, tv_loc, vtx


def test_birdview_matches_executed_reference(ref_mod, monkeypatch):
    ref_chauffeurnet, ref_tl, mc = ref_mod
    from autonomous_driving_with_diffusion_model_tpu.sim.birdview import (
        BirdviewRenderer,
    )
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import (
        CarlaDrivingEnv,
    )
    from autonomous_driving_with_diffusion_model_tpu.sim.traffic_lights import (
        TrafficLightRegistry,
    )

    world = mc._World()

    # --- actors: ego + 2 vehicles + a crossing walker -----------------------
    ego = mc._Vehicle(world, mc.Transform(mc.Location(200.0, 150.0)))
    v1 = mc._Vehicle(world, mc.Transform(mc.Location(215.0, 150.0)))
    v2 = mc._Vehicle(
        world, mc.Transform(mc.Location(192.0, 146.0), mc.Rotation(yaw=30.0))
    )
    walker = mc._Walker(world, mc.Transform(mc.Location(227.7, 155.2)))
    world.actors.extend([ego, v1, v2, walker])

    # --- traffic lights: one cycling near the start, one red down the road --
    st = mc.TrafficLightState
    l1, l1_loc, l1_vtx = _make_light(
        mc, 7, (215.0, 148.0), [((215.0, 146.0), (215.0, 154.0))], st.Green
    )
    l2, l2_loc, l2_vtx = _make_light(
        mc, 9, (255.0, 150.0),
        [((255.0, 146.5), (255.0, 153.5)), ((257.0, 146.5), (257.0, 153.5))],
        st.Red,
    )
    for attr, vals in (
        ("num_tl", 2),
        ("list_tl_actor", [l1, l2]),
        ("list_tv_loc", [l1_loc, l2_loc]),
        ("list_stopline_vtx", [l1_vtx, l2_vtx]),
    ):
        monkeypatch.setattr(ref_tl.TrafficLightHandler, attr, vals, raising=False)

    # duck registry driving OUR stop-line filter (the real unbound method
    # over the same light data)
    our_entries = []
    for actor, tv_loc, vtx in ((l1, l1_loc, l1_vtx), (l2, l2_loc, l2_vtx)):
        our_entries.append(
            SimpleNamespace(
                actor=actor,
                trigger_loc=(tv_loc.x, tv_loc.y),
                stop_lines=[
                    SimpleNamespace(left=(a.x, a.y), right=(b.x, b.y))
                    for a, b in vtx
                ],
            )
        )
    our_reg = SimpleNamespace(
        entries=our_entries, _state_name=TrafficLightRegistry._state_name
    )

    # --- stop sign with an offset, rotated trigger volume -------------------
    sign = mc.StopSign(x=220.0, extent=1.0)
    sign._transform = mc.Transform(
        mc.Location(220.0, 152.0), mc.Rotation(yaw=40.0)
    )
    sign.trigger_volume = SimpleNamespace(
        location=mc.Location(1.5, 0.3, 0.0),
        extent=SimpleNamespace(x=1.0, y=2.0, z=1.0),
    )

    # --- route: gentle S ahead of the ego -----------------------------------
    route_x = np.linspace(195.0, 295.0, 100)
    route_y = 150.0 + 2.0 * np.sin((route_x - 195.0) / 18.0)
    route = list(zip(route_x.tolist(), route_y.tolist()))

    # --- the reference ObsManager, attached over mock carla -----------------
    parent = SimpleNamespace(
        vehicle=ego,
        criteria_stop=SimpleNamespace(
            _target_stop_sign=None, _stop_completed=False
        ),
        route_plan=[],
    )
    ref_om = ref_chauffeurnet.ObsManager(dict(OBS_CONFIGS))
    ref_om.attach_ego_vehicle(parent)

    ours = BirdviewRenderer.from_h5(TOWN01_H5, scale_mask_col=1.0)

    saw = {"stop": False, "red": False, "collision": False, "walker": False}
    for t in range(20):
        # script the world
        ego.transform.location.x = 200.0 + 3.0 * t
        if t > 8:  # turn away after the junction
            ego.transform.rotation.yaw = 12.0 * (t - 8)
            ego.transform.location.y = 150.0 + 0.6 * (t - 8) ** 2 * 0.2
        v1.transform.location.x = 215.0 + 2.0 * t
        walker.transform.location.x = 227.7 - 0.7 * t
        walker.transform.location.y = 155.2 - 0.7 * t
        l1.state = (st.Green, st.Yellow, st.Red)[min(t // 5, 2)]
        targeted = 6 <= t <= 14
        parent.criteria_stop._target_stop_sign = sign if targeted else None
        parent.criteria_stop._stop_completed = targeted and t >= 12
        parent.route_plan = [
            (SimpleNamespace(transform=mc.Transform(mc.Location(x, y))), None)
            for x, y in route[t:]
        ]

        ref_obs = ref_om.get_observation()

        # our inputs, gathered through the REAL env adapters (unbound over a
        # duck env): level-bbox filter, stop composition, stop-line filter
        from autonomous_driving_with_diffusion_model_tpu.sim.traffic_lights import (
            StopSignRegistry,
        )

        tf = ego.get_transform()
        pos = (tf.location.x, tf.location.y)
        env_duck = SimpleNamespace(
            ego=ego,
            world=world,
            _birdview=ours,
            _carla=mc,
            run_stop_sign=SimpleNamespace(
                target_stop_id=sign.id if targeted else None,
                stop_completed=parent.criteria_stop._stop_completed,
            ),
            stop_registry=SimpleNamespace(
                get=lambda _id: sign,
                _trigger_center_extent=(
                    lambda s: StopSignRegistry._trigger_center_extent(None, s)
                ),
            ),
        )
        our_obs = ours.tick(
            ev_loc_xy=pos,
            ev_yaw_deg=tf.rotation.yaw,
            ev_extent_xy=(ego.bounding_box.extent.x, ego.bounding_box.extent.y),
            vehicles=CarlaDrivingEnv._birdview_level_boxes(
                env_duck, mc.CityObjectLabel.Vehicles
            ),
            walkers=CarlaDrivingEnv._birdview_level_boxes(
                env_duck, mc.CityObjectLabel.Pedestrians
            ),
            tl_green=TrafficLightRegistry.get_stopline_vtx(our_reg, pos, 0),
            tl_yellow=TrafficLightRegistry.get_stopline_vtx(our_reg, pos, 1),
            tl_red=TrafficLightRegistry.get_stopline_vtx(our_reg, pos, 2),
            stops=CarlaDrivingEnv._birdview_stops(env_duck),
            route_xy=np.asarray(route[t : t + 80]),
        )

        assert np.array_equal(ref_obs["rendered"], our_obs["rendered"]), t
        assert np.array_equal(ref_obs["masks"], our_obs["masks"]), t
        assert bool(parent.collision_px) == our_obs["collision_px"], t

        # non-vacuity markers
        tl_hist = ref_obs["masks"][-len(OBS_CONFIGS["history_idx"]):]
        if t in (6, 7):
            # the stop box is the ONLY possible 255 source in the current tl
            # channel here: l1 is Yellow (170), l1 red starts at t=10, and
            # l2's red lines are still off-canvas (>30.4 m ahead) — a silent
            # stop-rendering regression fails THIS assert, not just the dict
            assert (tl_hist[-1] == 255).any(), t
            saw["stop"] = True
        # past the stop window (t>=15, nothing targeted) 255 can only be a
        # red stop line
        saw["red"] |= t >= 15 and bool((tl_hist[-1] == 255).any())
        saw["walker"] |= bool(ref_obs["masks"][3 + 4 : 3 + 8].any())
        saw["collision"] |= bool(parent.collision_px)

    # the scenario genuinely exercised every channel family
    assert saw == {"stop": True, "red": True, "collision": True, "walker": True}
    # and the map content itself was on screen (road + lanes + route)
    assert ref_obs["masks"][0].any() and ref_obs["masks"][1].any()


def test_birdview_history_warmup_matches_reference(ref_mod):
    """First ticks, before the 20-deep queue fills: history_idx clamp to the
    oldest frame (chauffeurnet.py:286-291) must agree frame-by-frame."""
    ref_chauffeurnet, ref_tl, mc = ref_mod
    from autonomous_driving_with_diffusion_model_tpu.sim.birdview import (
        BirdviewRenderer,
    )

    for attr, vals in (
        ("num_tl", 0),
        ("list_tl_actor", []),
        ("list_tv_loc", []),
        ("list_stopline_vtx", []),
    ):
        setattr(ref_tl.TrafficLightHandler, attr, vals)

    world = mc._World()
    ego = mc._Vehicle(world, mc.Transform(mc.Location(200.0, 150.0)))
    v1 = mc._Vehicle(world, mc.Transform(mc.Location(210.0, 150.0)))
    world.actors.extend([ego, v1])
    parent = SimpleNamespace(
        vehicle=ego,
        criteria_stop=SimpleNamespace(
            _target_stop_sign=None, _stop_completed=False
        ),
        route_plan=[
            (
                SimpleNamespace(
                    transform=mc.Transform(mc.Location(200.0 + 2 * i, 150.0))
                ),
                None,
            )
            for i in range(40)
        ],
    )
    ref_om = ref_chauffeurnet.ObsManager(dict(OBS_CONFIGS))
    ref_om.attach_ego_vehicle(parent)
    ours = BirdviewRenderer.from_h5(TOWN01_H5, scale_mask_col=1.0)

    for t in range(4):
        v1.transform.location.x = 210.0 + 4.0 * t  # moves: history must differ
        ref_obs = ref_om.get_observation()
        our_obs = ours.tick(
            ev_loc_xy=(200.0, 150.0),
            ev_yaw_deg=0.0,
            ev_extent_xy=(ego.bounding_box.extent.x, ego.bounding_box.extent.y),
            vehicles=[((210.0 + 4.0 * t, 150.0), 0.0, (2.45, 1.06))],
            route_xy=np.asarray([(200.0 + 2 * i, 150.0) for i in range(40)]),
        )
        assert np.array_equal(ref_obs["rendered"], our_obs["rendered"]), t
        assert np.array_equal(ref_obs["masks"], our_obs["masks"]), t
        # the oldest-history channel shows the OLDEST position, not the
        # current one, once >1 frame is buffered
        if t == 3:
            oldest = ref_obs["masks"][3]
            newest = ref_obs["masks"][6]
            assert not np.array_equal(oldest, newest)

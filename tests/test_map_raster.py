"""Map rasterizer -> .h5 -> birdview renderer, closing the map pipeline."""

import numpy as np

from autonomous_driving_with_diffusion_model_tpu.sim.birdview import BirdviewRenderer
from autonomous_driving_with_diffusion_model_tpu.sim.map_raster import (
    LaneStrip,
    rasterize_map,
    save_h5,
)


def _strips():
    n = 100
    straight = LaneStrip(
        centerline=np.stack([np.linspace(0, 200, n), np.zeros(n)], axis=-1),
        width=np.full(n, 3.5),
        left_marking="broken",
        right_marking="solid",
    )
    curve_t = np.linspace(0, np.pi / 2, n)
    curve = LaneStrip(
        centerline=np.stack(
            [200 + 30 * np.sin(curve_t), 30 - 30 * np.cos(curve_t)], axis=-1
        ),
        width=np.full(n, 3.5),
    )
    return [straight, curve]


def test_rasterize_masks():
    masks = rasterize_map(_strips())
    road = masks["road"]
    assert road.dtype == np.uint8 and road.sum() > 0
    # a point on the straight lane is road; far off-road is not
    ppm = masks["pixels_per_meter"]
    off = masks["world_offset_in_meters"]
    px = ((np.array([100.0, 0.0]) - off) * ppm).astype(int)
    assert road[px[1], px[0]] == 255
    far = ((np.array([100.0, 30.0]) - off) * ppm).astype(int)
    assert road[far[1], far[0]] == 0
    # lane markings exist; broken is a subset of all
    assert masks["lane_marking_all"].sum() > 0
    assert 0 < masks["lane_marking_white_broken"].sum() < masks["lane_marking_all"].sum()


def test_h5_roundtrip_feeds_renderer(tmp_path):
    masks = rasterize_map(_strips())
    path = str(tmp_path / "TownX.h5")
    save_h5(path, masks)
    renderer = BirdviewRenderer.from_h5(path)
    out = renderer.tick(
        ev_loc_xy=(100.0, 0.0), ev_yaw_deg=0.0, ev_extent_xy=(2.4, 1.1),
        route_xy=np.stack([np.linspace(100, 140, 40), np.zeros(40)], axis=-1),
    )
    # the generated road renders under the ego
    assert out["masks"][0].sum() > 0  # road channel
    assert (out["rendered"] != 0).any()


def test_full_town_generation_flow(tmp_path, monkeypatch):
    """Whole pipeline on the mock town: topology march -> rasterize ->
    save_h5 -> BirdviewRenderer.from_h5 -> rendered frame shows the road
    (the reference's birdview_map.py CLI + chauffeurnet consumption loop)."""
    import sys

    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    from autonomous_driving_with_diffusion_model_tpu.sim.birdview import BirdviewRenderer
    from autonomous_driving_with_diffusion_model_tpu.sim.map_raster import main

    out = tmp_path / "maps"
    main(["--towns", "MockTown", "--save-dir", str(out), "--pixels-per-meter", "5.0"])
    h5_path = out / "MockTown.h5"
    assert h5_path.exists()

    renderer = BirdviewRenderer.from_h5(str(h5_path), width_in_pixels=192)
    frame = renderer.tick(
        ev_loc_xy=(30.0, 0.0), ev_yaw_deg=0.0, ev_extent_xy=(2.45, 1.06),
        route_xy=np.stack([np.arange(30.0, 80.0, 2.0), np.zeros(25)], axis=-1),
    )
    rendered = frame["rendered"]
    assert rendered.shape == (192, 192, 3)
    # the road band under the ego is drawn (non-black pixels near the bottom)
    ego_region = rendered[140:160, 80:112]
    assert (ego_region.sum(axis=-1) > 0).mean() > 0.5

"""Birdview renderer on the reference's real Town01 global masks."""

import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.sim.birdview import (
    BirdviewRenderer,
    tint,
)

TOWN01_H5 = "/root/reference/carla_gym/core/obs_manager/birdview/maps/Town01.h5"


def test_tint():
    assert tint((0, 0, 0), 1.0) == (255, 255, 255)
    assert tint((100, 200, 0), 0.0) == (100, 200, 0)


@pytest.fixture(scope="module")
def renderer():
    return BirdviewRenderer.from_h5(TOWN01_H5)


def test_render_from_reference_maps(renderer):
    # a pose on the Town01 road grid (map offset read from the h5 attrs)
    ev = (200.0, 150.0)
    out = renderer.tick(
        ev_loc_xy=ev,
        ev_yaw_deg=0.0,
        ev_extent_xy=(2.4, 1.1),
        vehicles=[((208.0, 150.0), 0.0, (2.4, 1.1))],
        walkers=[((204.0, 152.0), 90.0, (0.4, 0.4))],
        tl_red=[((210.0, 148.0), (210.0, 152.0))],
        route_xy=np.stack([np.linspace(200, 240, 40), np.full(40, 150.0)], axis=-1),
    )
    img, masks = out["rendered"], out["masks"]
    assert img.shape == (192, 192, 3) and img.dtype == np.uint8
    assert masks.shape == (3 + 3 * 4, 192, 192)
    # ego drawn white at ~40px from the bottom center
    assert (img[192 - 40 - 2 : 192 - 38, 94:98] == 255).any()
    # route channel has the polyline
    assert masks[1].sum() > 0
    # vehicle history channel (last) shows the other car
    assert masks[3 + 3].sum() > 0  # most recent vehicle mask = index 3+len-1 = 6
    # red stop line appears in the tl channel
    assert (masks[-1] == 255).any()


def test_collision_px_flag(renderer):
    ev = (200.0, 150.0)
    # walker overlapping the (scaled) ego box
    out = renderer.tick(
        ev_loc_xy=ev, ev_yaw_deg=0.0, ev_extent_xy=(2.4, 1.1),
        walkers=[((200.5, 150.0), 0.0, (0.4, 0.4))],
    )
    assert out["collision_px"] is True
    out2 = renderer.tick(
        ev_loc_xy=ev, ev_yaw_deg=0.0, ev_extent_xy=(2.4, 1.1),
        walkers=[((230.0, 150.0), 0.0, (0.4, 0.4))],
    )
    assert out2["collision_px"] is False


def test_history_tinting(renderer):
    """Older history frames render lighter (tinted) vehicle pixels."""
    r = BirdviewRenderer.from_h5(TOWN01_H5)
    ev = (200.0, 150.0)
    # 20 frames: vehicle present only in the oldest frames
    for i in range(20):
        # with 20 frames buffered, history_idx -16 = frame index 4
        vehicles = [((206.0, 150.0), 0.0, (2.0, 1.0))] if i <= 4 else []
        out = r.tick(ev, 0.0, (2.4, 1.1), vehicles=vehicles)
    assert out["masks"][3].sum() > 0  # oldest history channel still sees it
    assert out["masks"][6].sum() == 0  # newest history channel does not

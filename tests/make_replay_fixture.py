"""Regenerate the committed replay fixture (tests/fixtures/replay_town01.npz).

Non-noise closed-loop frames: BEV frames rendered by our chauffeurnet
renderer over the reference's real Town01 global masks, and a procedural
front-camera road scene (sky, road trapezoid, dashed center line advancing
with the ego). The golden waypoint trajectories are produced by the interact
agent with deterministically-initialized weights (PRNGKey(0), dim-8 U-Net,
tiny perception) so tests/test_replay_env.py can pin them.

Run from the repo root: python tests/make_replay_fixture.py
(needs /root/reference mounted for the Town01.h5 masks).
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TOWN01_H5 = "/root/reference/carla_gym/core/obs_manager/birdview/maps/Town01.h5"
FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "replay_town01.npz")
N_FRAMES = 8
CAM_HW = (256, 900)


def road_scene(step: int, h: int, w: int) -> np.ndarray:
    """Procedural front-camera frame: sky gradient, road trapezoid, dashed
    center line that advances with the ego step."""
    img = np.zeros((h, w, 3), np.uint8)
    horizon = h // 2
    sky = np.linspace(180, 120, horizon).astype(np.uint8)
    img[:horizon] = sky[:, None, None] * np.array([0.6, 0.8, 1.0])[None, None]
    ground = np.linspace(60, 110, h - horizon).astype(np.uint8)
    img[horizon:] = ground[:, None, None]
    # road trapezoid narrowing to the vanishing point
    for row in range(horizon, h):
        frac = (row - horizon) / (h - horizon)
        half = int(0.05 * w + 0.40 * w * frac)
        img[row, w // 2 - half: w // 2 + half] = (90 + 40 * frac, 90 + 40 * frac, 95 + 40 * frac)
        # dashed center line, phase advances with the ego
        if int(8 * frac + step) % 2 == 0:
            cw = max(1, int(6 * frac))
            img[row, w // 2 - cw: w // 2 + cw] = (230, 230, 230)
    return img


def main():
    from autonomous_driving_with_diffusion_model_tpu.sim.birdview import BirdviewRenderer

    renderer = BirdviewRenderer.from_h5(TOWN01_H5, width_in_pixels=512)

    # find a straight drivable stretch: take a road pixel row with a long run
    road = renderer._road
    offset = renderer._world_offset
    ppm = renderer._ppm
    ys, xs = np.nonzero(road)
    # median road pixel, then walk along +x in world space from there
    start_px = np.array([xs[len(xs) // 2], ys[len(ys) // 2]], np.float32)
    start_world = start_px / ppm + offset[:2]

    route = np.stack(
        [start_world[0] + np.arange(0.0, 120.0, 2.0), np.full(60, start_world[1])],
        axis=-1,
    )
    h, w = CAM_HW
    frames, bevs, obs_pos, obs_speed = [], [], [], []
    pos = route[0].copy()
    for i in range(N_FRAMES):
        bev = renderer.tick(
            ev_loc_xy=pos, ev_yaw_deg=0.0, ev_extent_xy=(2.45, 1.06),
            route_xy=route,
        )["rendered"]
        frames.append(road_scene(i, h, w))
        bevs.append(bev)
        obs_pos.append(pos.copy())
        obs_speed.append(2.0 + 0.5 * i)
        pos = pos + np.array([3.0, 0.0])  # ~3 m per frame

    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(
        FIXTURE.replace(".npz", ".tmp.npz"),
        frames=np.stack(frames),
        bevs=np.stack(bevs),
        pos=np.stack(obs_pos),
        speed=np.asarray(obs_speed, np.float32),
        route=route,
    )

    # golden waypoints: interact agent over the replay with PRNGKey(0) weights
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tests.test_replay_env import build_agent_and_env  # reuse one builder

    agent, env, planned = build_agent_and_env(FIXTURE.replace(".npz", ".tmp.npz"))
    obs = env.reset()
    for _ in range(N_FRAMES - 1):
        control = agent.compute_control(obs)
        obs, _, done, _ = env.step({0: control})
        if done:
            break

    data = dict(np.load(FIXTURE.replace(".npz", ".tmp.npz")))
    data["golden_waypoints"] = np.stack(planned)
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, **data)
    os.remove(FIXTURE.replace(".npz", ".tmp.npz"))
    print(f"{FIXTURE}: {os.path.getsize(FIXTURE) / 1e6:.2f} MB, "
          f"{len(planned)} planned trajectories")


if __name__ == "__main__":
    main()

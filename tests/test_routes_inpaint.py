"""Route XML parsing, inpainting sampler, multi-device batch sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.diffusion import (
    SamplerConfig,
    StepConfig,
    make_sampler,
    make_schedule,
)
from autonomous_driving_with_diffusion_model_tpu.driving import (
    parse_routes_xml,
    parse_scenarios_json,
    route_length_m,
)
from autonomous_driving_with_diffusion_model_tpu.models import build_model
from autonomous_driving_with_diffusion_model_tpu.parallel import make_mesh, shard_batch
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg
from autonomous_driving_with_diffusion_model_tpu.utils.constants import GuidanceType

REF_ROUTES = "/root/reference/leaderboard/data/evaluation_routes/longest6_tiny.xml"
REF_SCENARIOS = "/root/reference/leaderboard/data/scenarios/all_towns_traffic_scenarios.json"


def test_parse_reference_routes():
    routes = parse_routes_xml(REF_ROUTES)
    assert len(routes) == 6  # "Longest 6 (tiny)" benchmark
    r0 = routes[0]
    assert r0["town"].startswith("Town")
    assert r0["waypoints"].shape[1] == 3
    assert r0["length_m"] > 100
    np.testing.assert_allclose(
        r0["waypoints"][0][:2], [334.7254638671875, 288.90679931640625]
    )


def test_parse_reference_scenarios():
    scenarios = parse_scenarios_json(REF_SCENARIOS)
    assert len(scenarios) > 0
    assert all("scenario_type" in s or "available_event_configurations" in s for s in scenarios)


def _tiny_model(rng):
    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, 32, 48, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, img=img, time=jnp.asarray([1.0]))
    return model, variables, img


@pytest.mark.parametrize("scheduler", ["ddim", "ddpm"])
def test_inpainting_sampler_pins_known_region(rng, scheduler):
    model, variables, img = _tiny_model(rng)
    schedule = make_schedule("squaredcos_cap_v2", 100)
    cfg = SamplerConfig(
        scheduler=scheduler,
        num_steps=4,
        step=StepConfig(prediction_type="sample", clip_sample=True),
        inpainting=True,
        scale_to_meters=False,
    )
    sample = jax.jit(make_sampler(model, schedule, cfg))
    init = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    target_traj = jnp.zeros((1, 16, 7)).at[:, :, 0].set(0.5)
    mask = jnp.zeros((1, 16, 7)).at[:, 4:8, :].set(1.0)  # pin waypoints 4..7
    out = np.asarray(
        sample(
            variables, init, image=img, rng=jax.random.PRNGKey(0),
            target_traj=target_traj, target_mask=mask,
        )
    )
    # final step has prev_t < 0 -> alpha_prod_prev = 1, so the known region
    # equals target_traj exactly (RePaint line 5 with no noise at t=0)
    np.testing.assert_allclose(out[:, 4:8, :], np.asarray(target_traj)[:, 4:8, :], atol=1e-5)
    # unknown region is model-driven, not the target
    assert not np.allclose(out[:, 8:, 0], 0.5, atol=1e-3)


def test_inpainting_guidance_rejected():
    model = build_model(create_cfg(), dtype=jnp.float32)
    schedule = make_schedule("squaredcos_cap_v2", 100)
    with pytest.raises(ValueError):
        make_sampler(
            model,
            schedule,
            SamplerConfig(guidance=GuidanceType.FREE_GUIDANCE, inpainting=True),
        )


def test_sharded_batch_sampling_on_mesh(rng):
    """Batch of plans sharded over the 8-device data axis == unsharded result."""
    model, variables, img = _tiny_model(rng)
    schedule = make_schedule("squaredcos_cap_v2", 100)
    cfg = SamplerConfig(scheduler="ddim", num_steps=3, scale_to_meters=True)
    sample = jax.jit(make_sampler(model, schedule, cfg))
    B = 16
    init = jnp.asarray(rng.standard_normal((B, 16, 7)), jnp.float32)
    imgs = jnp.tile(img, (B, 1, 1, 1))
    ref = np.asarray(sample(variables, init, image=imgs))

    mesh = make_mesh()
    batch = shard_batch({"init": init, "img": imgs}, mesh)
    out = np.asarray(sample(variables, batch["init"], image=batch["img"]))
    # partitioned reductions reassociate fp adds; equality is to ~1e-3
    np.testing.assert_allclose(out, ref, atol=2e-3)

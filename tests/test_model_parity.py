"""Golden parity: our flax models vs the reference torch implementation.

The read-only reference repo is imported as a *test oracle* (its torch modules
are executed, never copied). ``resnet34(pretrained=True)`` is monkeypatched to
``pretrained=False`` because the image has no network egress.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def reference_modeling():
    import modeling.resnet as ref_resnet
    import modeling.temporal as ref_temporal

    orig = ref_resnet.resnet34

    def no_pretrain(pretrained=True, **kw):
        return orig(pretrained=False, **kw)

    ref_temporal.resnet34 = no_pretrain
    yield ref_temporal
    ref_temporal.resnet34 = orig


def make_cfg(use_cond="NO_GUIDANCE", dim=16, attn=False):
    from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg

    cfg = create_cfg()
    cfg.TRAIN.USE_COND = use_cond
    cfg.MODEL.DIM = dim
    cfg.MODEL.USE_ATTN = attn
    return cfg


def build_pair(reference_modeling, cfg, seed=0):
    """Build (torch model, flax model, converted variables)."""
    import jax.numpy as jnp

    from autonomous_driving_with_diffusion_model_tpu.models import (
        build_model,
        torch_state_dict_to_variables,
    )
    from autonomous_driving_with_diffusion_model_tpu.utils.constants import GuidanceType

    torch.manual_seed(seed)
    tmodel = reference_modeling.TemporalMapUnet(
        horizon=cfg.MODEL.HORIZON,
        transition_dim=cfg.MODEL.TRANSITION_DIM,
        attention=cfg.MODEL.USE_ATTN,
        dim=cfg.MODEL.DIM,
        dim_mults=tuple(cfg.MODEL.DIM_MULTS),
        diffuser_building_block="concat",
        use_cond=__import__("misc.constant", fromlist=["GuidanceType"]).GuidanceType[
            cfg.TRAIN.USE_COND
        ],
    ).eval()
    jmodel = build_model(cfg, dtype=jnp.float32)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), cfg)
    return tmodel, jmodel, variables


def rand_inputs(rng, batch=2, h=16, td=7, img_hw=(64, 96)):
    x = rng.standard_normal((batch, h, td)).astype(np.float32)
    img = rng.standard_normal((batch, *img_hw, 3)).astype(np.float32)
    t = np.array([3.0] * batch, dtype=np.float32)
    return x, img, t


@pytest.mark.parametrize("use_cond", ["NO_GUIDANCE", "FREE_GUIDANCE", "CLASSIFIER_GUIDANCE"])
def test_forward_parity(reference_modeling, rng, use_cond):
    import jax.numpy as jnp

    # TrajPredict's hidden_dim is hardcoded to 64 == time_dim in the reference
    # (temporal.py:188), so the classifier variant only works at MODEL.DIM=64.
    cfg = make_cfg(use_cond, dim=64 if use_cond == "CLASSIFIER_GUIDANCE" else 16)
    tmodel, jmodel, variables = build_pair(reference_modeling, cfg)
    x, img, t = rand_inputs(rng)

    cond = None
    if use_cond == "FREE_GUIDANCE":
        cond = rng.standard_normal((2, 2)).astype(np.float32)

    with torch.inference_mode():
        targs = dict(
            x=torch.from_numpy(x),
            img=torch.from_numpy(img.transpose(0, 3, 1, 2)),
            time=torch.from_numpy(t),
        )
        if cond is not None:
            targs["cond"] = torch.from_numpy(cond)
        ref = tmodel(**targs).numpy()

    out = jmodel.apply(
        variables,
        jnp.asarray(x),
        img=jnp.asarray(img),
        time=jnp.asarray(t),
        cond=jnp.asarray(cond) if cond is not None else None,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)


def test_attention_block_parity(rng):
    """Residual(PreNorm(LinearAttention)) vs the reference block.

    Tested at block level: the reference's full-model attention path crashes on
    its own up-path channel mismatch (temporal.py:168 builds PreNorm(dim_out)
    but feeds dim_in — latent bug; attention is off by default). Our model
    fixes the up path; the down/mid blocks match the reference exactly.
    """
    import jax
    import jax.numpy as jnp
    from modeling.helpers import LinearAttention as RefLA
    from modeling.helpers import PreNorm as RefPreNorm
    from modeling.helpers import Residual as RefResidual

    from autonomous_driving_with_diffusion_model_tpu.models.blocks import PreNormAttention

    dim = 32
    torch.manual_seed(0)
    ref = RefResidual(RefPreNorm(dim, RefLA(dim))).eval()
    x = rng.standard_normal((2, 16, dim)).astype(np.float32)
    with torch.inference_mode():
        ref_out = ref(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    mod = PreNormAttention(dim)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = ref.state_dict()
    params = {
        "norm_g": np.reshape(sd["fn.norm.g"].numpy(), (-1,)),
        "norm_b": np.reshape(sd["fn.norm.b"].numpy(), (-1,)),
        "attn": {
            "to_qkv": {"weight": sd["fn.fn.to_qkv.weight"].numpy().transpose(2, 1, 0)},
            "to_out": {
                "weight": sd["fn.fn.to_out.weight"].numpy().transpose(2, 1, 0),
                "bias": sd["fn.fn.to_out.bias"].numpy(),
            },
        },
    }
    out = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-4, rtol=1e-3)


def test_classifier_action_head_parity(reference_modeling, rng):
    """return_action_and_time_only path (reference: temporal.py:236-237)."""
    import jax.numpy as jnp

    cfg = make_cfg("CLASSIFIER_GUIDANCE", dim=64)
    tmodel, jmodel, variables = build_pair(reference_modeling, cfg)
    x, img, t = rand_inputs(rng)
    with torch.inference_mode():
        ref_action, ref_temb = tmodel(
            torch.from_numpy(x),
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            return_action_and_time_only=True,
        )
    action, temb = jmodel.apply(
        variables,
        jnp.asarray(x),
        img=jnp.asarray(img),
        time=jnp.asarray(t),
        return_action_and_time_only=True,
    )
    np.testing.assert_allclose(np.asarray(action), ref_action.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(temb), ref_temb.numpy(), atol=5e-4, rtol=1e-3)


def test_cfg_dual_batch_broadcast(reference_modeling, rng):
    """Dual-batch CFG: cond (2B, 2) with x (B,...) tiles time/img features
    (reference: temporal.py:206-212 batch-repeat)."""
    import jax.numpy as jnp

    cfg = make_cfg("FREE_GUIDANCE")
    tmodel, jmodel, variables = build_pair(reference_modeling, cfg)
    x, img, t = rand_inputs(rng, batch=1)
    x2 = np.concatenate([x, x], axis=0)
    cond = np.concatenate(
        [rng.standard_normal((1, 2)).astype(np.float32), np.zeros((1, 2), np.float32)]
    )
    with torch.inference_mode():
        ref = tmodel(
            torch.from_numpy(x2),
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(np.array([5.0], np.float32)),
            cond=torch.from_numpy(cond),
        ).numpy()
    out = jmodel.apply(
        variables,
        jnp.asarray(x2),
        img=jnp.asarray(img),
        time=jnp.asarray(np.array([5.0], np.float32)),
        cond=jnp.asarray(cond),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)


def test_roundtrip_export_strict(reference_modeling, rng):
    """flax -> torch export loads strictly into the reference model and matches."""
    import jax
    import jax.numpy as jnp

    from autonomous_driving_with_diffusion_model_tpu.models import (
        build_model,
        variables_to_torch_state_dict,
    )

    cfg = make_cfg("NO_GUIDANCE")
    jmodel = build_model(cfg, dtype=jnp.float32)
    x, img, t = rand_inputs(rng)
    variables = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), img=jnp.asarray(img), time=jnp.asarray(t))
    sd = variables_to_torch_state_dict(variables, cfg)

    torch.manual_seed(1)
    tmodel, _, _ = build_pair(reference_modeling, cfg, seed=1)
    tmodel.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, strict=True)
    tmodel.eval()
    with torch.inference_mode():
        ref = tmodel(
            torch.from_numpy(x),
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
        ).numpy()
    out = jmodel.apply(variables, jnp.asarray(x), img=jnp.asarray(img), time=jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)


def test_ema_shadow_param_count(reference_modeling):
    """build_mapping order/length must match torch named_parameters exactly."""
    from autonomous_driving_with_diffusion_model_tpu.models import build_mapping

    for use_cond in ["NO_GUIDANCE", "FREE_GUIDANCE", "CLASSIFIER_GUIDANCE"]:
        cfg = make_cfg(use_cond, dim=64 if use_cond == "CLASSIFIER_GUIDANCE" else 16)
        tmodel, _, _ = build_pair(reference_modeling, cfg)
        torch_names = [k for k, _ in tmodel.named_parameters()]
        mapped_names = [k for k, _, _ in build_mapping(cfg)[0]]
        assert mapped_names == torch_names


def test_ema_shadow_apply(reference_modeling, rng):
    """Applying shadow params reproduces the reference copy_parameters semantics
    (misc/load_param.py:4-8)."""
    import jax.numpy as jnp

    from autonomous_driving_with_diffusion_model_tpu.models import apply_ema_shadow_params

    cfg = make_cfg("NO_GUIDANCE")
    tmodel, jmodel, variables = build_pair(reference_modeling, cfg)
    shadow = [p.detach() * 0.5 for p in tmodel.parameters()]
    # reference semantics: overwrite model params with shadow values
    with torch.no_grad():
        for s, p in zip(shadow, tmodel.parameters()):
            p.copy_(s)
    tmodel.eval()
    variables = apply_ema_shadow_params(variables, shadow, cfg)
    x, img, t = rand_inputs(rng)
    with torch.inference_mode():
        ref = tmodel(
            torch.from_numpy(x),
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
        ).numpy()
    out = jmodel.apply(variables, jnp.asarray(x), img=jnp.asarray(img), time=jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)

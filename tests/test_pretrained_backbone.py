"""ImageNet-pretrained backbone ingestion (models/torch_convert.py:
import_torchvision_backbone).

The reference ALWAYS trains from ``resnet34(pretrained=True)``
(/root/reference/modeling/temporal.py:83: torchvision weights downloaded in
/root/reference/modeling/resnet.py:299-311, then the fc re-headed with a
fresh ``nn.Linear(512, time_dim)``). These tests pin our import to exactly
those semantics using a locally-constructed torchvision-layout state_dict
(no network): every backbone param and BN running stat must come from the
state_dict, the fc head and all non-perception params must stay untouched.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from test_model_parity import build_pair, make_cfg, reference_modeling  # noqa: F401,E402


@pytest.fixture(scope="module")
def imagenet_sd():
    """A torchvision-layout resnet34 state_dict (random weights standing in
    for the ImageNet ones — the layout is what's under test)."""
    import modeling.resnet as ref_resnet

    torch.manual_seed(7)
    backbone = ref_resnet.resnet34(pretrained=False)
    # make running stats distinguishable from the fresh-init (0 mean, 1 var)
    with torch.no_grad():
        backbone(torch.randn(2, 3, 64, 96))
    return backbone.state_dict()


def _tree_allclose(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_allclose(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6, err_msg=path
        )


def test_import_matches_reference_semantics(reference_modeling, imagenet_sd):
    """import_torchvision_backbone(variables, sd) must equal loading sd into
    the reference model's perception (fc excluded, as the reference re-heads
    it after the load) and converting the whole model."""
    from autonomous_driving_with_diffusion_model_tpu.models import (
        torch_state_dict_to_variables,
    )
    from autonomous_driving_with_diffusion_model_tpu.models.torch_convert import (
        import_torchvision_backbone,
    )

    cfg = make_cfg("FREE_GUIDANCE", dim=16)
    tmodel, _, variables = build_pair(reference_modeling, cfg)

    got = import_torchvision_backbone(variables, imagenet_sd)

    # oracle: the reference's effective init = backbone weights loaded while
    # the fc was still 1000-way, then the fc replaced (kept from tmodel here)
    filtered = {k: v for k, v in imagenet_sd.items() if not k.startswith("fc.")}
    missing, unexpected = tmodel.perception.load_state_dict(filtered, strict=False)
    assert not unexpected
    assert all(k.startswith("fc.") for k in missing)
    expected = torch_state_dict_to_variables(tmodel.state_dict(), cfg)

    _tree_allclose(got["params"], expected["params"])
    _tree_allclose(got["batch_stats"], expected["batch_stats"])


def test_fc_head_and_rest_preserved(reference_modeling, imagenet_sd):
    from autonomous_driving_with_diffusion_model_tpu.models.torch_convert import (
        import_torchvision_backbone,
    )

    cfg = make_cfg("NO_GUIDANCE", dim=16)
    _, _, variables = build_pair(reference_modeling, cfg)
    got = import_torchvision_backbone(variables, imagenet_sd)

    # the fresh time_dim fc head survives (torchvision's 1000-way fc dropped)
    np.testing.assert_array_equal(
        np.asarray(got["params"]["perception"]["fc"]["weight"]),
        np.asarray(variables["params"]["perception"]["fc"]["weight"]),
    )
    # a U-Net param is untouched
    np.testing.assert_array_equal(
        np.asarray(got["params"]["mid_block1"]["block1"]["weight"]),
        np.asarray(variables["params"]["mid_block1"]["block1"]["weight"]),
    )
    # but the backbone itself was overwritten (and stats came along)
    conv1_ours = np.asarray(got["params"]["perception"]["conv1"]["weight"])
    conv1_torch = imagenet_sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(conv1_ours, conv1_torch, atol=1e-7)
    rm = np.asarray(got["batch_stats"]["perception"]["bn1"]["running_mean"])
    np.testing.assert_allclose(rm, imagenet_sd["bn1.running_mean"].numpy(), atol=1e-7)
    assert np.abs(rm).max() > 0  # genuinely the warmed stats, not fresh zeros
    # inputs were not mutated
    assert np.abs(conv1_ours
                  - np.asarray(variables["params"]["perception"]["conv1"]["weight"])
                  ).max() > 0


def test_shape_mismatch_raises(reference_modeling, imagenet_sd):
    from autonomous_driving_with_diffusion_model_tpu.models.torch_convert import (
        import_torchvision_backbone,
    )

    cfg = make_cfg("NO_GUIDANCE", dim=16)
    _, _, variables = build_pair(reference_modeling, cfg)
    bad = dict(imagenet_sd)
    bad["conv1.weight"] = torch.zeros(64, 3, 3, 3)  # 7x7 in the real layout
    with pytest.raises(ValueError, match="conv1.weight"):
        import_torchvision_backbone(variables, bad)
    missing = {k: v for k, v in imagenet_sd.items() if "layer4" not in k}
    with pytest.raises(KeyError, match="layer4"):
        import_torchvision_backbone(variables, missing)


def test_batch_stats_shape_mismatch_raises(reference_modeling, imagenet_sd):
    """Running stats are validated like params — a wrong-shaped running_mean
    must fail loudly at the load site, not as a broadcast error mid-train."""
    from autonomous_driving_with_diffusion_model_tpu.models.torch_convert import (
        import_torchvision_backbone,
    )

    cfg = make_cfg("NO_GUIDANCE", dim=16)
    _, _, variables = build_pair(reference_modeling, cfg)
    bad = dict(imagenet_sd)
    bad["bn1.running_mean"] = torch.zeros(32)  # 64 in the real layout
    with pytest.raises(ValueError, match="bn1.running_mean"):
        import_torchvision_backbone(variables, bad)


def test_non_resnet34_perception_raises_clearly(imagenet_sd):
    """TRAIN.PRETRAINED_BACKBONE with MODEL.PERCEPTION=tiny (the CPU smoke
    recipes) must raise the explicit ValueError, not a bare KeyError from
    deep inside the pytree walk."""
    import jax

    from autonomous_driving_with_diffusion_model_tpu.models import build_model
    from autonomous_driving_with_diffusion_model_tpu.models.torch_convert import (
        import_torchvision_backbone,
    )

    cfg = make_cfg("NO_GUIDANCE", dim=16)
    cfg.MODEL.PERCEPTION = "tiny"
    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 16, 7), np.float32),
        img=np.zeros((1, 32, 48, 3), np.float32),
        time=np.asarray([1.0], np.float32),
    )
    with pytest.raises(ValueError, match="MODEL.PERCEPTION=resnet34"):
        import_torchvision_backbone(dict(variables), imagenet_sd)

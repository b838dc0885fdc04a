"""Training stack tests: EMA schedule, SPMD train step, checkpoint round-trips."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from autonomous_driving_with_diffusion_model_tpu.diffusion import make_schedule
from autonomous_driving_with_diffusion_model_tpu.models import build_model
from autonomous_driving_with_diffusion_model_tpu.parallel import make_mesh, shard_batch
from autonomous_driving_with_diffusion_model_tpu.train import (
    EmaConfig,
    create_train_state,
    ema_decay_for_step,
    export_torch_checkpoint,
    import_torch_checkpoint,
    make_lr_schedule,
    make_train_step,
    restore_orbax,
    save_orbax,
)
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg


def tiny_cfg(use_cond="NO_GUIDANCE", perception="tiny"):
    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = perception
    cfg.TRAIN.USE_COND = use_cond
    cfg.TRAIN.TIME_STEPS = 10
    cfg.TRAIN.SAMPLE_STEPS = 10
    return cfg


def make_batch(rng, batch=8, img_hw=(32, 48)):
    return {
        "image": jnp.asarray(rng.standard_normal((batch, *img_hw, 3)), jnp.float32),
        "trajs": jnp.asarray(rng.standard_normal((batch, 16, 7)) * 0.3, jnp.float32),
        "target": jnp.asarray(rng.standard_normal((batch, 2)), jnp.float32),
    }


def init_state(cfg, rng, img_hw=(32, 48)):
    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, *img_hw, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, img=img, time=jnp.asarray([1.0]))
    return model, create_train_state(model, variables, cfg)


def test_ema_decay_schedule_matches_diffusers_formula():
    """diffusers EMAModel.get_decay (training_utils.py, v0.28.0):
    step = max(0, opt_step - update_after_step - 1); 0 if step<=0;
    warmup: 1 - (1 + step/inv_gamma)^-power, clipped to [min_decay, decay]."""
    cfg = EmaConfig(decay=0.9999, update_after_step=5000, inv_gamma=1.0, power=0.75)

    def ref(opt_step):
        step = max(0, opt_step - 5000 - 1)
        if step <= 0:
            return 0.0
        cur = 1 - (1 + step / 1.0) ** -0.75
        return max(min(cur, 0.9999), 0.0)

    for s in [0, 1, 5000, 5001, 5002, 5100, 20000, 1000000]:
        assert float(ema_decay_for_step(cfg, jnp.asarray(s))) == pytest.approx(ref(s), abs=1e-7)


def test_lr_warmup():
    sched = make_lr_schedule(1e-4, 1000)
    assert float(sched(0)) == 0.0
    assert float(sched(500)) == pytest.approx(5e-5)
    assert float(sched(1000)) == pytest.approx(1e-4)
    assert float(sched(50000)) == pytest.approx(1e-4)


@pytest.mark.parametrize("use_cond", ["NO_GUIDANCE", "FREE_GUIDANCE", "CLASSIFIER_GUIDANCE"])
def test_train_step_decreases_loss(rng, use_cond):
    cfg = tiny_cfg(use_cond)
    if use_cond == "CLASSIFIER_GUIDANCE":
        cfg.MODEL.DIM = 64
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.LR_WARMUP = 1
    model, state = init_state(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    step = jax.jit(make_train_step(model, schedule, cfg))
    batch = make_batch(rng, batch=4)
    losses = []
    for i in range(15):
        state, metrics = step(state, batch, jax.random.PRNGKey(i % 3))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9
    assert int(state.step) == 15
    assert np.isfinite(losses).all()


def test_frozen_bn_mode(rng):
    """TPU.BN_MODE=frozen (the TPU DEFAULT since round 5, docs/PARITY.md #8):
    encoder BN normalizes with running stats and never mutates them (the
    torch frozen-backbone practice); params still train and the loss still
    falls. BN_MODE=train is the strict-parity switch and must keep mutating
    stats (the reference's model.train() semantics)."""
    cfg = tiny_cfg(perception="resnet18")
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.LR_WARMUP = 1
    assert cfg.TPU.BN_MODE == "frozen"  # the documented TPU default
    model, state = init_state(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    step = jax.jit(make_train_step(model, schedule, cfg))
    batch = make_batch(rng, batch=4)
    losses = []
    for i in range(15):
        state2, metrics = step(state if i == 0 else state2, batch, jax.random.PRNGKey(i % 3))
        losses.append(float(metrics["loss"]))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.batch_stats,
        state2.batch_stats,
    )
    moved = np.abs(
        np.asarray(state2.params["time_mlp"]["fc1"]["weight"])
        - np.asarray(state.params["time_mlp"]["fc1"]["weight"])
    ).max()
    assert moved > 0
    assert losses[-1] < losses[0] * 0.9 and np.isfinite(losses).all()

    # "train" (strict-parity switch) mutates the running stats — the
    # reference contract
    cfg_t = tiny_cfg(perception="resnet18")
    cfg_t.TPU.BN_MODE = "train"
    model_t, state_t = init_state(cfg_t, rng)
    step_t = jax.jit(make_train_step(model_t, schedule, cfg_t))
    state_t2, _ = step_t(state_t, batch, jax.random.PRNGKey(0))
    diffs = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            state_t.batch_stats,
            state_t2.batch_stats,
        )
    )
    assert max(diffs) > 0

    cfg_bad = tiny_cfg()
    cfg_bad.TPU.BN_MODE = "nope"
    with pytest.raises(ValueError, match="BN_MODE"):
        make_train_step(build_model(cfg_bad, dtype=jnp.float32), schedule, cfg_bad)


def test_train_step_on_8_device_mesh(rng):
    """The SPMD path: batch sharded over the data axis, state replicated."""
    cfg = tiny_cfg()
    model, state = init_state(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    step = jax.jit(make_train_step(model, schedule, cfg))
    batch = make_batch(rng, batch=16)
    state2, metrics = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # sharded-batch result must equal the unsharded result (same data/rng)
    state1, metrics1 = step(state, batch, jax.random.PRNGKey(0))
    assert float(metrics1["loss"]) == pytest.approx(float(metrics["loss"]), rel=1e-4)


def test_gradient_accumulation_matches_large_batch(rng):
    """G micro-batches averaged == one big batch with per-micro rngs: verify
    accumulation runs and produces a finite, comparable loss/update."""
    cfg = tiny_cfg()
    model, state = init_state(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    batch = make_batch(rng, batch=8)

    cfg.TRAIN.GRADIENT_ACCUMULATION_STEPS = 4
    cfg.TRAIN.LR_WARMUP = 1  # step-0 LR is 0 under warmup; move by step 2
    step_acc = jax.jit(make_train_step(model, schedule, cfg))
    state_a, metrics_a = step_acc(state, batch, jax.random.PRNGKey(0))
    state_a, metrics_a = step_acc(state_a, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics_a["loss"]))
    assert int(state_a.step) == 2
    # params actually moved
    moved = np.abs(
        np.asarray(state_a.params["time_mlp"]["fc1"]["weight"])
        - np.asarray(state.params["time_mlp"]["fc1"]["weight"])
    ).max()
    assert moved > 0


def test_orbax_roundtrip(tmp_path, rng):
    cfg = tiny_cfg()
    model, state = init_state(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    step = jax.jit(make_train_step(model, schedule, cfg))
    state, _ = step(state, make_batch(rng, 4), jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    save_orbax(path, state)
    restored = restore_orbax(path, jax.tree.map(np.asarray, state))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), state, restored
    )


def test_torch_checkpoint_roundtrip_and_reference_load(tmp_path, rng):
    """Export .pth -> (a) import back bit-identically, (b) strict-load into the
    reference torch model + AdamW optimizer and run a torch step."""
    import torch

    import modeling.resnet as ref_resnet
    import modeling.temporal as ref_temporal
    from misc.constant import GuidanceType as RefGuidance

    cfg = tiny_cfg(perception="resnet34")  # conversion needs the reference encoder
    model, state = init_state(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    step = jax.jit(make_train_step(model, schedule, cfg))
    for i in range(3):
        state, _ = step(state, make_batch(rng, 4), jax.random.PRNGKey(i))

    path = str(tmp_path / "export.pth")
    export_torch_checkpoint(state, cfg, path)

    # (a) bit round-trip
    state2 = import_torch_checkpoint(path, cfg, state)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7),
        state.params,
        state2.params,
    )
    adam1, adam2 = state.opt_state[0], state2.opt_state[0]
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7),
        adam1.mu,
        adam2.mu,
    )
    assert int(state2.step) == int(state.step)
    assert int(state2.ema.optimization_step) == int(state.ema.optimization_step)

    # (b) reference-side load (strict) + torch optimizer resume
    orig = ref_resnet.resnet34
    ref_temporal.resnet34 = lambda pretrained=True, **kw: orig(pretrained=False, **kw)
    try:
        tmodel = ref_temporal.TemporalMapUnet(
            horizon=16,
            transition_dim=7,
            attention=False,
            dim=cfg.MODEL.DIM,
            dim_mults=(1, 2, 4, 8),
            use_cond=RefGuidance.NO_GUIDANCE,
        )
    finally:
        ref_temporal.resnet34 = orig
    ckpt = torch.load(path, weights_only=False)
    tmodel.load_state_dict(ckpt["state_dict"], strict=True)
    opt = torch.optim.AdamW(tmodel.parameters(), lr=1e-4, betas=(0.95, 0.999), eps=1e-7)
    opt.load_state_dict(ckpt["optimizer"])
    loss = tmodel(
        torch.randn(2, 16, 7), torch.randn(2, 3, 32, 48), torch.tensor([1.0, 2.0])
    ).pow(2).mean()
    loss.backward()
    opt.step()  # must not raise: moments aligned with params


def test_remat_gradients_identical(rng):
    """TPU.REMAT recomputes activations on backward; the optimizer step and
    loss must be bitwise-identical to the non-remat step."""
    states, metrics = [], []
    for remat in (False, True):
        cfg = tiny_cfg()
        cfg.TPU.REMAT = remat
        model, state = init_state(cfg, np.random.default_rng(0))
        schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
        step = jax.jit(make_train_step(model, schedule, cfg))
        batch = make_batch(np.random.default_rng(1), 8)
        new_state, m = step(state, batch, jax.random.PRNGKey(0))
        states.append(new_state)
        metrics.append(m)
    assert float(metrics[0]["loss"]) == float(metrics[1]["loss"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        states[0].params,
        states[1].params,
    )

"""Progressive distillation: grid halving, DDIM inversion, training, CLI.

The distillation math (diffusion/distill.py) is our own capability beyond
the reference (which samples eagerly at 100/10/2 steps); these tests pin
its internal consistency: a student that outputs the implied-x0 target
reproduces the teacher's two-step composite EXACTLY through the standard
sampler's step function, and custom grids run through the bone-stock
sampler via TPU.SAMPLE_TIMESTEPS.
"""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.diffusion import (
    SamplerConfig,
    StepConfig,
    ddim_step,
    grid_chain,
    halve_grid,
    implied_x0_target,
    initial_grid,
    leading_timesteps,
    make_distill_step,
    make_sampler,
    make_schedule,
)
from autonomous_driving_with_diffusion_model_tpu.models import build_model
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg
from autonomous_driving_with_diffusion_model_tpu.utils.constants import GuidanceType


def tiny_cfg(use_cond="NO_GUIDANCE"):
    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    cfg.TRAIN.USE_COND = use_cond
    cfg.TRAIN.TIME_STEPS = 100
    cfg.TRAIN.SAMPLE_STEPS = 100
    return cfg


# --------------------------------------------------------------------- grids


def test_grid_chain_halves_exactly():
    grids = grid_chain(100, 50, 10)
    sizes = [len(g.ts) for g in grids]
    assert sizes == [25, 13, 7, 4, 2, 1]  # stops at 1
    ts, prev = initial_grid(100, 50)
    for g in grids:
        # student timesteps are every other teacher timestep
        np.testing.assert_array_equal(g.ts, ts[::2])
        # two-substep rows: mid is the teacher's prev at the same row, and
        # the student's prev is the teacher's NEXT prev
        for i in range(len(g.ts)):
            j = 2 * i
            assert g.mids[i] == prev[j]
            if j + 1 < len(ts):
                assert not g.single[i]
                assert g.prev[i] == prev[j + 1]
            else:
                assert g.single[i]
                assert g.prev[i] == prev[j]
        # non-terminal prevs chain to the next grid entry
        np.testing.assert_array_equal(g.prev[:-1], g.ts[1:])
        assert g.prev[-1] < g.ts[-1]
        ts, prev = g.ts, g.prev


def test_halve_grid_rejects_single_step():
    with pytest.raises(ValueError):
        halve_grid(np.asarray([5]), np.asarray([-1]))


# ----------------------------------------------------------------- inversion


def test_implied_x0_inverts_ddim_step():
    """implied_x0_target is the exact inverse of the (eta=0) DDIM step: for
    any model output z in [-1,1], stepping with z then inverting returns z."""
    schedule = make_schedule(num_train_timesteps=100)
    scfg = StepConfig(prediction_type="sample", clip_sample=True)
    rng = np.random.default_rng(0)
    x_t = jnp.asarray(rng.standard_normal((4, 16, 7)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (4, 16, 7)), jnp.float32)
    for t_val, s_val in [(98, 66), (66, 34), (34, 2), (2, -1), (50, -1)]:
        t = jnp.full((4,), t_val, jnp.int32)
        s = jnp.full((4,), s_val, jnp.int32)
        x_s = jax.vmap(
            lambda mo, tt, ss, x: ddim_step(schedule, scfg, mo[None], tt, ss, x[None])[0][0]
        )(z, t, s, x_t)
        z_rec = implied_x0_target(schedule, x_t, x_s, t, s)
        np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z), atol=2e-5)


def test_implied_x0_terminal_is_identity():
    """At a terminal prev (alpha=1) the implied target IS the composite
    endpoint: a 1-step student is trained to predict x0 directly."""
    schedule = make_schedule(num_train_timesteps=100)
    rng = np.random.default_rng(1)
    x_t = jnp.asarray(rng.standard_normal((2, 16, 7)), jnp.float32)
    x_s = jnp.asarray(rng.standard_normal((2, 16, 7)), jnp.float32)
    t = jnp.full((2,), 98, jnp.int32)
    s = jnp.full((2,), -1, jnp.int32)
    z = implied_x0_target(schedule, x_t, x_s, t, s)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x_s), atol=1e-6)


# ------------------------------------------------- custom grids in the sampler


def test_sampler_custom_grid_matches_leading():
    """A custom grid equal to the leading grid reproduces the default sampler
    bit-for-bit (terminal prev -1 vs -ratio both hit final_alpha_cumprod)."""
    cfg = tiny_cfg()
    rng = np.random.default_rng(2)
    model, variables = _init_model(cfg, rng)
    x = jnp.asarray(rng.standard_normal((2, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((2, 32, 48, 3)), jnp.float32)
    schedule = make_schedule(num_train_timesteps=100)
    ts, _ = leading_timesteps(100, 10)
    base = SamplerConfig(num_steps=10, scheduler="ddim")
    custom = base._replace(timesteps=tuple(int(t) for t in ts))
    out_a = make_sampler(model, schedule, base)(variables, x, image=img)
    out_b = make_sampler(model, schedule, custom)(variables, x, image=img)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_sampler_rejects_bad_grids():
    cfg = tiny_cfg()
    model = build_model(cfg, dtype=jnp.float32)
    schedule = make_schedule(num_train_timesteps=100)
    for bad in [(2, 34), (98, 98), (120, 50), ()]:
        with pytest.raises(ValueError):
            make_sampler(model, schedule, SamplerConfig(timesteps=bad))


# ------------------------------------------------------------------- training


def _init_model(cfg, rng, img_hw=(32, 48)):
    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, *img_hw, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, img=img, time=jnp.asarray([1.0]))
    return model, variables


@pytest.mark.parametrize("use_cond", ["NO_GUIDANCE", "FREE_GUIDANCE"])
def test_distill_step_decreases_loss(use_cond):
    cfg = tiny_cfg(use_cond)
    rng = np.random.default_rng(3)
    model, variables = _init_model(cfg, rng)
    schedule = make_schedule(num_train_timesteps=100)
    grid = grid_chain(100, 8, 1)[0]  # 8 -> 4 steps
    init_state, step = make_distill_step(
        model,
        schedule,
        grid,
        use_cond=GuidanceType[use_cond],
        free_scale=2.0,
        lr=1e-3,
        warmup=2,
    )
    jit_step = jax.jit(step, donate_argnums=(0,))
    state = init_state(variables["params"])
    batch = {
        "image": jnp.asarray(rng.standard_normal((8, 32, 48, 3)), jnp.float32),
        "trajs": jnp.asarray(rng.uniform(-0.5, 0.5, (8, 16, 7)), jnp.float32),
        "target": jnp.asarray(rng.standard_normal((8, 2)), jnp.float32),
    }
    stats = variables.get("batch_stats", {})
    losses = []
    for it in range(25):
        state, metrics = jit_step(
            state, variables, stats, batch, jax.random.PRNGKey(it)
        )
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    assert int(state.step) == 25


def test_student_ema_lags_and_deploys(rng=None):
    """The deployed student is the EMA (r4 postmortem: raw end-of-stage params
    carried a steer-channel bias that blew up closed loop): the shadow starts
    at the teacher, lags the raw params, and with decay_steps the LR ends at
    ~0 so the last raw step is negligible."""
    import optax

    from autonomous_driving_with_diffusion_model_tpu.train.state import make_optimizer

    cfg = tiny_cfg("NO_GUIDANCE")
    rng = np.random.default_rng(5)
    model, variables = _init_model(cfg, rng)
    schedule = make_schedule(num_train_timesteps=100)
    grid = grid_chain(100, 8, 1)[0]
    N = 12
    init_state, step = make_distill_step(
        model, schedule, grid, lr=1e-3, warmup=2, decay_steps=N
    )
    jit_step = jax.jit(step, donate_argnums=(0,))
    state = init_state(variables["params"])
    teacher_leaf = np.asarray(variables["params"]["time_mlp"]["fc1"]["weight"])
    np.testing.assert_array_equal(
        np.asarray(state.ema.shadow_params["time_mlp"]["fc1"]["weight"]), teacher_leaf
    )
    batch = {
        "image": jnp.asarray(rng.standard_normal((4, 32, 48, 3)), jnp.float32),
        "trajs": jnp.asarray(rng.uniform(-0.5, 0.5, (4, 16, 7)), jnp.float32),
        "target": jnp.asarray(rng.standard_normal((4, 2)), jnp.float32),
    }
    stats = variables.get("batch_stats", {})
    for it in range(N):
        state, _ = jit_step(state, variables, stats, batch, jax.random.PRNGKey(it))
    raw = np.asarray(state.params["time_mlp"]["fc1"]["weight"])
    ema = np.asarray(state.ema.shadow_params["time_mlp"]["fc1"]["weight"])
    assert int(state.ema.optimization_step) == N
    # the EMA moved off the teacher but lags the raw iterate (it averages the
    # trajectory, so it sits strictly between teacher and raw in step norm)
    d_ema = np.abs(ema - teacher_leaf).max()
    d_raw = np.abs(raw - teacher_leaf).max()
    assert d_ema > 0
    assert d_ema < d_raw
    # cosine decay reached ~0: the schedule's terminal LR is < 1% of peak
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 2, N, 0.0)
    assert float(sched(N)) < 1e-5


def test_cfg_free_scale_one_skips_uncond_pass():
    """free_scale=1.0 statically reduces CFG to the conditional forward
    (u + 1*(c-u) == c): the sampler output matches a manual cond-only DDIM
    loop to compiler-fusion tolerance (the fused scan program and the eager
    per-step loop schedule float ops differently) — the deployed operating
    point of CFG-distilled students."""
    from autonomous_driving_with_diffusion_model_tpu.diffusion.sampler import _anchor
    from autonomous_driving_with_diffusion_model_tpu.models.temporal_unet import (
        TemporalMapUnet,
    )
    from autonomous_driving_with_diffusion_model_tpu.utils.constants import MAGIC_NUM

    cfg = tiny_cfg("FREE_GUIDANCE")
    rng = np.random.default_rng(7)
    model, variables = _init_model(cfg, rng)
    schedule = make_schedule(num_train_timesteps=100)
    x = jnp.asarray(rng.standard_normal((2, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((2, 32, 48, 3)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, 2)), jnp.float32)
    scfg = SamplerConfig(
        guidance=GuidanceType.FREE_GUIDANCE,
        scheduler="ddim",
        num_steps=4,
        free_scale=1.0,
    )
    out = make_sampler(model, schedule, scfg)(variables, x, image=img, target=tgt)

    feat = model.apply(variables, img, train=False, method=TemporalMapUnet.encode_image)
    ts, prev = leading_timesteps(100, 4)
    trajs = _anchor(x)
    for t, p in zip(ts, prev):
        t_b = jnp.full((2,), t, jnp.float32)
        mo = model.apply(variables, trajs, time=t_b, cond=tgt, img_feature=feat)
        trajs, _ = ddim_step(
            schedule, scfg.step, mo,
            jnp.asarray(t, jnp.int32), jnp.asarray(p, jnp.int32), trajs,
        )
        trajs = _anchor(trajs)
    manual = jnp.clip(trajs, -1.0, 1.0).at[..., :2].multiply(MAGIC_NUM)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(manual), atol=1e-3, rtol=1e-4
    )


def test_cfg_distill_student_is_single_conditional_pass():
    """Under FREE_GUIDANCE the teacher runs the w-guided dual combination
    (2 forwards per substep) but the STUDENT is a single conditional forward
    — the guidance scale bakes into the weights (Meng et al. 2023; deploy at
    GUIDANCE.FREE_SCALE=1). Pins the forward counts of one loss evaluation."""
    schedule = make_schedule(num_train_timesteps=100)
    grid = grid_chain(100, 8, 1)[0]

    class _Rec:
        def __init__(self):
            self.fwd_calls = 0
            self.encode_calls = 0

        def apply(self, variables, x, *a, method=None, **k):
            if method is not None:  # encode_image
                self.encode_calls += 1
                return jnp.zeros((x.shape[0], 4))
            self.fwd_calls += 1
            return jnp.full(x.shape, 0.2, jnp.float32)

    rec = _Rec()
    init_state, step = make_distill_step(
        rec, schedule, grid, use_cond=GuidanceType.FREE_GUIDANCE,
        free_scale=3.0, lr=0.0,
    )
    rng = np.random.default_rng(8)
    batch = {
        "image": jnp.asarray(rng.standard_normal((4, 8, 8, 3)), jnp.float32),
        "trajs": jnp.asarray(rng.uniform(-0.5, 0.5, (4, 16, 7)), jnp.float32),
        "target": jnp.asarray(rng.standard_normal((4, 2)), jnp.float32),
    }
    state = init_state({})
    step(state, {}, {}, batch, jax.random.PRNGKey(0))
    # teacher: 2 substeps x (cond + uncond) = 4; student: 1 conditional
    assert rec.fwd_calls == 5, rec.fwd_calls
    assert rec.encode_calls == 2, rec.encode_calls


def test_distill_rejects_classifier_guidance():
    schedule = make_schedule(num_train_timesteps=100)
    with pytest.raises(ValueError, match="CLASSIFIER_GUIDANCE"):
        make_distill_step(
            None, schedule, grid_chain(100, 8, 1)[0],
            use_cond=GuidanceType.CLASSIFIER_GUIDANCE,
        )


def test_perfect_student_has_near_zero_loss():
    """If the teacher's one-step map already equals its own two-step
    composite (a model with constant output in [-1,1]), the implied target
    equals that output and the distillation loss starts at ~0 — pins that
    the target construction introduces no bias."""
    cfg = tiny_cfg()
    schedule = make_schedule(num_train_timesteps=100)
    grid = grid_chain(100, 8, 1)[0]

    class _Const:
        """Stand-in for the model: constant x0 prediction c."""

        def apply(self, variables, *a, method=None, **k):
            if method is not None:  # encode_image
                return jnp.zeros((a[0].shape[0], 4))
            return jnp.full(a[0].shape, 0.3, jnp.float32)

    init_state, step = make_distill_step(_Const(), schedule, grid, lr=0.0)
    rng = np.random.default_rng(5)
    batch = {
        "image": jnp.asarray(rng.standard_normal((4, 8, 8, 3)), jnp.float32),
        "trajs": jnp.asarray(rng.uniform(-0.5, 0.5, (4, 16, 7)), jnp.float32),
        "target": jnp.zeros((4, 2), jnp.float32),
    }
    state = init_state({})
    _, metrics = step(state, {}, {}, batch, jax.random.PRNGKey(0))
    # anchor rows of the target are zeroed while the constant model predicts
    # 0.3 there; everything else must match to float tolerance
    anchor_mass = 0.3**2 * 3 / (16 * 7)
    assert float(metrics["loss"]) <= anchor_mass + 1e-4


# ------------------------------------------------------------------------ CLI


def _write_micro_dataset(root, n=6, hw=(32, 48)):
    import cv2

    (root / "front").mkdir(parents=True)
    (root / "waypoints").mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (*hw, 3), np.uint8)
        cv2.imwrite(str(root / "front" / f"{i:06d}.png"), img)
        traj = rng.uniform(-0.5, 0.5, (16, 7))
        lines = ["0.0 -0.4"] + [" ".join(f"{v:.4f}" for v in row) for row in traj]
        (root / "waypoints" / f"{i:06d}.txt").write_text("\n".join(lines) + "\n")


def test_distill_cli_end_to_end(tmp_path):
    """Full CLI pass on a micro dataset: trains two stages off a tiny trained
    checkpoint, writes per-stage .pth + manifest, and the standard planner
    loads a student and plans on its recorded grid."""
    from autonomous_driving_with_diffusion_model_tpu.train import (
        create_train_state,
        save_orbax,
    )

    data_root = tmp_path / "data"
    _write_micro_dataset(data_root)

    cfg = tiny_cfg()
    cfg.TRAIN.IMAGE_HEIGHT, cfg.TRAIN.IMAGE_WIDTH = 32, 48
    rng = np.random.default_rng(6)
    model, variables = _init_model(cfg, rng)
    teacher_path = str(tmp_path / "teacher_orbax")
    save_orbax(teacher_path, create_train_state(model, variables, cfg))

    opts = [
        "MODEL.DIM", "8", "MODEL.PERCEPTION", "tiny",
        "TRAIN.TIME_STEPS", "100", "TRAIN.SAMPLE_STEPS", "100",
        "TRAIN.ROOT", str(data_root), "TRAIN.BATCH_SIZE", "4",
        "TRAIN.IMAGE_HEIGHT", "32", "TRAIN.IMAGE_WIDTH", "48",
    ]
    workdir = tmp_path / "distill"
    proc = subprocess.run(
        [
            sys.executable, "distill.py",
            "--checkpoint", teacher_path,
            "--workdir", str(workdir),
            "--start-steps", "8", "--stages", "2", "--iters", "4",
            "--opts", *opts,
        ],
        capture_output=True, text=True, timeout=600,
        # overrides AFTER the inherited env (an exported ADM_PLATFORM must
        # not undo the CPU pin and drag pytest onto the TPU relay)
        env={**__import__("os").environ, "ADM_PLATFORM": "cpu"},
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    import json

    manifest = json.loads((workdir / "distill.json").read_text())
    assert [s["num_steps"] for s in manifest["stages"]] == [4, 2]
    four = manifest["stages"][0]

    from autonomous_driving_with_diffusion_model_tpu.driving.plan import (
        DiffusionPlanner,
    )

    pcfg = tiny_cfg()
    pcfg.TRAIN.IMAGE_HEIGHT, pcfg.TRAIN.IMAGE_WIDTH = 32, 48
    pcfg.TPU.SAMPLE_TIMESTEPS = four["timesteps"]
    planner = DiffusionPlanner(pcfg, checkpoint=four["checkpoint"])
    traj = planner.plan(np.zeros((32, 48, 3), np.uint8))
    assert traj.shape == (1, 16, 7) and np.all(np.isfinite(traj))


def test_make_optimizer_one_step_stage():
    """decay_steps=1 must degenerate to a single cosine step (warmup 0) —
    with a warmup floor of 1 optax would reject the zero-step cosine
    segment with ValueError."""
    import optax  # noqa: F401

    from autonomous_driving_with_diffusion_model_tpu.train.state import make_optimizer

    for ds in (1, 2):
        opt = make_optimizer(1e-4, warmup_steps=20, decay_steps=ds)
        params = {"w": jnp.zeros(3)}
        st = opt.init(params)
        updates, _ = opt.update({"w": jnp.ones(3)}, st, params)
        assert np.all(np.isfinite(np.asarray(updates["w"])))

"""Regenerate the committed golden .npz packs from the torch reference oracle.

Run from the repo root with the reference mounted at /root/reference and
torch installed:

    python tests/make_goldens.py

Each pack freezes, for one guidance mode, everything needed to verify the
fused sampler WITHOUT torch or the reference checkout:

- inputs: ``init`` (1,16,7), ``target`` (1,2)
- ``img_feature``: the torch ResNet-34 perception output for a fixed image
  (committing the feature instead of the 85 MB encoder weights keeps packs
  ~1 MB; encoder parity itself is covered by tests/test_model_parity.py
  against the live oracle)
- the converted flax U-Net weights minus the perception subtree
  (``param:<path>`` arrays)
- per-step torch model outputs ``step_outputs`` (S,1,16,7) and per-step
  trajectories ``step_trajs`` advanced by the REFERENCE's own scheduler
  classes (scheduler/guidance_ddim_scheduler.py etc., running on the
  diffusers-0.28 stub — see tests/diffusers_stub.py) + anchoring.  Since
  round 4 no repo step function touches the recorded chain: a divergence of
  diffusion/steps.py from diffusers-0.28.0 semantics fails tests/test_goldens.py.
- ``expected``: the final clipped, meter-scaled trajectory

tests/test_goldens.py consumes these; parity tests that need the live oracle
keep their importorskip fallback.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
TESTS = os.path.dirname(os.path.abspath(__file__))
for p in (REPO, REF, TESTS):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # golden regen is CPU-only work

import torch  # noqa: E402

from diffusers_stub import load_reference_schedulers  # noqa: E402

from autonomous_driving_with_diffusion_model_tpu.diffusion import (  # noqa: E402
    leading_timesteps,
)
from autonomous_driving_with_diffusion_model_tpu.models import (  # noqa: E402
    torch_state_dict_to_variables,
)
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg  # noqa: E402
from autonomous_driving_with_diffusion_model_tpu.utils.constants import MAGIC_NUM  # noqa: E402

REF_SCHED = load_reference_schedulers()

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
DIM = 8
STEPS = {"no_guidance": 10, "free_guidance": 5, "classifier_guidance": 2}
FREE_SCALE = 7.5
CLASSIFIER_SCALE = 15.0
T_TRAIN = 100


def make_oracle(family: str, n_steps: int, guidance_cfg=None):
    """Reference scheduler instance, eval-configured like interact.py:81-94
    (squaredcos betas, prediction sample, thresholding=True)."""
    cfg = create_cfg()
    if guidance_cfg is not None:
        cfg.GUIDANCE.USE_COND = "CLASSIFIER_GUIDANCE"
        cfg.GUIDANCE.LOSS_LIST = guidance_cfg["loss_list"]
        cfg.GUIDANCE.CLASSIFIER_SCALE = guidance_cfg["scale"]
    cls = {
        "ddim": REF_SCHED.GuidanceDDIMScheduler,
        "ddpm": REF_SCHED.GuidanceDDPMScheduler,
    }[family]
    oracle = cls(
        cfg,
        num_train_timesteps=T_TRAIN,
        prediction_type="sample",
        beta_schedule="squaredcos_cap_v2",
        thresholding=True,
    )
    oracle.set_timesteps(n_steps)
    return oracle


def build_ref_model(use_cond_name: str, seed: int = 0):
    import modeling.resnet as ref_resnet
    import modeling.temporal as ref_temporal
    from misc.constant import GuidanceType as RefGuidance

    orig = ref_resnet.resnet34
    ref_temporal.resnet34 = lambda pretrained=True, **kw: orig(pretrained=False, **kw)
    try:
        torch.manual_seed(seed)
        return ref_temporal.TemporalMapUnet(
            horizon=16, transition_dim=7, attention=False, dim=DIM,
            dim_mults=(1, 2, 4, 8), use_cond=RefGuidance[use_cond_name.upper()],
        ).eval()
    finally:
        ref_temporal.resnet34 = orig


def flatten_params(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, path))
        else:
            out[path] = np.asarray(v, np.float32)
    return out


def make_pack(mode: str):
    rng = np.random.default_rng(42)
    init = rng.standard_normal((1, 16, 7)).astype(np.float32)
    img = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    target = rng.standard_normal((1, 2)).astype(np.float32)
    img_t = torch.from_numpy(img.transpose(0, 3, 1, 2))

    tmodel = build_ref_model(mode)
    cfg = create_cfg()
    cfg.MODEL.DIM = DIM
    cfg.TRAIN.USE_COND = mode.upper()
    variables = torch_state_dict_to_variables(tmodel.state_dict(), cfg)

    with torch.inference_mode():
        img_feature = tmodel.perception(img_t).numpy()

    steps = STEPS[mode]
    oracle = make_oracle("ddim", steps)
    ts, prev_ts = leading_timesteps(100, steps)

    step_outputs, step_trajs = [], []
    trajs = init.copy()
    trajs[:, 0, :3] = 0.0
    for t in ts:
        if mode == "free_guidance":
            cond_t = torch.from_numpy(
                np.concatenate([target, np.zeros_like(target)], axis=0)
            )
            with torch.inference_mode():
                x2 = torch.from_numpy(np.concatenate([trajs, trajs], axis=0))
                out_c, out_u = tmodel(
                    x2, img_t, torch.tensor([float(t)]), cond=cond_t
                ).chunk(2, dim=0)
                out = (out_u + FREE_SCALE * (out_c - out_u)).numpy()
        else:
            with torch.inference_mode():
                out = tmodel(
                    torch.from_numpy(trajs), img_t, torch.tensor([float(t)])
                ).numpy()
        step_outputs.append(out.copy())
        trajs = (
            oracle.step(torch.from_numpy(out), int(t), torch.from_numpy(trajs))
            .prev_sample.numpy()
            .copy()
        )
        trajs[:, 0, :3] = 0.0
        step_trajs.append(trajs.copy())

    expected = np.clip(trajs, -1.0, 1.0)
    expected[..., :2] *= MAGIC_NUM

    params = {k: v for k, v in flatten_params(variables["params"]).items()
              if not k.startswith("perception")}
    pack = {
        "init": init,
        "target": target,
        "img_feature": img_feature.astype(np.float32),
        "step_outputs": np.stack(step_outputs),
        "step_trajs": np.stack(step_trajs),
        "expected": expected,
        "ts": np.asarray(ts, np.int32),
        "prev_ts": np.asarray(prev_ts, np.int32),
        "meta_dim": np.asarray(DIM),
        "meta_free_scale": np.asarray(FREE_SCALE, np.float32),
        "meta_classifier_scale": np.asarray(CLASSIFIER_SCALE, np.float32),
    }
    for k, v in params.items():
        pack[f"param:{k}"] = v
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"sampling_{mode}.npz")
    np.savez_compressed(path, **pack)
    print(f"{path}: {os.path.getsize(path) / 1e6:.2f} MB, {steps} steps")


def make_classifier_pack():
    """Classifier guidance needs the reference's fixed hidden_dim=64
    TrajPredict, so the U-Net must be dim=64 — too large to commit. Instead
    freeze the recorded per-step (action, time_embed) pairs, the guided
    outputs, and ONLY the state_pred (TrajPredict) weights: the golden test
    re-runs our predict_state network + jax.grad guidance transform + DDIM
    chain against them (U-Net forward parity is covered at dim=8 by the
    other packs; full classifier network parity stays in test_e2e_parity.py
    against the live oracle). The chain is advanced by the reference
    GuidanceDDIMScheduler itself (guidance applied inside step())."""
    rng = np.random.default_rng(42)
    init = rng.standard_normal((1, 16, 7)).astype(np.float32)
    img = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    target = rng.standard_normal((1, 2)).astype(np.float32)
    img_t = torch.from_numpy(img.transpose(0, 3, 1, 2))

    global DIM
    dim_saved, DIM = DIM, 64
    try:
        tmodel = build_ref_model("classifier_guidance")
    finally:
        DIM = dim_saved
    cfg = create_cfg()
    cfg.MODEL.DIM = 64
    cfg.TRAIN.USE_COND = "CLASSIFIER_GUIDANCE"
    variables = torch_state_dict_to_variables(tmodel.state_dict(), cfg)

    steps = STEPS["classifier_guidance"]
    oracle = make_oracle(
        "ddim", steps,
        guidance_cfg={"loss_list": [["TargetGuidance", []]], "scale": CLASSIFIER_SCALE},
    )
    plain_oracle = make_oracle("ddim", steps)  # guidance-free twin for the cross-check
    assert oracle.use_classifier_guidance
    ts, prev_ts = leading_timesteps(100, steps)

    actions, time_embeds, guided_outs, step_trajs = [], [], [], []
    trajs = init.copy()
    trajs[:, 0, :3] = 0.0
    for t, prev_t in zip(ts, prev_ts):
        with torch.no_grad():
            action_ng, time_embed = tmodel(
                torch.from_numpy(trajs), img_t, torch.tensor([float(t)]),
                return_action_and_time_only=True,
            )

        def build_graph():
            # interact.py:145-160 eval graph: detached action re-rooted, state
            # flows grad from it through state_pred, row 0 zeroed
            action = action_ng.detach().clone().requires_grad_()
            state = tmodel.state_pred(action[:, :-1], time_embed.detach())
            state = torch.cat([torch.zeros_like(state[:, :1]), state], dim=1)
            return torch.cat([state, action], dim=-1), action

        # record the guided model output with the oracle's own guidance + variance
        mo_rec, act_rec = build_graph()
        model_std = torch.exp(0.5 * oracle._get_variance(int(t), int(prev_t)))
        guided = oracle.guidance_loss(
            mo_rec, act_rec, torch.from_numpy(target), model_std
        ).detach().numpy()
        # authoritative advance: the reference scheduler step applies the same
        # guidance internally (guidance_ddim_scheduler.py:89-92); fresh graph
        # because autograd.grad freed the first one
        mo_step, act_step = build_graph()
        cur = trajs.copy()
        res = oracle.step(
            mo_step, int(t), torch.from_numpy(cur),
            target=torch.from_numpy(target), action=act_step,
        )
        trajs = res.prev_sample.detach().numpy().copy()
        # cross-check: stepping the plain oracle on the recorded guided output
        # must reproduce the guided oracle's step exactly
        check = plain_oracle.step(
            torch.from_numpy(guided), int(t), torch.from_numpy(cur)
        ).prev_sample.numpy()
        np.testing.assert_allclose(check, trajs, atol=1e-6)
        actions.append(action_ng.detach().numpy().copy())
        time_embeds.append(time_embed.detach().numpy().copy())
        guided_outs.append(guided.copy())
        trajs[:, 0, :3] = 0.0
        step_trajs.append(trajs.copy())

    expected = np.clip(trajs, -1.0, 1.0)
    expected[..., :2] *= MAGIC_NUM

    params = {k: v for k, v in flatten_params(variables["params"]).items()
              if k.startswith("state_pred")}
    pack = {
        "init": init,
        "target": target,
        "step_actions": np.stack(actions),
        "step_time_embeds": np.stack(time_embeds),
        "step_guided": np.stack(guided_outs),
        "step_trajs": np.stack(step_trajs),
        "expected": expected,
        "ts": np.asarray(ts, np.int32),
        "prev_ts": np.asarray(prev_ts, np.int32),
        "meta_dim": np.asarray(64),
        "meta_classifier_scale": np.asarray(CLASSIFIER_SCALE, np.float32),
    }
    for k, v in params.items():
        pack[f"param:{k}"] = v
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, "sampling_classifier_guidance.npz")
    np.savez_compressed(path, **pack)
    print(f"{path}: {os.path.getsize(path) / 1e6:.2f} MB, {steps} steps")


def make_ddpm_pack():
    """DDPM sampler golden (the training-eval path, train.py:53-103 uses the
    DDPM scheduler): per-step oracle outputs + the injected noise; chain
    advanced by the reference GuidanceDDPMScheduler with the noise sequence
    fed through its randn_tensor."""
    import scheduler.guidance_ddpm_scheduler as gddpm_mod

    rng = np.random.default_rng(43)
    init = rng.standard_normal((1, 16, 7)).astype(np.float32)
    img = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    img_t = torch.from_numpy(img.transpose(0, 3, 1, 2))

    tmodel = build_ref_model("no_guidance")
    cfg = create_cfg()
    cfg.MODEL.DIM = DIM
    variables = torch_state_dict_to_variables(tmodel.state_dict(), cfg)
    with torch.inference_mode():
        img_feature = tmodel.perception(img_t).numpy()

    steps = 10
    oracle = make_oracle("ddpm", steps)
    ts, prev_ts = leading_timesteps(100, steps)
    noise_seq = rng.standard_normal((steps, 1, 16, 7)).astype(np.float32)

    # feed the recorded noise through the oracle's randn_tensor (only drawn
    # for t > 0, guidance_ddpm_scheduler.py:155-162)
    queue = [noise_seq[i] for i, t in enumerate(ts) if t > 0]
    orig_randn = gddpm_mod.randn_tensor
    gddpm_mod.randn_tensor = lambda *a, **k: torch.from_numpy(queue.pop(0))

    step_outputs, step_trajs = [], []
    trajs = init.copy()
    trajs[:, 0, :3] = 0.0
    try:
        for t in ts:
            with torch.inference_mode():
                out = tmodel(
                    torch.from_numpy(trajs), img_t, torch.tensor([float(t)])
                ).numpy()
            step_outputs.append(out.copy())
            trajs = (
                oracle.step(torch.from_numpy(out), int(t), torch.from_numpy(trajs))
                .prev_sample.numpy()
                .copy()
            )
            trajs[:, 0, :3] = 0.0
            step_trajs.append(trajs.copy())
    finally:
        gddpm_mod.randn_tensor = orig_randn
    assert not queue

    expected = np.clip(trajs, -1.0, 1.0)
    expected[..., :2] *= MAGIC_NUM
    params = {k: v for k, v in flatten_params(variables["params"]).items()
              if not k.startswith("perception")}
    pack = {
        "init": init, "img_feature": img_feature.astype(np.float32),
        "noise_seq": noise_seq,
        "step_outputs": np.stack(step_outputs), "step_trajs": np.stack(step_trajs),
        "expected": expected, "ts": np.asarray(ts, np.int32),
        "prev_ts": np.asarray(prev_ts, np.int32), "meta_dim": np.asarray(DIM),
        "meta_scheduler": np.asarray("ddpm"),
    }
    for k, v in params.items():
        pack[f"param:{k}"] = v
    path = os.path.join(GOLDEN_DIR, "sampling_ddpm.npz")
    np.savez_compressed(path, **pack)
    print(f"{path}: {os.path.getsize(path) / 1e6:.2f} MB, {steps} steps")


def make_inpaint_pack():
    """RePaint DDIM inpainting golden incl. the reference's scalar-variance
    quirk (inpainting_ddim_scheduler.py:109-128); chain advanced by the
    reference InpaintingDDIMScheduler with injected variance_noise."""
    rng = np.random.default_rng(44)
    init = rng.standard_normal((1, 16, 7)).astype(np.float32)
    img = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    img_t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    target_traj = (rng.standard_normal((1, 16, 7)) * 0.3).astype(np.float32)
    target_mask = np.zeros((1, 16, 7), np.float32)
    target_mask[:, :4, :2] = 1.0  # pin the first 4 waypoints' xy

    tmodel = build_ref_model("no_guidance")
    cfg = create_cfg()
    cfg.MODEL.DIM = DIM
    variables = torch_state_dict_to_variables(tmodel.state_dict(), cfg)
    with torch.inference_mode():
        img_feature = tmodel.perception(img_t).numpy()

    steps = 8
    oracle = REF_SCHED.InpaintingDDIMScheduler(
        num_train_timesteps=T_TRAIN,
        prediction_type="sample",
        beta_schedule="squaredcos_cap_v2",
        thresholding=True,
    )
    oracle.set_timesteps(steps)
    ts, prev_ts = leading_timesteps(100, steps)
    noise_seq = rng.standard_normal((steps, 1, 16, 7)).astype(np.float32)

    step_outputs, step_trajs = [], []
    trajs = init.copy()
    trajs[:, 0, :3] = 0.0
    for i, t in enumerate(ts):
        with torch.inference_mode():
            out = tmodel(torch.from_numpy(trajs), img_t, torch.tensor([float(t)])).numpy()
        step_outputs.append(out.copy())
        trajs = (
            oracle.step(
                torch.from_numpy(out), int(t), torch.from_numpy(trajs),
                variance_noise=torch.from_numpy(noise_seq[i]),
                target_traj=torch.from_numpy(target_traj),
                target_mask=torch.from_numpy(target_mask),
            )
            .prev_sample.numpy()
            .copy()
        )
        trajs[:, 0, :3] = 0.0
        step_trajs.append(trajs.copy())

    expected = np.clip(trajs, -1.0, 1.0)
    expected[..., :2] *= MAGIC_NUM
    params = {k: v for k, v in flatten_params(variables["params"]).items()
              if not k.startswith("perception")}
    pack = {
        "init": init, "img_feature": img_feature.astype(np.float32),
        "noise_seq": noise_seq, "target_traj": target_traj, "target_mask": target_mask,
        "step_outputs": np.stack(step_outputs), "step_trajs": np.stack(step_trajs),
        "expected": expected, "ts": np.asarray(ts, np.int32),
        "prev_ts": np.asarray(prev_ts, np.int32), "meta_dim": np.asarray(DIM),
        "meta_scheduler": np.asarray("inpaint_ddim"),
    }
    for k, v in params.items():
        pack[f"param:{k}"] = v
    path = os.path.join(GOLDEN_DIR, "sampling_inpaint_ddim.npz")
    np.savez_compressed(path, **pack)
    print(f"{path}: {os.path.getsize(path) / 1e6:.2f} MB, {steps} steps")


if __name__ == "__main__":
    for mode in ("no_guidance", "free_guidance"):
        make_pack(mode)
    make_classifier_pack()
    make_ddpm_pack()
    make_inpaint_pack()

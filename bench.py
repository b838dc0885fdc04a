"""Benchmark: trajectory-sampling performance on the local accelerator.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline", ...extras}``.

Headline: p50 single-plan latency at the flagship closed-loop operating point
(BASELINE.json: "p50 single-plan latency under 30 ms for closed-loop
control"), measured for the full fused plan in the default deployment dtype
(bf16 encoder/U-Net compute, fp32 trajectory math): ResNet-34 perception on a
900x256 frame (hoisted, once per plan) + DDIM-50 denoising of a 16x7
trajectory. ``vs_baseline`` = 30 ms / measured p50 (>1 beats the bar).

Extras:
- fp32 batch-1 latency (round-1 comparable) and the scan-unroll pick;
- throughput sweep (batch 1/8/64/256, traj/s/chip) in fp32 and bf16;
- strict-reference execution (perception re-run inside every denoise step,
  exactly the torch reference's schedule — temporal.py:203) and the
  hoisted-vs-strict speedup ratio: the apples-to-apples design win;
- closed-loop CFG DDIM-10 plan latency (free_guidance operating point);
- classifier-guidance DDIM-2 plan latency, bf16 + fp32 (the reference's best
  published operating point, README.md:233-245: per-step jax.grad through the
  state head in-scan — reference control/guidance.py:35-59);
- inpainting DDIM-50 plan latency (RePaint blend, scheduler/inpainting_*.py);
- distilled 4-step-grid plan latency (``distill4_bf16`` in-loop: the
  deployment operating point of a ``distill.py`` student — quality side in
  DISTILL.json);
- DPM-Solver++(2M) 10-step plan latency (``dpm10_bf16``: few-step sampling
  with NO distillation training — diffusion/dpm.py, the reference's dead
  "dpm" branch implemented);
- train-step sweep: samples/s/chip fwd+bwd+EMA at batch 8/64/128/256 (+256
  with TPU.REMAT), fp32 and bf16-compute (reference envelope:
  train.py:221-325), plus useful-FLOP accounting -> ``train_mfu_pct_useful``
  at the best bf16 operating point (cost_analysis of the non-remat graph);
- machine-checked FLOP accounting (XLA cost_analysis) -> gflop_per_plan and
  mfu_pct at the bf16 batch-256 operating point.

Latency basis: the headline and every ``p50_plan_latency_ms_inloop`` entry
are TRUE device time — N plans inside ONE jitted program (single dispatch,
serialized by data dependency, loop-invariant inputs perturbed so XLA cannot
hoist them; see ``inloop_ms``). Per-call chained figures remain in the extras
as an UPPER bound: on this tunneled dev setup each call of a NON-trivial
program carries ~2-4.5 ms of relay-side overhead (measured chained-vs-inloop
gap; a trivial program chains at ``dispatch_floor_ms`` ~0.2 ms, so the
overhead is program-dependent, not a constant floor).
``host_roundtrip_p50_ms`` is the per-call host-in-the-loop figure here
(~25-30 ms relay RPC); on a co-located TPU host closed-loop latency is
device time + O(0.1 ms) dispatch.

``closed_loop_step_ms`` is the DEPLOYMENT answer to the 30 ms budget: the
real InteractAgent in pipelined mode (obs ingest -> control from the
previous frame's plan -> this frame's whole plan pipeline on a one-deep
worker thread) driven at the reference's 10 fps and 20 Hz cadences. The
frame upload, device compute, and result download all overlap the
inter-tick gap, so the measured host step is control math + bookkeeping —
even on this tunneled rig where a blocking in-step plan would cost ~60-90 ms
(bandwidth-bound frame upload + relay RPC).
"""

import json
import sys
import time

import numpy as np


def _percentile(samples, q):
    return float(np.percentile(np.asarray(samples), q))


def _log(msg):
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.time()


def main():
    import os

    import jax

    # ADM_BENCH_TINY=1: shrink the model/image and run on CPU — a fast smoke
    # of the full bench flow (same code paths, meaningless numbers).
    tiny = os.environ.get("ADM_BENCH_TINY") == "1"
    if tiny:
        jax.config.update("jax_platforms", "cpu")

    # persistent compile cache: repeat bench runs skip the (minutes-long on the
    # tunneled dev setup) XLA compiles when the programs are unchanged
    jax.config.update("jax_compilation_cache_dir", "/tmp/adm_tpu_jax_cache_dev")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from autonomous_driving_with_diffusion_model_tpu.diffusion import (
        make_schedule,
        sampler_from_cfg,
    )
    from autonomous_driving_with_diffusion_model_tpu.models import build_model
    from autonomous_driving_with_diffusion_model_tpu.utils.config import (
        create_cfg as _create_cfg,
        merge_possible_with_base,
    )

    def create_cfg():
        cfg = _create_cfg()
        if tiny:
            cfg.MODEL.DIM = 8
            cfg.MODEL.PERCEPTION = "tiny"
        return cfg

    H, W = (32, 48) if tiny else (256, 900)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    init1 = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)

    def build(cfg):
        model = build_model(cfg)
        variables = jax.jit(
            lambda k: model.init(k, init1, img=img, time=jnp.asarray([1.0], jnp.float32))
        )(jax.random.PRNGKey(0))
        schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
        return model, variables, schedule

    def time_fn(fn, *args, iters=30, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            samples.append((time.perf_counter() - t0) * 1000.0)
        return samples

    def chained_ms(fn, variables, init, *args, iters=40, repeats=3):
        """Per-call device time with host<->device roundtrips amortized.

        Each call consumes a value derived from the previous output, forcing
        sequential device execution; only the last result is fetched. On the
        tunneled dev setup a per-call block_until_ready measures ~25 ms of
        relay RPC latency — this measures what the chip actually spends.

        The tunnel chip is shared: back-to-back trials of the same program
        vary up to ~2x under external load, so take the min of ``repeats``
        trials (the standard interference-robust latency estimator).
        """
        out = fn(variables, init, *args)
        for _ in range(3):  # warm the glue ops (slice/mul/add) too
            out = fn(variables, init + 0.0 * out[0, 0, 0], *args)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(variables, init + 0.0 * out[0, 0, 0], *args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters * 1000.0)
        return best

    def inloop_ms(call3, variables, init, img_, n=32, iters=4, repeats=3):
        """TRUE device per-plan time: ``n`` plans inside ONE jitted program
        (single dispatch), serialized by a data dependency; the image is
        perturbed per iteration (1e-12 * carry) so XLA cannot hoist the
        perception encode out of the repeat loop. This removes the relay's
        per-call overhead (~2-4.5 ms for non-trivial programs on this
        tunneled setup), which inflates ``chained_ms`` for short programs —
        chained numbers are an UPPER bound on device time; these are the
        honest ones.

        Residual bias: each OUTER call's relay overhead is divided by ``n``,
        so figures still include ~overhead/n (~0.1-0.6 ms at n=32..8) — a
        small upper-bound slack, kept comparable by using the same ``n`` for
        points quoted against each other.

        ``call3(v, x, im) -> trajs`` with any other operands baked in."""

        def wrapper(v, x, im):
            def body(c, _):
                out = call3(v, c, im + 1e-12 * c[0, 0, 0])
                return x + 1e-12 * out[0, 0, 0], None
            c, _ = jax.lax.scan(body, x, None, length=n)
            return c

        w = jax.jit(wrapper)
        return chained_ms(w, variables, init, img_, iters=iters, repeats=repeats) / n

    # per-dispatch floor of this setup: a near-empty program, chained. The
    # measured ~0.2 ms shows the chained-vs-inloop gap on real programs
    # (~2-4.5 ms) is program-dependent relay overhead, not a constant floor
    tiny_add = jax.jit(lambda v, x: x + 1.0)
    dispatch_floor_ms = chained_ms(tiny_add, None, init1, iters=60, repeats=3)
    _log(f"per-dispatch floor: {dispatch_floor_ms:.3f} ms")

    # ---- fp32 DDIM-50 model (round-1 comparable) + scan-unroll tuning
    _log("building fp32 DDIM-50 model...")
    cfg = create_cfg()
    cfg.EVAL.SAMPLE_STEPS = 50
    model, variables, schedule = build(cfg)

    unroll_ms = {}
    for unroll in (1, 5):
        cfg.TPU.SCAN_UNROLL = unroll
        sample_u = jax.jit(sampler_from_cfg(model, schedule, cfg))
        _log(f"compiling fp32 batch-1 plan (unroll={unroll})...")
        unroll_ms[unroll] = chained_ms(sample_u, variables, init1, img)
        _log(f"fp32 batch-1 unroll={unroll}: {unroll_ms[unroll]:.2f} ms")
    best_unroll = min(unroll_ms, key=unroll_ms.get)
    p50_fp32 = unroll_ms[best_unroll]
    cfg.TPU.SCAN_UNROLL = best_unroll
    sample = jax.jit(sampler_from_cfg(model, schedule, cfg))
    host_lat = time_fn(sample, variables, init1, img, iters=10)
    host_p50 = _percentile(host_lat, 50)

    # ---- throughput sweep, fp32
    def sweep(sample_fn, variables, tag):
        tp = {}
        for B in (1, 8, 64, 256, 512):
            initB = jnp.asarray(rng.standard_normal((B, 16, 7)), jnp.float32)
            imgB = jnp.tile(img, (B, 1, 1, 1))
            _log(f"compiling {tag} batch-{B}...")
            try:
                msB = chained_ms(sample_fn, variables, initB, imgB, iters=20)
            except Exception as exc:  # encoder activations OOM at the top end
                _log(f"{tag} batch {B}: skipped ({type(exc).__name__})")
                break
            tp[B] = B / (msB / 1000.0)
            _log(f"{tag} batch {B}: {msB:.2f} ms, {tp[B]:.0f} traj/s")
        return tp

    tp_fp32 = sweep(sample, variables, "fp32")

    # ---- bf16 default deployment dtype (encoder + U-Net compute in bf16;
    # trajectories and scheduler outputs stay fp32 — see diffusion/sampler.py)
    _log("building bf16 DDIM-50 model...")
    cfg16 = create_cfg()
    cfg16.EVAL.SAMPLE_STEPS = 50
    cfg16.TPU.COMPUTE_DTYPE = "bfloat16"
    model16 = build_model(cfg16)
    # the headline: measure BOTH unroll variants with the single-dispatch
    # in-loop method (accurate under the relay's per-dispatch floor) and
    # keep the better one
    p50_bf16 = np.inf
    sample16 = None
    for unroll in (1, 5):
        cfg16.TPU.SCAN_UNROLL = unroll
        sample_u16 = jax.jit(sampler_from_cfg(model16, schedule, cfg16))
        _log(f"compiling bf16 batch-1 in-loop plan (unroll={unroll})...")
        try:
            ms = inloop_ms(
                lambda v, x, im, s=sample_u16: s(v, x, image=im),
                variables, init1, img, n=16,
            )
        except Exception as exc:  # degrade to the chained upper bound
            _log(f"in-loop unroll={unroll} failed ({type(exc).__name__}); "
                 "falling back to chained")
            ms = chained_ms(sample_u16, variables, init1, img)
        _log(f"bf16 batch-1 unroll={unroll}: {ms:.3f} ms (device)")
        if ms < p50_bf16:
            p50_bf16 = ms
            sample16 = sample_u16
    tp_bf16 = sweep(sample16, variables, "bf16")

    # ---- strict-reference execution: perception inside every denoise step
    # (the torch reference's schedule, temporal.py:203)
    _log("compiling strict-mode (perception-per-step) fp32 plan...")
    cfg_strict = create_cfg()
    cfg_strict.EVAL.SAMPLE_STEPS = 50
    cfg_strict.TPU.HOIST_PERCEPTION = False
    sample_strict = jax.jit(sampler_from_cfg(model, schedule, cfg_strict))
    p50_strict = chained_ms(sample_strict, variables, init1, img, iters=10)
    _log(f"strict fp32 batch-1: {p50_strict:.2f} ms "
         f"(hoisted speedup {p50_strict / p50_fp32:.1f}x)")

    # ---- closed-loop flagship: CFG DDIM-10 (free_guidance operating point)
    _log("building CFG DDIM-10 model (bf16)...")
    cfg_cfgmode = create_cfg()
    merge_possible_with_base(cfg_cfgmode, "configs/guidance/free_guidance.yaml")
    cfg_cfgmode.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg_cfgmode.TPU.SCAN_UNROLL = best_unroll
    model_f, variables_f, schedule_f = build(cfg_cfgmode)
    sample_f = jax.jit(sampler_from_cfg(model_f, schedule_f, cfg_cfgmode))
    target = jnp.asarray(rng.standard_normal((1, 2)), jnp.float32)

    def plan_cfg(v, x, im, tgt):
        return sample_f(v, x, image=im, target=tgt)

    _log("compiling CFG DDIM-10 plan...")
    p50_cfg10 = chained_ms(plan_cfg, variables_f, init1, img, target)
    _log(f"CFG-10 bf16 device = {p50_cfg10:.2f} ms")

    # multi-hypothesis closed-loop plan: best-of-8 trajectories per frame in
    # the same fused program (perception encoded once, scan at batch 8)
    init8 = jnp.asarray(rng.standard_normal((8, 16, 7)), jnp.float32)
    target8 = jnp.tile(target, (8, 1))
    _log("compiling CFG DDIM-10 K=8 multi-hypothesis plan...")
    # K=8 vs K=1 differ by ~15%; use extra trials so shared-chip interference
    # doesn't invert the ordering (round-2 weak finding).
    p50_cfg10_k8 = chained_ms(plan_cfg, variables_f, init8, img, target8, repeats=6)
    p50_cfg10 = min(p50_cfg10, chained_ms(plan_cfg, variables_f, init1, img, target, repeats=3))
    _log(f"CFG-10 bf16 K=8 device = {p50_cfg10_k8:.2f} ms "
         f"({p50_cfg10_k8 / p50_cfg10:.2f}x single for 8x plans)")

    # ---- classifier guidance DDIM-2: the reference's best published result
    # (DS 14.89, README.md:233-245) — 2 denoise steps, each with jax.grad of
    # the TargetGuidance loss through the state head in-scan (reference
    # control/guidance.py:35-59, interact.py:145-160).
    _log("building classifier-guidance DDIM-2 model...")
    cfg_cls = create_cfg()
    merge_possible_with_base(cfg_cls, "configs/guidance/classifier_guidance.yaml")
    cfg_cls.TPU.SCAN_UNROLL = best_unroll
    if tiny:
        # the classifier state head requires MODEL.DIM == 64 (the reference
        # hardcodes TrajPredict hidden_dim=64, temporal.py:187 — time_embed
        # addition only type-checks at DIM 64); keep the tiny perception only
        cfg_cls.MODEL.DIM = 64
    model_c32, variables_c, schedule_c = build(cfg_cls)
    sample_c32 = jax.jit(sampler_from_cfg(model_c32, schedule_c, cfg_cls))
    cfg_cls16 = cfg_cls.clone()
    cfg_cls16.TPU.COMPUTE_DTYPE = "bfloat16"
    model_c16 = build_model(cfg_cls16)
    sample_c16 = jax.jit(sampler_from_cfg(model_c16, schedule_c, cfg_cls16))

    def plan_cls32(v, x, im, tgt):
        return sample_c32(v, x, image=im, target=tgt)

    def plan_cls16(v, x, im, tgt):
        return sample_c16(v, x, image=im, target=tgt)

    _log("compiling classifier DDIM-2 fp32 plan...")
    p50_cls2_fp32 = chained_ms(plan_cls32, variables_c, init1, img, target)
    _log(f"classifier-2 fp32 device = {p50_cls2_fp32:.2f} ms")
    _log("compiling classifier DDIM-2 bf16 plan...")
    p50_cls2_bf16 = chained_ms(plan_cls16, variables_c, init1, img, target)
    _log(f"classifier-2 bf16 device = {p50_cls2_bf16:.2f} ms")

    # ---- inpainting DDIM-50 (RePaint blend — scheduler/inpainting_*.py)
    from autonomous_driving_with_diffusion_model_tpu.diffusion.sampler import (
        SamplerConfig,
        make_sampler,
    )
    from autonomous_driving_with_diffusion_model_tpu.diffusion.steps import StepConfig

    _log("building inpainting DDIM-50 sampler (bf16)...")
    inpaint_cfg = SamplerConfig(
        scheduler="ddim",
        num_steps=50,
        step=StepConfig(prediction_type="sample", clip_sample=True, thresholding=True),
        inpainting=True,
        unroll=best_unroll,
    )
    sample_inp = jax.jit(make_sampler(model16, schedule, inpaint_cfg))
    target_traj = jnp.zeros((1, 16, 7)).at[:, :4, :2].set(0.1)
    target_mask = jnp.zeros((1, 16, 7)).at[:, :4, :2].set(1.0)

    def plan_inp(v, x, im, tt, tm):
        return sample_inp(v, x, image=im, rng=jax.random.PRNGKey(0),
                          target_traj=tt, target_mask=tm)

    _log("compiling inpainting DDIM-50 plan...")
    p50_inp50 = chained_ms(plan_inp, variables, init1, img, target_traj, target_mask)
    _log(f"inpaint-50 bf16 device = {p50_inp50:.2f} ms")

    # ---- distilled 4-step student grid (diffusion/distill.py halving chain
    # 50 -> 25 -> 13 -> 7 -> 4) through the bone-stock sampler: the
    # deployment latency of a distilled planner. Latency depends only on the
    # program shape, not the weights; the quality side is DISTILL.json.
    sample_d4 = sample_cfg_d4 = None
    try:
        from autonomous_driving_with_diffusion_model_tpu.diffusion.distill import (
            grid_chain,
        )

        grids = grid_chain(schedule.num_train_timesteps, 50, 6)
        four = next(g for g in grids if len(g.ts) == 4)
        cfg_d4 = create_cfg()
        cfg_d4.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg_d4.TPU.SAMPLE_TIMESTEPS = [int(t) for t in four.ts]
        sample_d4 = jax.jit(sampler_from_cfg(model16, schedule, cfg_d4))
        # CFG student with the guidance scale BAKED IN (diffusion/distill.py):
        # deployed at FREE_SCALE=1.0 the sampler statically skips the uncond
        # pass — 4 single forwards + one encode, the fastest guided plan
        cfg_cd4 = create_cfg()
        merge_possible_with_base(cfg_cd4, "configs/guidance/free_guidance.yaml")
        cfg_cd4.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg_cd4.TPU.SAMPLE_TIMESTEPS = [int(t) for t in four.ts]
        cfg_cd4.GUIDANCE.FREE_SCALE = 1.0
        sample_cfg_d4 = jax.jit(sampler_from_cfg(model_f, schedule_f, cfg_cd4))
    except Exception as exc:
        _log(f"distill4 sampler unavailable: {type(exc).__name__}: {exc}")

    # ---- DPM-Solver++(2M) 10-step plan (diffusion/dpm.py — the reference's
    # dead "dpm" branch, live): few-step deployment WITHOUT distillation
    # training; latency depends only on the program shape (10 U-Net forwards
    # + 1 encode + elementwise solver updates)
    sample_dpm10 = None
    try:
        cfg_dpm = create_cfg()
        cfg_dpm.EVAL.SCHEDULER = "dpm"
        cfg_dpm.EVAL.SAMPLE_STEPS = 10
        cfg_dpm.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg_dpm.TPU.SCAN_UNROLL = best_unroll
        sample_dpm10 = jax.jit(sampler_from_cfg(model16, schedule, cfg_dpm))
    except Exception as exc:
        _log(f"dpm10 sampler unavailable: {type(exc).__name__}: {exc}")

    # ---- machine-checked FLOP accounting + MFU at the bf16 batch-256
    # operating point (fixes the round-2 "~4.2 GFLOP" DESIGN.md error).
    # XLA's cost_analysis counts a lax.scan body ONCE regardless of trip
    # count, so the plan's FLOPs are composed: encoder + num_steps * one
    # denoiser forward, each cost-analyzed as its own program.
    from autonomous_driving_with_diffusion_model_tpu.models.temporal_unet import (
        TemporalMapUnet,
    )

    def _flops(lowered) -> float:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))

    gflop_per_plan = mfu_pct = achieved_tflops = peak_tflops = None
    gflop_encoder = gflop_unet_step = ref_gflop_per_plan = None
    h100_ceiling_traj_s = x_vs_h100_ceiling = None
    try:
        Bm = 256
        initB = jnp.asarray(rng.standard_normal((Bm, 16, 7)), jnp.float32)
        imgB = jnp.tile(img, (Bm, 1, 1, 1))
        tB = jnp.full((Bm,), 1.0, jnp.float32)

        enc_fn = jax.jit(
            lambda v, im: model16.apply(
                v, im, train=False, method=TemporalMapUnet.encode_image
            )
        )
        feat = jax.eval_shape(enc_fn, variables, imgB)
        featB = jnp.zeros(feat.shape, feat.dtype)
        unet_fn = jax.jit(lambda v, x, t, f: model16.apply(v, x, time=t, img_feature=f))
        enc_flops = _flops(enc_fn.lower(variables, imgB))
        unet_flops = _flops(unet_fn.lower(variables, initB, tB, featB))
        flops = enc_flops + 50 * unet_flops
        gflop_per_plan = flops / Bm / 1e9
        gflop_encoder = enc_flops / Bm / 1e9
        gflop_unet_step = unet_flops / Bm / 1e9
        _log(f"FLOPs/plan: encoder {gflop_encoder:.2f} + 50 x unet "
             f"{gflop_unet_step:.3f} = {gflop_per_plan:.2f} GFLOP")
        # The reference re-runs the ResNet-34 encoder inside EVERY denoise
        # step (/root/reference/modeling/temporal.py:203 `self.perception(img)`
        # in forward, called once per scheduler step), so its per-plan FLOPs
        # at DDIM-50 are 50 x (encoder + unet). An H100 SXM (989 TFLOP/s
        # dense bf16 peak) running the reference implementation therefore has
        # an absolute throughput CEILING of 989400 / ref_gflop traj/s even at
        # 100% MFU — the analytic anchor for BASELINE.json's ">=5x H100"
        # target (no GPU exists in this environment to measure it directly).
        ref_gflop_per_plan = 50.0 * (enc_flops + unet_flops) / Bm / 1e9
        h100_ceiling_traj_s = 989.4e3 / ref_gflop_per_plan
        tp_b256 = tp_bf16.get(Bm)
        if tp_b256:
            x_vs_h100_ceiling = tp_b256 / h100_ceiling_traj_s
            _log(
                f"reference impl: {ref_gflop_per_plan:.0f} GFLOP/plan -> H100 "
                f"ceiling {h100_ceiling_traj_s:.0f} traj/s; this chip "
                f"{tp_b256:.0f} = {x_vs_h100_ceiling:.1f}x the ceiling"
            )
        tp = tp_bf16.get(Bm)
        if tp:
            achieved_tflops = tp * gflop_per_plan / 1e3
            kind = jax.devices()[0].device_kind.lower()
            peaks = {  # dense bf16 TFLOP/s per chip (public specs)
                "v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0,
                "v6 lite": 918.0, "v6e": 918.0, "v4": 275.0, "v3": 123.0,
            }
            for key, pk in peaks.items():
                if key in kind:
                    peak_tflops = pk
                    break
            if peak_tflops:
                mfu_pct = 100.0 * achieved_tflops / peak_tflops
        _log(f"achieved {achieved_tflops and round(achieved_tflops, 1)} TFLOP/s, "
             f"MFU {mfu_pct and round(mfu_pct, 1)}% of {peak_tflops} peak")
    except Exception as exc:  # cost_analysis availability varies by backend
        _log(f"cost_analysis unavailable: {type(exc).__name__}: {exc}")

    # ---- in-loop (single-dispatch) device latencies for every closed-loop
    # operating point: the honest per-plan device times (see inloop_ms)
    inloop = {"ddim50_bf16": p50_bf16}  # measured in-loop at the unroll pick
    inloop_points = [
        ("ddim50_fp32", lambda v, x, im: sample(v, x, image=im), init1, 16),
        # strict mode re-encodes inside every denoise step; in-loop this
        # quantifies how much of that XLA's loop-invariant code motion
        # recovers on its own (DESIGN.md decision 3). Same n as the hoisted
        # fp32 point so the quoted ratio carries the same overhead/n slack
        ("strict_ddim50_fp32",
         lambda v, x, im: sample_strict(v, x, image=im), init1, 16),
        ("cfg_ddim10_bf16",
         lambda v, x, im: sample_f(v, x, image=im, target=target), init1, 32),
        ("cfg_ddim10_bf16_k8",
         lambda v, x, im: sample_f(v, x, image=im, target=target8), init8, 32),
        ("classifier_ddim2_bf16",
         lambda v, x, im: sample_c16(v, x, image=im, target=target), init1, 32),
        ("inpaint_ddim50_bf16",
         lambda v, x, im: sample_inp(v, x, image=im, rng=jax.random.PRNGKey(0),
                                     target_traj=target_traj,
                                     target_mask=target_mask), init1, 16),
    ]
    if sample_d4 is not None:
        inloop_points.append(
            ("distill4_bf16",
             lambda v, x, im: sample_d4(v, x, image=im), init1, 32)
        )
    if sample_cfg_d4 is not None:
        inloop_points.append(
            ("cfg_distill4_bf16",
             lambda v, x, im: sample_cfg_d4(v, x, image=im, target=target),
             init1, 32)
        )
    if sample_dpm10 is not None:
        inloop_points.append(
            ("dpm10_bf16",
             lambda v, x, im: sample_dpm10(v, x, image=im), init1, 32)
        )
    for tag, call3, init_, n in inloop_points:
        vset = variables_f if tag.startswith("cfg") else (
            variables_c if tag.startswith("classifier") else variables
        )
        try:
            _log(f"compiling in-loop x{n} {tag}...")
            ms = inloop_ms(call3, vset, init_, img, n=n)
            inloop[tag] = ms
            _log(f"in-loop {tag}: {ms:.3f} ms/plan (device)")
        except Exception as exc:
            _log(f"in-loop {tag} failed: {type(exc).__name__}: {exc}")

    p50 = p50_bf16  # in-loop device time at the best unroll

    # per-U-Net-step latency at batch 1 (sequencing-bound — DESIGN.md):
    # (in-loop plan - in-loop encoder) / 50 steps, both single-dispatch
    us_per_step_b1 = enc_b1_ms = None
    try:
        def enc_call(v, x, im):
            feat = model16.apply(
                v, im, train=False, method=TemporalMapUnet.encode_image
            )
            return feat[:, :, None]  # 3-D for the carry chain

        _log("compiling in-loop x64 encoder (batch 1)...")
        enc_b1_ms = inloop_ms(enc_call, variables, init1, img, n=64)
        plan_ms = inloop.get("ddim50_bf16", p50_bf16)
        if enc_b1_ms < plan_ms:
            us_per_step_b1 = (plan_ms - enc_b1_ms) / 50.0 * 1000.0
            _log(f"encoder {enc_b1_ms:.3f} ms -> {us_per_step_b1:.0f} us per denoise step")
        else:  # interference swamped the split this run
            _log(f"encoder measured {enc_b1_ms:.3f} ms >= plan; split skipped")
    except Exception as exc:
        _log(f"per-step split unavailable: {type(exc).__name__}")

    # ---- closed-loop host-in-the-loop step at sim cadence: the REAL
    # InteractAgent in pipelined mode (control from the PREVIOUS frame's
    # plan; this frame's upload + plan + download run on the agent's
    # one-deep worker thread), driven at the reference's two deployment
    # cadences — 10 fps interact loop (/root/reference/interact.py:274-317)
    # and the 20 Hz leaderboard tick (/root/reference/leaderboard/.../
    # scenario_manager.py:118-183). The whole plan pipeline overlaps the
    # inter-tick gap, so the host-visible step cost is control math +
    # bookkeeping — the deployment answer to the 30 ms budget that
    # host_roundtrip_p50_ms (a blocking per-call RPC) cannot give. If the
    # worker's pipeline exceeds the tick period (possible at 20 Hz on this
    # bandwidth-limited tunneled rig: upload+RPC ~60-90 ms), .result()
    # blocks for the remainder and the p99 shows it honestly.
    closed_loop_ms = {}
    try:
        from autonomous_driving_with_diffusion_model_tpu.driving.interact_agent import (
            InteractAgent,
        )
        from autonomous_driving_with_diffusion_model_tpu.driving.plan import (
            DiffusionPlanner,
        )

        cfg_cl = create_cfg()
        merge_possible_with_base(cfg_cl, "configs/guidance/free_guidance.yaml")
        cfg_cl.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg_cl.TPU.SCAN_UNROLL = best_unroll
        if tiny:
            cfg_cl.MODEL.DIM = 8
            cfg_cl.MODEL.PERCEPTION = "tiny"
        planner_cl = DiffusionPlanner(cfg_cl)
        agent_cl = InteractAgent(cfg_cl, env=None, planner=planner_cl, pipelined=True)
        n_frames = 8
        frames = np.asarray(
            rng.integers(0, 256, size=(n_frames, H, W, 3)), np.uint8
        )

        def mk_state(i):
            return {
                "camera": frames[i % n_frames][None],
                "next_waypoint": np.array([4.0, 4.0], np.float32),
                "cur_waypoint": np.zeros((1, 2), np.float32),
                "compass": np.zeros((1, 1), np.float32),
                "state": np.zeros((1, 2), np.float32),
            }

        _log("compiling closed-loop pipelined agent (CFG DDIM-10 bf16)...")
        agent_cl.warmup(mk_state(0))
        n_ticks = 8 if tiny else 80
        for hz in (10, 20):
            period = 1.0 / hz
            agent_cl._pending_plan = None
            ticks = []
            next_tick = time.perf_counter()
            for i in range(n_ticks):
                t0 = time.perf_counter()
                agent_cl.compute_control(mk_state(i))
                ticks.append((time.perf_counter() - t0) * 1000.0)
                next_tick += period
                time.sleep(max(0.0, next_tick - time.perf_counter()))
            ticks = ticks[3:]  # the first fetches ride a cold pipeline
            closed_loop_ms[f"{hz}hz"] = {
                "p50": round(_percentile(ticks, 50), 3),
                "p99": round(_percentile(ticks, 99), 3),
            }
            _log(
                f"closed-loop pipelined step @{hz} Hz: "
                f"p50 {closed_loop_ms[f'{hz}hz']['p50']:.2f} ms, "
                f"p99 {closed_loop_ms[f'{hz}hz']['p99']:.2f} ms"
            )
    except Exception as exc:
        _log(f"closed-loop cadence bench failed: {type(exc).__name__}: {exc}")

    # ---- training throughput: fwd+bwd+AdamW+EMA device step time
    # (reference envelope: train.py:221-325; synthetic on-device batch so the
    # tunnel never transfers the 256x900 images)
    from functools import partial

    from autonomous_driving_with_diffusion_model_tpu.diffusion import (
        make_schedule_from_cfg,
    )
    from autonomous_driving_with_diffusion_model_tpu.train import (
        create_train_state,
        make_train_step,
    )

    @partial(jax.jit, static_argnums=0)
    def make_batch(B, k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "image": jax.random.normal(k1, (B, H, W, 3), jnp.float32),
            "trajs": jax.random.uniform(k2, (B, 16, 7), jnp.float32, -1.0, 1.0),
            "target": jax.random.normal(k3, (B, 2), jnp.float32),
        }

    def time_train(step, state, batch, iters=8, repeats=3):
        rng_t = jax.random.PRNGKey(1)
        state, _ = step(state, batch, rng_t)  # compile + warm
        jax.block_until_ready(state.step)
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            metrics = None
            for _ in range(iters):
                state, metrics = step(state, batch, rng_t)
            # block on the LOSS, not state.step: on the tunneled relay the
            # tiny step counter can report ready before the heavy chain
            # drains (observed 20x-optimistic reading once in round 4)
            jax.block_until_ready(metrics["loss"])
            best = min(best, (time.perf_counter() - t0) / iters * 1000.0)
        return best, state

    # round-4 profile result (docs/DESIGN.md): the full-batch-256 train step
    # FITS without remat on v5e (the round-3 headline assumed it needed
    # rematerialization) and runs ~30% faster: the best operating point is
    # bf16 b256 no-remat (~48% useful MFU; fwd/bwd balanced at step ~= 3.1x
    # fwd-only). REMAT stays the lever for b384+.
    train_ms = {}
    train_sps = {}
    train_gflop_per_sample = None
    train_gflop_per_sample_frozen = None
    # BN_MODE is pinned per point: the non-"frozen_bn" tags measure the
    # strict-parity batch-statistics semantics (BN_MODE=train, the reference's
    # model.train()); "frozen_bn" is the TPU DEFAULT since round 5
    # (docs/PARITY.md #8) — the tag names keep cross-round comparability.
    for tag, compute_dtype, B, remat in (
        ("fp32_b8", "float32", 8, False),
        ("fp32_b64", "float32", 64, False),
        ("bf16_b8", "bfloat16", 8, False),
        ("bf16_b64", "bfloat16", 64, False),
        ("bf16_b128", "bfloat16", 128, False),
        ("bf16_b256", "bfloat16", 256, False),
        ("bf16_b256_remat", "bfloat16", 256, True),
        ("bf16_b256_frozen_bn", "bfloat16", 256, False),
    ):
        cfg_t = create_cfg()
        cfg_t.TPU.COMPUTE_DTYPE = compute_dtype
        cfg_t.TPU.REMAT = remat
        cfg_t.TPU.BN_MODE = "frozen" if tag.endswith("frozen_bn") else "train"
        model_t = build_model(cfg_t)
        variables_t = jax.jit(
            lambda k: model_t.init(
                k, init1, img=img, time=jnp.asarray([1.0], jnp.float32), train=True
            )
        )(jax.random.PRNGKey(0))
        state_t = create_train_state(model_t, variables_t, cfg_t)
        schedule_t = make_schedule_from_cfg(cfg_t)
        step_t = jax.jit(make_train_step(model_t, schedule_t, cfg_t), donate_argnums=(0,))
        batch = make_batch(B, jax.random.PRNGKey(2))
        if tag == "bf16_b64" and train_gflop_per_sample is None:
            # useful train FLOPs: XLA cost analysis of the NON-remat graph
            # (batch-linear; fwd+bwd+optimizer as executed)
            try:
                train_gflop_per_sample = (
                    _flops(step_t.lower(state_t, batch, jax.random.PRNGKey(1))) / B / 1e9
                )
                _log(f"train useful FLOPs: {train_gflop_per_sample:.2f} GFLOP/sample")
            except Exception as exc:
                _log(f"train cost_analysis unavailable: {type(exc).__name__}")
        if tag.endswith("frozen_bn") and train_gflop_per_sample_frozen is None:
            # the frozen-BN graph does slightly less work; count its own FLOPs
            try:
                train_gflop_per_sample_frozen = (
                    _flops(step_t.lower(state_t, batch, jax.random.PRNGKey(1))) / B / 1e9
                )
                _log(
                    "train useful FLOPs (frozen BN): "
                    f"{train_gflop_per_sample_frozen:.2f} GFLOP/sample"
                )
            except Exception as exc:
                _log(f"frozen-BN cost_analysis unavailable: {type(exc).__name__}")
        _log(f"compiling train step {tag}...")
        try:
            ms, state_t = time_train(step_t, state_t, batch)
        except Exception as exc:
            _log(f"train {tag}: skipped ({type(exc).__name__}: {exc})")
            continue
        train_ms[tag] = ms
        train_sps[tag] = B / (ms / 1000.0)
        _log(f"train {tag}: {ms:.2f} ms/step, {train_sps[tag]:.1f} samples/s/chip")
        del state_t, step_t, batch, variables_t

    def _train_mfu(samples_per_s, gflop_per_sample):
        return (100.0 * samples_per_s * gflop_per_sample / 1e3) / peak_tflops

    train_mfu_pct = train_best = train_mfu_pct_frozen = None
    if train_gflop_per_sample and peak_tflops:
        bf16_points = {
            k: v
            for k, v in train_sps.items()
            if k.startswith("bf16") and "frozen" not in k
        }
        if bf16_points:
            train_best = max(bf16_points, key=bf16_points.get)
            train_mfu_pct = _train_mfu(bf16_points[train_best], train_gflop_per_sample)
            _log(
                f"train best point {train_best}: {bf16_points[train_best]:.0f} "
                f"samples/s = {train_mfu_pct:.1f}% useful MFU"
            )
    if train_gflop_per_sample_frozen and peak_tflops and "bf16_b256_frozen_bn" in train_sps:
        train_mfu_pct_frozen = _train_mfu(
            train_sps["bf16_b256_frozen_bn"], train_gflop_per_sample_frozen
        )
        _log(
            f"train frozen-BN point: {train_sps['bf16_b256_frozen_bn']:.0f} "
            f"samples/s = {train_mfu_pct_frozen:.1f}% useful MFU (the default mode)"
        )

    # headline: default deployment dtype; the in-loop figure when available
    # (single-dispatch device time), else the chained upper bound
    result = {
        "metric": "p50_plan_latency_ms_ddim50_bf16",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(30.0 / p50, 2),
        "extra": {
            "platform": str(jax.devices()[0]),
            "p50_plan_latency_ms_ddim50_fp32": round(p50_fp32, 3),
            "p50_plan_latency_ms_cfg_ddim10_bf16": round(p50_cfg10, 3),
            "p50_plan_latency_ms_cfg_ddim10_bf16_k8_hypotheses": round(p50_cfg10_k8, 3),
            "p50_strict_perception_per_step_fp32_ms": round(p50_strict, 3),
            "hoisted_vs_strict_speedup": round(p50_strict / p50_fp32, 2),
            "scan_unroll": best_unroll,
            "scan_unroll_ms": {str(k): round(v, 3) for k, v in unroll_ms.items()},
            "traj_per_s_per_chip_ddim50_fp32": {
                str(k): round(v, 1) for k, v in tp_fp32.items()
            },
            "traj_per_s_per_chip_ddim50_bf16": {
                str(k): round(v, 1) for k, v in tp_bf16.items()
            },
            "p50_plan_latency_ms_classifier_ddim2_fp32": round(p50_cls2_fp32, 3),
            "p50_plan_latency_ms_classifier_ddim2_bf16": round(p50_cls2_bf16, 3),
            "p50_plan_latency_ms_inpaint_ddim50_bf16": round(p50_inp50, 3),
            "train_step_ms": {k: round(v, 2) for k, v in train_ms.items()},
            "train_samples_per_s_per_chip": {
                k: round(v, 1) for k, v in train_sps.items()
            },
            "train_gflop_per_sample_useful": train_gflop_per_sample
            and round(train_gflop_per_sample, 2),
            "train_best_point": train_best,
            "train_mfu_pct_useful": train_mfu_pct and round(train_mfu_pct, 1),
            "train_mfu_pct_useful_frozen_bn": train_mfu_pct_frozen
            and round(train_mfu_pct_frozen, 1),
            "train_gflop_per_sample_useful_frozen_bn": train_gflop_per_sample_frozen
            and round(train_gflop_per_sample_frozen, 2),
            "p50_plan_latency_ms_inloop": {
                k: round(v, 3) for k, v in inloop.items()
            },
            "us_per_unet_step_b1_bf16": us_per_step_b1 and round(us_per_step_b1, 1),
            "encoder_b1_ms_bf16": enc_b1_ms and round(enc_b1_ms, 3),
            "gflop_per_plan_ddim50": gflop_per_plan and round(gflop_per_plan, 2),
            "gflop_encoder_per_plan": gflop_encoder and round(gflop_encoder, 2),
            "gflop_unet_per_step": gflop_unet_step and round(gflop_unet_step, 4),
            "ref_gflop_per_plan_ddim50": ref_gflop_per_plan
            and round(ref_gflop_per_plan, 1),
            "h100_ceiling_traj_per_s": h100_ceiling_traj_s
            and round(h100_ceiling_traj_s, 1),
            "x_vs_h100_ceiling": x_vs_h100_ceiling and round(x_vs_h100_ceiling, 2),
            "closed_loop_step_ms": closed_loop_ms,
            "achieved_tflops_bf16_b256": achieved_tflops and round(achieved_tflops, 1),
            "peak_tflops_bf16": peak_tflops,
            "mfu_pct_bf16_b256": mfu_pct and round(mfu_pct, 1),
            "latency_basis": (
                "p50_plan_latency_ms_inloop = TRUE device time (N plans in one "
                "jitted program, single dispatch; the headline uses it). "
                "Per-call chained figures are an upper bound: each call of a "
                "non-trivial program carries ~2-4.5 ms relay-side overhead "
                "here (dispatch_floor_ms shows a trivial program's ~0.2 ms). "
                "host_roundtrip_p50_ms is the per-call host-in-the-loop "
                "figure on this tunneled dev setup, not a co-located "
                "deployment"
            ),
            "dispatch_floor_ms": round(dispatch_floor_ms, 3),
            "host_roundtrip_p50_ms": round(host_p50, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

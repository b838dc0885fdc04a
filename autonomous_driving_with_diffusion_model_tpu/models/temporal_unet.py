"""Temporal trajectory U-Net denoiser (flax.linen, channels-last).

TPU-first re-design of the reference denoiser (reference: modeling/temporal.py:58-245):
a 1-D U-Net over the planning horizon conditioned on (timestep embedding ||
ResNet-34 image feature), with three guidance variants selected statically:

* NO_GUIDANCE          — final conv head to ``transition_dim`` channels.
* FREE_GUIDANCE        — extra ``cond_mlp`` on the 2-d target point added into
                         the time embedding (classifier-free guidance).
* CLASSIFIER_GUIDANCE  — 3-channel action head + ``TrajPredict`` transformer
                         predicting the 4-d state from (detached) actions.

TPU-native differences from the reference:
* trajectories flow (B, horizon, channels) so channels sit on the TPU lane dim;
* the image feature can be computed once per plan and passed in
  (``img_feature=``) instead of re-running the encoder every denoise step
  (the reference recomputes it per step, temporal.py:203 — numerically
  identical for a constant image with eval-mode BN);
* all guidance branches are Python-static, so each variant jits to a single
  fused XLA program with no data-dependent control flow.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.constants import GuidanceType, MAGIC_NUM
from .blocks import (
    CondMLP,
    Conv1d,
    Conv1dBlock,
    Downsample1d,
    PreNormAttention,
    ResidualTemporalMapBlock,
    TimeMLP,
    TrajPredict,
    Upsample1d,
)
from .resnet import (
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    wide_resnet50_2,
)

Dtype = Any


class TinyEncoder(nn.Module):
    """Minimal conv encoder for tests/experiments (not in the reference)."""

    num_classes: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .resnet import Conv2d

        x = jax.nn.relu(Conv2d(16, 5, 4, 2, dtype=self.dtype, name="conv1")(x))
        x = jax.nn.relu(Conv2d(32, 3, 2, 1, dtype=self.dtype, name="conv2")(x))
        x = jnp.mean(x, axis=(1, 2))
        from .blocks import Dense

        return Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


PERCEPTION_BUILDERS = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
    "resnext50_32x4d": resnext50_32x4d,
    "wide_resnet50_2": wide_resnet50_2,
    "tiny": lambda num_classes, dtype: TinyEncoder(num_classes=num_classes, dtype=dtype),
}


class TemporalMapUnet(nn.Module):
    horizon: int = 16
    transition_dim: int = 7
    attention: bool = False
    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    use_cond: GuidanceType = GuidanceType.NO_GUIDANCE
    perception_name: str = "resnet34"
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    magic_num = MAGIC_NUM

    def setup(self):
        dims = [self.transition_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        self._in_out = in_out
        time_dim = self.dim

        self.perception = PERCEPTION_BUILDERS[self.perception_name](
            num_classes=time_dim, dtype=self.dtype
        )
        self.time_mlp = TimeMLP(time_dim, dtype=self.dtype)
        if self.use_cond == GuidanceType.FREE_GUIDANCE:
            self.cond_mlp = CondMLP(time_dim, dtype=self.dtype)

        n_res = len(in_out)
        downs = []
        horizon = self.horizon
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= n_res - 1
            downs.append(
                (
                    ResidualTemporalMapBlock(dim_out, dtype=self.dtype, use_pallas=self.use_pallas, name=f"down{ind}_res1"),
                    ResidualTemporalMapBlock(dim_out, dtype=self.dtype, use_pallas=self.use_pallas, name=f"down{ind}_res2"),
                    (
                        PreNormAttention(dim_out, dtype=self.dtype, name=f"down{ind}_attn")
                        if self.attention
                        else None
                    ),
                    (
                        Downsample1d(dim_out, dtype=self.dtype, name=f"down{ind}_down")
                        if not is_last
                        else None
                    ),
                )
            )
            if not is_last:
                horizon //= 2
        self.downs = downs

        mid_dim = dims[-1]
        self.mid_block1 = ResidualTemporalMapBlock(mid_dim, dtype=self.dtype, use_pallas=self.use_pallas, name="mid_block1")
        self.mid_attn = (
            PreNormAttention(mid_dim, dtype=self.dtype, name="mid_attn") if self.attention else None
        )
        self.mid_block2 = ResidualTemporalMapBlock(mid_dim, dtype=self.dtype, use_pallas=self.use_pallas, name="mid_block2")

        ups = []
        final_up_dim = None
        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            is_last = ind >= n_res - 1
            ups.append(
                (
                    ResidualTemporalMapBlock(dim_in, dtype=self.dtype, use_pallas=self.use_pallas, name=f"up{ind}_res1"),
                    ResidualTemporalMapBlock(dim_in, dtype=self.dtype, use_pallas=self.use_pallas, name=f"up{ind}_res2"),
                    (
                        # NOTE: the reference builds this with dim_out
                        # (temporal.py:168) but feeds it a dim_in tensor, which
                        # crashes when attention=True; we use dim_in (bug fix —
                        # the attention path is off by default in both).
                        PreNormAttention(dim_in, dtype=self.dtype, name=f"up{ind}_attn")
                        if self.attention
                        else None
                    ),
                    (
                        Upsample1d(dim_in, dtype=self.dtype, name=f"up{ind}_up")
                        if not is_last
                        else None
                    ),
                )
            )
            final_up_dim = dim_in
            if not is_last:
                horizon *= 2
        self.ups = ups
        self._final_horizon = horizon

        if self.use_cond == GuidanceType.CLASSIFIER_GUIDANCE:
            self.act_block = Conv1dBlock(final_up_dim, 5, dtype=self.dtype, use_pallas=self.use_pallas, name="act_block")
            self.act_head = Conv1d(3, 1, dtype=self.dtype, name="act_head")
            # NOTE: hidden_dim=64 is a reference contract (temporal.py:187);
            # time_embed (dim = MODEL.DIM) is added to the hidden features, so
            # the classifier variant only builds at MODEL.DIM == 64 — exactly
            # like the reference.
            self.state_pred = TrajPredict(
                in_dim=3,
                out_dim=self.transition_dim - 3,
                pred_len=horizon - 1,
                hidden_dim=64,
                num_layers=2,
                dtype=self.dtype,
                name="state_pred",
            )
        else:
            self.final_block = Conv1dBlock(final_up_dim, 5, dtype=self.dtype, use_pallas=self.use_pallas, name="final_block")
            self.final_head = Conv1d(self.transition_dim, 1, dtype=self.dtype, name="final_head")

    def encode_image(self, img: jax.Array, train: bool = False) -> jax.Array:
        """Run the perception encoder once: NHWC image -> (B, dim) feature."""
        return self.perception(img, train=train)

    def _unet(self, x: jax.Array, cond_input: jax.Array) -> jax.Array:
        skips = []
        for res1, res2, attn, down in self.downs:
            x = res1(x, cond_input)
            x = res2(x, cond_input)
            if attn is not None:
                x = attn(x)
            skips.append(x)
            if down is not None:
                x = down(x)
        x = self.mid_block1(x, cond_input)
        if self.mid_attn is not None:
            x = self.mid_attn(x)
        x = self.mid_block2(x, cond_input)
        for res1, res2, attn, up in self.ups:
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = res1(x, cond_input)
            x = res2(x, cond_input)
            if attn is not None:
                x = attn(x)
            if up is not None:
                x = up(x)
        return x

    def __call__(
        self,
        x: jax.Array,
        img: Optional[jax.Array] = None,
        time: Optional[jax.Array] = None,
        cond: Optional[jax.Array] = None,
        img_feature: Optional[jax.Array] = None,
        return_action_and_time_only: bool = False,
        train: bool = False,
        deterministic: bool = True,
    ):
        """Denoise one step.

        x:    (B, horizon, transition_dim) noisy trajectories
        img:  (B, H, W, 3) normalized camera image (NHWC), or ``img_feature``
              (B, dim) precomputed via :meth:`encode_image`.
        time: (B,) diffusion timesteps
        cond: (B', 2) target point for FREE_GUIDANCE (B' may be 2x B for
              dual-batch CFG; time/img features broadcast by tiling, matching
              reference temporal.py:206-212).
        """
        if img_feature is None:
            img_feature = self.encode_image(img, train=train)
        time_embed = self.time_mlp(time)

        if self.use_cond == GuidanceType.FREE_GUIDANCE:
            if cond is None:
                cond = jnp.zeros((x.shape[0], 2), dtype=x.dtype)
            if time_embed.shape[0] != cond.shape[0]:
                time_embed = jnp.tile(time_embed, (cond.shape[0] // time_embed.shape[0], 1))
            if img_feature.shape[0] != cond.shape[0]:
                img_feature = jnp.tile(img_feature, (cond.shape[0] // img_feature.shape[0], 1))
            time_embed = time_embed + self.cond_mlp(cond)

        cond_input = jnp.concatenate([time_embed, img_feature], axis=-1)
        h = self._unet(x.astype(self.dtype), cond_input)

        if self.use_cond == GuidanceType.CLASSIFIER_GUIDANCE:
            action = self.act_head(self.act_block(h))  # (B, horizon, 3)
            if return_action_and_time_only:
                return action, time_embed
            state = self.state_pred(
                jax.lax.stop_gradient(action)[:, :-1], time_embed, deterministic=deterministic
            )
            state = jnp.concatenate([jnp.zeros_like(state[:, :1]), state], axis=1)
            return jnp.concatenate([state, action], axis=-1)
        return self.final_head(self.final_block(h))

    def predict_state(self, action, time_embed, deterministic: bool = True):
        """Classifier-guidance state head on its own (reference: interact.py:158-159)."""
        state = self.state_pred(action[:, :-1], time_embed, deterministic=deterministic)
        return jnp.concatenate([jnp.zeros_like(state[:, :1]), state], axis=1)


def build_model(cfg, dtype=None) -> TemporalMapUnet:
    """Construct the denoiser from a config (reference: modeling/temporal.py:248-258)."""
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    if cfg.MODEL.DIFFUSER_BUILDING_BLOCK != "concat":
        raise NotImplementedError(cfg.MODEL.DIFFUSER_BUILDING_BLOCK)
    return TemporalMapUnet(
        horizon=cfg.MODEL.HORIZON,
        transition_dim=cfg.MODEL.TRANSITION_DIM,
        attention=cfg.MODEL.USE_ATTN,
        dim=cfg.MODEL.DIM,
        dim_mults=tuple(cfg.MODEL.DIM_MULTS),
        use_cond=GuidanceType[cfg.TRAIN.USE_COND],
        perception_name=cfg.MODEL.get("PERCEPTION", "resnet34"),
        use_pallas=bool(cfg.TPU.get("USE_PALLAS_CONV", False)),
        dtype=dtype,
    )

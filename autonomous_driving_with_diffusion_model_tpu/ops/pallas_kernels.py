"""Pallas TPU kernels for the temporal U-Net hot ops.

``fused_conv1d_gn_mish`` fuses the entire reference ``Conv1dBlock``
(conv1d(k=5, pad=2) -> bias -> GroupNorm(8) -> Mish; reference
modeling/helpers.py:95-112) into one VMEM-resident kernel: the conv is five
(L, Cin) x (Cin, Cout) MXU matmuls over shifted windows, followed by on-chip
group statistics and the activation — one HBM round-trip for the whole block
instead of one per op.

This op runs 28x per U-Net forward (2 per residual block, temporal.py:27-31),
entirely inside the sampling scan. Falls back to the XLA composite on
non-TPU backends (``interpret=True`` under tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too (used for interpret-mode tests)
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

__all__ = ["fused_conv1d_gn_mish", "fused_residual_block"]


def _effective_interpret(interpret: bool) -> bool:
    """Compiled Mosaic kernels need a TPU; interpret everywhere else so the
    use_pallas flag is safe on any backend (tests run interpreted on CPU)."""
    if interpret:
        return True
    return jax.default_backend() not in ("tpu", "axon")


def _mish(y):
    return y * jnp.tanh(jax.nn.softplus(y))


def _conv_gn_mish_inline(xb, w, b, g, be, L, K, n_groups, eps):
    """Shared body: shifted-window conv matmuls + selector-matmul group norm +
    Mish, on VMEM-resident 2-D values. xb: (L+K-1, Cin) padded input."""
    Cout = w.shape[-1]
    cg = Cout // n_groups
    acc = jnp.zeros((L, Cout), jnp.float32)
    for k in range(K):
        acc = acc + jnp.dot(xb[k : k + L, :], w[k], preferred_element_type=jnp.float32)
    acc = acc + b[None, :]

    row = jax.lax.broadcasted_iota(jnp.int32, (Cout, n_groups), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Cout, n_groups), 1)
    sel = (row // cg == col).astype(jnp.float32)
    ch_sum = jnp.sum(acc, axis=0, keepdims=True)
    ch_sq = jnp.sum(acc * acc, axis=0, keepdims=True)
    grp_sum = jnp.dot(ch_sum, sel, preferred_element_type=jnp.float32)
    grp_sq = jnp.dot(ch_sq, sel, preferred_element_type=jnp.float32)
    n = L * cg
    mean_g = grp_sum / n
    var_g = grp_sq / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean = jnp.dot(mean_g, sel.T, preferred_element_type=jnp.float32)
    inv = jnp.dot(inv_g, sel.T, preferred_element_type=jnp.float32)
    y = (acc - mean) * inv * g[None, :] + be[None, :]
    return _mish(y)


def _residual_kernel(
    x_ref, t_ref, w1_ref, b1_ref, g1_ref, be1_ref, tw_ref, tb_ref,
    w2_ref, b2_ref, g2_ref, be2_ref, wres_ref, bres_ref, o_ref,
    *, L, K, n_groups, eps, has_res,
):
    pad = K // 2
    xb = x_ref[0]  # (L+K-1, Cin) pre-padded
    h = _conv_gn_mish_inline(
        xb, w1_ref[:], b1_ref[0], g1_ref[0], be1_ref[0], L, K, n_groups, eps
    )
    # conditioning bias: mish(t) @ tw + tb
    t_row = _mish(t_ref[0:1, :].astype(jnp.float32))  # (1, E)
    t_bias = jnp.dot(t_row, tw_ref[:], preferred_element_type=jnp.float32) + tb_ref[0][None, :]
    h = h + t_bias  # broadcast over L

    # second conv block needs zero padding around h
    Cout = h.shape[-1]
    zeros = jnp.zeros((pad, Cout), jnp.float32)
    hb = jnp.concatenate([zeros, h, zeros], axis=0)
    out = _conv_gn_mish_inline(
        hb, w2_ref[:], b2_ref[0], g2_ref[0], be2_ref[0], L, K, n_groups, eps
    )

    x_core = xb[pad : pad + L, :]
    if has_res:
        res = jnp.dot(x_core, wres_ref[0], preferred_element_type=jnp.float32) + bres_ref[0][
            None, :
        ]
    else:
        res = x_core
    o_ref[0] = (out + res).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_groups", "eps", "interpret"))
def fused_residual_block(
    x: jax.Array,
    t: jax.Array,
    w1, b1, g1, be1,
    tw, tb,
    w2, b2, g2, be2,
    wres=None, bres=None,
    n_groups: int = 8,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """Whole ResidualTemporalMapBlock as one Pallas kernel.

    Matches ``block2(block1(x) + dense(mish(t))) + residual(x)``
    (reference: modeling/temporal.py:46-55) to float tolerance. One kernel
    instead of ~10 XLA ops — the denoise scan is per-op-overhead-bound at
    batch 1 (measured ~125 us/step of which compute is a small fraction).

    x: (B, L, Cin); t: (B, E); w1 (K, Cin, C); w2 (K, C, C); tw (E, C);
    wres (1, Cin, C) or None.
    """
    B, L, Cin = x.shape
    K = w1.shape[0]
    C = w1.shape[-1]
    E = t.shape[-1]
    pad = K // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    has_res = wres is not None
    if not has_res:
        wres = jnp.zeros((1, Cin, C), x.dtype)
        bres = jnp.zeros((C,), x.dtype)

    kernel = functools.partial(
        _residual_kernel, L=L, K=K, n_groups=n_groups, eps=eps, has_res=has_res
    )
    interpret = _effective_interpret(interpret)
    vec = lambda v: v.reshape(1, -1)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L + K - 1, Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, E), lambda i: (i, 0)),
            full((K, Cin, C)),
            full((1, C)),
            full((1, C)),
            full((1, C)),
            full((E, C)),
            full((1, C)),
            full((K, C, C)),
            full((1, C)),
            full((1, C)),
            full((1, C)),
            full((1, Cin, C)),
            full((1, C)),
        ],
        out_specs=pl.BlockSpec((1, L, C), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(xp, t, w1, vec(b1), vec(g1), vec(be1), tw, vec(tb), w2, vec(b2), vec(g2), vec(be2), wres, vec(bres))


def _kernel(x_ref, w_ref, b_ref, g_ref, be_ref, o_ref, *, L, K, n_groups, eps):
    # x_ref: (1, L+K-1, Cin) one batch row; w_ref: (K, Cin, Cout)
    Cout = w_ref.shape[-1]
    cg = Cout // n_groups
    xb = x_ref[0]

    acc = jnp.zeros((L, Cout), jnp.float32)
    for k in range(K):
        acc = acc + jnp.dot(
            xb[k : k + L, :], w_ref[k], preferred_element_type=jnp.float32
        )
    acc = acc + b_ref[0][None, :]

    # GroupNorm over (L, group channels). 1-D reshapes/repeats are not
    # Mosaic-layout-friendly; aggregate per group with a (Cout, G) selector
    # matmul instead (both directions stay 2-D and ride the MXU).
    row = jax.lax.broadcasted_iota(jnp.int32, (Cout, n_groups), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Cout, n_groups), 1)
    sel = (row // cg == col).astype(jnp.float32)  # channel -> group one-hot

    ch_sum = jnp.sum(acc, axis=0, keepdims=True)  # (1, Cout)
    ch_sq = jnp.sum(acc * acc, axis=0, keepdims=True)
    grp_sum = jnp.dot(ch_sum, sel, preferred_element_type=jnp.float32)  # (1, G)
    grp_sq = jnp.dot(ch_sq, sel, preferred_element_type=jnp.float32)
    n = L * cg
    mean_g = grp_sum / n
    var_g = grp_sq / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean = jnp.dot(mean_g, sel.T, preferred_element_type=jnp.float32)  # (1, Cout)
    inv = jnp.dot(inv_g, sel.T, preferred_element_type=jnp.float32)

    y = (acc - mean) * inv * g_ref[0][None, :] + be_ref[0][None, :]
    o_ref[0] = (y * jnp.tanh(jax.nn.softplus(y))).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_groups", "eps", "interpret"))
def fused_conv1d_gn_mish(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    n_groups: int = 8,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """x: (B, L, Cin); w: (K, Cin, Cout); b/gamma/beta: (Cout,).

    Matches ``mish(group_norm(conv1d(x, w, b, padding=K//2)))`` to float
    tolerance (same math as ops.nn composed ops).
    """
    B, L, Cin = x.shape
    K, _, Cout = w.shape
    pad = K // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))

    kernel = functools.partial(_kernel, L=L, K=K, n_groups=n_groups, eps=eps)
    vec = lambda v: v.reshape(1, -1)
    interpret = _effective_interpret(interpret)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, L, Cout), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L + K - 1, Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((K, Cin, Cout), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, Cout), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(xp, w, vec(b), vec(gamma), vec(beta))

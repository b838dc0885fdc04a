"""Torch checkpoint <-> flax pytree conversion.

The reference trains with torch and saves ``{"state_dict", "optimizer",
"lr_scheduler", "iter", "ema_state_dict"}`` (reference: train.py:288-299);
evaluation loads ``state_dict`` then overwrites parameters with the EMA
``shadow_params`` list in ``model.parameters()`` order (reference:
interact.py:102-108, misc/load_param.py:4-8). This module reproduces those
semantics exactly so published reference checkpoints drive this framework
bit-compatibly, and so our checkpoints can be exported back to the torch
format.

The mapping is declarative: ``build_mapping(cfg)`` emits
``(torch_key, flax_path, transform)`` triples covering every parameter and
buffer of the reference ``TemporalMapUnet`` (modeling/temporal.py:58-195).

Torch parameter registration order (needed to interpret ``shadow_params``):
``perception, [cond_mlp], time_mlp, downs, ups, mid_block1, [mid_attn],
mid_block2, [act_conv + state_pred | final_conv]`` — note ``ups`` precedes the
mid blocks because the empty ModuleLists are registered first
(modeling/temporal.py:102-103).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..utils.constants import GuidanceType

# transform tags: how a torch tensor maps to the flax layout
T_NONE = "none"  # identical layout
T_CONV1D = "conv1d"  # (O, I, K)    -> (K, I, O)
T_CONV2D = "conv2d"  # (O, I, H, W) -> (H, W, I, O)
T_CONVT1D = "convt1d"  # (I, O, K)    -> (K, I, O)
T_DENSE = "dense"  # (O, I)       -> (I, O)
T_SQUEEZE = "squeeze"  # (1, C, 1)    -> (C,)

_FWD = {
    T_NONE: lambda x: x,
    T_CONV1D: lambda x: np.transpose(x, (2, 1, 0)),
    T_CONV2D: lambda x: np.transpose(x, (2, 3, 1, 0)),
    T_CONVT1D: lambda x: np.transpose(x, (2, 0, 1)),
    T_DENSE: lambda x: np.transpose(x, (1, 0)),
    T_SQUEEZE: lambda x: np.reshape(x, (-1,)),
}
_INV = {
    T_NONE: lambda x: x,
    T_CONV1D: lambda x: np.transpose(x, (2, 1, 0)),
    T_CONV2D: lambda x: np.transpose(x, (3, 2, 0, 1)),
    T_CONVT1D: lambda x: np.transpose(x, (1, 2, 0)),
    T_DENSE: lambda x: np.transpose(x, (1, 0)),
    T_SQUEEZE: lambda x: np.reshape(x, (1, -1, 1)),
}

Entry = Tuple[str, Tuple[str, ...], str]


def _dense(tk: str, fp: Tuple[str, ...]) -> List[Entry]:
    return [
        (f"{tk}.weight", fp + ("weight",), T_DENSE),
        (f"{tk}.bias", fp + ("bias",), T_NONE),
    ]


def _conv1d(tk: str, fp: Tuple[str, ...], bias: bool = True) -> List[Entry]:
    out = [(f"{tk}.weight", fp + ("weight",), T_CONV1D)]
    if bias:
        out.append((f"{tk}.bias", fp + ("bias",), T_NONE))
    return out


def _norm(tk: str, fp: Tuple[str, ...]) -> List[Entry]:
    return [
        (f"{tk}.weight", fp + ("weight",), T_NONE),
        (f"{tk}.bias", fp + ("bias",), T_NONE),
    ]


def _conv1d_block(tk: str, fp: Tuple[str, ...]) -> List[Entry]:
    """torch Conv1dBlock: .block.0 conv, .block.2 groupnorm (helpers.py:95-112).
    Flax side keeps the conv + norm params flat (fusable as one kernel)."""
    return _conv1d(f"{tk}.block.0", fp) + [
        (f"{tk}.block.2.weight", fp + ("norm_weight",), T_NONE),
        (f"{tk}.block.2.bias", fp + ("norm_bias",), T_NONE),
    ]


def _res_block(tk: str, fp_name: str, cin: int, cout: int) -> List[Entry]:
    """ResidualTemporalMapBlockConcat (temporal.py:23-44)."""
    fp = (fp_name,)
    out = _conv1d_block(f"{tk}.blocks.0", fp + ("block1",))
    out += _conv1d_block(f"{tk}.blocks.1", fp + ("block2",))
    out += _dense(f"{tk}.time_mlp.1", fp + ("time_mlp",))
    if cin != cout:
        out += _conv1d(f"{tk}.residual_conv", fp + ("residual_conv",))
    return out


def _attn(tk: str, fp_name: str) -> List[Entry]:
    """Residual(PreNorm(LinearAttention)) (helpers.py:120-172)."""
    fp = (fp_name,)
    return [
        (f"{tk}.fn.norm.g", fp + ("norm_g",), T_SQUEEZE),
        (f"{tk}.fn.norm.b", fp + ("norm_b",), T_SQUEEZE),
        (f"{tk}.fn.fn.to_qkv.weight", fp + ("attn", "to_qkv", "weight"), T_CONV1D),
    ] + _conv1d(f"{tk}.fn.fn.to_out", fp + ("attn", "to_out"))


def _bn(tk: str, fp: Tuple[str, ...]) -> Tuple[List[Entry], List[Entry]]:
    params = _norm(tk, fp)
    stats = [
        (f"{tk}.running_mean", fp + ("running_mean",), T_NONE),
        (f"{tk}.running_var", fp + ("running_var",), T_NONE),
    ]
    return params, stats


def _resnet34_mapping(prefix: str = "perception") -> Tuple[List[Entry], List[Entry]]:
    """torchvision resnet34 layout (reference: modeling/resnet.py:163-296)."""
    params: List[Entry] = [(f"{prefix}.conv1.weight", ("perception", "conv1", "weight"), T_CONV2D)]
    stats: List[Entry] = []
    p, s = _bn(f"{prefix}.bn1", ("perception", "bn1"))
    params += p
    stats += s
    layers = [3, 4, 6, 3]
    in_ch = 64
    for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layers)):
        stride = 1 if stage == 0 else 2
        for i in range(blocks):
            tk = f"{prefix}.layer{stage + 1}.{i}"
            fp = ("perception", f"layer{stage + 1}_{i}")
            params.append((f"{tk}.conv1.weight", fp + ("conv1", "weight"), T_CONV2D))
            p, s = _bn(f"{tk}.bn1", fp + ("bn1",))
            params += p
            stats += s
            params.append((f"{tk}.conv2.weight", fp + ("conv2", "weight"), T_CONV2D))
            p, s = _bn(f"{tk}.bn2", fp + ("bn2",))
            params += p
            stats += s
            if (stride if i == 0 else 1) != 1 or in_ch != planes:
                params.append((f"{tk}.downsample.0.weight", fp + ("ds_conv", "weight"), T_CONV2D))
                p, s = _bn(f"{tk}.downsample.1", fp + ("ds_bn",))
                params += p
                stats += s
            in_ch = planes
    params += _dense(f"{prefix}.fc", ("perception", "fc"))
    return params, stats


def _transformer_layer(tk: str, fp: Tuple[str, ...]) -> List[Entry]:
    """torch nn.TransformerEncoderLayer (used in TrajPredict, helpers.py:35-44)."""
    return [
        (f"{tk}.self_attn.in_proj_weight", fp + ("in_proj_weight",), T_DENSE),
        (f"{tk}.self_attn.in_proj_bias", fp + ("in_proj_bias",), T_NONE),
        *_dense(f"{tk}.self_attn.out_proj", fp + ("out_proj",)),
        *_dense(f"{tk}.linear1", fp + ("linear1",)),
        *_dense(f"{tk}.linear2", fp + ("linear2",)),
        *_norm(f"{tk}.norm1", fp + ("norm1",)),
        *_norm(f"{tk}.norm2", fp + ("norm2",)),
    ]


def build_mapping(cfg) -> Tuple[List[Entry], List[Entry]]:
    """All (torch_key, flax_path, transform) triples for the configured model.

    Returns (param_entries, batch_stat_entries). ``param_entries`` follows the
    torch ``named_parameters()`` registration order described in the module
    docstring, so EMA ``shadow_params`` lists zip against it directly.
    """
    perception = cfg.MODEL.get("PERCEPTION", "resnet34") if hasattr(cfg.MODEL, "get") else "resnet34"
    if perception != "resnet34":
        raise ValueError(
            f"torch checkpoint conversion requires MODEL.PERCEPTION=resnet34 "
            f"(the reference's encoder), got {perception}"
        )
    use_cond = GuidanceType[cfg.TRAIN.USE_COND]
    attention = cfg.MODEL.USE_ATTN
    dim = cfg.MODEL.DIM
    mults = tuple(cfg.MODEL.DIM_MULTS)
    tdim = cfg.MODEL.TRANSITION_DIM

    dims = [tdim] + [dim * m for m in mults]
    in_out = list(zip(dims[:-1], dims[1:]))
    n_res = len(in_out)

    params: List[Entry] = []
    p, stats = _resnet34_mapping()
    params += p

    if use_cond == GuidanceType.FREE_GUIDANCE:
        params += _dense("cond_mlp.0", ("cond_mlp", "fc1"))
        params += _dense("cond_mlp.2", ("cond_mlp", "fc2"))

    params += _dense("time_mlp.1", ("time_mlp", "fc1"))
    params += _dense("time_mlp.3", ("time_mlp", "fc2"))

    # downs (registered before ups/mid; temporal.py:102)
    for ind, (dim_in, dim_out) in enumerate(in_out):
        is_last = ind >= n_res - 1
        params += _res_block(f"downs.{ind}.0", f"down{ind}_res1", dim_in, dim_out)
        params += _res_block(f"downs.{ind}.1", f"down{ind}_res2", dim_out, dim_out)
        if attention:
            params += _attn(f"downs.{ind}.2", f"down{ind}_attn")
        if not is_last:
            params += _conv1d(f"downs.{ind}.3.conv", (f"down{ind}_down", "conv"))

    # ups (ModuleList registered at temporal.py:103 => precedes mid blocks)
    for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
        is_last = ind >= n_res - 1
        params += _res_block(f"ups.{ind}.0", f"up{ind}_res1", dim_out * 2, dim_in)
        params += _res_block(f"ups.{ind}.1", f"up{ind}_res2", dim_in, dim_in)
        if attention:
            params += _attn(f"ups.{ind}.2", f"up{ind}_attn")
        if not is_last:
            params.append((f"ups.{ind}.3.conv.weight", (f"up{ind}_up", "weight"), T_CONVT1D))
            params.append((f"ups.{ind}.3.conv.bias", (f"up{ind}_up", "bias"), T_NONE))

    mid_dim = dims[-1]
    params += _res_block("mid_block1", "mid_block1", mid_dim, mid_dim)
    if attention:
        params += _attn("mid_attn", "mid_attn")
    params += _res_block("mid_block2", "mid_block2", mid_dim, mid_dim)

    if use_cond == GuidanceType.CLASSIFIER_GUIDANCE:
        params += _conv1d_block("act_conv.0", ("act_block",))
        params += _conv1d("act_conv.1", ("act_head",))
        params += _dense("state_pred.input_proj", ("state_pred", "input_proj"))
        for i in range(2):
            params += _transformer_layer(
                f"state_pred.encoder_traj.layers.{i}", ("state_pred", f"layer{i}")
            )
        params += _norm("state_pred.encoder_traj.norm", ("state_pred", "norm"))
        params += _dense("state_pred.output_proj", ("state_pred", "output_proj"))
    else:
        params += _conv1d_block("final_conv.0", ("final_block",))
        params += _conv1d("final_conv.1", ("final_head",))

    return params, stats


# --------------------------------------------------------------------- pytree


def _set_path(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _get_path(tree: Dict, path: Tuple[str, ...]):
    node = tree
    for key in path:
        node = node[key]
    return node


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def torch_state_dict_to_variables(state_dict: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Convert a reference torch ``state_dict`` to flax variables.

    Accepts torch tensors or numpy arrays. Returns
    ``{"params": ..., "batch_stats": ...}``.
    """
    params_map, stats_map = build_mapping(cfg)
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    for torch_key, flax_path, tf in params_map:
        if torch_key not in state_dict:
            raise KeyError(f"Missing key in torch checkpoint: {torch_key}")
        _set_path(params, flax_path, _FWD[tf](_to_np(state_dict[torch_key])))
    for torch_key, flax_path, tf in stats_map:
        _set_path(batch_stats, flax_path, _FWD[tf](_to_np(state_dict[torch_key])))
    return {"params": params, "batch_stats": batch_stats}


def variables_to_torch_state_dict(variables: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    """Export flax variables to the reference torch ``state_dict`` layout.

    Includes BN running stats and zero ``num_batches_tracked`` buffers so
    ``model.load_state_dict`` on the reference succeeds strictly.
    """
    params_map, stats_map = build_mapping(cfg)
    out: Dict[str, np.ndarray] = {}
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    for torch_key, flax_path, tf in params_map:
        out[torch_key] = _INV[tf](np.asarray(_get_path(params, flax_path), dtype=np.float32))
    for torch_key, flax_path, tf in stats_map:
        out[torch_key] = _INV[tf](np.asarray(_get_path(stats, flax_path), dtype=np.float32))
        if torch_key.endswith("running_var"):
            out[torch_key.replace("running_var", "num_batches_tracked")] = np.asarray(
                0, dtype=np.int64
            )
    return out


def apply_ema_shadow_params(variables: Dict[str, Any], shadow_params: List[Any], cfg):
    """Overwrite params with EMA shadow values (reference: misc/load_param.py:4-8).

    ``shadow_params`` is the list saved by diffusers ``EMAModel.state_dict()``
    in ``model.parameters()`` order.
    """
    params_map, _ = build_mapping(cfg)
    if len(shadow_params) != len(params_map):
        raise ValueError(
            f"shadow_params length {len(shadow_params)} != expected {len(params_map)}"
        )
    params = variables["params"]
    for (torch_key, flax_path, tf), shadow in zip(params_map, shadow_params):
        arr = shadow
        if hasattr(arr, "detach"):
            arr = arr.detach().cpu().numpy()
        _set_path(params, flax_path, _FWD[tf](np.asarray(arr, dtype=np.float32)))
    return variables


def _copy_tree(node):
    if isinstance(node, dict):
        return {k: _copy_tree(v) for k, v in node.items()}
    return node


def import_torchvision_backbone(
    variables: Dict[str, Any], state_dict: Dict[str, Any]
) -> Dict[str, Any]:
    """Initialize the perception encoder from a torchvision-ImageNet
    ``resnet34`` state_dict, reproducing the reference's fresh-training-run
    init (modeling/temporal.py:83-84: ``resnet34(pretrained=True)`` downloads
    the torchvision weights — modeling/resnet.py:299-311 — then the fc is
    re-headed with a FRESH ``nn.Linear(512, time_dim)``):

    * every perception conv/BN parameter and BN running stat comes from the
      ImageNet state_dict, bit-compatibly;
    * the fc head keeps the freshly-initialized (512, time_dim) kernel
      already in ``variables`` (torchvision's 1000-way fc is dropped);
    * every non-perception parameter is left untouched.

    ``state_dict`` uses torchvision keys (``conv1.weight``,
    ``layer1.0.bn1.running_mean``, ...); tensors may be torch or numpy.
    Returns a new variables pytree (inputs are not mutated).
    """
    params_map, stats_map = _resnet34_mapping()

    out = {k: _copy_tree(v) for k, v in variables.items()}
    # Clear error for the wrong-encoder case (e.g. MODEL.PERCEPTION=tiny in
    # the CPU smoke recipes) instead of a bare KeyError deep in the walk.
    # The tiny encoder shares shallow names like perception/conv1, so probe
    # a resnet34-distinctive deep path (layer4.2) in params AND stats.
    try:
        _get_path(out["params"], params_map[0][1])
        _get_path(out["params"], ("perception", "layer4_2", "bn2", "bias"))
        _get_path(out["batch_stats"], ("perception", "layer4_2", "bn2", "running_var"))
    except KeyError:
        raise ValueError(
            "TRAIN.PRETRAINED_BACKBONE requires MODEL.PERCEPTION=resnet34 "
            "(the model's perception subtree does not match the torchvision "
            "resnet34 layout)"
        ) from None
    for torch_key, flax_path, tf in params_map:
        if flax_path[:2] == ("perception", "fc"):
            continue  # fresh time_dim head, not ImageNet's 1000-way fc
        key = torch_key[len("perception."):]
        if key not in state_dict:
            raise KeyError(f"Missing key in torchvision state_dict: {key}")
        arr = _FWD[tf](_to_np(state_dict[key]))
        have = np.asarray(_get_path(out["params"], flax_path))
        if tuple(arr.shape) != tuple(have.shape):
            raise ValueError(
                f"{key}: torchvision shape {arr.shape} != model {have.shape}"
            )
        _set_path(out["params"], flax_path, arr)
    for torch_key, flax_path, tf in stats_map:
        key = torch_key[len("perception."):]
        if key not in state_dict:
            raise KeyError(f"Missing key in torchvision state_dict: {key}")
        arr = _FWD[tf](_to_np(state_dict[key]))
        have = np.asarray(_get_path(out["batch_stats"], flax_path))
        if tuple(arr.shape) != tuple(have.shape):
            raise ValueError(
                f"{key}: torchvision shape {arr.shape} != model {have.shape}"
            )
        _set_path(out["batch_stats"], flax_path, arr)
    return out


def load_torchvision_backbone(path: str, variables: Dict[str, Any], cfg=None) -> Dict[str, Any]:
    """``import_torchvision_backbone`` from a ``.pth`` file — the file a user
    gets from ``torch.hub`` / ``torchvision.models.resnet34(pretrained=True)``
    (a bare state_dict, or a dict holding one under ``state_dict``)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if hasattr(sd, "state_dict"):  # a whole torch module was saved
        sd = sd.state_dict()
    return import_torchvision_backbone(variables, sd)


def load_torch_checkpoint(path: str, cfg, use_ema: bool = True) -> Dict[str, Any]:
    """Load a reference ``.pth`` checkpoint into flax variables.

    Mirrors eval-time loading: ``state_dict`` then EMA shadow overwrite
    (reference: interact.py:102-108).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    variables = torch_state_dict_to_variables(state_dict, cfg)
    if use_ema and isinstance(ckpt, dict) and "ema_state_dict" in ckpt:
        variables = apply_ema_shadow_params(
            variables, ckpt["ema_state_dict"]["shadow_params"], cfg
        )
    return variables

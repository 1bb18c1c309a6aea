"""PyTorch -> JAX weight conversion and pretrained-weight loading.

Converts:
- torchvision `vit_b_16` state dicts (the reference's pretraining source,
  reference encoder.py:29-35) into our `VisionTransformer` params;
- full reference checkpoints (`DepthAnything` / `EnhancedDepthAnything`
  `state_dict()` saves, reference mars_adapter.py:249-262) into our model
  params + batch stats, so Mars fine-tuned reference weights load directly.

Handles the torch->flax layout changes: Linear [out,in] -> kernel [in,out],
Conv2d OIHW -> HWIO, packed qkv in_proj -> single Dense, BatchNorm running
stats -> the `batch_stats` collection.  Accepts both old (`mlp.linear_1`) and
new (`mlp.0`) torchvision MLP namings.

No network access is assumed: `find_vit_weights()` looks for a local file
(env `MONODEPTH_TPU_VIT_WEIGHTS` or the torch-hub cache); absent that,
models start from random init with a warning — matching `pretrained=False`.
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, Mapping, Optional

import numpy as np

__all__ = [
    "convert_vit_state_dict",
    "convert_decoder_state_dict",
    "convert_reference_state_dict",
    "find_vit_weights",
    "load_torch_state_dict",
]


def _t(x) -> np.ndarray:
    """torch tensor / ndarray -> float32 ndarray."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd, prefix):
    return {"kernel": _t(sd[prefix + ".weight"]).T, "bias": _t(sd[prefix + ".bias"])}


def _conv(sd, prefix):
    return {
        "kernel": _t(sd[prefix + ".weight"]).transpose(2, 3, 1, 0),
        "bias": _t(sd[prefix + ".bias"]),
    }


def _layernorm(sd, prefix):
    return {"scale": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}


def _batchnorm(sd, prefix):
    params = {"scale": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}
    stats = {
        "mean": _t(sd[prefix + ".running_mean"]),
        "var": _t(sd[prefix + ".running_var"]),
    }
    return params, stats


def _mlp_key(sd, prefix, which):
    """torchvision MLP naming: new `mlp.{0,3}` or old `mlp.linear_{1,2}`."""
    new = f"{prefix}.{0 if which == 1 else 3}"
    old = f"{prefix}.linear_{which}"
    if new + ".weight" in sd:
        return new
    if old + ".weight" in sd:
        return old
    raise KeyError(f"MLP weights not found under {new} or {old}")


def convert_vit_state_dict(sd: Mapping, num_layers: int = None) -> Dict:
    """torchvision vit_{s,b,l}_16 state dict -> our VisionTransformer params.

    num_layers=None infers the depth from the `encoder_layer_{i}` keys, so
    vit_l_16 (24 layers) converts with no extra arguments."""
    if num_layers is None:
        num_layers = 1 + max(
            int(k.split("encoder_layer_")[1].split(".")[0])
            for k in sd if "encoder_layer_" in k)
    params: Dict = {
        "patch_embed": _conv(sd, "conv_proj"),
        "cls_token": _t(sd["class_token"]),
        "pos_embedding": _t(sd["encoder.pos_embedding"]),
    }
    for i in range(num_layers):
        p = f"encoder.layers.encoder_layer_{i}"
        attn = f"{p}.self_attention"
        block = {
            "ln_1": _layernorm(sd, f"{p}.ln_1"),
            "ln_2": _layernorm(sd, f"{p}.ln_2"),
            "qkv": {
                "kernel": _t(sd[attn + ".in_proj_weight"]).T,
                "bias": _t(sd[attn + ".in_proj_bias"]),
            },
            "out_proj": _linear(sd, attn + ".out_proj"),
            "mlp": {
                "fc1": _linear(sd, _mlp_key(sd, f"{p}.mlp", 1)),
                "fc2": _linear(sd, _mlp_key(sd, f"{p}.mlp", 2)),
            },
        }
        params[f"block_{i}"] = block
    return params


def _convert_convblock(sd, prefix):
    """Reference decoder ConvBlock: Sequential(Conv3x3, BN, ELU).

    torch keys: `{prefix}.conv.0.conv.1.{weight,bias}` (conv inside the
    reflect-pad Sequential) and `{prefix}.conv.1.*` (BatchNorm).
    """
    conv = _conv(sd, f"{prefix}.conv.0.conv.1")
    bn_params, bn_stats = _batchnorm(sd, f"{prefix}.conv.1")
    params = {"conv3x3": {"conv": conv}, "bn": bn_params}
    stats = {"bn": bn_stats}
    return params, stats


def convert_decoder_state_dict(sd: Mapping, prefix: str = "decoder.convs."):
    """Reference `DepthAnythingDecoder` weights (torch naming under `prefix`)
    -> (params, batch_stats) trees for our decoder.  Usable standalone on a
    bare `DepthAnythingDecoder().state_dict()` with prefix='convs.'."""
    dec_p: Dict = {}
    dec_s: Dict = {}
    block_names = ["init_conv", "mars_adapt"]
    for i in range(4):
        block_names += [f"upconv_{i}_0", f"upconv_{i}_1"]
        if i < 3:
            block_names.append(f"skip_{i}")
    for name in block_names:
        p, s = _convert_convblock(sd, f"{prefix}{name}")
        dec_p[name] = p
        dec_s[name] = s
    for s_idx in range(4):
        dec_p[f"dispconv_{s_idx}"] = _conv(sd, f"{prefix}dispconv_{s_idx}")
    return dec_p, dec_s


def convert_reference_state_dict(sd: Mapping, enhanced: bool = False):
    """Full reference model state dict -> (params, batch_stats) trees.

    Accepts `DepthAnything().state_dict()` (torch naming, see docstring) and,
    with `enhanced=True`, `EnhancedDepthAnything().state_dict()`.
    """
    params: Dict = {}
    stats: Dict = {}

    # --- encoder ---
    enc_p: Dict = {"vit": convert_vit_state_dict(
        {k[len("encoder.encoder."):]: v for k, v in sd.items()
         if k.startswith("encoder.encoder.")}
    )}
    enc_s: Dict = {}
    bn_p, bn_s = _batchnorm(sd, "encoder.normalize")
    enc_p["normalize"] = bn_p
    enc_s["normalize"] = bn_s
    for i in range(4):
        enc_p[f"channel_reduce_{i}"] = _conv(sd, f"encoder.channel_reduce.{i}")
    params["encoder"] = enc_p
    stats["encoder"] = enc_s

    # --- decoder ---
    dec_p, dec_s = convert_decoder_state_dict(sd)
    params["decoder"] = dec_p
    stats["decoder"] = dec_s

    if enhanced:
        for i in (1, 2):
            params[f"attention_{i}"] = {
                "query": _conv(sd, f"attention_blocks.{i}.query"),
                "key": _conv(sd, f"attention_blocks.{i}.key"),
                "value": _conv(sd, f"attention_blocks.{i}.value"),
                "gamma": _t(sd[f"attention_blocks.{i}.gamma"]),
            }
        params["uncertainty_module"] = {
            f"conv{j}": _conv(sd, f"uncertainty_module.conv{j}") for j in (1, 2, 3)
        }
        params["refinement"] = {
            f"conv{j}": _conv(sd, f"refinement.conv{j}") for j in (1, 2, 3)
        }
        params["feature_fusion"] = {"weights": _t(sd["feature_fusion.weights"])}

    return params, stats


def _t_back(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def export_vit_state_dict(params: Mapping, num_layers: int = 12,
                          prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of `convert_vit_state_dict`: our ViT params -> torchvision
    naming/layout (new `mlp.{0,3}` convention)."""
    sd: Dict[str, np.ndarray] = {
        prefix + "conv_proj.weight": _t_back(params["patch_embed"]["kernel"]).transpose(3, 2, 0, 1),
        prefix + "conv_proj.bias": _t_back(params["patch_embed"]["bias"]),
        prefix + "class_token": _t_back(params["cls_token"]),
        prefix + "encoder.pos_embedding": _t_back(params["pos_embedding"]),
    }
    for i in range(num_layers):
        b = params[f"block_{i}"]
        p = f"{prefix}encoder.layers.encoder_layer_{i}"
        sd[p + ".ln_1.weight"] = _t_back(b["ln_1"]["scale"])
        sd[p + ".ln_1.bias"] = _t_back(b["ln_1"]["bias"])
        sd[p + ".ln_2.weight"] = _t_back(b["ln_2"]["scale"])
        sd[p + ".ln_2.bias"] = _t_back(b["ln_2"]["bias"])
        sd[p + ".self_attention.in_proj_weight"] = _t_back(b["qkv"]["kernel"]).T
        sd[p + ".self_attention.in_proj_bias"] = _t_back(b["qkv"]["bias"])
        sd[p + ".self_attention.out_proj.weight"] = _t_back(b["out_proj"]["kernel"]).T
        sd[p + ".self_attention.out_proj.bias"] = _t_back(b["out_proj"]["bias"])
        sd[p + ".mlp.0.weight"] = _t_back(b["mlp"]["fc1"]["kernel"]).T
        sd[p + ".mlp.0.bias"] = _t_back(b["mlp"]["fc1"]["bias"])
        sd[p + ".mlp.3.weight"] = _t_back(b["mlp"]["fc2"]["kernel"]).T
        sd[p + ".mlp.3.bias"] = _t_back(b["mlp"]["fc2"]["bias"])
    return sd


def _export_conv(sd, prefix, p):
    sd[prefix + ".weight"] = _t_back(p["kernel"]).transpose(3, 2, 0, 1)
    sd[prefix + ".bias"] = _t_back(p["bias"])


def _export_bn(sd, prefix, p, s):
    sd[prefix + ".weight"] = _t_back(p["scale"])
    sd[prefix + ".bias"] = _t_back(p["bias"])
    sd[prefix + ".running_mean"] = _t_back(s["mean"])
    sd[prefix + ".running_var"] = _t_back(s["var"])


def _export_convblock(sd, prefix, p, s):
    _export_conv(sd, f"{prefix}.conv.0.conv.1", p["conv3x3"]["conv"])
    _export_bn(sd, f"{prefix}.conv.1", p["bn"], s["bn"])


def export_reference_state_dict(params: Mapping, batch_stats: Mapping,
                                enhanced: bool = False) -> Dict[str, np.ndarray]:
    """Inverse of `convert_reference_state_dict`: our model variables -> a
    reference-format state dict (loadable by the PyTorch reference via
    `model.load_state_dict`), so Mars fine-tunes done here round-trip back
    into the reference ecosystem."""
    sd: Dict[str, np.ndarray] = export_vit_state_dict(
        params["encoder"]["vit"], prefix="encoder.encoder."
    )
    _export_bn(sd, "encoder.normalize", params["encoder"]["normalize"],
               batch_stats["encoder"]["normalize"])
    for i in range(4):
        _export_conv(sd, f"encoder.channel_reduce.{i}",
                     params["encoder"][f"channel_reduce_{i}"])

    dec_p, dec_s = params["decoder"], batch_stats["decoder"]
    names = ["init_conv", "mars_adapt"]
    for i in range(4):
        names += [f"upconv_{i}_0", f"upconv_{i}_1"]
        if i < 3:
            names.append(f"skip_{i}")
    for name in names:
        _export_convblock(sd, f"decoder.convs.{name}", dec_p[name], dec_s[name])
    for s_idx in range(4):
        _export_conv(sd, f"decoder.convs.dispconv_{s_idx}",
                     dec_p[f"dispconv_{s_idx}"])

    if enhanced:
        for i in (1, 2):
            att = params[f"attention_{i}"]
            for proj in ("query", "key", "value"):
                _export_conv(sd, f"attention_blocks.{i}.{proj}", att[proj])
            sd[f"attention_blocks.{i}.gamma"] = _t_back(att["gamma"])
        for j in (1, 2, 3):
            _export_conv(sd, f"uncertainty_module.conv{j}",
                         params["uncertainty_module"][f"conv{j}"])
            _export_conv(sd, f"refinement.conv{j}", params["refinement"][f"conv{j}"])
        sd["feature_fusion.weights"] = _t_back(params["feature_fusion"]["weights"])
    return sd


def find_vit_weights() -> Optional[str]:
    """Locate a local torchvision vit_b_16 checkpoint, if any."""
    env = os.environ.get("MONODEPTH_TPU_VIT_WEIGHTS")
    if env and os.path.exists(env):
        return env
    hub = os.path.join(
        os.path.expanduser(os.environ.get("TORCH_HOME", "~/.cache/torch")),
        "hub", "checkpoints",
    )
    if os.path.isdir(hub):
        for name in sorted(os.listdir(hub)):
            if name.startswith("vit_b_16") and name.endswith(".pth"):
                return os.path.join(hub, name)
    return None


def load_torch_state_dict(path: str) -> Dict:
    """Load a .pth state dict on CPU (weights only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def load_model_variables(variables, path: str, enhanced: bool = False):
    """Load full-model weights from `path` into a variables dict.

    `path` is either a reference-format .pth state dict (converted via
    `convert_reference_state_dict`) or an Orbax checkpoint directory (the
    params/batch_stats template comes from `variables`).  Shared by the
    inference estimator, `convert_to_mars_domain`, and the training
    adapter's `--model_weights` start-from-checkpoint path (reference
    mars_finetune.py:38-40).
    """
    if os.path.isdir(path):
        from monodepth_tpu.train.checkpoints import restore_params

        return restore_params(path, variables)
    sd = load_torch_state_dict(path)
    params, stats = convert_reference_state_dict(sd, enhanced=enhanced)
    return {"params": params, "batch_stats": stats}


def maybe_load_pretrained_vit() -> Optional[Dict]:
    """Return converted ViT params if a local checkpoint exists, else None.

    Two formats: a torchvision vit_*_16 .pth (converted key-by-key), or a
    native .npz written by the in-domain SimMIM pretrainer
    (train/pretrain.py save_vit_npz) — the zero-egress substitute for the
    torchvision download, consumed through the same hook.
    """
    path = find_vit_weights()
    if path is None:
        warnings.warn(
            "No local ViT-B/16 checkpoint found (set MONODEPTH_TPU_VIT_WEIGHTS); "
            "encoder starts from random init (pretrained=False behavior)."
        )
        return None
    if path.endswith(".npz"):
        from monodepth_tpu.train.pretrain import load_vit_npz

        return load_vit_npz(path)
    return convert_vit_state_dict(load_torch_state_dict(path))


def vit_params_compatible(loaded: Mapping, template: Mapping) -> bool:
    """True when a converted ViT checkpoint fits the model's backbone
    variant (same depth, same hidden width).  Guards against silently
    grafting vit_b_16 weights onto a 'small'/'large' encoder — shapes would
    only blow up at the first jitted apply, far from the cause."""
    try:
        import numpy as _np

        if set(loaded) != set(template):
            return False
        return (_np.shape(loaded["pos_embedding"])
                == _np.shape(template["pos_embedding"]))
    except Exception:  # malformed tree: not compatible
        return False

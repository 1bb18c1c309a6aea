"""Torch-functional oracle of the reference model's numerics (test-only).

torchvision is not installed in this environment, so the reference model can't
be imported directly.  This oracle re-states the reference's math using only
`torch.nn.functional` over an explicit state-dict of tensors, serving as the
ground truth for parity tests of the JAX models (weights are shared through
`monodepth_tpu.models.weights`).  Layouts follow torch (NCHW / [out,in]).
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F

VIT_DIM = 768
VIT_LAYERS = 12
VIT_HEADS = 12
VIT_MLP = 3072
TAPS = (2, 5, 8, 11)
NUM_CH_ENC = (256, 256, 256, 256)
NUM_CH_DEC = (256, 128, 64, 32, 16)


# ---------------------------------------------------------------- state dicts
def make_vit_state_dict(gen: torch.Generator, prefix: str = ""):
    """Random torchvision-vit_b_16-shaped state dict (new `mlp.0` naming)."""

    def r(*shape, scale=0.02):
        return torch.randn(*shape, generator=gen) * scale

    sd = {
        prefix + "conv_proj.weight": r(VIT_DIM, 3, 16, 16),
        prefix + "conv_proj.bias": r(VIT_DIM),
        prefix + "class_token": r(1, 1, VIT_DIM),
        prefix + "encoder.pos_embedding": r(1, 197, VIT_DIM),
    }
    for i in range(VIT_LAYERS):
        p = f"{prefix}encoder.layers.encoder_layer_{i}."
        sd[p + "ln_1.weight"] = 1 + r(VIT_DIM)
        sd[p + "ln_1.bias"] = r(VIT_DIM)
        sd[p + "ln_2.weight"] = 1 + r(VIT_DIM)
        sd[p + "ln_2.bias"] = r(VIT_DIM)
        sd[p + "self_attention.in_proj_weight"] = r(3 * VIT_DIM, VIT_DIM)
        sd[p + "self_attention.in_proj_bias"] = r(3 * VIT_DIM)
        sd[p + "self_attention.out_proj.weight"] = r(VIT_DIM, VIT_DIM)
        sd[p + "self_attention.out_proj.bias"] = r(VIT_DIM)
        sd[p + "mlp.0.weight"] = r(VIT_MLP, VIT_DIM)
        sd[p + "mlp.0.bias"] = r(VIT_MLP)
        sd[p + "mlp.3.weight"] = r(VIT_DIM, VIT_MLP)
        sd[p + "mlp.3.bias"] = r(VIT_DIM)
    # final encoder.ln exists in torchvision but is unused by the reference
    sd[prefix + "encoder.ln.weight"] = 1 + r(VIT_DIM)
    sd[prefix + "encoder.ln.bias"] = r(VIT_DIM)
    return sd


def _conv_sd(gen, sd, prefix, cin, cout, k):
    sd[prefix + ".weight"] = torch.randn(cout, cin, k, k, generator=gen) * (
        1.0 / math.sqrt(cin * k * k)
    )
    sd[prefix + ".bias"] = torch.randn(cout, generator=gen) * 0.01


def _bn_sd(gen, sd, prefix, c):
    sd[prefix + ".weight"] = 1 + torch.randn(c, generator=gen) * 0.05
    sd[prefix + ".bias"] = torch.randn(c, generator=gen) * 0.05
    sd[prefix + ".running_mean"] = torch.randn(c, generator=gen) * 0.1
    sd[prefix + ".running_var"] = 1 + torch.randn(c, generator=gen).abs() * 0.1


def _convblock_sd(gen, sd, prefix, cin, cout):
    _conv_sd(gen, sd, prefix + ".conv.0.conv.1", cin, cout, 3)
    _bn_sd(gen, sd, prefix + ".conv.1", cout)


def make_model_state_dict(gen: torch.Generator, enhanced: bool = False):
    """Random full-reference-model state dict (standard or enhanced)."""
    sd = make_vit_state_dict(gen, prefix="encoder.encoder.")
    _bn_sd(gen, sd, "encoder.normalize", 3)
    for i in range(4):
        _conv_sd(gen, sd, f"encoder.channel_reduce.{i}", VIT_DIM, NUM_CH_ENC[i], 1)

    d = "decoder.convs."
    _convblock_sd(gen, sd, d + "init_conv", NUM_CH_ENC[-1], NUM_CH_DEC[0])
    for i in range(4):
        _convblock_sd(gen, sd, d + f"upconv_{i}_0", NUM_CH_DEC[i], NUM_CH_DEC[i + 1])
        in_ch = NUM_CH_DEC[i + 1]
        if i < 3:
            _convblock_sd(gen, sd, d + f"skip_{i}", NUM_CH_ENC[0], NUM_CH_DEC[i + 1])
            in_ch *= 2
        _convblock_sd(gen, sd, d + f"upconv_{i}_1", in_ch, NUM_CH_DEC[i + 1])
    _convblock_sd(gen, sd, d + "mars_adapt", NUM_CH_DEC[-1], NUM_CH_DEC[-1])
    for s in range(4):
        _conv_sd(gen, sd, d + f"dispconv_{s}", NUM_CH_DEC[s + 1], 1, 3)

    if enhanced:
        for i in (1, 2):
            c = NUM_CH_ENC[i]
            _conv_sd(gen, sd, f"attention_blocks.{i}.query", c, c // 8, 1)
            _conv_sd(gen, sd, f"attention_blocks.{i}.key", c, c // 8, 1)
            _conv_sd(gen, sd, f"attention_blocks.{i}.value", c, c, 1)
            sd[f"attention_blocks.{i}.gamma"] = torch.randn(1, generator=gen) * 0.3
        c = NUM_CH_ENC[0]
        _conv_sd(gen, sd, "uncertainty_module.conv1", c, c // 2, 3)
        _conv_sd(gen, sd, "uncertainty_module.conv2", c // 2, c // 2, 3)
        _conv_sd(gen, sd, "uncertainty_module.conv3", c // 2, 1, 1)
        _conv_sd(gen, sd, "refinement.conv1", c + 3, c, 3)
        _conv_sd(gen, sd, "refinement.conv2", c, c // 2, 3)
        _conv_sd(gen, sd, "refinement.conv3", c // 2, 1, 1)
        sd["feature_fusion.weights"] = torch.randn(3, generator=gen) * 0.2
    return sd


# ------------------------------------------------------------------- forward
def vit_forward(sd, x, prefix: str = ""):
    """ViT-B/16 forward, returning tapped block outputs (pre-final-LN)."""
    b = x.shape[0]
    x = F.conv2d(x, sd[prefix + "conv_proj.weight"], sd[prefix + "conv_proj.bias"], stride=16)
    x = x.reshape(b, VIT_DIM, -1).permute(0, 2, 1)
    cls = sd[prefix + "class_token"].expand(b, -1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + sd[prefix + "encoder.pos_embedding"]

    taps = {}
    for i in range(VIT_LAYERS):
        p = f"{prefix}encoder.layers.encoder_layer_{i}."
        y = F.layer_norm(x, (VIT_DIM,), sd[p + "ln_1.weight"], sd[p + "ln_1.bias"], eps=1e-6)
        qkv = F.linear(y, sd[p + "self_attention.in_proj_weight"], sd[p + "self_attention.in_proj_bias"])
        q, k, v = qkv.chunk(3, dim=-1)
        hd = VIT_DIM // VIT_HEADS

        def split(t):
            return t.reshape(b, -1, VIT_HEADS, hd).transpose(1, 2)

        attn = F.scaled_dot_product_attention(split(q), split(k), split(v))
        attn = attn.transpose(1, 2).reshape(b, -1, VIT_DIM)
        attn = F.linear(attn, sd[p + "self_attention.out_proj.weight"], sd[p + "self_attention.out_proj.bias"])
        x = x + attn
        y = F.layer_norm(x, (VIT_DIM,), sd[p + "ln_2.weight"], sd[p + "ln_2.bias"], eps=1e-6)
        y = F.linear(y, sd[p + "mlp.0.weight"], sd[p + "mlp.0.bias"])
        y = F.gelu(y)
        y = F.linear(y, sd[p + "mlp.3.weight"], sd[p + "mlp.3.bias"])
        x = x + y
        if i in TAPS:
            taps[i] = x
    return [taps[i] for i in TAPS]


def reshape_tokens_to_grid(feat, h, w):
    """Reference encoder.py:69-110 token->grid logic (incl. the CLS quirk)."""
    b, tokens, c = feat.shape
    if tokens == h * w + 1:
        feat = feat[:, 1:, :]
        tokens -= 1
    if tokens != h * w:
        new_h = int(math.sqrt(tokens))
        new_w = tokens // new_h
        if new_h * new_w < tokens:
            new_w += 1
        if new_h * new_w > tokens:
            pad = new_h * new_w - tokens
            feat = torch.cat([feat, torch.zeros(b, pad, c)], dim=1)
        h, w = new_h, new_w
    return feat.reshape(b, h, w, c).permute(0, 3, 1, 2)


def encoder_forward(sd, x):
    """Reference DepthAnythingEncoder.forward (encoder.py:112-187), eval mode."""
    b, c, h, w = x.shape
    x = F.batch_norm(
        x,
        sd["encoder.normalize.running_mean"],
        sd["encoder.normalize.running_var"],
        sd["encoder.normalize.weight"],
        sd["encoder.normalize.bias"],
        training=False,
        eps=1e-5,
    )
    if x.max() > 1.0:
        x = x / 255.0
    if x.min() >= 0 and x.max() <= 1.0:
        x = 2.0 * x - 1.0
    if (x.shape[2], x.shape[3]) != (224, 224):
        x_vit = F.interpolate(x, size=(224, 224), mode="bilinear", align_corners=False)
    else:
        x_vit = x
    taps = vit_forward(sd, x_vit, prefix="encoder.encoder.")

    feats = []
    for i, tok in enumerate(taps):
        grid = reshape_tokens_to_grid(tok, h // 16, w // 16)
        red = F.conv2d(grid, sd[f"encoder.channel_reduce.{i}.weight"], sd[f"encoder.channel_reduce.{i}.bias"])
        feats.append(F.instance_norm(red))
    return feats


def _convblock(sd, prefix, x):
    x = F.pad(x, (1, 1, 1, 1), mode="reflect")
    x = F.conv2d(x, sd[prefix + ".conv.0.conv.1.weight"], sd[prefix + ".conv.0.conv.1.bias"])
    x = F.batch_norm(
        x,
        sd[prefix + ".conv.1.running_mean"],
        sd[prefix + ".conv.1.running_var"],
        sd[prefix + ".conv.1.weight"],
        sd[prefix + ".conv.1.bias"],
        training=False,
        eps=1e-5,
    )
    return F.elu(x)


def decoder_forward(sd, features):
    """Reference DepthAnythingDecoder.forward (decoder.py:90-173), eval mode."""
    d = "decoder.convs."
    outputs = {}
    x = features[-1]
    x = _convblock(sd, d + "init_conv", x)
    for i in range(4):
        x = _convblock(sd, d + f"upconv_{i}_0", x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        if i < len(features) - 1:
            skip_idx = min(i + 2, len(features))
            skip = _convblock(sd, d + f"skip_{i}", features[-skip_idx])
            if skip.shape[2:] != x.shape[2:]:
                skip = F.interpolate(skip, size=x.shape[2:], mode="bilinear", align_corners=True)
            x = torch.cat([x, skip], dim=1)
        x = _convblock(sd, d + f"upconv_{i}_1", x)
        if i == 3:
            x = _convblock(sd, d + "mars_adapt", x)
        disp = F.conv2d(x, sd[d + f"dispconv_{i}.weight"], sd[d + f"dispconv_{i}.bias"], padding=1)
        outputs[("disp", i)] = torch.sigmoid(disp)
    return outputs


def model_forward(sd, x, disp_scale=None):
    """Reference DepthAnything.forward (model.py:32-102), eval mode."""
    original_size = x.shape[2:]
    if x.shape[2] % 16 != 0 or x.shape[3] % 16 != 0:
        h = (x.shape[2] // 16 + 1) * 16
        w = (x.shape[3] // 16 + 1) * 16
        x = F.interpolate(x, size=(h, w), mode="bilinear", align_corners=False)
    feats = encoder_forward(sd, x)
    outputs = decoder_forward(sd, feats)
    if disp_scale is not None:
        outputs = {k: v * disp_scale for k, v in outputs.items()}
    for k in outputs:
        if outputs[k].shape[2:] != original_size:
            outputs[k] = F.interpolate(outputs[k], size=original_size, mode="bilinear", align_corners=False)
    return outputs


def enhanced_forward(sd, x, disp_scale=None):
    """Reference EnhancedDepthAnything.forward (enhanced_model.py:152-279)."""
    original_size = x.shape[2:]
    if x.shape[2] % 16 != 0 or x.shape[3] % 16 != 0:
        h = (x.shape[2] // 16 + 1) * 16
        w = (x.shape[3] // 16 + 1) * 16
        x = F.interpolate(x, size=(h, w), mode="bilinear", align_corners=False)
    feats = encoder_forward(sd, x)

    enhanced = list(feats)
    for i in (1, 2):
        f = feats[i]
        b, c, hh, ww = f.shape
        q = F.conv2d(f, sd[f"attention_blocks.{i}.query.weight"], sd[f"attention_blocks.{i}.query.bias"])
        k = F.conv2d(f, sd[f"attention_blocks.{i}.key.weight"], sd[f"attention_blocks.{i}.key.bias"])
        v = F.conv2d(f, sd[f"attention_blocks.{i}.value.weight"], sd[f"attention_blocks.{i}.value.bias"])
        q = q.view(b, -1, hh * ww).permute(0, 2, 1)
        k = k.view(b, -1, hh * ww)
        attn = torch.softmax(torch.bmm(q, k), dim=2)
        v = v.view(b, -1, hh * ww)
        out = torch.bmm(v, attn.permute(0, 2, 1)).view(b, c, hh, ww)
        enhanced[i] = sd[f"attention_blocks.{i}.gamma"] * out + f

    outputs = decoder_forward(sd, enhanced)

    u = feats[0]
    u1 = F.elu(F.conv2d(u, sd["uncertainty_module.conv1.weight"], sd["uncertainty_module.conv1.bias"], padding=1))
    u2 = F.elu(F.conv2d(u1, sd["uncertainty_module.conv2.weight"], sd["uncertainty_module.conv2.bias"], padding=1))
    outputs[("uncertainty", 0)] = torch.sigmoid(
        F.conv2d(u2, sd["uncertainty_module.conv3.weight"], sd["uncertainty_module.conv3.bias"])
    )

    rgb = x
    if rgb.shape[2:] != feats[0].shape[2:]:
        rgb = F.interpolate(rgb, size=feats[0].shape[2:], mode="bilinear", align_corners=False)
    r = torch.cat([feats[0], rgb], dim=1)
    r = F.elu(F.conv2d(r, sd["refinement.conv1.weight"], sd["refinement.conv1.bias"], padding=1))
    r = F.elu(F.conv2d(r, sd["refinement.conv2.weight"], sd["refinement.conv2.bias"], padding=1))
    refinement = F.conv2d(r, sd["refinement.conv3.weight"], sd["refinement.conv3.bias"])

    if refinement.shape[2:] != outputs[("disp", 0)].shape[2:]:
        refinement = F.interpolate(refinement, size=outputs[("disp", 0)].shape[2:], mode="bilinear", align_corners=False)
    outputs[("disp_unrefined", 0)] = outputs[("disp", 0)].clone()
    outputs[("disp", 0)] = outputs[("disp", 0)] + refinement

    if disp_scale is not None:
        for key in list(outputs.keys()):
            if key[0] == "disp":
                outputs[key] = outputs[key] * disp_scale

    w_soft = torch.softmax(sd["feature_fusion.weights"], dim=0)
    target_size = outputs[("disp", 0)].shape[2:]
    fused = 0
    for i, s in enumerate((0, 1, 2)):
        f = outputs[("disp", s)]
        if f.shape[2:] != target_size:
            f = F.interpolate(f, size=target_size, mode="bilinear", align_corners=False)
        fused = fused + w_soft[i] * f
    outputs[("disp_fused", 0)] = fused
    outputs[("disp", 0)] = fused

    for key in list(outputs.keys()):
        if outputs[key].shape[2:] != original_size:
            outputs[key] = F.interpolate(outputs[key], size=original_size, mode="bilinear", align_corners=False)

    for key in list(outputs.keys()):
        if key[0] == "disp":
            min_disp, max_disp = 1 / 100.0, 1 / 0.1
            scaled = min_disp + (max_disp - min_disp) * outputs[key]
            outputs[("depth", key[1])] = 1.0 / scaled
    return outputs

"""timm/torch state_dict → Flax npz weight converter.

The reference gets ImageNet initialization for free by hard-coding
``pretrained=True`` into ``timm.create_model`` (reference:
src/image_encoder.py:16-17), and every BASELINE.md accuracy was produced
with it. This module maps a torch state_dict (read from a ``.safetensors``
or ``torch.save`` file — both torch-free numpy paths where possible) onto
the '/'-joined Flax parameter paths of this package's from-scratch
backbones, producing the npz that ``models.pretrained.load_pretrained_npz``
merges at train time.

Key design: each architecture has a *spec* — an explicit list of
``(kind, torch_key, flax_path)`` rules — so the mapping is unit-testable
without timm: tests synthesize a state_dict with the inverse shapes and
assert every backbone parameter (and BatchNorm running stat) is covered.

Layout transforms (torch → Flax):
  conv    (Co, Ci, H, W)  → kernel (H, W, Ci, Co)
  dwconv  (C, 1, H, W)    → kernel (H, W, 1, C)   [feature_group_count=C]
  dense   (O, I)          → kernel (I, O)
  bn      weight/bias → scale/bias (params); running_mean/var → mean/var
          (batch_stats — emitted under the 'batch_stats/' npz namespace)
  qkv     fused (3D, D) → separate query/key/value kernels (D, h, hd)
  stem convs adapt in_chans the timm way: RGB kernels summed over Ci for
  single-channel inputs (timm adapt_input_conv semantics).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

Spec = Tuple  # (kind, torch_key, flax_path[, extra])


# ---------------------------------------------------------------- specs

def _spec_efficientnet(depth_mult: float) -> List[Spec]:
    from .image.efficientnet import _B0_STAGES, _round_repeats

    specs: List[Spec] = [
        ("conv_in", "conv_stem.weight", "stem_conv/kernel"),
        ("bn", "bn1", "stem_bn"),
    ]
    for si, (expand, _ch, repeats, _stride, _k) in enumerate(_B0_STAGES):
        for b in range(_round_repeats(repeats, depth_mult)):
            t = f"blocks.{si}.{b}."
            f = f"stage{si + 1}_block{b}/"
            if expand == 1:  # timm DepthwiseSeparableConv (stage 0)
                specs += [
                    ("dwconv", t + "conv_dw.weight", f + "dw_conv/kernel"),
                    ("bn", t + "bn1", f + "dw_bn"),
                    ("convb", t + "se.conv_reduce", f + "se/reduce"),
                    ("convb", t + "se.conv_expand", f + "se/expand"),
                    ("conv", t + "conv_pw.weight", f + "project_conv/kernel"),
                    ("bn", t + "bn2", f + "project_bn"),
                ]
            else:  # timm InvertedResidual
                specs += [
                    ("conv", t + "conv_pw.weight", f + "expand_conv/kernel"),
                    ("bn", t + "bn1", f + "expand_bn"),
                    ("dwconv", t + "conv_dw.weight", f + "dw_conv/kernel"),
                    ("bn", t + "bn2", f + "dw_bn"),
                    ("convb", t + "se.conv_reduce", f + "se/reduce"),
                    ("convb", t + "se.conv_expand", f + "se/expand"),
                    ("conv", t + "conv_pwl.weight", f + "project_conv/kernel"),
                    ("bn", t + "bn3", f + "project_bn"),
                ]
    specs += [
        ("conv", "conv_head.weight", "head_conv/kernel"),
        ("bn", "bn2", "head_bn"),
    ]
    return specs


def _spec_vit(depth: int, num_heads: int) -> List[Spec]:
    specs: List[Spec] = [
        ("raw", "cls_token", "cls_token"),
        ("raw", "pos_embed", "pos_embed"),
        ("conv_in", "patch_embed.proj.weight", "patch_embed/kernel"),
        ("raw", "patch_embed.proj.bias", "patch_embed/bias"),
    ]
    for i in range(depth):
        t = f"blocks.{i}."
        f = f"block_{i}/"
        specs += [
            ("ln", t + "norm1", f + "ln1"),
            ("qkv", t + "attn.qkv", f + "attn", num_heads),
            ("attn_out", t + "attn.proj", f + "attn/out", num_heads),
            ("ln", t + "norm2", f + "ln2"),
            ("dense", t + "mlp.fc1", f + "mlp1"),
            ("dense", t + "mlp.fc2", f + "mlp2"),
        ]
    specs.append(("ln", "norm", "ln_final"))
    return specs


def _spec_resnet(stage_sizes: Sequence[int], bottleneck: bool) -> List[Spec]:
    specs: List[Spec] = [
        ("conv_in", "conv1.weight", "stem_conv/kernel"),
        ("bn", "bn1", "stem_bn"),
    ]
    expansion = 4 if bottleneck else 1
    in_ch = 64
    for stage, repeats in enumerate(stage_sizes):
        width = 64 * (2 ** stage)
        for b in range(repeats):
            t = f"layer{stage + 1}.{b}."
            f = f"stage{stage + 1}_block{b}/"
            n_convs = 3 if bottleneck else 2
            for c in range(1, n_convs + 1):
                specs += [
                    ("conv", t + f"conv{c}.weight", f + f"conv{c}/kernel"),
                    ("bn", t + f"bn{c}", f + f"bn{c}"),
                ]
            stride = 2 if (stage > 0 and b == 0) else 1
            if b == 0 and (stride != 1 or in_ch != width * expansion):
                specs += [
                    ("conv", t + "downsample.0.weight", f + "proj_conv/kernel"),
                    ("bn", t + "downsample.1", f + "proj_bn"),
                ]
            in_ch = width * expansion
    return specs


def _spec_densenet(block_config: Sequence[int]) -> List[Spec]:
    specs: List[Spec] = [
        ("conv_in", "features.conv0.weight", "stem_conv/kernel"),
        ("bn", "features.norm0", "stem_bn"),
    ]
    for bi, n_layers in enumerate(block_config):
        for li in range(n_layers):
            t = f"features.denseblock{bi + 1}.denselayer{li + 1}."
            f = f"block{bi + 1}_layer{li}/"
            specs += [
                ("bn", t + "norm1", f + "bn1"),
                ("conv", t + "conv1.weight", f + "conv1/kernel"),
                ("bn", t + "norm2", f + "bn2"),
                ("conv", t + "conv2.weight", f + "conv2/kernel"),
            ]
        if bi != len(block_config) - 1:
            specs += [
                ("bn", f"features.transition{bi + 1}.norm",
                 f"trans{bi + 1}_bn"),
                ("conv", f"features.transition{bi + 1}.conv.weight",
                 f"trans{bi + 1}_conv/kernel"),
            ]
    specs.append(("bn", "features.norm5", "final_bn"))
    return specs


ARCH_SPECS = {
    "efficientnet_b0": lambda: _spec_efficientnet(1.0),
    "efficientnet_b1": lambda: _spec_efficientnet(1.1),
    "vit_tiny_patch16_224": lambda: _spec_vit(12, 3),
    "vit_small_patch16_224": lambda: _spec_vit(12, 6),
    "vit_small_patch32_224": lambda: _spec_vit(12, 6),
    "resnet18": lambda: _spec_resnet((2, 2, 2, 2), False),
    "resnet50": lambda: _spec_resnet((3, 4, 6, 3), True),
    "densenet121": lambda: _spec_densenet((6, 12, 24, 16)),
    "densenet169": lambda: _spec_densenet((6, 12, 32, 32)),
}


# ----------------------------------------------------------- transforms

def _adapt_in_chans(w: np.ndarray, in_chans: int) -> np.ndarray:
    """timm adapt_input_conv: torch (Co, Ci, H, W) → target input channels."""
    src = w.shape[1]
    if src == in_chans:
        return w
    if in_chans == 1:
        return w.sum(axis=1, keepdims=True)
    if src == 1:
        return np.repeat(w, in_chans, axis=1) / in_chans
    raise ValueError(f"cannot adapt conv in_chans {src} -> {in_chans}")


def convert_state_dict(arch: str, sd: Dict[str, np.ndarray],
                       in_chans: int = 1
                       ) -> Tuple[Dict[str, np.ndarray],
                                  Dict[str, np.ndarray], List[str]]:
    """Map a torch state_dict to (params_flat, batch_stats_flat, missing).

    ``missing`` lists spec torch_keys absent from ``sd`` (e.g. a truncated
    file); classifier heads (``classifier.*``/``fc.*``/``head.*``) in ``sd``
    are ignored by construction since no spec references them.
    """
    if arch not in ARCH_SPECS:
        raise ValueError(f"no converter spec for {arch!r}; "
                         f"known: {sorted(ARCH_SPECS)}")
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}
    missing: List[str] = []

    def take(key):
        if key not in sd:
            missing.append(key)
            return None
        return sd[key]

    for spec in ARCH_SPECS[arch]():
        kind, tkey, fpath = spec[:3]
        if kind in ("conv", "conv_in", "dwconv"):
            w = take(tkey)
            if w is None:
                continue
            if kind == "conv_in":
                w = _adapt_in_chans(w, in_chans)
            params[fpath] = w.transpose(2, 3, 1, 0)
        elif kind == "convb":  # 1x1 conv with bias (SE)
            w, b = take(tkey + ".weight"), take(tkey + ".bias")
            if w is not None:
                params[fpath + "/kernel"] = w.transpose(2, 3, 1, 0)
            if b is not None:
                params[fpath + "/bias"] = b
        elif kind == "dense":
            w, b = take(tkey + ".weight"), take(tkey + ".bias")
            if w is not None:
                params[fpath + "/kernel"] = w.T
            if b is not None:
                params[fpath + "/bias"] = b
        elif kind == "bn":
            m = {"weight": "/scale", "bias": "/bias"}
            for suf, out in m.items():
                v = take(f"{tkey}.{suf}")
                if v is not None:
                    params[fpath + out] = v
            for suf, out in (("running_mean", "/mean"),
                             ("running_var", "/var")):
                v = take(f"{tkey}.{suf}")
                if v is not None:
                    stats[fpath + out] = v
        elif kind == "ln":
            w, b = take(tkey + ".weight"), take(tkey + ".bias")
            if w is not None:
                params[fpath + "/scale"] = w
            if b is not None:
                params[fpath + "/bias"] = b
        elif kind == "raw":
            v = take(tkey)
            if v is not None:
                params[fpath] = v
        elif kind == "qkv":
            heads = spec[3]
            w, b = take(tkey + ".weight"), take(tkey + ".bias")
            if w is not None:
                d = w.shape[1]
                hd = d // heads
                for i, name in enumerate(("query", "key", "value")):
                    wi = w[i * d:(i + 1) * d]          # (D_out, D_in)
                    params[f"{fpath}/{name}/kernel"] = \
                        wi.T.reshape(d, heads, hd)
                    if b is not None:
                        params[f"{fpath}/{name}/bias"] = \
                            b[i * d:(i + 1) * d].reshape(heads, hd)
        elif kind == "attn_out":
            heads = spec[3]
            w, b = take(tkey + ".weight"), take(tkey + ".bias")
            if w is not None:
                d_out, d_in = w.shape
                hd = d_in // heads
                params[fpath + "/kernel"] = w.T.reshape(heads, hd, d_out)
            if b is not None:
                params[fpath + "/bias"] = b
        else:  # pragma: no cover
            raise ValueError(f"unknown spec kind {kind!r}")
    return params, stats, missing


# ------------------------------------------------------------- file I/O

def read_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``state_dict`` file into numpy, supporting
    ``.safetensors`` (torch-free) and ``torch.save`` formats."""
    if str(path).endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file
            return dict(load_file(path))
        except ImportError:
            from safetensors import safe_open
            out = {}
            with safe_open(path, framework="np") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
            return out
    import torch  # cpu build is available in this environment
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def convert_to_npz(arch: str, src_path: str, out_path: str,
                   in_chans: int = 1,
                   prefix: str = "image_encoder/backbone") -> Dict[str, int]:
    """Convert ``src_path`` (timm weights for ``arch``) into the npz layout
    ``models.pretrained.load_pretrained_npz`` consumes: keys
    ``params/<prefix>/<path>`` and ``batch_stats/<prefix>/<path>``."""
    sd = read_torch_file(src_path)
    params, stats, missing = convert_state_dict(arch, sd, in_chans=in_chans)
    if missing:
        raise KeyError(f"{len(missing)} expected torch keys absent from "
                       f"{src_path}: {missing[:8]}{'...' if len(missing) > 8 else ''}")
    pre = (prefix + "/") if prefix else ""
    out = {f"params/{pre}{k}": v for k, v in params.items()}
    out.update({f"batch_stats/{pre}{k}": v for k, v in stats.items()})
    np.savez(out_path, **out)
    return {"params": len(params), "batch_stats": len(stats)}


# -------------------------------------------------- test-support helper

def synthesize_state_dict(arch: str, flax_params: Dict, flax_stats: Dict,
                          src_in_chans: int = 3,
                          seed: int = 0) -> Dict[str, np.ndarray]:
    """Build a random torch-shaped state_dict covering exactly the keys the
    ``arch`` spec consumes, with shapes inverse-derived from an initialized
    Flax tree. Test-only: lets the mapping be validated without timm."""
    from .pretrained import flatten_params

    fp = flatten_params(flax_params)
    fs = flatten_params(flax_stats)
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}

    def rand(shape):
        return rng.standard_normal(shape).astype(np.float32)

    for spec in ARCH_SPECS[arch]():
        kind, tkey, fpath = spec[:3]
        if kind in ("conv", "conv_in", "dwconv"):
            h, w, ci, co = fp[fpath].shape
            if kind == "conv_in":
                ci = src_in_chans
            sd[tkey] = rand((co, ci, h, w))
        elif kind == "convb":
            h, w, ci, co = fp[fpath + "/kernel"].shape
            sd[tkey + ".weight"] = rand((co, ci, h, w))
            sd[tkey + ".bias"] = rand((co,))
        elif kind == "dense":
            i, o = fp[fpath + "/kernel"].shape
            sd[tkey + ".weight"] = rand((o, i))
            sd[tkey + ".bias"] = rand((o,))
        elif kind == "bn":
            n = fp[fpath + "/scale"].shape[0]
            sd[tkey + ".weight"] = rand((n,))
            sd[tkey + ".bias"] = rand((n,))
            sd[tkey + ".running_mean"] = rand((n,))
            sd[tkey + ".running_var"] = np.abs(rand((n,))) + 0.5
        elif kind == "ln":
            n = fp[fpath + "/scale"].shape[0]
            sd[tkey + ".weight"] = rand((n,))
            sd[tkey + ".bias"] = rand((n,))
        elif kind == "raw":
            sd[tkey] = rand(fp[fpath].shape)
        elif kind == "qkv":
            d, h, hd = fp[fpath + "/query/kernel"].shape
            sd[tkey + ".weight"] = rand((3 * d, d))
            sd[tkey + ".bias"] = rand((3 * d,))
        elif kind == "attn_out":
            h, hd, d = fp[fpath + "/kernel"].shape
            sd[tkey + ".weight"] = rand((d, h * hd))
            sd[tkey + ".bias"] = rand((d,))
    return sd

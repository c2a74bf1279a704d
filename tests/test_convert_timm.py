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

"""Fused attention-BLOCK kernel (QKV + MHA + out projection in one Pallas
call, ops/pallas/experimental/attention_block.py) parity tests.

Interpret mode on the CPU test platform; same kernels compile through
Mosaic on TPU (hardware numbers in docs/PERF.md). Shapes cover both
flagship configurations: ViT-T (3 heads x 64) and the reference
ProfileTransformer (8 heads x 24, reference src/profile_encoder.py:14-27).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_plankton_recognition_tpu.ops.pallas.experimental.attention_block import (
    attn_block, attn_block_reference,
)


def _inputs(b, l, e, seed=0, dtype=jnp.float32):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(b, l, e), dtype)
    ws = {}
    for name in ("wq", "wk", "wv", "wo"):
        ws[name] = jnp.asarray(rs.randn(e, e) / np.sqrt(e), jnp.float32)
    for name in ("bq", "bk", "bv", "bo"):
        ws[name] = jnp.asarray(rs.randn(e) * 0.1, jnp.float32)
    return x, ws


def _mask_bias(b, l, seed=1):
    rs = np.random.RandomState(seed)
    pad = rs.rand(b, l) < 0.3
    pad[:, 0] = False
    return jnp.where(jnp.asarray(pad), -1e9, 0.0).astype(jnp.float32)


def _call(x, ws, bias, heads, **kw):
    seed = jnp.zeros((), jnp.int32)
    args = (x, ws["wq"], ws["bq"], ws["wk"], ws["bk"], ws["wv"], ws["bv"],
            ws["wo"], ws["bo"], bias, seed)
    defaults = dict(dropout_p=0.0, train=False, interpret=True,
                    has_bias=True)
    defaults.update(kw)
    return attn_block(*args, heads, defaults["dropout_p"],
                      defaults["train"], defaults["interpret"],
                      defaults["has_bias"])


@pytest.mark.parametrize("heads,l,e", [(3, 197, 192), (8, 225, 192)])
def test_block_matches_reference_fwd(heads, l, e):
    b = 4
    x, ws = _inputs(b, l, e, dtype=jnp.bfloat16)
    bias = _mask_bias(b, l)
    out = _call(x, ws, bias, heads)
    ref = attn_block_reference(x, ws["wq"], ws["bq"], ws["wk"], ws["bk"],
                               ws["wv"], ws["bv"], ws["wo"], ws["bo"],
                               bias, heads)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("heads,l,e", [(4, 64, 64)])
def test_block_grads_match_reference(heads, l, e):
    """All 10 differentiable inputs (x, 4 weights, 4 biases, mask bias)."""
    b = 2
    x, ws = _inputs(b, l, e, dtype=jnp.float32)
    bias = _mask_bias(b, l)
    names = ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo")

    def loss_k(x, bias, *w):
        wd = dict(zip(names, w))
        return jnp.sum(_call(x, wd, bias, heads).astype(jnp.float32) ** 2)

    def loss_r(x, bias, *w):
        o = attn_block_reference(x, *w, bias, heads)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    args = (x, bias) + tuple(ws[n] for n in names)
    argnums = tuple(range(len(args)))
    gk = jax.grad(loss_k, argnums=argnums)(*args)
    gr = jax.grad(loss_r, argnums=argnums)(*args)
    for name, a, b_ in zip(("x", "bias") + names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=0.05, atol=0.05, err_msg=f"grad mismatch for {name}")


def test_block_module_path_matches_unfused(monkeypatch):
    """FusedSelfAttention with fuse_projections routes through attn_block
    and must match the einsum/unfused composition on the SAME param tree."""
    from multimodal_plankton_recognition_tpu.models.attention import (
        FusedSelfAttention,
    )

    monkeypatch.setenv("PLANKTON_FUSED_INTERPRET", "1")
    b, l, e, h = 2, 33, 48, 4
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(b, l, e), jnp.bfloat16)
    pad = jnp.asarray(rs.rand(b, l) < 0.25)
    pad = pad.at[:, 0].set(False)

    fused = FusedSelfAttention(num_heads=h, dtype=jnp.bfloat16,
                               fuse_projections=True)
    unfused = FusedSelfAttention(num_heads=h, dtype=jnp.bfloat16,
                                 fuse_projections=False)
    variables = fused.init(jax.random.key(0), x, pad)
    # identical param tree between the two paths (checkpoint compat)
    monkeypatch.setenv("PLANKTON_ATTN_FUSE_PROJ", "0")
    v2 = unfused.init(jax.random.key(0), x, pad)
    assert jax.tree.map(jnp.shape, variables) == jax.tree.map(jnp.shape, v2)

    monkeypatch.setenv("PLANKTON_ATTN_FUSE_PROJ", "1")
    y_fused = fused.apply(variables, x, pad)
    monkeypatch.setenv("PLANKTON_ATTN_FUSE_PROJ", "0")
    y_unfused = unfused.apply(variables, x, pad)
    np.testing.assert_allclose(np.asarray(y_fused, np.float32),
                               np.asarray(y_unfused, np.float32),
                               rtol=0.06, atol=0.06)


def test_block_env_knob_overrides(monkeypatch):
    from multimodal_plankton_recognition_tpu.models.attention import (
        FusedSelfAttention,
    )
    m = FusedSelfAttention(num_heads=2, fuse_projections=True)
    monkeypatch.setenv("PLANKTON_ATTN_FUSE_PROJ", "0")
    assert not m._fuse_proj_enabled()
    monkeypatch.setenv("PLANKTON_ATTN_FUSE_PROJ", "1")
    assert FusedSelfAttention(
        num_heads=2, fuse_projections=False)._fuse_proj_enabled()
    monkeypatch.delenv("PLANKTON_ATTN_FUSE_PROJ")
    assert m._fuse_proj_enabled()

"""Fused multi-head attention kernel + module parity tests.

Kernel parity runs in Pallas interpret mode on the CPU test platform; the
same kernels compile through Mosaic on TPU (hardware-verified numbers in
docs/PERF.md). Shapes cover both flagship configurations: ViT-T (3 heads x
64) and the reference ProfileTransformer (8 heads x 24,
reference src/profile_encoder.py:14-27).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from multimodal_plankton_recognition_tpu.models.attention import (
    FusedSelfAttention,
)
from multimodal_plankton_recognition_tpu.ops.pallas.attention import (
    mha_core, mha_core_qkv, mha_reference,
)


def _rand_qkv(b, l, e, seed=0, dtype=jnp.bfloat16):
    rs = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rs.randn(b, l, e), dtype)  # noqa: E731
    return mk(), mk(), mk()


def _mask_bias(b, l, seed=1):
    rs = np.random.RandomState(seed)
    pad = rs.rand(b, l) < 0.3
    pad[:, 0] = False  # CLS always valid
    return jnp.where(jnp.asarray(pad), -1e9, 0.0).astype(jnp.float32), pad


@pytest.mark.parametrize("narrow", [True, False])
@pytest.mark.parametrize("heads,l,e", [(3, 197, 192), (8, 225, 192)])
def test_kernel_matches_reference_fwd(heads, l, e, narrow):
    b = 4
    q, k, v = _rand_qkv(b, l, e)
    bias, _ = _mask_bias(b, l)
    seed = jnp.zeros((), jnp.int32)
    out = mha_core(q, k, v, bias, seed, heads, 0.0, False, True, narrow)
    ref = mha_reference(q, k, v, bias, heads)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("heads,l,e", [(3, 197, 192), (8, 64, 64)])
def test_kernel_no_bias_specialization(heads, l, e):
    """has_bias=False (the unmasked image-encoder attention) must equal the
    bias path with zeros — fwd and q/k/v grads — and return a zero bias
    cotangent without the per-head reduction."""
    b = 2
    q, k, v = _rand_qkv(b, l, e, dtype=jnp.float32)
    zero_bias = jnp.zeros((b, l), jnp.float32)
    seed = jnp.zeros((), jnp.int32)

    out_nb = mha_core(q, k, v, zero_bias, seed, heads, 0.0, False, True,
                      True, False)
    out_b = mha_core(q, k, v, zero_bias, seed, heads, 0.0, False, True,
                     True, True)
    np.testing.assert_allclose(np.asarray(out_nb, np.float32),
                               np.asarray(out_b, np.float32),
                               rtol=1e-5, atol=1e-5)

    def loss(q, k, v, bias, has_bias):
        o = mha_core(q, k, v, bias, seed, heads, 0.0, False, True, True,
                     has_bias)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_nb = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, zero_bias, False)
    g_b = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, zero_bias, True)
    for a, b_ in zip(g_nb[:3], g_b[:3]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(g_nb[3]), 0.0)


@pytest.mark.parametrize("heads,l,e", [(8, 64, 64)])
def test_kernel_matches_reference_grad(heads, l, e):
    b = 2
    q, k, v = _rand_qkv(b, l, e, dtype=jnp.float32)
    bias, _ = _mask_bias(b, l)
    seed = jnp.zeros((), jnp.int32)

    def loss_kernel(q, k, v):
        o = mha_core(q, k, v, bias, seed, heads, 0.0, False, True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        o = mha_reference(q, k, v, bias, heads)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=0.05, atol=0.05)


def test_kernel_bias_gradient_matches_reference():
    """The bias cotangent is real (sum of dz over heads and query rows) —
    a learned additive bias (e.g. relative positions) would train with the
    correct gradient, not silently zero (round-2 advisor finding)."""
    heads, b, l, e = 4, 2, 32, 64
    q, k, v = _rand_qkv(b, l, e, dtype=jnp.float32)
    rs = np.random.RandomState(11)
    bias = jnp.asarray(rs.randn(b, l) * 0.5, jnp.float32)
    seed = jnp.zeros((), jnp.int32)

    def loss_kernel(bias):
        o = mha_core(q, k, v, bias, seed, heads, 0.0, False, True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(bias):
        o = mha_reference(q, k, v, bias, heads)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gk = jax.grad(loss_kernel)(bias)
    gr = jax.grad(loss_ref)(bias)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=0.05, atol=0.05)


def test_kernel_dropout_statistics():
    """Train-mode dropout: ~p of the prob mass dropped, kept entries scaled
    by 1/(1-p); row means of the output stay near the no-drop output.

    TPU-only: the kernel PRNG (pltpu.prng_random_bits) has no interpret-mode
    implementation, so this runs when the suite executes on real hardware
    (scripts/attention_probe.py covers it in the TPU verification runs)."""
    if jax.default_backend() != "tpu":
        pytest.skip("kernel PRNG requires a TPU backend")
    heads, b, l, e, p = 4, 2, 64, 64, 0.5
    q, k, v = _rand_qkv(b, l, e, dtype=jnp.float32)
    bias = jnp.zeros((b, l), jnp.float32)
    base = mha_core(q, k, v, bias, jnp.zeros((), jnp.int32),
                    heads, 0.0, False, False)
    seeds = [jnp.asarray(s, jnp.int32) for s in (7, 99, 1234)]
    outs = [np.asarray(mha_core(q, k, v, bias, s, heads, p, True, False),
                       np.float32) for s in seeds]
    # different seeds -> different masks
    assert not np.allclose(outs[0], outs[1])
    # dropout is unbiased: the seed-average approaches the base output
    avg = np.mean(outs, axis=0)
    err = np.abs(avg - np.asarray(base, np.float32)).mean()
    scale = np.abs(np.asarray(base, np.float32)).mean()
    assert err < 0.6 * scale


def test_module_matches_flax_mha_param_tree():
    """FusedSelfAttention's params are interchangeable with flax MHA's:
    init one, apply the other, outputs agree (eval mode, no dropout)."""
    b, l, e, heads = 2, 33, 48, 4
    x = jnp.asarray(np.random.RandomState(0).randn(b, l, e), jnp.float32)

    fused = FusedSelfAttention(num_heads=heads, dropout_rate=0.0,
                               dtype=jnp.float32)
    params = fused.init(jax.random.key(0), x)["params"]

    flax_mha = nn.MultiHeadDotProductAttention(
        num_heads=heads, dtype=jnp.float32, dropout_rate=0.0,
        deterministic=True)
    out_flax = flax_mha.apply({"params": params}, x, x, x)
    out_fused = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_flax),
                               rtol=2e-3, atol=2e-3)


def test_module_padding_mask_matches_flax():
    b, l, e, heads = 2, 19, 32, 8
    x = jnp.asarray(np.random.RandomState(3).randn(b, l, e), jnp.float32)
    _, pad = _mask_bias(b, l, seed=5)
    pad = jnp.asarray(pad)

    fused = FusedSelfAttention(num_heads=heads, dropout_rate=0.0,
                               dtype=jnp.float32)
    params = fused.init(jax.random.key(0), x, pad)["params"]
    out_fused = fused.apply({"params": params}, x, pad)

    flax_mha = nn.MultiHeadDotProductAttention(
        num_heads=heads, dtype=jnp.float32, dropout_rate=0.0,
        deterministic=True)
    out_flax = flax_mha.apply({"params": params}, x, x, x,
                              mask=(~pad)[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_flax),
                               rtol=2e-3, atol=2e-3)


def test_transformer_encoders_build_with_fused_flag():
    """Both flagship encoders accept fused_attention and keep the same
    parameter tree as the unfused build (checkpoint compatibility)."""
    from multimodal_plankton_recognition_tpu.models.profile.factory import (
        create_profile_encoder,
    )
    from multimodal_plankton_recognition_tpu.models.image.registry import (
        create_backbone,
    )

    args = {"kind": "transformer", "dim_in": 6, "dim_hidden": 32,
            "num_head": 4, "num_layers": 1, "target_size": 16,
            "dim_feedforward": 64}
    enc_a = create_profile_encoder(dict(args, fused_attention=True))
    enc_b = create_profile_encoder(args)
    prof = jnp.zeros((2, 17, 6))
    time = jnp.zeros((2, 17), jnp.int32)
    mask = jnp.zeros((2, 17), bool)
    plen = jnp.ones((2, 1), jnp.int32)
    va = enc_a.init(jax.random.key(0), prof, time, mask, plen)
    vb = enc_b.init(jax.random.key(0), prof, time, mask, plen)
    ta = jax.tree.structure(va)
    tb = jax.tree.structure(vb)
    assert ta == tb
    oa = enc_a.apply(va, prof, time, mask, plen)
    ob = enc_b.apply(vb, prof, time, mask, plen)
    assert oa.shape == ob.shape

    vit_a = create_backbone("vit_tiny_patch16_224", in_chans=1,
                            fused_attention=True)
    vit_b = create_backbone("vit_tiny_patch16_224", in_chans=1)
    img = jnp.zeros((1, 224, 224, 1))
    pa = vit_a.init(jax.random.key(0), img)
    pb = vit_b.init(jax.random.key(0), img)
    assert jax.tree.structure(pa) == jax.tree.structure(pb)


def test_fused_flag_shards_on_multi_device_mesh():
    """With fused_attention on, a GSPMD-sharded batch must still work: on
    any multi-device mesh the module takes the einsum fallback (a
    pallas_call has no partitioning rule — the round-2 review fix), which
    XLA shards cleanly. Exercised on the virtual 8-device CPU mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from multimodal_plankton_recognition_tpu.models.profile.factory import (
        create_profile_encoder,
    )

    devs = np.array(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devs, ("data", "model"))
    enc = create_profile_encoder(
        {"kind": "transformer", "dim_in": 6, "dim_hidden": 32,
         "num_head": 4, "num_layers": 1, "target_size": 16,
         "dim_feedforward": 64, "fused_attention": True})
    prof = jnp.zeros((16, 17, 6))
    time = jnp.zeros((16, 17), jnp.int32)
    mask = jnp.zeros((16, 17), bool)
    plen = jnp.ones((16, 1), jnp.int32)
    variables = enc.init(jax.random.key(0), prof, time, mask, plen)

    batch_sharding = NamedSharding(mesh, P("data"))
    prof = jax.device_put(prof, NamedSharding(mesh, P("data", None, None)))
    time = jax.device_put(time, batch_sharding)
    mask = jax.device_put(mask, batch_sharding)
    plen = jax.device_put(plen, batch_sharding)

    out = jax.jit(lambda v, p, t, m, pl_: enc.apply(v, p, t, m, pl_))(
        variables, prof, time, mask, plen)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_block_b_env_knob_is_defensive(monkeypatch):
    """PLANKTON_ATTN_BLOCK_B is a perf-probe override; malformed values are
    ignored and valid ones are capped at 8 so a stale export cannot
    VMEM-OOM or crash a training run."""
    from multimodal_plankton_recognition_tpu.ops.pallas.attention import (
        _pick_block_b,
    )

    assert _pick_block_b(256) == 4                      # default limit
    monkeypatch.setenv("PLANKTON_ATTN_BLOCK_B", "8")
    assert _pick_block_b(256) == 8
    monkeypatch.setenv("PLANKTON_ATTN_BLOCK_B", "64")   # capped
    assert _pick_block_b(256) == 8
    monkeypatch.setenv("PLANKTON_ATTN_BLOCK_B", "8x")   # malformed: default
    assert _pick_block_b(256) == 4
    monkeypatch.setenv("PLANKTON_ATTN_BLOCK_B", "0")    # degenerate: 1
    assert _pick_block_b(256) == 1
    assert _pick_block_b(7) == 1                        # odd batch: 1 always


@pytest.mark.parametrize("heads,l,e", [(3, 197, 192), (8, 225, 192)])
def test_stacked_kernel_matches_reference_fwd(heads, l, e):
    b = 4
    q, k, v = _rand_qkv(b, l, e)
    bias, _ = _mask_bias(b, l)
    seed = jnp.zeros((), jnp.int32)
    out = mha_core(q, k, v, bias, seed, heads, 0.0, False, True, True,
                   True, True)
    ref = mha_reference(q, k, v, bias, heads)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("heads,l,e", [(8, 64, 64), (4, 33, 64)])
def test_stacked_kernel_matches_reference_grad(heads, l, e):
    """Stacked softmax backward: q/k/v AND bias cotangents (the pad-row
    garbage in the (H*L8, L) scratch must never leak into any gradient —
    l=33 makes L8=40 > L so the pad rows exist)."""
    b = 2
    q, k, v = _rand_qkv(b, l, e, dtype=jnp.float32)
    bias, _ = _mask_bias(b, l)
    seed = jnp.zeros((), jnp.int32)

    def loss_kernel(q, k, v, bias):
        o = mha_core(q, k, v, bias, seed, heads, 0.0, False, True, True,
                     True, True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v, bias):
        o = mha_reference(q, k, v, bias, heads)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b_ in zip("qkvb", gk, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=0.05, atol=0.05,
                                   err_msg=f"grad mismatch for d{name}")


@pytest.mark.parametrize("heads,l,e", [(3, 197, 192), (8, 225, 192)])
def test_qkv_packed_kernel_matches_reference_fwd(heads, l, e):
    """Packed-QKV variant (one (B, L, 3E) operand, VERDICT r4 #2 lever)
    against the plain-jnp oracle."""
    b = 4
    q, k, v = _rand_qkv(b, l, e)
    bias, _ = _mask_bias(b, l)
    seed = jnp.zeros((), jnp.int32)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    out = mha_core_qkv(qkv, bias, seed, heads, 0.0, False, True, True)
    ref = mha_reference(q, k, v, bias, heads)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("heads,l,e", [(8, 64, 64), (4, 33, 64)])
def test_qkv_packed_kernel_matches_reference_grad(heads, l, e):
    """Packed-QKV backward: the single (B, L, 3E) dqkv must equal the
    concatenated per-operand reference cotangents (l=33 keeps the L8>L
    pad-row case covered), plus the bias cotangent."""
    b = 2
    q, k, v = _rand_qkv(b, l, e, dtype=jnp.float32)
    bias, _ = _mask_bias(b, l)
    seed = jnp.zeros((), jnp.int32)
    qkv = jnp.concatenate([q, k, v], axis=-1)

    def loss_kernel(qkv, bias):
        o = mha_core_qkv(qkv, bias, seed, heads, 0.0, False, True, True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(qkv, bias):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = mha_reference(q, k, v, bias, heads)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(qkv, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    for name, a, b_ in zip(("qkv", "bias"), gk, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=0.05, atol=0.05,
                                   err_msg=f"grad mismatch for d{name}")


def test_qkv_packed_module_path_matches_unpacked(monkeypatch):
    """FusedSelfAttention with PLANKTON_ATTN_QKV_PACKED on/off must produce
    the same deterministic output from the SAME param tree (the packed GEMM
    is a concat view of the query/key/value kernels)."""
    monkeypatch.setenv("PLANKTON_FUSED_INTERPRET", "1")
    b, l, e, h = 2, 33, 64, 4
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(b, l, e), jnp.bfloat16)
    mod = FusedSelfAttention(num_heads=h, dropout_rate=0.0,
                             dtype=jnp.bfloat16)
    variables = mod.init(jax.random.key(0), x)
    monkeypatch.setenv("PLANKTON_ATTN_QKV_PACKED", "0")
    o0 = mod.apply(variables, x)
    monkeypatch.setenv("PLANKTON_ATTN_QKV_PACKED", "1")
    o1 = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(o0, np.float32),
                               np.asarray(o1, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("heads,l,e", [(3, 197, 192), (8, 225, 192)])
def test_softmax_bf16_probe_fwd(heads, l, e, monkeypatch):
    """PLANKTON_SOFTMAX_BF16=1 (VERDICT r4 #2's bf16-softmax lever): the
    stacked kernels' softmax chain and scratch round-trips run in bf16.
    Scores still accumulate f32 on the MXU, so the result must stay within
    bf16's ~2^-8 relative band of the f32 oracle — both the stacked and the
    packed-QKV variants."""
    monkeypatch.setenv("PLANKTON_SOFTMAX_BF16", "1")
    b = 4
    q, k, v = _rand_qkv(b, l, e)
    bias, _ = _mask_bias(b, l)
    seed = jnp.zeros((), jnp.int32)
    ref = mha_reference(q, k, v, bias, heads)
    out = mha_core(q, k, v, bias, seed, heads, 0.0, False, True, True,
                   True, True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.1, atol=0.1)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    out_p = mha_core_qkv(qkv, bias, seed, heads, 0.0, False, True, True)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.1, atol=0.1)


def test_softmax_bf16_probe_grad(monkeypatch):
    """bf16-softmax backward: all cotangents (incl. the bias grad, whose
    per-head reduction now sums bf16 dz rows into an f32 accumulator) stay
    within bf16 tolerance of the f32 oracle; pad rows (l=33 -> L8=40) must
    still never leak."""
    monkeypatch.setenv("PLANKTON_SOFTMAX_BF16", "1")
    heads, l, e, b = 4, 33, 64, 2
    q, k, v = _rand_qkv(b, l, e, dtype=jnp.float32)
    bias, _ = _mask_bias(b, l)
    seed = jnp.zeros((), jnp.int32)
    qkv = jnp.concatenate([q, k, v], axis=-1)

    def loss_kernel(qkv, bias):
        o = mha_core_qkv(qkv, bias, seed, heads, 0.0, False, True, True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(qkv, bias):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = mha_reference(q, k, v, bias, heads)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(qkv, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    for name, a, b_ in zip(("qkv", "bias"), gk, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=0.1, atol=0.15,
                                   err_msg=f"grad mismatch for d{name}")

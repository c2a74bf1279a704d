"""Fused MBConv Pallas kernel tests (interpret mode on CPU).

1. kernel-level parity: mbconv_core forward + every gradient vs the plain
   jnp composition (mbconv_reference), expand_ratio 6 and 1, k 3 and 5;
2. model-level parity: a fused-mode EfficientNet produces the same train
   and eval outputs and BatchNorm running-stats updates as the unfused
   module when driven by the SAME parameters (the fused layout declares an
   identical parameter tree by construction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_plankton_recognition_tpu.ops.pallas.experimental.mbconv import (
    mbconv_core, mbconv_reference,
)
from multimodal_plankton_recognition_tpu.models.image.efficientnet import (
    EfficientNet,
)


@pytest.fixture
def force_kernel(monkeypatch):
    """The fused module path gates the Pallas kernel to single-chip TPU
    backends; the CPU parity tests force it (interpret mode) via the env
    escape hatch (models/image/efficientnet.py)."""
    monkeypatch.setenv("PLANKTON_FUSED_INTERPRET", "1")


def _params(cin, mid, cout, k, r, seed=0, expand=True):
    rs = np.random.RandomState(seed)
    f = lambda *s: jnp.asarray(rs.randn(*s) * 0.3, jnp.float32)
    return dict(
        wexp=f(cin, mid) if expand else None,
        g1=1.0 + 0.1 * f(mid) if expand else None,
        b1=0.1 * f(mid) if expand else None,
        wdw=f(k, k, 1, mid) * 0.5,
        g2=1.0 + 0.1 * f(mid), b2=0.1 * f(mid),
        wr=f(mid, r), br=0.1 * f(r),
        we=f(r, mid), be=0.1 * f(mid),
        wproj=f(mid, cout),
    )


@pytest.mark.parametrize("expand_ratio,k", [(6, 3), (1, 3), (6, 5)])
def test_mbconv_core_matches_reference(expand_ratio, k):
    B, H, W, cin = 4, 8, 8, 8
    cout = 16 if expand_ratio != 1 else cin
    expand = expand_ratio != 1
    mid = cin * expand_ratio
    p = _params(cin, mid, cout, k, max(1, cin // 4), seed=k, expand=expand)
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(B, H, W, cin), jnp.bfloat16)
    args = (x, p["wexp"], p["g1"], p["b1"], p["wdw"], p["g2"], p["b2"],
            p["wr"], p["br"], p["we"], p["be"], p["wproj"])

    ref = mbconv_reference(*args, k=k)
    got = mbconv_core(*args, k, True)
    for i, name in enumerate(["y3", "m1", "v1", "m2", "v2", "m3", "v3"]):
        if not expand and name in ("m1", "v1"):
            continue
        a = np.asarray(got[i], np.float32)
        b = np.asarray(ref[i], np.float32)
        np.testing.assert_allclose(a, b, atol=3e-2 * max(1.0, np.abs(b).max()),
                                   err_msg=name)

    # gradients — the loss touches y3 AND the returned BN3 statistics, so
    # the d_mean3/d_var3 folding in the custom VJP is exercised
    def loss(fn):
        def inner(x, *params):
            y3, m1, v1, m2, v2, m3, v3 = fn(x, *params)
            return (jnp.sum(y3.astype(jnp.float32) ** 2)
                    + 3.0 * jnp.sum(m3) + 2.0 * jnp.sum(v3))
        return inner

    argnums = tuple(i for i, a in enumerate(args) if a is not None)
    gf = jax.grad(loss(lambda x, *a: mbconv_core(x, *a, k, True)),
                  argnums=argnums)(*args)
    gr = jax.grad(loss(lambda x, *a: mbconv_reference(x, *a, k=k)),
                  argnums=argnums)(*args)
    names = [n for n, a in zip(
        ["x", "wexp", "g1", "b1", "wdw", "g2", "b2", "wr", "br", "we",
         "be", "wproj"], args) if a is not None]
    for name, a, b in zip(names, gf, gr):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        np.testing.assert_allclose(
            a, b, atol=6e-2 * max(1e-3, np.abs(b).max()),
            err_msg=f"d{name}")


@pytest.fixture(scope="module")
def b0_pair():
    """(params, batch_stats, x) from an UNFUSED B0 init — the fused module
    consumes the identical tree."""
    enc = EfficientNet(in_chans=1, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 24, 24, 1),
                    jnp.float32)
    variables = enc.init(jax.random.key(0), x, train=False)
    return variables, x


@pytest.mark.parametrize("cin,cout,er,stride,k",
                         [(16, 16, 6, 1, 3), (32, 32, 1, 1, 3),
                          (16, 24, 6, 2, 3), (40, 40, 6, 1, 5)])
def test_fused_block_matches_unfused_train(cin, cout, er, stride, k,
                                           force_kernel):
    """Single fused _MBConv vs the unfused flax module with SHARED params,
    train mode — tight: one block has no batch-stat feedback loop to
    amplify bf16 reassociation noise."""
    from multimodal_plankton_recognition_tpu.models.image.efficientnet \
        import _MBConv

    u = _MBConv(cin, cout, er, stride, k, 0.25, jnp.bfloat16)
    f = _MBConv(cin, cout, er, stride, k, 0.25, jnp.bfloat16, fused=True)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 12, 12, cin),
                    jnp.bfloat16)
    v = u.init(jax.random.key(0), x, train=False)
    out_u, upd_u = u.apply(v, x, train=True, mutable=["batch_stats"])
    out_f, upd_f = f.apply(v, x, train=True, mutable=["batch_stats"])
    a, b = np.asarray(out_f, np.float32), np.asarray(out_u, np.float32)
    assert np.abs(a - b).max() <= 3e-2 * max(1.0, np.abs(b).max())
    for lu, lf in zip(jax.tree.leaves(upd_u["batch_stats"]),
                      jax.tree.leaves(upd_f["batch_stats"])):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lu),
                                   atol=2e-2 * max(1.0, np.abs(lu).max()))


def test_fused_efficientnet_train_close(b0_pair, force_kernel):
    """Full B0, train mode: bf16 reassociation noise (~0.7%/block) is
    amplified by the train-BN statistics feedback across 16 blocks at this
    tiny batch, so this asserts statistical agreement, not elementwise
    parity (single blocks are tight — see above; eval is tight — below)."""
    variables, x = b0_pair
    unfused = EfficientNet(in_chans=1, dtype=jnp.bfloat16)
    fused = EfficientNet(in_chans=1, dtype=jnp.bfloat16, fused=True)
    x16 = jnp.asarray(np.random.RandomState(3).randn(16, 24, 24, 1),
                      jnp.float32)
    out_u, _ = unfused.apply(variables, x16, train=True,
                             mutable=["batch_stats"])
    out_f, _ = fused.apply(variables, x16, train=True,
                           mutable=["batch_stats"])
    a, b = np.asarray(out_f, np.float32), np.asarray(out_u, np.float32)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    rms = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(b ** 2))
    assert corr > 0.95, corr
    assert rms < 0.3, rms


def test_fused_efficientnet_matches_unfused_eval(b0_pair):
    variables, x = b0_pair
    unfused = EfficientNet(in_chans=1, dtype=jnp.bfloat16)
    fused = EfficientNet(in_chans=1, dtype=jnp.bfloat16, fused=True)
    out_u = unfused.apply(variables, x, train=False)
    out_f = fused.apply(variables, x, train=False)
    a, b = np.asarray(out_f, np.float32), np.asarray(out_u, np.float32)
    assert np.abs(a - b).max() <= 3e-2 * max(1.0, np.abs(b).max())


def test_fused_flag_shards_on_multi_device_mesh(b0_pair):
    """With fused=True on a multi-device mesh (this suite's virtual
    8-device CPU mesh), the module must take _unfused_over_params — a
    pallas_call has no GSPMD partitioning rule (round-2 advisor finding).
    The sharded train-mode apply must run and match the unfused module."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    variables, _ = b0_pair
    devs = np.array(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devs, ("data", "model"))
    x = jnp.asarray(np.random.RandomState(5).randn(16, 24, 24, 1),
                    jnp.float32)
    x = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))

    fused = EfficientNet(in_chans=1, dtype=jnp.bfloat16, fused=True)
    unfused = EfficientNet(in_chans=1, dtype=jnp.bfloat16)
    apply_f = jax.jit(lambda v, x: fused.apply(v, x, train=True,
                                               mutable=["batch_stats"]))
    apply_u = jax.jit(lambda v, x: unfused.apply(v, x, train=True,
                                                 mutable=["batch_stats"]))
    out_f, _ = apply_f(variables, x)
    out_u, _ = apply_u(variables, x)
    a, b = np.asarray(out_f, np.float32), np.asarray(out_u, np.float32)
    assert np.isfinite(a).all()
    # train-mode BN feedback amplifies bf16 op-order noise across 16
    # blocks (see test_fused_efficientnet_train_close) — statistical match
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.95, corr


def test_fused_param_tree_identical(b0_pair):
    variables, x = b0_pair
    fused = EfficientNet(in_chans=1, dtype=jnp.bfloat16, fused=True)
    vf = fused.init(jax.random.key(1), x, train=False)
    paths_u = {jax.tree_util.keystr(kp)
               for kp, _ in jax.tree_util.tree_leaves_with_path(variables)}
    paths_f = {jax.tree_util.keystr(kp)
               for kp, _ in jax.tree_util.tree_leaves_with_path(vf)}
    assert paths_u == paths_f

"""Coordination-loss tests: numpy oracles + torch cross-check of the
reference formulas (reference: src/coordination.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_plankton_recognition_tpu.ops import losses


def _embs(B=8, D=16, seed=0):
    rs = np.random.RandomState(seed)
    return (rs.randn(B, D).astype(np.float32),
            rs.randn(B, D).astype(np.float32))


def _np_normalize(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _np_clip_loss(i, p, scale, buckets):
    i, p = _np_normalize(i), _np_normalize(p)
    bs = i.shape[0] // buckets
    i = i.reshape(buckets, bs, -1)
    p = p.reshape(buckets, bs, -1)
    logits = np.einsum("bnd,bmd->bnm", i, p) * np.exp(scale)
    def xent(lg):
        lg = lg - lg.max(-1, keepdims=True)
        lp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
        return -np.mean(np.diagonal(lp, axis1=-2, axis2=-1))
    l1 = np.mean([xent(l) for l in logits])
    l2 = np.mean([xent(l.T) for l in logits])
    return (l1 + l2) / 2


@pytest.mark.parametrize("buckets", [1, 2, 4])
def test_clip_loss_oracle(buckets):
    i, p = _embs()
    scale = 0.7
    ours = float(losses.clip_loss(jnp.asarray(i), jnp.asarray(p),
                                  jnp.asarray(scale), buckets))
    oracle = _np_clip_loss(i, p, scale, buckets)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_clip_loss_perfect_alignment_small():
    # identical, well-separated embeddings with a large scale -> loss ~ 0
    i = np.eye(8, 16, dtype=np.float32)
    ours = float(losses.clip_loss(jnp.asarray(i), jnp.asarray(i),
                                  jnp.asarray(3.0), 1))
    assert ours < 0.05


@pytest.mark.parametrize("buckets", [1, 2])
def test_siglip_loss_oracle(buckets):
    i, p = _embs(seed=1)
    scale, bias = 0.5, -10.0
    ni, np_ = _np_normalize(i), _np_normalize(p)
    bs = i.shape[0] // buckets
    logits = np.einsum("bnd,bmd->bnm",
                       ni.reshape(buckets, bs, -1),
                       np_.reshape(buckets, bs, -1)) * np.exp(scale) + bias
    labels = 2 * np.eye(bs) - 1
    z = labels[None] * logits
    oracle = np.mean(-np.sum(np.log1p(np.exp(-np.abs(z))) + np.maximum(-z, 0),
                             axis=(1, 2)) * -1 / bs)
    # -logsigmoid(z) = log(1+exp(-z)) = max(-z,0)+log1p(exp(-|z|))
    oracle = np.mean(np.sum(np.maximum(-z, 0) + np.log1p(np.exp(-np.abs(z))),
                            axis=(1, 2)) / bs)
    ours = float(losses.siglip_loss(jnp.asarray(i), jnp.asarray(p),
                                    jnp.asarray(scale), jnp.asarray(bias),
                                    buckets))
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_torch_reference_formula_crosscheck():
    """Re-derive the reference loss math in torch (src/coordination.py:26-95)
    and check our jax values match."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    i, p = _embs(B=12, D=8, seed=2)
    buckets, scale = 3, 0.9
    ti, tp = torch.tensor(i), torch.tensor(p)

    # CLIP (reference lines 33-45)
    ni, np_ = F.normalize(ti), F.normalize(tp)
    bs = 12 // buckets
    vi, vp = ni.view(buckets, bs, -1), np_.view(buckets, bs, -1)
    logits = (vi @ vp.transpose(1, 2)) * torch.tensor(scale).exp()
    label = torch.arange(bs).long()
    l1 = torch.stack([F.cross_entropy(x, label) for x in logits]).mean()
    l2 = torch.stack([F.cross_entropy(x.T, label) for x in logits]).mean()
    ref_clip = float((l1 + l2) / 2)
    ours = float(losses.clip_loss(jnp.asarray(i), jnp.asarray(p),
                                  jnp.asarray(scale), buckets))
    np.testing.assert_allclose(ours, ref_clip, rtol=1e-5)

    # SigLIP (reference lines 82-95)
    bias = -10.0
    logits = (vi @ vp.transpose(1, 2)) * torch.tensor(scale).exp() + bias
    logits = logits * (-1)
    logits.diagonal(0, 1, 2).mul_(-1)
    ref_siglip = float((-F.logsigmoid(logits).sum((1, 2)) / bs).mean())
    ours = float(losses.siglip_loss(jnp.asarray(i), jnp.asarray(p),
                                    jnp.asarray(scale), jnp.asarray(bias),
                                    buckets))
    np.testing.assert_allclose(ours, ref_siglip, rtol=1e-5)

    # Rank (reference lines 123-135), buckets=1
    margin = 0.25
    ni2 = ti / ti.norm(dim=1, keepdim=True)
    np2 = tp / tp.norm(dim=1, keepdim=True)
    logits = ni2 @ np2.T
    logits.diagonal().mul_(-1)
    rl1 = F.relu(margin + logits.sum(0)).mean()
    rl2 = F.relu(margin + logits.sum(1)).mean()
    ref_rank = float((rl1 + rl2) / 2)
    ours = float(losses.rank_loss(jnp.asarray(i), jnp.asarray(p), margin, 1))
    np.testing.assert_allclose(ours, ref_rank, rtol=1e-5)

    # CLIP+ / SigLIP+ add beta * MSE (reference lines 60-64, 108-112)
    beta = 0.25
    ref = ref_clip + beta * float(F.mse_loss(ti, tp))
    ours = float(losses.clipplus_loss(jnp.asarray(i), jnp.asarray(p),
                                      jnp.asarray(scale), buckets, beta))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_arcface_matches_torch_reference_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    import math

    rs = np.random.RandomState(3)
    i, p = _embs(B=6, D=8, seed=3)
    n_classes = 4
    w = rs.randn(n_classes, 8).astype(np.float32)
    label = rs.randint(0, n_classes, 6)

    # reference formula (src/coordination.py:176-196), device-agnostic
    emb = torch.tensor(np.concatenate([i, p]))
    lbl = torch.tensor(np.tile(label, 2)).long()
    tw = torch.tensor(w)
    cosine = F.linear(F.normalize(emb), F.normalize(tw))
    sine = torch.sqrt((1.0 - torch.pow(cosine, 2)).clamp(0, 1))
    s, m = 30.0, 0.50
    phi = cosine * math.cos(m) - sine * math.sin(m)
    th, mm = math.cos(math.pi - m), math.sin(math.pi - m) * m
    phi = torch.where(cosine > th, phi, cosine - mm)
    one_hot = torch.zeros(cosine.size())
    one_hot.scatter_(1, lbl.view(-1, 1), 1)
    output = (one_hot * phi + (1.0 - one_hot) * cosine) * s
    ref = float(F.cross_entropy(output, lbl))

    ours = float(losses.arcface_loss(jnp.asarray(i), jnp.asarray(p),
                                     jnp.asarray(label), jnp.asarray(w)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_distance_and_zero():
    i, p = _embs()
    np.testing.assert_allclose(
        float(losses.distance_loss(jnp.asarray(i), jnp.asarray(p))),
        np.mean((i - p) ** 2), rtol=1e-6)
    assert float(losses.zero_loss()) == 0.0


def test_cross_entropy():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
    label = jnp.asarray([0, 1])
    val = float(losses.cross_entropy_loss(logits, label))
    expected = -np.log(np.exp(2) / (np.exp(2) + 1))
    np.testing.assert_allclose(val, expected, rtol=1e-6)

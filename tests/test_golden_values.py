"""Golden-value regression tests.

Pin exact loss values on fixed inputs so any semantic drift in the loss
implementations (which are verified against the reference's formulas in
test_losses.py) is caught immediately. Values recorded from the CPU f32
implementation at commit time.
"""

import numpy as np
import jax.numpy as jnp

from multimodal_plankton_recognition_tpu.ops import losses


def _fixed(B=8, D=4):
    # deterministic, platform-independent input
    i = np.arange(B * D, dtype=np.float32).reshape(B, D) / (B * D)
    p = (np.arange(B * D, dtype=np.float32)[::-1].reshape(B, D) / (B * D)) ** 2
    return jnp.asarray(i), jnp.asarray(p)


def test_clip_golden():
    i, p = _fixed()
    val = float(losses.clip_loss(i, p, jnp.asarray(1.0), buckets=2))
    np.testing.assert_allclose(val, 1.4006755, rtol=1e-5)


def test_siglip_golden():
    i, p = _fixed()
    val = float(losses.siglip_loss(i, p, jnp.asarray(1.0),
                                   jnp.asarray(-10.0), buckets=2))
    np.testing.assert_allclose(val, 7.5564632, rtol=1e-5)


def test_rank_golden():
    i, p = _fixed()
    val = float(losses.rank_loss(i, p, margin=0.25, buckets=1))
    np.testing.assert_allclose(val, 5.5364370, rtol=1e-5)


def test_distance_golden():
    i, p = _fixed()
    val = float(losses.distance_loss(i, p))
    np.testing.assert_allclose(val, 0.35593462, rtol=1e-5)

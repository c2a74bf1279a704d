"""On-device batched augmentation tests."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_plankton_recognition_tpu.ops import augment


def test_random_crop_2d_shapes_and_content():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 10, 10, 1), jnp.float32)
    out = augment.random_crop_2d(x, 6, jax.random.key(0))
    assert out.shape == (4, 6, 6, 1)
    # every crop is a contiguous window of the source
    xs = np.asarray(x)
    for b in range(4):
        found = any(
            np.array_equal(np.asarray(out)[b], xs[b, dy:dy + 6, dx:dx + 6])
            for dy in range(5) for dx in range(5))
        assert found


def test_random_crop_1d():
    x = jnp.broadcast_to(jnp.arange(20.0)[None, :, None], (3, 20, 6))
    out = augment.random_crop_1d(x, 8, jax.random.key(1))
    assert out.shape == (3, 8, 6)
    diffs = np.diff(np.asarray(out)[:, :, 0], axis=1)
    np.testing.assert_allclose(diffs, 1.0)  # contiguous windows


def test_joint_flip_consistency():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(32, 4, 4, 1), jnp.float32)
    prof = jnp.asarray(rs.randn(32, 5, 6), jnp.float32)
    i2, p2 = augment.joint_horizontal_flip(img, prof, jax.random.key(2))
    img_flipped = ~np.all(np.asarray(i2) == np.asarray(img), axis=(1, 2, 3))
    prof_flipped = ~np.all(np.asarray(p2) == np.asarray(prof), axis=(1, 2))
    np.testing.assert_array_equal(img_flipped, prof_flipped)
    assert img_flipped.any() and not img_flipped.all()
    b = int(np.argmax(img_flipped))
    np.testing.assert_array_equal(np.asarray(i2)[b],
                                  np.asarray(img)[b, :, ::-1])
    np.testing.assert_array_equal(np.asarray(p2)[b],
                                  np.asarray(prof)[b, ::-1])


def test_multi_train_augment_jits():
    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.randn(4, 34, 34, 1), jnp.float32),
        "profile": jnp.asarray(rs.randn(4, 34, 6), jnp.float32),
        "image_shape": jnp.ones((4, 2), jnp.int32),
        "profile_len": jnp.ones((4, 1), jnp.int32),
    }
    fn = jax.jit(lambda b, r: augment.multi_train_augment(b, 32, r))
    out = fn(batch, jax.random.key(3))
    assert out["image"].shape == (4, 32, 32, 1)
    assert out["profile"].shape == (4, 32, 6)
    assert out["image_shape"].shape == (4, 2)  # passthrough keys kept
    # deterministic per key
    out2 = fn(batch, jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(out["image"]),
                                  np.asarray(out2["image"]))

"""ops/kernels.py gating invariants.

The kernel gate decides whether a pallas_call ever traces; a silent
regression here either breaks multi-chip GSPMD runs (kernel under a
sharded mesh) or silently drops the kernels on single-chip TPU. The env
escape hatches are probe infrastructure (PLANKTON_FUSED_INTERPRET for CPU
parity tests, PLANKTON_FUSED_DISABLE for the single-chip-TPU einsum
oracle — scripts/mosaic_mesh_check.py).
"""

from multimodal_plankton_recognition_tpu.ops import kernels


def test_disable_beats_everything(monkeypatch):
    monkeypatch.setenv("PLANKTON_FUSED_DISABLE", "1")
    monkeypatch.setenv("PLANKTON_FUSED_INTERPRET", "1")
    assert not kernels.kernel_path_allowed()


def test_interpret_enables_on_cpu(monkeypatch):
    monkeypatch.delenv("PLANKTON_FUSED_DISABLE", raising=False)
    monkeypatch.setenv("PLANKTON_FUSED_INTERPRET", "1")
    assert kernels.kernel_path_allowed()


def test_disable_reaches_fused_ffn(monkeypatch):
    # models/ffn.py gates on backend==tpu directly (the experimental FFN
    # kernel predates kernel_path_allowed); the PLANKTON_FUSED_DISABLE
    # contract ("forces the einsum fallbacks EVERYWHERE") must still hold
    # for it — round-5 review finding.
    import jax
    import jax.numpy as jnp

    from multimodal_plankton_recognition_tpu.models import ffn as ffn_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    monkeypatch.setenv("PLANKTON_FUSED_DISABLE", "1")

    def _boom(*a, **k):  # the kernel must never trace under the hatch
        raise AssertionError("ffn_core traced despite PLANKTON_FUSED_DISABLE")

    monkeypatch.setattr(ffn_mod, "ffn_core", _boom)
    x = jnp.ones((2, 4, 8), jnp.float32)
    k1 = jnp.ones((8, 16), jnp.float32)
    b1 = jnp.zeros((16,), jnp.float32)
    k2 = jnp.ones((16, 8), jnp.float32)
    b2 = jnp.zeros((8,), jnp.float32)
    out = ffn_mod.apply_fused_ffn(None, x, k1, b1, k2, b2, "gelu",
                                  0.0, True, jnp.float32)
    assert out.shape == (2, 4, 8)


def test_cpu_multichip_default_is_fallback(monkeypatch):
    # the CPU test platform with the virtual 8-device mesh: no kernels
    # unless inside a shard_map trace or forced interpret
    monkeypatch.delenv("PLANKTON_FUSED_DISABLE", raising=False)
    monkeypatch.delenv("PLANKTON_FUSED_INTERPRET", raising=False)
    assert not kernels.kernel_path_allowed()
    with kernels.shard_map_kernels():
        # shard_map marks the trace, but a non-TPU backend still falls back
        assert kernels.in_shard_step()
        assert not kernels.kernel_path_allowed()

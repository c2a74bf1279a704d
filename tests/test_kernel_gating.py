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

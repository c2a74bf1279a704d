"""MEASURED-NEGATIVE Pallas kernels — quarantined, not part of the live path.

Every module here is real, hardware-verified code whose measured v5e
result is SLOWER than XLA's own lowering of the same math at the flagship
shapes (full attribution tables in docs/PERF.md):

* ``mbconv.py`` — fused MBConv (expand+BN+SiLU+dw+SE+project) blocks:
  4-13x slower than XLA at every B0 shape (gen-1 and gen-2 designs).
* ``ffn.py`` — fused transformer FFN: ~2 ms/step slower than XLA's fusion.
* ``attention_block.py`` — QKV + MHA + out-projection in one kernel:
  63.9 vs 57.6 ms/step on the ViT flagship (loses XLA's batched
  (B·L, E) projection GEMMs by more than the saved layout bridges).

They stay importable (cards: ``fused_mbconv`` / ``fused_ffn`` /
``fuse_projections`` or ``PLANKTON_ATTN_FUSE_PROJ=1``), tested
(tests/test_{mbconv,ffn,attention_block}.py) and default-OFF, kept as the
permanent record of what was tried so future hardware/toolchain changes
can re-measure instead of re-implement. The LIVE kernels are the parent
package's ``contrastive.py`` and ``attention.py``.
"""

"""TPU-native multimodal plankton recognition framework.

A from-scratch JAX / Flax / XLA / Pallas re-design of the capabilities of
``imveikka/multimodal_plankton_recognition`` (PyTorch/Lightning, single-GPU):

* contrastive cross-modal pretraining (CLIP / SigLIP / CLIP+ / SigLIP+ /
  rank losses; bucketed negatives for reference parity or globally sharded
  negatives over the TPU ICI mesh),
* supervised unimodal image / pulse-shape-profile classifiers,
* exact top-k gallery retrieval (replacing the reference's pynndescent ANN),
* the same CLI surface (``scripts/train_{image,profile,multi}.py``,
  ``split*.py``, ``benchmark_*.py``) driven by YAML model cards.

Package layout:

* ``data``     — host input pipeline (decode, transforms, batching, prefetch)
* ``models``   — Flax encoders (image backbones, profile encoders) and task models
* ``ops``      — pure-function losses, exact kNN retrieval, Pallas TPU kernels
* ``parallel`` — device-mesh / sharding utilities, sharded contrastive loss
* ``train``    — jitted train loop, checkpointing, metrics, early stopping
* ``utils``    — label vocab, registries, PRNG helpers
"""

__version__ = "0.1.0"

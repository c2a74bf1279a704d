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


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache so repeated CLI invocations
    (fold sweeps, encode-after-train) skip XLA recompilation. Called by the
    train/encode/benchmark drivers; safe to call multiple times."""
    import os

    import jax

    path = path or os.environ.get(
        "PLANKTON_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_plankton"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization; never fail the run
        pass


def use_tpu_runtime_flags() -> None:
    """Default libtpu tuning flags (no-op if the user already set any).

    Must run before JAX initializes the TPU backend (libtpu reads
    ``LIBTPU_INIT_ARGS`` at load). Currently: raise the scoped-VMEM fusion
    budget to 64 MiB — measured on a v5e this deepens XLA's fusions for
    both flagship steps (B0: 59.4 -> 57.4 ms; ViT fused: 61.1 -> 60.5 ms,
    docs/PERF.md) and leaves ample VMEM for the Pallas kernels' own
    scoped limits."""
    import os

    os.environ.setdefault("LIBTPU_INIT_ARGS",
                          "--xla_tpu_scoped_vmem_limit_kib=65536")


def use_fast_prng() -> None:
    """Switch JAX's default PRNG to the XLA hardware generator (``rbg``).

    Threefry (JAX's default) costs ~10 ALU ops per random bit, and the
    dropout masks of the transformer flagships are generated over huge
    activations every step — measured on a v5e, rbg cuts the
    ViT-T + ProfileTransformer train step from 80.3 to 67.7 ms (+18.6%
    pairs/s, docs/PERF.md). rbg is JAX's recommended fast/partitionable
    implementation for TPUs (identical key API, different stream), and
    dropout/augment randomness carries no reproducibility contract against
    the reference (which uses torch's own RNG). Called by the train
    drivers and bench before any key is created; opt out with
    PLANKTON_PRNG=threefry."""
    import os

    import jax

    impl = os.environ.get("PLANKTON_PRNG", "rbg")
    try:
        jax.config.update("jax_default_prng_impl", impl)
    except Exception:  # never fail the run over an optimization
        pass

"""End-to-end training drivers behind the CLI scripts.

One function per reference entry point (scripts/train_multi.py,
scripts/train_image.py, scripts/train_profile.py), preserving the file
contracts: ``<dataset>/train.csv`` + ``<dataset>/test.csv`` in,
``<logdir>/<card>_<dataset>/version_k/`` TensorBoard events + checkpoints
out. The hot path is fully jitted; on a multi-chip TPU a ``(data, model)``
mesh is created automatically and batches are sharded along ``data``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import (enable_compilation_cache, use_fast_prng,
                use_tpu_runtime_flags)
from ..config import ModelCard, load_card
from ..data import (
    MultiSet, ImageTransformTrain, ImageTransformTest, ProfileTransformTrain,
    ProfileTransformTest, PairAugmentation, Loader, tokenize,
)
from ..data.grain_pipeline import GrainLoader
from ..data.transforms import ImageTransforms, ProfileTransform
from ..data.pipeline import (
    multi_collate_fn, image_collate_fn, profile_collate_fn,
)
from ..models import build
from ..parallel import create_mesh, shard_batch
from ..parallel.mesh import replicate_state
from ..utils import LabelVocab
from .optim import make_optimizer
from .state import create_train_state
from .loop import make_multi_steps, make_classifier_steps, Fitter
from .checkpoint import CheckpointManager
from .early_stopping import EarlyStopping
from .logging import MetricsWriter
from .metrics import confusion_matrix, render_confusion_matrix


def _run_name(card_path: Path, data_path: Path) -> str:
    """``<card-stem>_<last-two-path-parts>`` (reference: train_multi.py:86)."""
    parts = [p for p in data_path.parts if p not in (".", "..", "/")]
    return card_path.stem + "_" + "_".join(parts[-2:])


def _setup_mesh(card: ModelCard):
    """Create the device mesh and state/batch placement functions.

    The data-axis size defaults to the largest divisor of the batch size
    that fits the available chips (all of them in the common bs=64 / v5e-8
    case); an explicit ``mesh:`` card entry overrides and must divide bs.
    """
    n_devices = len(jax.devices())
    n_model = (card.mesh or {}).get("model", 1)
    n_data = (card.mesh or {}).get("data")
    if n_data is None:
        avail = max(1, n_devices // n_model)
        n_data = max(d for d in range(1, avail + 1) if card.bs % d == 0)
    mesh = create_mesh(n_data=n_data, n_model=n_model)
    if card.bs % n_data != 0:
        raise ValueError(
            f"Batch size {card.bs} not divisible by data-axis size {n_data}")
    if n_data * n_model > 1:
        def put_fn(b):
            b = {k: jnp.asarray(v) for k, v in b.items()}
            # an uneven trailing eval batch (drop_last=False) cannot shard
            # along `data`; let jit place/replicate it instead
            rows = jax.tree.leaves(b)[0].shape[0]
            if rows % n_data != 0:
                return b
            return shard_batch(b, mesh)

        place_state = lambda s: replicate_state(s, mesh)
    else:
        put_fn = lambda b: jax.tree.map(jnp.asarray, b)
        place_state = lambda s: s
    return mesh, put_fn, place_state


def _profile_kind(card: ModelCard) -> str:
    return (card.profile_encoder_args or {}).get("kind", "cnn")


def _loader_cls(card: ModelCard):
    """'threads' (default) or 'grain' (multiprocess workers — sidesteps the
    GIL, ~5x host input throughput; see data/grain_pipeline.py)."""
    return GrainLoader if card.loader == "grain" else Loader




def _maybe_load_pretrained(state, card: ModelCard):
    """Merge pretrained backbone weights (npz) when the card asks for them
    (fixes the reference ignoring its own ``pretrained`` flag,
    src/image_encoder.py:17)."""
    args = card.image_encoder_args or {}
    if not args.get("pretrained"):
        return state
    path = args.get("pretrained_path")
    if not path:
        print("pretrained: true but no pretrained_path given; "
              "training from scratch (produce an npz with "
              "scripts/convert_timm.py)")
        return state
    from ..models.pretrained import load_pretrained_npz
    params, batch_stats, stats = load_pretrained_npz(
        state.params, path, batch_stats=state.batch_stats or {})
    print(f"loaded pretrained weights from {path}: {stats}")
    # a BN-free model (ViT) has falsy batch_stats; keep its original value
    # rather than the loader's empty-dict merge result
    if not state.batch_stats:
        return state.replace(params=params)
    return state.replace(params=params, batch_stats=batch_stats)


def _maybe_resume(state, resume):
    """Restore a full TrainState (params + batch_stats + opt_state + step)
    from a checkpoint directory to continue an interrupted run. The reference
    has no mid-run resume (SURVEY item); here any checkpoint dir produced by
    these drivers works: ``--resume <logdir>/<run>/version_k/checkpoints``."""
    if not resume:
        return state
    mgr = CheckpointManager(resume, save_top_k=0)
    restored = mgr.restore(template={
        "step": 0, "params": state.params,
        "batch_stats": state.batch_stats or {},
        "opt_state": state.opt_state})
    mgr.close()
    return state.replace(step=restored["step"], params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"])


class _Profiler:
    """jax.profiler trace over the first epoch when enabled (the reference
    has no profiling hooks; SURVEY aux-subsystem item)."""

    def __init__(self, logdir, enabled: bool):
        self.logdir = str(logdir)
        self.enabled = enabled
        self.active = False

    def start(self):
        if self.enabled:
            jax.profiler.start_trace(self.logdir)
            self.active = True

    def stop_after_first_epoch(self, epoch, *_):
        if self.active and epoch == 0:
            jax.profiler.stop_trace()
            self.active = False

    def stop(self):
        if self.active:
            jax.profiler.stop_trace()
            self.active = False


def train_multi(dataset: str | Path, modelcard: str | Path,
                logdir: str | Path = "logs",
                max_epochs: Optional[int] = None,
                resume: Optional[str] = None,
                profile: bool = False) -> dict:
    """Contrastive cross-modal pretraining (reference: scripts/train_multi.py)."""
    use_tpu_runtime_flags()
    enable_compilation_cache()
    use_fast_prng()
    card = load_card(modelcard)
    if max_epochs is not None:
        card.trainer_args.max_epochs = max_epochs
    data_path = Path(dataset)
    ts = card.target_size

    if card.packed_cache:
        # memmap the packed deterministic-prefix cache
        # (scripts/pack_dataset.py); batches are bit-identical to the CSV
        # path below, without the per-epoch JPEG/CSV work
        from ..data.packed import PackedMultiSet
        train_set = PackedMultiSet(data_path / "train.csv", ts,
                                   device_augment=card.device_augment)
        test_set = PackedMultiSet(data_path / "test.csv", ts)
    else:
        if card.device_augment:
            # host does the deterministic oversize prefix; crop/flip/noise
            # run batched on the TPU inside the train step (ops/augment.py)
            from ..data.transforms import (
                ImageTransformOversize, ProfileTransformOversize,
            )
            train_set = MultiSet(data_path / "train.csv",
                                 ImageTransformOversize(ts),
                                 ProfileTransformOversize(ts))
        else:
            train_set = MultiSet(data_path / "train.csv",
                                 ImageTransformTrain(ts),
                                 ProfileTransformTrain(ts),
                                 PairAugmentation())
        test_set = MultiSet(data_path / "test.csv",
                            ImageTransformTest(ts), ProfileTransformTest(ts))

    kind = _profile_kind(card)
    train_len = card.oversize if card.device_augment else ts
    if card.device_augment:
        # host collate delivers a plain (B, oversize, D) stack; the jitted
        # step crops on device and rebuilds the kind's tokenize fields
        # (CLS/time/padding_mask/last_idx) — ops/augment.multi_train_augment
        train_tok = tokenize.get_tokenizer("cnn", ts, pad_to=train_len)
    else:
        train_tok = tokenize.get_tokenizer(
            kind, ts,
            pad_to=train_len + 1 if kind == "transformer" else train_len)
    valid_tok = tokenize.get_tokenizer(
        kind, ts, pad_to=ts + 1 if kind == "transformer" else ts)
    # ArcFace is label-supervised: wire class ids through the collate and
    # derive the class count from the training table
    coord = card.coordination_args or {}
    label_vocab = None
    if coord.get("method") == "arcface":
        label_vocab = LabelVocab(train_set.class_names)
        coord.setdefault("out_features", len(label_vocab))
    loader_cls = _loader_cls(card)
    train_loader = loader_cls(train_set, card.bs,
                              multi_collate_fn(train_tok, label_vocab),
                              shuffle=True, drop_last=True,
                              num_workers=card.num_workers, seed=card.seed)
    valid_loader = loader_cls(test_set, card.bs,
                              multi_collate_fn(valid_tok, label_vocab),
                              shuffle=True, drop_last=True,
                              num_workers=card.num_workers,
                              seed=card.seed + 1)

    model = build.build_multi_model(card)
    tx = make_optimizer(card.optim_args,
                        card.trainer_args.accumulate_grad_batches)
    mesh, put_fn, place_state = _setup_mesh(card)

    augment_fn = None
    if card.device_augment:
        from ..ops.augment import multi_train_augment
        augment_fn = lambda b, r: multi_train_augment(b, ts, r, kind=kind)

    # init from a throwaway loader so the training loader's epoch state
    # (and, for GrainLoader, its persistent worker stream) is untouched
    init_loader = Loader(train_set, card.bs,
                         multi_collate_fn(train_tok, label_vocab),
                         shuffle=True, drop_last=True, num_workers=1,
                         seed=card.seed)
    sample = put_fn(next(iter(init_loader)))
    if augment_fn is not None:
        # init with post-augment shapes (the transformer/lstm tokenize
        # fields only exist after the on-device crop)
        sample = augment_fn(sample, jax.random.key(card.seed))
    state = create_train_state(model, jax.random.key(card.seed), sample, tx,
                               init_kwargs={"buckets": card.buckets})
    state = _maybe_load_pretrained(state, card)
    state = _maybe_resume(state, resume)
    state = place_state(state)

    # global negatives: the whole (sharded) batch is one contrastive group
    negatives = (card.coordination_args or {}).get("negatives", "bucketed")
    buckets = 1 if negatives == "global" else card.buckets
    n_mesh = mesh.shape["data"] * mesh.shape["model"]
    if card.parallel == "shard_map" and n_mesh > 1:
        # explicit per-chip step: keeps the Pallas kernel paths enabled on
        # multi-chip meshes (train/shard_step.py); BN-free models only
        if state.batch_stats:
            raise ValueError(
                "parallel: shard_map requires a BatchNorm-free model "
                "(per-chip BN statistics would diverge from GSPMD's "
                "sync-BN); use the default parallel: gspmd")
        from .shard_step import make_multi_steps_shard_map
        try:
            train_step, eval_step = make_multi_steps_shard_map(
                model, tx, mesh, buckets=card.buckets, negatives=negatives,
                augment_fn=augment_fn)
        except ValueError as e:
            # e.g. buckets not divisible by the data axis — keep training
            # (GSPMD shards the bucketed loss correctly, kernels fall back)
            print(f"parallel: shard_map unavailable ({e}); "
                  f"falling back to GSPMD")
            train_step, eval_step = make_multi_steps(model, tx, buckets,
                                                     augment_fn=augment_fn)
    else:
        train_step, eval_step = make_multi_steps(model, tx, buckets,
                                                 augment_fn=augment_fn)

    name = _run_name(Path(modelcard), data_path)
    writer = MetricsWriter(logdir, name=name)
    ckpt = CheckpointManager(
        writer.logdir / "checkpoints", monitor="valid_loss", mode="min",
        save_top_k=card.save_top_k,
        metadata={"card": card.to_dict(), "kind": "multi",
                  "class_names": [str(c) for c in train_set.class_names]})
    stopper = EarlyStopping("valid_loss", "min", card.patience)
    profiler = _Profiler(writer.logdir / "profile", profile)
    fitter = Fitter(train_step, eval_step, writer=writer, checkpointer=ckpt,
                    early_stopping=stopper,
                    min_epochs=card.trainer_args.min_epochs,
                    max_epochs=card.trainer_args.max_epochs,
                    check_val_every_n_epoch=card.trainer_args.check_val_every_n_epoch,
                    seed=card.seed, put_fn=put_fn,
                    hooks={"on_epoch_end": profiler.stop_after_first_epoch})
    profiler.start()
    try:
        state = fitter.fit(state, train_loader, valid_loader)
    finally:
        profiler.stop()
    writer.close()
    return {"history": fitter.history, "logdir": str(writer.logdir),
            "best_step": ckpt.best_step(), "state": state}


def _train_classifier(kind: str, dataset: str | Path,
                      modelcard: str | Path, logdir: str | Path = "logs",
                      max_epochs: Optional[int] = None,
                      resume: Optional[str] = None,
                      profile: bool = False) -> dict:
    use_tpu_runtime_flags()
    enable_compilation_cache()
    use_fast_prng()
    card = load_card(modelcard)
    if max_epochs is not None:
        card.trainer_args.max_epochs = max_epochs
    data_path = Path(dataset)

    # reference uses the raw canonicalizing transforms for the supervised
    # baselines (reference: scripts/train_image.py:37-38)
    image_tf = ImageTransforms(target_size=card.target_size)
    profile_tf = ProfileTransform(max_len=card.max_len if kind == "profile"
                                  else 0)
    train_set = MultiSet(data_path / "train.csv", image_tf, profile_tf,
                         PairAugmentation())
    test_set = MultiSet(data_path / "test.csv", image_tf, profile_tf)

    vocab = LabelVocab(train_set.class_names)
    if kind == "image":
        collate = image_collate_fn(vocab)
        model = build.build_image_classifier(card, vocab.to_list())
    else:
        enc_kind = _profile_kind(card)
        max_len = card.max_len or 256
        pad_to = max_len + 1 if enc_kind == "transformer" else max_len
        tok = tokenize.get_tokenizer(enc_kind, max_len, pad_to=pad_to)
        collate = profile_collate_fn(tok, vocab)
        model = build.build_profile_classifier(card, vocab.to_list())

    loader_cls = _loader_cls(card)
    train_loader = loader_cls(train_set, card.bs, collate, shuffle=True,
                              drop_last=True, num_workers=card.num_workers,
                              seed=card.seed)
    test_loader = loader_cls(test_set, card.bs, collate, shuffle=False,
                             drop_last=False, num_workers=card.num_workers,
                             seed=card.seed + 1)

    tx = make_optimizer(card.optim_args,
                        card.trainer_args.accumulate_grad_batches)
    mesh, put_fn, place_state = _setup_mesh(card)
    init_loader = Loader(train_set, card.bs, collate, shuffle=True,
                         drop_last=True, num_workers=1, seed=card.seed)
    sample = put_fn(next(iter(init_loader)))
    inputs = {k: v for k, v in sample.items() if k != "label"}
    state = create_train_state(model, jax.random.key(card.seed), inputs, tx)
    state = _maybe_load_pretrained(state, card)
    state = _maybe_resume(state, resume)
    state = place_state(state)
    train_step, eval_step = make_classifier_steps(model, tx)

    name = _run_name(Path(modelcard), data_path)
    writer = MetricsWriter(logdir, name=name)
    ckpt = CheckpointManager(
        writer.logdir / "checkpoints", monitor="valid_acc", mode="max",
        save_top_k=card.save_top_k,
        metadata={"card": card.to_dict(), "kind": kind,
                  "class_names": vocab.to_list()})
    stopper = EarlyStopping("valid_loss", "min", card.patience)
    profiler = _Profiler(writer.logdir / "profile", profile)
    fitter = Fitter(train_step, eval_step, writer=writer, checkpointer=ckpt,
                    early_stopping=stopper,
                    min_epochs=card.trainer_args.min_epochs,
                    max_epochs=card.trainer_args.max_epochs,
                    check_val_every_n_epoch=card.trainer_args.check_val_every_n_epoch,
                    seed=card.seed, put_fn=put_fn,
                    hooks={"on_epoch_end": profiler.stop_after_first_epoch})
    profiler.start()
    try:
        state = fitter.fit(state, train_loader, test_loader)
    finally:
        profiler.stop()

    # test with the best checkpoint (reference: trainer.test(ckpt_path='best'),
    # scripts/train_image.py:97) + confusion-matrix TensorBoard image
    best = ckpt.best_step()
    if best is not None:
        restored = ckpt.restore(best, template={
            "step": 0, "params": state.params,
            "batch_stats": state.batch_stats or {},
            "opt_state": state.opt_state})
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
    preds, trues = [], []
    for batch in test_loader:
        out = eval_step(state, put_fn(batch))
        preds.append(np.asarray(out["pred"]))
        trues.append(np.asarray(out["label"]))
    pred = np.concatenate(preds)
    true = np.concatenate(trues)
    test_acc = float((pred == true).mean())
    cm = confusion_matrix(pred, true, len(vocab))
    writer.log({"test_acc": test_acc}, step=0)
    writer.log_image("test_cm", render_confusion_matrix(cm, vocab.to_list()))
    writer.close()
    return {"history": fitter.history, "logdir": str(writer.logdir),
            "best_step": best, "test_acc": test_acc, "state": state}


def train_image(dataset, modelcard, logdir="logs", max_epochs=None,
                resume=None, profile=False) -> dict:
    """Supervised image classifier (reference: scripts/train_image.py)."""
    return _train_classifier("image", dataset, modelcard, logdir, max_epochs,
                             resume, profile)


def train_profile(dataset, modelcard, logdir="logs", max_epochs=None,
                  resume=None, profile=False) -> dict:
    """Supervised profile classifier (reference: scripts/train_profile.py)."""
    return _train_classifier("profile", dataset, modelcard, logdir,
                             max_epochs, resume, profile)

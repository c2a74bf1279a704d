"""Model-card schema tests, including reference stale-card compat shims."""

import pytest

from multimodal_plankton_recognition_tpu.config import (
    CardError, ModelCard, load_card,
)

REFERENCE_MULTI_CARD = {
    # mirrors reference model_cards/example_multi.yaml (including its stale
    # dim_out/max_len keys that the reference encoders don't accept)
    "precision": "medium",
    "dim_embedding": 512,
    "max_len": 256,
    "bs": 64,
    "patience": 20,
    "save_top_k": 5,
    "image_encoder_args": {
        "name": "efficientnet_b0", "pretrained": False, "num_classes": 0,
        "metadata": True, "in_chans": 1, "dropout": 0.1,
    },
    "profile_encoder_args": {
        "dim_in": 6, "dim_out": 128, "num_head": 4, "num_layers": 6,
        "dim_feedforward": 1024, "dropout": 0.1, "activation": "gelu",
        "max_len": 256,
    },
    "coordination_args": {"method": "clip"},
    "optim_args": {"lr": 5.0e-3, "momentum": 0.9, "weight_decay": 1.0e-3,
                   "nesterov": True},
    "trainer_args": {"precision": "16-mixed", "min_epochs": 40,
                     "max_epochs": 200, "accumulate_grad_batches": 4,
                     "val_check_interval": None,
                     "check_val_every_n_epoch": 1},
}


def test_reference_multi_card_accepted():
    card = ModelCard.from_dict(dict(REFERENCE_MULTI_CARD))
    pe = card.profile_encoder_args
    assert pe["kind"] == "transformer"       # key-sniffed from num_head
    assert pe["dim_hidden"] == 128           # renamed from dim_out
    assert pe["target_size"] == 256          # renamed from max_len
    assert card.trainer_args.compute_dtype == "bfloat16"
    assert card.trainer_args.accumulate_grad_batches == 4
    assert card.coordination_args["negatives"] == "bucketed"
    assert card.optim_args.nesterov is True


def test_cnn_and_lstm_sniffing():
    cnn = ModelCard.from_dict({
        "bs": 8,
        "profile_encoder_args": {"dim_in": 6, "blocks": [2, 2, 2, 2]},
    })
    assert cnn.profile_encoder_args["kind"] == "cnn"
    lstm = ModelCard.from_dict({
        "bs": 8,
        "profile_encoder_args": {"dim_in": 6, "dim_hidden": 32,
                                 "num_layers": 2},
    })
    assert lstm.profile_encoder_args["kind"] == "lstm"


def test_invalid_method_rejected():
    with pytest.raises(CardError):
        ModelCard.from_dict({"bs": 8, "coordination_args": {"method": "nope"}})


def test_buckets_divisibility():
    with pytest.raises(CardError):
        ModelCard.from_dict({"bs": 10, "buckets": 4})


def test_unknown_keys_rejected():
    with pytest.raises(CardError):
        ModelCard.from_dict({"bs": 8, "image_encoder_args": {
            "name": "resnet18", "bogus": 1}})


def test_load_card_yaml(tmp_path):
    import yaml
    p = tmp_path / "card.yaml"
    p.write_text(yaml.safe_dump(REFERENCE_MULTI_CARD))
    card = load_card(p)
    assert card.bs == 64
    assert card.oversize == 236


def test_transformer_position_table_must_cover_target_size():
    """An undersized transformer position table (profile_encoder target_size
    < card target_size) reads out-of-bounds embeddings -> rejected."""
    with pytest.raises(CardError):
        ModelCard.from_dict({
            "bs": 8, "dim_embedding": 16, "target_size": 224,
            "profile_encoder_args": {"kind": "transformer", "dim_in": 6,
                                     "dim_hidden": 16, "num_head": 2,
                                     "target_size": 64},
        })
    # equal or larger is fine (the reference's 256 >= 224 case)
    ModelCard.from_dict({
        "bs": 8, "dim_embedding": 16, "target_size": 224,
        "profile_encoder_args": {"kind": "transformer", "dim_in": 6,
                                 "dim_hidden": 16, "num_head": 2,
                                 "target_size": 256},
    })

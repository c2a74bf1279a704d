"""Profile-encoder factory.

Replaces the reference's key-presence dispatch (reference: src/model.py:34-39)
with an explicit ``kind`` (config.py supplies the key-sniffing compat shim).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .transformer import ProfileTransformer
from .lstm import ProfileLSTM
from .cnn import ProfileCNN

_KINDS = {
    "transformer": ProfileTransformer,
    "lstm": ProfileLSTM,
    "cnn": ProfileCNN,
}


def create_profile_encoder(args: Dict[str, Any],
                           dtype: jnp.dtype = jnp.float32):
    args = dict(args)
    kind = args.pop("kind", None)
    if kind is None:  # key-sniffing fallback, reference parity
        kind = "transformer" if "num_head" in args else (
            "cnn" if "blocks" in args else "lstm")
    cls = _KINDS[kind]
    if "blocks" in args:
        args["blocks"] = tuple(args["blocks"])
    return cls(dtype=dtype, **args)

"""Golden conversion fixture: pins the timm->Flax weight conversion
byte-exactly across refactors (VERDICT r3 #9, pretrained last mile).

This environment has no timm and no egress, so REAL ImageNet weights can
only be produced elsewhere (``scripts/convert_timm.py --from-hub`` is the
one-command recipe). What CAN be pinned here is the conversion function
itself: a deterministic synthetic torch-shaped state_dict (seed 0) is
converted and the result compared against recorded per-leaf SHA256
digests plus a recorded forward output of the restored backbone —
so any future converter change that alters a single byte of any produced
array, or the restored model's numerics, fails loudly. A timm-enabled
host that runs ``--from-hub`` gets the live forward-parity check against
timm itself on top.

Regenerate after a DELIBERATE converter change:
    python tests/test_convert_fixture.py --regen
"""

import hashlib
import json
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "convert_fixture.npz"
ARCHS = ("resnet18", "vit_tiny_patch16_224")


def _digest(arr: np.ndarray) -> str:
    a = np.ascontiguousarray(arr)
    return hashlib.sha256(a.tobytes() + str(a.shape).encode()
                          + str(a.dtype).encode()).hexdigest()


def _convert(arch):
    import jax

    from multimodal_plankton_recognition_tpu.models.convert_timm import (
        convert_state_dict, synthesize_state_dict,
    )
    from multimodal_plankton_recognition_tpu.models.image.registry import (
        create_backbone,
    )

    enc = create_backbone(arch, in_chans=1)
    x0 = np.zeros((1, 224, 224, 1), np.float32)
    shapes = jax.eval_shape(lambda: enc.init(jax.random.key(0), x0,
                                             train=False))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    sd = synthesize_state_dict(arch, zeros["params"],
                               zeros.get("batch_stats", {}),
                               src_in_chans=3, seed=0)
    params, stats, missing = convert_state_dict(arch, sd, in_chans=1)
    assert missing == []

    # forward output of the restored backbone on a fixed input
    def unflatten(flat):
        tree = {}
        for k, v in flat.items():
            d = tree
            parts = k.split("/")
            for part in parts[:-1]:
                d = d.setdefault(part, {})
            d[parts[-1]] = v
        return tree

    variables = {"params": unflatten(params)}
    if stats:
        variables["batch_stats"] = unflatten(stats)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 224, 224, 1)).astype(np.float32) * 0.1
    out = np.asarray(jax.jit(
        lambda v, x: enc.apply(v, x, train=False))(variables, x),
        np.float32)
    digests = {f"params/{k}": _digest(v) for k, v in params.items()}
    digests.update({f"batch_stats/{k}": _digest(v)
                    for k, v in stats.items()})
    return digests, out


def _regen():
    payload = {}
    for arch in ARCHS:
        digests, out = _convert(arch)
        payload[f"{arch}/digests"] = np.frombuffer(
            json.dumps(digests, sort_keys=True).encode(), np.uint8)
        payload[f"{arch}/forward"] = out
    GOLDEN.parent.mkdir(exist_ok=True)
    np.savez_compressed(GOLDEN, **payload)
    print(f"wrote {GOLDEN} ({GOLDEN.stat().st_size / 1024:.1f} KiB)")


@pytest.mark.parametrize("arch", ARCHS)
def test_conversion_matches_golden_fixture(arch):
    if not GOLDEN.exists():
        pytest.skip("fixture missing (python tests/test_convert_fixture.py"
                    " --regen)")
    with np.load(GOLDEN) as z:
        want_digests = json.loads(bytes(z[f"{arch}/digests"]).decode())
        want_out = z[f"{arch}/forward"]
    digests, out = _convert(arch)
    changed = sorted(k for k in want_digests
                     if digests.get(k) != want_digests[k])
    missing = sorted(set(want_digests) - set(digests))
    extra = sorted(set(digests) - set(want_digests))
    assert not (changed or missing or extra), (
        f"converter output drifted for {arch}: changed {changed[:5]}, "
        f"missing {missing[:5]}, extra {extra[:5]} "
        "(regenerate ONLY after a deliberate converter change)")
    # forward numerics of the restored backbone (CPU f32: tight tolerance)
    np.testing.assert_allclose(out, want_out, rtol=1e-4, atol=1e-4)


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        _regen()
    else:
        print(__doc__)

"""Runtime proof of the multi-host path (parallel/multihost.py).

The reference has no distributed code at all (SURVEY section 2c); our pod
story is per-host batch shards assembled into global arrays along the data
mesh axis. These tests actually EXECUTE that path with
``jax.process_count() == 2``: two subprocesses, each with 4 virtual CPU
devices, joined through ``jax.distributed.initialize`` on a localhost
coordinator with gloo CPU collectives — so ``host_shard``,
``make_global_batch`` and a global-negatives shard_map loss run over a
genuinely multi-process 8-device mesh (VERDICT r3 #4).

Kept OUT of the default suite's process (the workers need their own JAX
runtime); each worker is bounded by a timeout so a hung rendezvous fails
fast instead of wedging CI.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, os, sys
import numpy as np
import jax
# the axon sitecustomize prepends its platform even over JAX_PLATFORMS=cpu
jax.config.update("jax_platforms", "cpu")

pid = int(os.environ["MH_PROC_ID"])
jax.distributed.initialize(
    coordinator_address=os.environ["MH_COORD"],
    num_processes=2, process_id=pid,
    initialization_timeout=60,
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 4, jax.local_devices()
assert len(jax.devices()) == 8, jax.devices()

import jax.numpy as jnp
from multimodal_plankton_recognition_tpu.parallel import multihost
from multimodal_plankton_recognition_tpu.parallel.mesh import create_mesh
from multimodal_plankton_recognition_tpu.parallel.contrastive import (
    global_clip_loss, make_global_loss_shard_map,
)

# host_shard: the Loader's per-host sharding contract
assert multihost.host_shard() == (pid, 2), multihost.host_shard()
# initialize() must be a no-op now that the runtime is up
multihost.initialize()
assert jax.process_count() == 2

mesh = create_mesh()  # (8, 1) over the GLOBAL device list
assert mesh.shape["data"] == 8

# deterministic global batch; each host contributes its 8-row shard
rng = np.random.default_rng(0)
g_img = rng.normal(size=(16, 12)).astype(np.float32)
g_prof = rng.normal(size=(16, 12)).astype(np.float32)
local = {"image_emb": g_img[pid * 8:(pid + 1) * 8],
         "profile_emb": g_prof[pid * 8:(pid + 1) * 8]}
batch = multihost.make_global_batch(local, mesh)
for k, v in batch.items():
    assert v.shape == (16, 12), (k, v.shape)

# the global array must reassemble to the full batch on every host
gathered = np.asarray(
    jax.jit(lambda x: x, out_shardings=jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))(batch["image_emb"]))
np.testing.assert_allclose(gathered, g_img, atol=1e-6)

# one global-negatives contrastive loss over the 2-process mesh
loss_fn = make_global_loss_shard_map(global_clip_loss, mesh, n_scalars=1)
loss = float(loss_fn(batch["image_emb"], batch["profile_emb"],
                     jnp.asarray(1.0)))
print("MH_RESULT " + json.dumps({"pid": pid, "loss": loss}), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_global_batch_and_loss(tmp_path):
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update({
            "MH_PROC_ID": str(pid),
            "MH_COORD": f"localhost:{port}",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "PYTHONPATH": str(REPO) + os.pathsep + os.environ.get(
                "PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("MH_RESULT ")]
        assert line, out
        rec = json.loads(line[-1][len("MH_RESULT "):])
        results[rec["pid"]] = rec["loss"]
    assert set(results) == {0, 1}
    # both hosts see the same replicated global loss
    assert results[0] == pytest.approx(results[1], rel=1e-6)

    # oracle: the single-process bucketed CLIP loss (buckets=1) on the
    # same global batch must equal the 2-process shard_map loss
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multimodal_plankton_recognition_tpu.ops.losses import clip_loss

    rng = np.random.default_rng(0)
    g_img = rng.normal(size=(16, 12)).astype(np.float32)
    g_prof = rng.normal(size=(16, 12)).astype(np.float32)
    want = float(clip_loss(jnp.asarray(g_img), jnp.asarray(g_prof),
                           jnp.asarray(1.0), buckets=1))
    assert results[0] == pytest.approx(want, rel=1e-4)

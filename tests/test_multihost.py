"""REAL multi-process test: two jax.distributed processes on localhost CPU
train the canonical DP step over a global mesh (SURVEY.md §2.3 multi-host;
upgrades round-1's single-process-only coverage).

Each worker gets 4 virtual CPU devices -> an 8-device global mesh spanning
2 processes. Workers shard the dataset's views (process_shard_indices),
stitch local ray batches into global arrays (distribute_batch), and run
3 steps of the shard_map'd canonical train step. The test asserts both
processes converge to IDENTICAL replicated parameters.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

coord = sys.argv[1]
pid = int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

import jax.numpy as jnp
from sanerf_tpu.config import ModelConfig, RenderConfig, TrainConfig
from sanerf_tpu.data.synthetic import SyntheticSphereDataset
from sanerf_tpu.models import fields
from sanerf_tpu.parallel import dp, multihost
from sanerf_tpu.train import state as state_lib

RC = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
MC = ModelConfig(field_type="mlp", prop_resolutions=(32,),
                 mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                 mlp_prop_enc_freqs=3, mlp_prop_width=16, mlp_prop_depth=2)
TC = TrainConfig(iters=10, num_rays=256, adaptive_num_rays=False,
                 use_native_loader=False)

mesh = multihost.global_mesh()
assert mesh.devices.size == 8

model = fields.make_model(MC, RC)
state = state_lib.create_train_state(model, TC, jax.random.key(0))
state = dp.replicate_state(state, mesh)
step = dp.make_dp_train_step(model, TC, mesh)

ds = SyntheticSphereDataset(H=16, W=16, n_views=4)
my_views = multihost.process_shard_indices(4)
assert len(my_views) == 2
rng = np.random.default_rng(pid)

losses = []
for i in range(3):
    # each process samples HALF the global batch from its own views
    local = ds.collate_train(rng, TC.num_rays // 2)
    local = {k: v for k, v in local.items() if isinstance(v, np.ndarray)}
    gbatch = multihost.distribute_batch(local, mesh)
    state, aux = step(state, gbatch, jax.random.key(i))
    losses.append(float(aux["loss"]))

assert all(np.isfinite(losses)), losses
leaf = state.params["grid_mlp"][0]["w"]
# replicated params: every process sees identical values
val = np.asarray(jax.device_get(leaf.addressable_shards[0].data))
print("RESULT", pid, float(np.sum(val)), losses[-1], flush=True)
"""


def test_two_process_dp_training(tmp_path):
    if os.environ.get("SANERF_SKIP_MULTIPROC"):
        pytest.skip("multi-process test disabled")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, s, loss = line.split()
                results[int(pid)] = (float(s), float(loss))
    assert set(results) == {0, 1}, outs
    # replicated params identical across processes
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-6)
    assert np.isfinite(results[0][1])

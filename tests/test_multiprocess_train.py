"""Multi-process distributed TRAINING: 2-process jax.distributed DP step.

Round-4 coverage stopped at multi-process *inference* (test_multiprocess_dp);
the training step across processes — psum'd gradients over jax.distributed —
was exercised only in single-process virtual-device form.  This test runs the
REAL mode: two OS processes joined through ``jax.distributed.initialize`` on
the CPU platform, a global ``Mesh`` over both processes' devices, the batch
assembled with ``jax.make_array_from_process_local_data`` (each process
contributes its local rows), and the production train-step's loss/grads
compared against a process-local single-device run over the FULL batch.
A wrong PartitionSpec or a missing psum gives O(0.1+) errors here.

Reference context: the rank-strided sampler implies exactly this DP layout
(/root/reference/utils/helpers.py:113-207).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]

WORKER = r"""
import json, sys
import numpy as np
import jax
import jax.numpy as jnp

coordinator, pid, nproc, out_base = sys.argv[1:5]
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=int(nproc), process_id=int(pid))
assert jax.process_count() == int(nproc)

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, "tests")
from test_parallel import TINY

from simwhisper_codec_tpu.models.codec import CodecConstants, init_params, training_forward
from simwhisper_codec_tpu.train.step import make_spectral_consts, reconstruction_loss

cfg = TINY
consts = CodecConstants(cfg)
params = init_params(jax.random.PRNGKey(0), cfg)  # same seed -> identical everywhere
spec_consts = make_spectral_consts()

B, t_mel = 4, 104
rng_m, rng_a = np.random.default_rng(0), np.random.default_rng(1)
full = {
    "mel": rng_m.standard_normal((B, t_mel, 80)).astype(np.float32),
    "mel_lens": np.full((B,), t_mel, np.int32),
    "audio": (rng_a.standard_normal((B, t_mel * 160)) * 0.1).astype(np.float32),
    "audio_lens": np.full((B,), t_mel * 160, np.int32),
}

def loss_and_grads(p, b, sc):
    def loss_fn(p_):
        out = training_forward(cfg, consts, p_, b["mel"], b["mel_lens"])
        return reconstruction_loss(
            cfg, out["reconstructed_audio"], b["audio"], b["audio_lens"], sc
        )["loss"]
    return jax.value_and_grad(loss_fn)(p)

# reference: full batch, unsharded, on this process's local device
ref_loss, ref_grads = jax.jit(loss_and_grads)(params, full, spec_consts)
ref_loss = float(ref_loss)

# distributed: global mesh over both processes, batch rows sharded by process
mesh = Mesh(np.array(jax.devices()), ("data",))
shard = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())
rows = slice(int(pid) * (B // int(nproc)), (int(pid) + 1) * (B // int(nproc)))
batch = {k: jax.make_array_from_process_local_data(shard, v[rows], v.shape)
         for k, v in full.items()}
g_params = jax.device_put(params, repl)
g_consts = jax.device_put(spec_consts, repl)
dist_loss, dist_grads = jax.jit(
    loss_and_grads, out_shardings=(repl, repl))(g_params, batch, g_consts)
dist_loss = float(np.asarray(dist_loss.addressable_data(0)))

max_err, worst = 0.0, ""
flat_ref = {jax.tree_util.keystr(path): np.asarray(leaf, np.float32)
            for path, leaf in jax.tree_util.tree_leaves_with_path(ref_grads)}
for path, leaf in jax.tree_util.tree_leaves_with_path(dist_grads):
    key = jax.tree_util.keystr(path)
    got = np.asarray(leaf.addressable_data(0), np.float32)
    scale = max(float(np.max(np.abs(flat_ref[key]))), 1e-4)
    err = float(np.max(np.abs(got - flat_ref[key]))) / scale
    if err > max_err:
        max_err, worst = err, key

with open(f"{out_base}/train{pid}.json", "w") as f:
    json.dump({"ref_loss": ref_loss, "dist_loss": dist_loss,
               "grad_rel_err": max_err, "worst": worst}, f)
print("WORKER_OK", pid)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_train_step(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # real 1-device-per-process topology
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coordinator, str(pid), "2", str(tmp_path)],
            env=env, cwd=REPO_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out

    results = [json.load(open(tmp_path / f"train{i}.json")) for i in (0, 1)]
    for pid, r in enumerate(results):
        # cross-process DP must reproduce the single-device numerics
        assert abs(r["dist_loss"] - r["ref_loss"]) <= 1e-4 * abs(r["ref_loss"]), r
        assert r["grad_rel_err"] < 2e-3, (pid, r)
    # both processes computed the same reference and the same psum'd result
    assert results[0]["ref_loss"] == pytest.approx(results[1]["ref_loss"], rel=1e-6)
    assert results[0]["dist_loss"] == pytest.approx(results[1]["dist_loss"], rel=1e-6)

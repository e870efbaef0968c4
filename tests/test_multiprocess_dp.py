"""Multi-process data parallelism: 2-process jax.distributed corpus eval.

The reference's distributed story is a seed-synchronized sampler whose
rank-strided shards partition the corpus across DDP ranks
(/root/reference/utils/helpers.py:113-207).  The TPU-native equivalent is
``shard_files_by_process`` + per-process ``evaluate_corpus`` (eval/corpus.py
uses ``jax.process_index()/process_count()``) + a host-side result merge.
This test runs the REAL multi-process mode: two OS processes joined through
``jax.distributed.initialize`` on the CPU platform, each evaluating its shard
of a shared corpus, with the parent asserting the shards partition the corpus
and the merged stats add up.
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
import jax

coordinator, pid, nproc, corpus_dir, out_base = sys.argv[1:6]
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=int(nproc), process_id=int(pid))
assert jax.process_count() == int(nproc)
assert jax.process_index() == int(pid)

from simwhisper_codec_tpu.models.codec import AudioCodec, init_params
from simwhisper_codec_tpu.eval.corpus import evaluate_corpus
sys.path.insert(0, "tests")
from test_parallel import TINY

params = init_params(jax.random.PRNGKey(0), TINY)
codec = AudioCodec(TINY, params)
out_dir = f"{out_base}/proc{pid}"
stats = evaluate_corpus(codec, corpus_dir, output_dir=out_dir, batch_size=2)
with open(f"{out_base}/stats{pid}.json", "w") as f:
    json.dump(stats, f)
print("WORKER_OK", pid)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_corpus_eval(tmp_path):
    from simwhisper_codec_tpu.utils.audio_io import save_audio

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    rng = np.random.default_rng(0)
    n_files = 6
    for i in range(n_files):
        n = rng.integers(8000, 20000)
        save_audio(corpus / f"utt{i}.wav",
                   (rng.standard_normal(n) * 0.1).astype(np.float32), 16000)

    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # real 1-device-per-process topology
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coordinator, str(pid), "2",
             str(corpus), str(tmp_path)],
            env=env, cwd=REPO_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out

    # the two shards must partition the corpus: disjoint, exhaustive
    rec0 = {p.stem for p in (tmp_path / "proc0").glob("*.wav")}
    rec1 = {p.stem for p in (tmp_path / "proc1").glob("*.wav")}
    assert rec0.isdisjoint(rec1)
    assert rec0 | rec1 == {f"utt{i}" for i in range(n_files)}
    # rank-striding (utils/data.py::shard_files_by_process on sorted paths)
    assert rec0 == {f"utt{i}" for i in range(0, n_files, 2)}

    stats = [json.load(open(tmp_path / f"stats{i}.json")) for i in (0, 1)]
    assert stats[0]["files"] + stats[1]["files"] == n_files
    assert stats[0]["skipped"] == stats[1]["skipped"] == 0

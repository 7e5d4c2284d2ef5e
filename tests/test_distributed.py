"""Process-level multi-host test: 2 real processes, 8 global devices,
jax.distributed over Gloo — the full multi-host story executed end-to-end
(SURVEY.md §5 distributed backend; parallel/distributed.py).

The mesh spans both processes, so every per-step reduction in the tiered
selection actually crosses the process boundary; merges must still be
bit-identical to single-device training, and only process 0 may write
resources.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

_DIR = os.path.dirname(__file__)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(_DIR) + os.pathsep + \
        env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_DIR, "dist_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"

    with open(tmp_path / "proc0.json") as f:
        r0 = json.load(f)
    with open(tmp_path / "proc1.json") as f:
        r1 = json.load(f)
    assert r0["wrote"] and not r1["wrote"], (r0, r1)
    assert r0["n_merges"] == r1["n_merges"] > 40

    # The coordinator's resources load back into a fresh tokenizer.
    from subword_tokenizers_tpu import NaiveBPE
    tok = NaiveBPE()
    tok.load_resources(str(tmp_path / "resources"), strict=True)
    assert len(tok.merges_list) == r0["n_merges"]

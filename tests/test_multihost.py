"""Two-process multi-host smoke test on CPU (VERDICT r2 #9).

Spawns two real OS processes that form a JAX distributed system
(``jax.distributed.initialize``), exercising the actual multi-host code
paths the trainer uses (trainer.py:301-305): ``Loader.shard`` disjoint
tile sharding and ``device_prefetch``'s per-process global batch assembly,
with replicated optimizer state that must stay bit-identical across hosts
after two steps (params are replicated, the batch is sharded, so XLA
inserts the gradient all-reduce — the ICI collective on a real pod).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_shard_and_replicated_state(tmp_path):
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize TPU-claim trigger
    outs = [tmp_path / f"out{p}.json" for p in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(p), "2", str(port), str(outs[p])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for p in range(2)
    ]
    logs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    res = [json.loads(o.read_text()) for o in outs]
    seen = [set(r["seen"]) for r in res]
    # disjoint per-host tile shards covering distinct strided halves
    assert seen[0] == {0, 2, 4, 6} and seen[1] == {1, 3, 5, 7}
    assert res[0]["nsteps"] == res[1]["nsteps"] == 2
    # replicated state stayed bit-identical across hosts
    np.testing.assert_array_equal(np.asarray(res[0]["w"]),
                                  np.asarray(res[1]["w"]))
    # and it actually trained (moved off the init value)
    assert not np.allclose(res[0]["w"], 0.1)

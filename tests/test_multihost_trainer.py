"""2-process ``train_patchgan`` e2e: uneven shards, synchronized
preemption, single-writer artifacts, resume (VERDICT r4 #6).

The deadlock this guards against (docs/ROUND4.md): host A receives
SIGTERM and breaks its local epoch loop while host B keeps issuing
collectives — B hangs in the gradient all-reduce and A hangs in orbax's
save barrier. The trainer's fix allgathers the preemption flag at
synchronized points so both hosts exit the loop on the same step; this
test delivers SIGTERM to ONE process and requires BOTH to exit cleanly
with the preempted status, then resumes to completion.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from mipheivit_tpu.slideio import write_pyramid

WORKER = Path(__file__).parent / "multihost_trainer_worker.py"

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _build_fixture(root: Path, rng) -> Path:
    """11 train tiles (UNEVEN 6/5 split across 2 hosts), 2 val, 2 test."""
    import cv2

    tiles = root / "tiles"
    tiles.mkdir()
    rows = []
    for i in range(15):
        he = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        mif = rng.integers(0, 255, (2, 32, 32), dtype=np.uint8)
        img = str(tiles / f"t{i}.png")
        cv2.imwrite(img, cv2.cvtColor(he, cv2.COLOR_RGB2BGR))
        targ = str(tiles / f"t{i}_mif.tiff")
        write_pyramid(targ, mif, n_levels=1, tile_size=32)
        rows.append({"image_path": img, "target_path": targ,
                     "in_slide_name": "s0",
                     "CD31_count": i, "CD31_prop": 0.1,
                     "CD3e_count": 15 - i, "CD3e_prop": 0.05})
    df = pd.DataFrame(rows)
    df.iloc[:11].to_csv(root / "train.csv", index=False)
    df.iloc[11:13].to_csv(root / "val.csv", index=False)
    df.iloc[13:].to_csv(root / "test.csv", index=False)
    stats = {
        "RGB": {"mean": [180.0, 140.0, 170.0], "std": [40.0, 45.0, 35.0]},
        "CD31": {"idx_channel": 0, "std": 10.0, "min": 0,
                 "is_structural": True},
        "CD3e": {"idx_channel": 1, "std": 12.0, "min": 0,
                 "is_structural": False},
    }
    (root / "channel_stats.json").write_text(json.dumps(stats))
    return root


def _spawn(pid, port, fixture, logdir, out, resume=False):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    argv = [sys.executable, str(WORKER), str(pid), "2", str(port),
            str(fixture), str(logdir), str(out)]
    if resume:
        argv.append("--resume")
    return subprocess.Popen(argv, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)


def test_train_patchgan_two_hosts_preempt_and_resume(tmp_path, rng):
    fixture = _build_fixture(tmp_path, rng)
    logdir = tmp_path / "run"
    outs = [tmp_path / f"out{p}.json" for p in range(2)]

    # ---- phase 1: train, then SIGTERM host 0 only --------------------
    port = _free_port()
    procs = [_spawn(p, port, fixture, logdir, outs[p]) for p in range(2)]

    metrics = logdir / "metrics.jsonl"
    deadline = time.time() + 420
    while time.time() < deadline:
        if metrics.exists() and metrics.read_text().strip():
            break
        if any(p.poll() is not None for p in procs):
            break
        time.sleep(1.0)
    else:
        for p in procs:
            p.kill()
        pytest.fail("no first-epoch metrics within the deadline")
    assert all(p.poll() is None for p in procs), \
        procs[0].communicate()[0].decode() + \
        procs[1].communicate()[0].decode()

    procs[0].send_signal(signal.SIGTERM)   # ONE host only
    logs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, f"worker {p.pid} failed:\n{lg[-3000:]}"

    res = [json.loads(o.read_text()) for o in outs]
    assert res[0]["preempted"] and res[1]["preempted"], res
    # SPMD: identical dispatched step counts despite the 6/5 shard split
    assert res[0]["state_step"] == res[1]["state_step"] > 0
    assert (logdir / "status.txt").read_text() == "preempted"
    assert (logdir / "orbax").exists()
    step_at_preempt = res[0]["state_step"]

    # ---- phase 2: resume to completion --------------------------------
    port = _free_port()
    procs = [_spawn(p, port, fixture, logdir, outs[p], resume=True)
             for p in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, f"resume worker failed:\n{lg[-3000:]}"

    res = [json.loads(o.read_text()) for o in outs]
    assert not res[0]["preempted"] and not res[1]["preempted"]
    assert res[0]["state_step"] == res[1]["state_step"] > step_at_preempt
    assert (logdir / "status.txt").read_text() == "finished"
    # main-only artifacts exist exactly once, written by host 0 (host 1
    # had MetricsLogger/save_safetensors patched to raise)
    assert (logdir / "model.safetensors").exists()
    assert (logdir / "config.yaml").exists()

"""Training entry point (reference run.py parity, hydra-free).

Usage: ``python run.py [+default_configs=miphei-vit] [++train.epochs=15] ...``
Creates ``logs/patchgan_<markers>_<timestamp>/`` with the resolved
config.yaml, a not-finished/finished ``status.txt`` sentinel, and a
``github_log.txt`` with the git SHA + diff (reference: run.py:16-72).
"""

import logging
import subprocess
import sys
from datetime import datetime
from pathlib import Path

from mipheivit_tpu.config import compose
from mipheivit_tpu.train.trainer import train_patchgan

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")


def write_github_logs(logdir: Path) -> None:
    try:
        sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                             text=True).stdout.strip()
        diff = subprocess.run(["git", "diff"], capture_output=True,
                              text=True).stdout
        (logdir / "github_log.txt").write_text(f"commit {sha}\n\n{diff}")
    except Exception:
        pass


def main() -> None:
    args = sys.argv[1:]
    resume_dir = None
    multirun = False
    for arg in list(args):
        if arg.startswith("--resume="):
            resume_dir = arg.split("=", 1)[1]
            args.remove(arg)
        elif arg in ("-m", "--multirun"):
            multirun = True
            args.remove(arg)
    if resume_dir:
        from mipheivit_tpu.config import load_yaml

        logdir = Path(resume_dir)
        cfg = load_yaml(logdir / "config.yaml")
        train_patchgan(cfg, str(logdir), resume=True)
        return
    timestamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    Path("logs").mkdir(exist_ok=True)
    if multirun:
        # hydra -m basic sweeper: sequential jobs, one logdir per job
        # (reference: README.md:193-197)
        from mipheivit_tpu.config import compose_multirun

        jobs = compose_multirun(args)
        sweep_dir = Path("logs") / f"multirun_{timestamp}"
        for i, (name, cfg) in enumerate(jobs):
            logdir = sweep_dir / f"{i}_{name}"
            logdir.mkdir(parents=True)
            (logdir / "status.txt").write_text("not finished")
            write_github_logs(logdir)
            logging.info("multirun job %d/%d: %s", i + 1, len(jobs), name)
            train_patchgan(cfg, str(logdir))
        return
    cfg = compose(args)
    markers = "_".join(map(str, cfg.data.targ_channel_names))
    logdir = Path("logs") / f"patchgan_{markers}_{timestamp}"
    logdir.mkdir(parents=True)
    (logdir / "status.txt").write_text("not finished")
    write_github_logs(logdir)
    train_patchgan(cfg, str(logdir))


if __name__ == "__main__":
    main()

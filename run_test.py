"""Eval-only entry point (reference run_test.py parity): re-runs the val +
test epochs of a finished run from its checkpoint dir."""

import argparse
import logging
from pathlib import Path

from mipheivit_tpu.config import load_yaml

logging.basicConfig(level=logging.INFO)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", required=True, help="Checkpoint Path")
    args = parser.parse_args()

    cfg = load_yaml(str(Path(args.checkpoint_dir) / "config.yaml"))
    from mipheivit_tpu.train.test_driver import test_model

    test_model(cfg, args.checkpoint_dir, Path(args.checkpoint_dir).stem)


if __name__ == "__main__":
    main()

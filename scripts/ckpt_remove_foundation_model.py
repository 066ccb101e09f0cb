"""Shrink a generator checkpoint: drop frozen foundation-encoder weights,
keep LoRA adapters + decoder (reference:
scripts/ckpt_remove_foundation_model.py:7-22). Loading the result requires
the raw foundation checkpoint on the side (src/inference.py strict=False
semantics / infer.loading here)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.models.import_weights import load_state_dict  # noqa: E402
from mipheivit_tpu.train.checkpoints import save_safetensors  # noqa: E402


def strip_foundation(state: dict) -> dict:
    out = {}
    for key, val in state.items():
        if key.startswith("encoder.vit.") and ".lora" not in key:
            continue
        out[key] = val
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    state = load_state_dict(args.checkpoint)
    stripped = strip_foundation(state)
    save_safetensors(stripped, args.out)
    print(f"{len(state)} -> {len(stripped)} tensors: {args.out}")


if __name__ == "__main__":
    main()

"""Foundation-model tile embeddings for artifact filtering.

Reference: preprocessings/artifacts_detection/extract_embeddings.py —
half-precision H-Optimus embeddings per tile, spilled to memmap shards;
downstream notebook filters outlier tiles. Here: the jax encoder (bf16 on
TPU) pooled to the CLS token, streamed into .npy shards.
"""

import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

from mipheivit_tpu.data.pipeline import Loader, device_prefetch  # noqa: E402
from mipheivit_tpu.data.dataset import TileDataset  # noqa: E402
from mipheivit_tpu.data.stats import HOPTIMUS_MEAN, HOPTIMUS_STD, Normalizer  # noqa: E402
from mipheivit_tpu.models import get_encoder_spec  # noqa: E402
from mipheivit_tpu.models.vit import VisionTransformer  # noqa: E402
from mipheivit_tpu.models.import_weights import (  # noqa: E402
    load_state_dict,
    vit_params_from_torch,
)


def main():
    import jax
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("--tile_dataframe", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--encoder", default="hoptimus0")
    parser.add_argument("--encoder_weights", required=True)
    parser.add_argument("--img_size", type=int, default=224)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--shard_size", type=int, default=4096)
    args = parser.parse_args()

    spec = get_encoder_spec(args.encoder, args.img_size)
    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    cfg = spec.vit_cfg.replace(dtype=dtype)
    model = VisionTransformer(cfg)
    params = vit_params_from_torch(load_state_dict(args.encoder_weights), cfg)
    fwd = jax.jit(lambda x: model.apply({"params": params}, x)[:, 0])  # CLS

    df = pd.read_csv(args.tile_dataframe)
    norm = Normalizer({"mean": HOPTIMUS_MEAN, "std": HOPTIMUS_STD}, "he")
    from mipheivit_tpu.data.augment import SpatialAugment

    dataset = TileDataset(df, preprocess_input_fn=norm,
                          spatial_augmentations=SpatialAugment(
                              args.img_size, args.img_size, training=False))
    loader = Loader(dataset, args.batch_size, num_workers=4,
                    pad_to_batch=True)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    shard, names, shard_idx = [], [], 0

    def flush():
        nonlocal shard, names, shard_idx
        if not shard:
            return
        np.save(out_dir / f"embeddings_{shard_idx:04d}.npy",
                np.concatenate(shard).astype(np.float16))
        pd.Series([n for b in names for n in b]).to_csv(
            out_dir / f"names_{shard_idx:04d}.csv", index=False)
        shard, names = [], []
        shard_idx += 1

    count = 0
    for batch in device_prefetch(loader, size=2):
        n = int(np.asarray(batch["mask"]).sum())
        emb = np.asarray(fwd(batch["image"]).astype(jnp.float32))[:n]
        shard.append(emb)
        names.append(batch["tile_name"][:n])
        count += n
        if sum(s.shape[0] for s in shard) >= args.shard_size:
            flush()
    flush()
    print(f"{count} embeddings -> {out_dir}")


if __name__ == "__main__":
    main()

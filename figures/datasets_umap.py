"""2-D embedding map of dataset tiles through a foundation encoder.

Script equivalent of the reference's figures/datasets_umap.ipynb: sample
tiles from the train/val/test dataframes, embed each through the ViT
encoder's class token, reduce to 2-D (umap-learn when installed, sklearn
PCA otherwise — same artifact either way), and scatter colored by split.
Shows dataset shift / split leakage at a glance.
"""

import argparse
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.data.stats import Normalizer  # noqa: E402
from mipheivit_tpu.slideio import read_image  # noqa: E402


def embed_tiles(df: pd.DataFrame, encoder_apply, normalizer,
                batch_size: int = 16) -> np.ndarray:
    import jax.numpy as jnp

    embs = []
    paths = df["image_path"].tolist()
    for i in range(0, len(paths), batch_size):
        tiles = [np.asarray(normalizer(read_image(p)), np.float32)
                 for p in paths[i:i + batch_size]]
        x = np.stack(tiles)
        embs.append(np.asarray(encoder_apply(jnp.asarray(x))))
    return np.concatenate(embs)


def reduce_2d(embs: np.ndarray, seed: int = 0) -> np.ndarray:
    try:
        import umap

        return umap.UMAP(random_state=seed).fit_transform(embs)
    except ImportError:
        from sklearn.decomposition import PCA

        return PCA(n_components=2, random_state=seed).fit_transform(embs)


def plot_embedding(coords: np.ndarray, labels, out_path: str) -> None:
    fig, ax = plt.subplots(figsize=(5, 4.5))
    for name in sorted(set(labels)):
        mask = np.asarray([l == name for l in labels])
        ax.scatter(coords[mask, 0], coords[mask, 1], s=8, alpha=0.6,
                   label=name)
    ax.legend(markerscale=2, frameon=False)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path, dpi=200)
    plt.close(fig)


def main():
    import jax

    from mipheivit_tpu.data.stats import (
        HOPTIMUS_MEAN, HOPTIMUS_STD, IMAGENET_MEAN, IMAGENET_STD)
    from mipheivit_tpu.models.foundation import get_encoder_spec
    from mipheivit_tpu.models.vit import VisionTransformer

    parser = argparse.ArgumentParser()
    parser.add_argument("--train_csv", required=True)
    parser.add_argument("--val_csv", required=True)
    parser.add_argument("--test_csv", required=True)
    parser.add_argument("--out_path", required=True)
    parser.add_argument("--encoder", default="hoptimus0")
    parser.add_argument("--encoder_ckpt", default=None,
                        help="safetensors/torch encoder weights; random "
                             "init without (geometry-only map)")
    parser.add_argument("--n_per_split", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    dfs = {name: pd.read_csv(path) for name, path in
           (("train", args.train_csv), ("val", args.val_csv),
            ("test", args.test_csv))}
    dfs = {k: v.sample(min(args.n_per_split, len(v)),
                       random_state=args.seed) for k, v in dfs.items()}
    sample_img = read_image(dfs["train"].iloc[0]["image_path"])
    img_size = sample_img.shape[0]

    spec = get_encoder_spec(args.encoder, (img_size, img_size))
    if spec.family != "vit":
        raise SystemExit(f"embedding map needs a ViT encoder, got {spec.family}")
    model = VisionTransformer(spec.vit_cfg.replace(lora_rank=0))
    variables = model.init(jax.random.PRNGKey(args.seed),
                           np.zeros((1, img_size, img_size, 3), np.float32))
    if args.encoder_ckpt:
        from mipheivit_tpu.models.import_weights import (
            load_state_dict, vit_params_from_torch)

        state = load_state_dict(args.encoder_ckpt)
        variables = {"params": vit_params_from_torch(
            state, spec.vit_cfg.replace(lora_rank=0))}
    if args.encoder == "hoptimus0":
        mean, std = HOPTIMUS_MEAN, HOPTIMUS_STD
    else:
        mean, std = IMAGENET_MEAN, IMAGENET_STD
    normalizer = Normalizer({"mean": mean, "std": std}, "he")
    fwd = jax.jit(lambda x: model.apply(variables, x)[:, 0])  # class token

    embs, labels = [], []
    for name, df in dfs.items():
        embs.append(embed_tiles(df, fwd, normalizer))
        labels += [name] * len(df)
    coords = reduce_2d(np.concatenate(embs), args.seed)
    plot_embedding(coords, labels, args.out_path)
    print(f"embedding map ({len(labels)} tiles) -> {args.out_path}")


if __name__ == "__main__":
    main()

"""HEMIT reproduction: pix2pix-style training of the dual-branch generator.

Reference: hemit/adapted_scripts — the adapted pix2pix train loop
(generator + NLayer discriminator, GAN + L1*100 objective, linear LR decay,
val SSIM/PSNR model selection) over the HEMIT folder layout. Rebuilt on the
framework's train core: the dual-branch ``ResnetGeneratorSwinT`` runs under
the same jitted GAN step as the flagship, with the pix2pix loss recipe
(lambda_L1=100, plain L1) instead of the MIPHEI losses.
"""

import argparse
import logging
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.data.dataset import TileImg2ImgDataset  # noqa: E402
from mipheivit_tpu.data.pipeline import Loader, device_prefetch  # noqa: E402
from mipheivit_tpu.data.stats import Normalizer  # noqa: E402
from mipheivit_tpu.data.augment import get_augmentations  # noqa: E402
from mipheivit_tpu.metrics import PixelMetrics  # noqa: E402
from mipheivit_tpu.models.hemit import build_hemit  # noqa: E402
from mipheivit_tpu.models.discriminator import DiscriminatorPatch  # noqa: E402
from mipheivit_tpu.train.losses import mae_loss  # noqa: E402
from mipheivit_tpu.train.optim import (  # noqa: E402
    build_discriminator_optimizer,
    build_generator_optimizer,
)
from mipheivit_tpu.train.steps import (  # noqa: E402
    StepConfig,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from mipheivit_tpu.utils import MetricsLogger  # noqa: E402

logging.basicConfig(level=logging.INFO)
log = logging.getLogger("train_hemit")


def dataframe_from_folders(root: str, split: str) -> pd.DataFrame:
    """HEMIT dataset layout: <root>/<split>/{input,label}/*.png
    (reference hemit converters produce this folder pairing)."""
    base = Path(root) / split
    rows = []
    for img in sorted((base / "input").glob("*")):
        label = base / "label" / img.name
        if label.exists():
            rows.append({"image_path": str(img), "target_path": str(label)})
    return pd.DataFrame(rows)


def main():
    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--lambda_l1", type=float, default=100.0)
    parser.add_argument("--crop", type=int, default=256)
    parser.add_argument("--nc_out", type=int, default=3)
    args = parser.parse_args()

    train_df = dataframe_from_folders(args.data_root, "train")
    val_df = dataframe_from_folders(args.data_root, "val")
    log.info("%d train / %d val pairs", len(train_df), len(val_df))
    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"

    # HEMIT normalizes both sides to [-1, 1] (pix2pix convention)
    norm = Normalizer(mode="if")
    spatial, color = get_augmentations(args.crop, args.crop, True)
    eval_spatial, _ = get_augmentations(args.crop, args.crop, False)
    train_ds = TileImg2ImgDataset(train_df, preprocess_input_fn=norm,
                                  preprocess_target_fn=norm,
                                  spatial_augmentations=spatial,
                                  color_augmentations=None)
    val_ds = TileImg2ImgDataset(val_df, preprocess_input_fn=norm,
                                preprocess_target_fn=norm,
                                spatial_augmentations=eval_spatial)

    model = build_hemit(args.crop, 3, args.nc_out, dtype=dtype)
    disc = DiscriminatorPatch(norm_layer_type=None)
    total_iters = max(1, len(train_df) // args.batch_size * args.epochs)
    gen_opt = build_generator_optimizer("hemit", args.lr, total_iters)
    disc_opt = build_discriminator_optimizer(args.lr, total_iters)

    loader = Loader(train_ds, args.batch_size, shuffle=True, drop_last=True,
                    num_workers=4)
    sample = next(iter(loader))
    state = create_train_state(
        jax.random.PRNGKey(0), model, gen_opt, disc, disc_opt,
        sample_batch={"image": sample["image"], "target": sample["target"]})
    train_step = jax.jit(make_train_step(
        model, mae_loss(args.lambda_l1), gen_opt, disc, disc_opt,
        StepConfig(gan_train=True)))
    eval_step = jax.jit(make_eval_step(model, mae_loss(args.lambda_l1)))

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = MetricsLogger(str(out_dir), use_wandb=False)
    best_psnr = -np.inf
    step = 0
    for epoch in range(args.epochs):
        metrics = PixelMetrics.zeros()
        for batch in device_prefetch(loader, size=2):
            b = {"image": batch["image"], "target": batch["target"]}
            state, metrics, slog = train_step(state, b, metrics)
            step += 1
            if bool(slog["nan"]):
                raise ValueError("Nan found")
        val_metrics = PixelMetrics.zeros()
        vloader = Loader(val_ds, args.batch_size, num_workers=4,
                         pad_to_batch=True)
        for batch in device_prefetch(vloader, size=2):
            b = {"image": batch["image"], "target": batch["target"],
                 "mask": batch["mask"]}
            val_metrics, _ = eval_step(state, b, val_metrics)
        vm = {f"val_{k}": float(v) for k, v in val_metrics.compute().items()}
        vm["epoch"] = epoch
        logger.log(vm, step=step)
        log.info("epoch %d: %s", epoch, vm)
        if vm["val_psnr"] > best_psnr:
            best_psnr = vm["val_psnr"]
            from mipheivit_tpu.train.checkpoints import save_train_state

            save_train_state(state, str(out_dir / "orbax"))
            log.info("new best val_psnr=%.3f", best_psnr)
    logger.finish()


if __name__ == "__main__":
    main()

"""Batch tile inference CLI (reference run_inference.py parity).

Usage:
  python run_inference.py --checkpoint_dir D [--dataset_config_path C]
                          [--batch_size N] [--wsi SLIDE --out OUT.ome.tiff]

Reads ``D/config.yaml`` (the resolved run config saved beside the
checkpoint), optionally overrides the dataframe paths from a dataset config
file, and writes per-tile prediction TIFFs to
``D/inference_<dataset>_<run>/`` — or, with ``--wsi``, runs sliding-window
stitched inference over a whole slide.
"""

import argparse
from pathlib import Path

from mipheivit_tpu.config import load_yaml
from mipheivit_tpu.infer import inference_model


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", required=True, help="Checkpoint Path")
    parser.add_argument("--dataset_config_path", default=None,
                        help="Optional dataset-specific config file (in configs/data/).")
    parser.add_argument("--batch_size", default=None, type=int)
    parser.add_argument("--wsi", default=None,
                        help="Whole-slide path: run stitched sliding-window inference")
    parser.add_argument("--out", default=None, help="Output path for --wsi mode")
    parser.add_argument("--tile_size", default=256, type=int)
    parser.add_argument("--overlap", default=64, type=int)
    parser.add_argument("--int8", action="store_true",
                        help="opt-in W8A8 serving: quantize the ViT encoder"
                             " matmuls + decoder fusion convs to int8."
                             " Accuracy-gated; measure throughput on your"
                             " hardware first (BASELINE.md: unmeasurable on"
                             " the tunneled dev chip; bf16 is the default)")
    parser.add_argument("--seq_shard", action="store_true",
                        help="whole-region serving: shard the token axis "
                             "over all devices (use with a large "
                             "--tile_size, e.g. 1024/2048)")
    args = parser.parse_args()

    config_path = str(Path(args.checkpoint_dir) / "config.yaml")
    run_name = Path(args.checkpoint_dir).stem
    cfg = load_yaml(config_path)

    if args.dataset_config_path:
        if not Path(args.dataset_config_path).exists():
            raise FileNotFoundError(
                f"Dataset config {args.dataset_config_path} not found.")
        ds_cfg = load_yaml(args.dataset_config_path)
        ds_data = ds_cfg.select("data", ds_cfg)
        for key in ("slide_dataframe_path", "train_dataframe_path",
                    "val_dataframe_path", "test_dataframe_path",
                    "channel_stats_path"):
            if key in ds_data:
                cfg.data[key] = ds_data[key]

    if args.batch_size:
        cfg.train["batch_size"] = args.batch_size

    if args.wsi:
        import jax

        from mipheivit_tpu.data.stats import (
            Normalizer, get_input_mean_std, load_channel_stats)
        from mipheivit_tpu.infer import load_generator, wsi_inference

        stats = load_channel_stats(cfg.data.channel_stats_path)
        names = list(cfg.data.targ_channel_names)
        dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
        seq_mesh = None
        if args.seq_shard:
            from mipheivit_tpu.parallel import make_mesh

            cfg.set_dotted("model.attn_impl", "seq_shard")
            seq_mesh = make_mesh(n_data=1, n_model=jax.device_count())
        model, variables = load_generator(
            cfg, args.checkpoint_dir, (args.tile_size, args.tile_size),
            len(names), dtype=dtype,
            fast_heads=cfg.model.model_name.startswith("myvitmatte"))
        if args.int8:
            from mipheivit_tpu.infer.loading import (quantize_decoder,
                                                     quantize_encoder)

            model, variables = quantize_encoder(model, variables)
            model, variables = quantize_decoder(model, variables)
        he_norm = Normalizer(get_input_mean_std(
            cfg.model.model_name, cfg.select("model.encoder.encoder_name"),
            stats.rgb), mode="he")
        out = args.out or str(Path(args.wsi).with_suffix(".pred.ome.tiff"))
        wsi_inference(model, variables, args.wsi, out, names, he_norm,
                      tile_size=args.tile_size, overlap=args.overlap,
                      batch_size=cfg.train.batch_size,
                      seq_shard_mesh=seq_mesh)
        return

    dataset_name = Path(args.dataset_config_path).stem \
        if args.dataset_config_path else "default"
    out_dir = str(Path(args.checkpoint_dir) / f"inference_{dataset_name}_{run_name}")
    inference_model(cfg, args.checkpoint_dir, out_dir)


if __name__ == "__main__":
    main()

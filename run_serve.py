"""Online inference daemon: serve a trained generator over HTTP.

Usage:
  python run_serve.py --checkpoint_dir D [--port 8000] [--batch_size 32]
                      [--tile_size 256] [--max_delay_ms 5]

Reads ``D/config.yaml`` (the resolved run config saved beside the
checkpoint) like the other drivers. Concurrent requests are micro-batched
into one fixed-shape device executable (mipheivit_tpu/infer/serve.py).

  POST /v1/predict   .npy uint8 [H,W,3] H&E tile -> .npy uint8 [H,W,C] mIF
  GET  /healthz      readiness (model warmed up)
  GET  /stats        latency percentiles + batch occupancy
"""

import argparse
import logging

from mipheivit_tpu.infer import TileServer

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", required=True)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", default=8000, type=int)
    parser.add_argument("--batch_size", default=32, type=int)
    parser.add_argument("--tile_size", default=256, type=int)
    parser.add_argument("--max_delay_ms", default=5.0, type=float,
                        help="max time the oldest request waits for the "
                             "batch to fill before a partial batch runs")
    parser.add_argument("--dtype", default=None,
                        help="compute dtype (default: bfloat16 on TPU)")
    args = parser.parse_args()

    server = TileServer.from_checkpoint(
        args.checkpoint_dir, tile_size=args.tile_size,
        batch_size=args.batch_size, max_delay_ms=args.max_delay_ms,
        host=args.host, port=args.port, dtype=args.dtype)
    server.serve_forever()


if __name__ == "__main__":
    main()

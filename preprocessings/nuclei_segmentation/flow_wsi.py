"""Overlap-averaged flow-field WSI segmentation (CellPose-style).

Reference: preprocessings/nuclei_segmentation/nuclei_dapi_wsi_cellpose/
cellpose_wsi_inference.py:161-249 — tile seams are avoided by averaging the
*flow fields*, not the masks: overlapping tiles accumulate the 2-channel
flow (dp), the cell probability, and a coverage count into an HDF5 spill;
masks are then computed per non-overlapping chunk from the averaged fields
with an overlap halo, keeping instances owned by the chunk interior. This
is strictly better at borders than disjoint-tile segmentation + halo
ownership alone (a nucleus split by a tile edge gets one coherent flow).

Here the spill is float16/uint8 np.memmaps (same bounded-RAM property as
the reference's HDF5), the backend is pluggable — ``cellpose_flow_factory``
adapts CellPose when installed, and ``flow_dynamics.
reference_dynamics_factory`` provides a network-free backend (diffusion
flows over any per-tile segmenter, followed by real flow integration) used
both as the production fallback and to test the plumbing on
model-faithful fields — and the labels plane reuses the memmap + banded
relabel machinery from wsi_nuclei_inference.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import numpy as np

from wsi_nuclei_inference import (  # noqa: E402
    _read_scaled,
    merge_owned_instances,
    sequential_relabel,
)


def flow_segment_wsi(reader, flow_fn, compute_masks_fn,
                     tile_size: int = 2048, overlap: int = 128,
                     dapi_channel: int = 0, scratch_dir: str = None,
                     target_mpp: float = None,
                     min_cellprob_sum: float = 10.0) -> np.ndarray:
    """Two-pass flow segmentation.

    ``flow_fn(tile_hw) -> (dp [2,h,w] float, cellprob [h,w] float)``;
    ``compute_masks_fn(dp, cellprob) -> labels [h,w] int``.
    Returns the sequentially relabeled int32 plane (np.memmap in
    ``scratch_dir``)."""
    w, h = reader.dimensions
    scale = 1.0
    if target_mpp and reader.mpp:
        scale = reader.mpp / float(target_mpp)
    vw, vh = max(int(round(w * scale)), 1), max(int(round(h * scale)), 1)

    scratch = Path(scratch_dir or tempfile.mkdtemp(prefix="flowseg_"))
    scratch.mkdir(parents=True, exist_ok=True)
    dp = np.memmap(scratch / "dp.f16", np.float16, "w+", shape=(2, vh, vw))
    prob = np.memmap(scratch / "prob.f16", np.float16, "w+", shape=(vh, vw))
    count = np.memmap(scratch / "count.u8", np.uint8, "w+", shape=(vh, vw))

    # ---- pass 1: accumulate flows over the overlapping tile grid --------
    stride = tile_size - overlap
    for ty in range(0, vh, stride):
        for tx in range(0, vw, stride):
            tw = min(tile_size, vw - tx)
            th = min(tile_size, vh - ty)
            tile = _read_scaled(reader, tx, ty, tw, th, scale)
            tile_dp, tile_prob = flow_fn(tile[..., dapi_channel])
            dp[:, ty:ty + th, tx:tx + tw] += tile_dp[:, :th, :tw].astype(
                np.float16)
            prob[ty:ty + th, tx:tx + tw] += tile_prob[:th, :tw].astype(
                np.float16)
            count[ty:ty + th, tx:tx + tw] += 1

    # ---- pass 2: masks from averaged fields, chunk + halo ---------------
    labels = np.memmap(scratch / "labels.i32", np.int32, "w+",
                       shape=(vh, vw))
    next_id = 0
    for ty in range(0, vh, tile_size):
        for tx in range(0, vw, tile_size):
            x0, y0 = max(tx - overlap, 0), max(ty - overlap, 0)
            x1 = min(tx + tile_size + overlap, vw)
            y1 = min(ty + tile_size + overlap, vh)
            n = np.maximum(count[y0:y1, x0:x1].astype(np.float32), 1.0)
            chunk_prob = prob[y0:y1, x0:x1].astype(np.float32) / n
            # gate on the foreground-pixel count, like the reference's
            # np.sum(cellmask_chunk) < 10 (:230-231) — raw logit sums go
            # hugely negative on mostly-background chunks and would skip
            # chunks that do contain cells
            if float((chunk_prob > 0).sum()) < min_cellprob_sum:
                continue
            chunk_dp = dp[:, y0:y1, x0:x1].astype(np.float32) / n
            tile_labels = np.asarray(
                compute_masks_fn(chunk_dp, chunk_prob), np.int32)

            next_id = merge_owned_instances(
                labels, tile_labels, tx, ty, x0, y0, x1, y1,
                tile_size, next_id, vh, vw)

    sequential_relabel(labels, next_id)

    for name in ("dp.f16", "prob.f16", "count.u8"):
        (scratch / name).unlink(missing_ok=True)
    # the caller gets an open memmap backed by labels.i32, so the scratch
    # dir cannot be removed here; record it (whoever supplied scratch_dir
    # included) so cleanup_flow_scratch() can reclaim the slide-sized
    # int32 plane once the labels are no longer needed
    labels.cleanup_dir = str(scratch)  # type: ignore[attr-defined]
    return labels


def cleanup_flow_scratch(labels) -> None:
    path = getattr(labels, "cleanup_dir", None)
    del labels
    if path:
        shutil.rmtree(path, ignore_errors=True)


def cellpose_jax_flow_factory(ckpt_path: str = None, params: dict = None,
                              x01: float = 0.0, x99: float = 0.65,
                              tile: int = 224, batch_size: int = 64):
    """First-party TPU/JAX CellPose backend (no optional deps).

    Mirrors the reference eval semantics (cellpose_wsi_inference.py:
    132-135, 187-218): DAPI/255 normalized by the fixed (X01, X99) window,
    image rescaled by diam_mean/diam_labels before the net, flows resized
    back, and the mask-time integration count scaled as
    ``niter = 200/rescale``. The network is the native CPnet port
    (mipheivit_tpu.models.cellpose_net) running jitted fixed-shape tile
    batches.
    """
    import cv2

    from mipheivit_tpu.models.cellpose_net import (
        eval_flows,
        load_cellpose_checkpoint,
    )

    if params is None:
        if not ckpt_path:
            raise ValueError("cellpose_jax_flow_factory needs ckpt_path "
                             "or params")
        params = load_cellpose_checkpoint(ckpt_path)
    diam_labels = params.get("diam_labels") or params["diam_mean"]
    rescale = params["diam_mean"] / diam_labels
    niter = int(round(200.0 / max(rescale, 1e-6)))

    def flow_fn(dapi):
        x = dapi.astype(np.float32) / 255.0
        x = (x - x01) / max(x99 - x01, 1e-6)
        h, w = x.shape[:2]
        if rescale != 1.0:
            x = cv2.resize(x, (max(int(round(w * rescale)), 1),
                               max(int(round(h * rescale)), 1)),
                           interpolation=cv2.INTER_LINEAR)
        dp, prob = eval_flows(params, x, tile=tile, batch_size=batch_size)
        if rescale != 1.0:
            dp = np.stack([cv2.resize(dp[c], (w, h),
                                      interpolation=cv2.INTER_LINEAR)
                           for c in range(2)])
            prob = cv2.resize(prob, (w, h),
                              interpolation=cv2.INTER_LINEAR)
        return dp.astype(np.float32), prob.astype(np.float32)

    def compute_masks_fn(dp, cellprob):
        from flow_dynamics import compute_masks

        return compute_masks(dp, cellprob, cellprob_threshold=0.0,
                             n_iter=niter)

    return flow_fn, compute_masks_fn


def cellpose_flow_factory(pretrained_model: str = None,
                          x01: float = 0.0, x99: float = 0.65):
    """CellPose adapter (reference :135-209): ``flow_fn`` runs
    model.eval(compute_masks=False) on the normalized DAPI tile and returns
    (dp, cellprob); ``compute_masks_fn`` follows the averaged flows."""
    from cellpose import dynamics, models  # optional dependency

    if pretrained_model:
        model = models.CellposeModel(pretrained_model=pretrained_model)
    else:
        model = models.Cellpose(model_type="nuclei")

    def normalize99(x):
        lo, hi = np.quantile(x, x01), np.quantile(x, x99)
        return np.clip((x - lo) / max(hi - lo, 1e-6), 0, 1)

    def flow_fn(dapi):
        x = normalize99(dapi.astype(np.float32) / 255.0)[..., None]
        _, flows, _ = model.eval([x], channels=[0, 0],
                                 diameter=getattr(model, "diam_labels", None),
                                 normalize=False, compute_masks=False)
        return np.squeeze(flows[0][1]), np.squeeze(flows[0][2])

    def compute_masks_fn(dp, cellprob):
        masks = dynamics.compute_masks(dp, cellprob,
                                       cellprob_threshold=0.0)[0]
        return masks

    return flow_fn, compute_masks_fn

"""CellPose CPnet forward in JAX + torch-checkpoint importer.

The reference runs the CellPose network on DAPI tiles to produce the
2-channel flow field + cell probability that drive its WSI instance
segmentation (reference: preprocessings/nuclei_segmentation/
nuclei_dapi_wsi_cellpose/cellpose_wsi_inference.py:138-209, via
``models.CellposeModel.eval(compute_masks=False)``). The cellpose package
is an optional dependency here; this module implements the network itself
(CPnet of Stringer et al., Nat Methods 2021 — the public
``cellpose/resnet_torch.py`` architecture) natively so DAPI segmentation
gets real network flows on TPU with zero optional deps.

Architecture (nbase=[2,32,64,128,256], nout=3, sz=3):

* ``downsample`` — 4 residual levels (2 pre-activation residual units per
  level: BN→ReLU→Conv3x3 pairs with a BN→Conv1x1 projection on the first),
  2x2 maxpool between levels.
* ``make_style`` — global average pool of the deepest feature map,
  L2-normalized: one style vector per image.
* ``upsample`` — 4 residual levels mirroring the encoder; the style vector
  is injected per conv through a learned Linear (``batchconvstyle``);
  nearest 2x upsampling between levels; skip connections add (not concat).
* ``output`` — BN→ReLU→Conv1x1 to 3 channels: (flow dY, flow dX, cellprob).

Inference only: BatchNorms are folded to per-channel scale/bias from the
checkpoint's running statistics at import time. Layout is NHWC throughout
(TPU-native); the importer transposes torch OIHW conv kernels to HWIO.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BN_EPS = 1e-5
NBASE = (2, 32, 64, 128, 256)   # cellpose default (nuclei/cyto models)
NOUT = 3


# ---------------------------------------------------------------------------
# forward (pure functions over a params pytree)


def _conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray
            ) -> jnp.ndarray:
    y = lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def _batchconv(p: Dict, x: jnp.ndarray, relu: bool = True) -> jnp.ndarray:
    """Folded BN (scale/bias) [-> ReLU] -> Conv. ``relu=False`` is the
    torch ``batchconv0`` (projection) flavor."""
    x = x * p["scale"] + p["bias"]
    if relu:
        x = jax.nn.relu(x)
    return _conv2d(x, p["kernel"], p["conv_bias"])


def _resdown(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    # torch resdown.forward: x = proj(x) + conv1(conv0(x)); x += conv3(conv2(x))
    y = _batchconv(p["proj"], x, relu=False) + _batchconv(
        p["conv"][1], _batchconv(p["conv"][0], x))
    return y + _batchconv(p["conv"][3], _batchconv(p["conv"][2], y))


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _batchconvstyle(p: Dict, style: jnp.ndarray, x: jnp.ndarray,
                    y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if y is not None:
        x = x + y
    feat = style @ p["full_w"] + p["full_b"]          # [B, C]
    return _batchconv(p["bc"], x + feat[:, None, None, :])


def _resup(p: Dict, x: jnp.ndarray, y: jnp.ndarray, style: jnp.ndarray
           ) -> jnp.ndarray:
    # torch resup.forward: x = proj(x) + conv1(style, conv0(x), y=y);
    #                      x = x + conv3(style, conv2(style, x))
    z = _batchconv(p["proj"], x, relu=False) + _batchconvstyle(
        p["conv1"], style, _batchconv(p["conv0"], x), y=y)
    return z + _batchconvstyle(p["conv3"], style,
                               _batchconvstyle(p["conv2"], style, z))


def _upsample2_nearest(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def cpnet_forward(params: Dict, x: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CPnet forward. ``x``: [B,H,W,Cin] (H, W multiples of 16).
    Returns (y [B,H,W,3], style [B, nbase[-1]])."""
    xd: List[jnp.ndarray] = []
    for n, lvl in enumerate(params["down"]):
        y = _maxpool2(xd[-1]) if n else x
        xd.append(_resdown(lvl, y))

    style = jnp.mean(xd[-1], axis=(1, 2))
    style = style / jnp.sqrt(
        jnp.sum(style ** 2, axis=1, keepdims=True) + 1e-12)

    up = params["up"]
    z = _resup(up[-1], xd[-1], xd[-1], style)
    for n in range(len(up) - 2, -1, -1):
        z = _upsample2_nearest(z)
        z = _resup(up[n], z, xd[n], style)
    out = _batchconv(params["output"], z)
    return out, style


# ---------------------------------------------------------------------------
# importer: cellpose torch state_dict -> params pytree


def _fold_bn(state: Dict[str, np.ndarray], base: str
             ) -> Tuple[np.ndarray, np.ndarray]:
    gamma = np.asarray(state[base + ".weight"], np.float32)
    beta = np.asarray(state[base + ".bias"], np.float32)
    mean = np.asarray(state[base + ".running_mean"], np.float32)
    var = np.asarray(state[base + ".running_var"], np.float32)
    scale = gamma / np.sqrt(var + BN_EPS)
    return scale, beta - mean * scale


def _bc(state: Dict[str, np.ndarray], base: str, conv_idx: int = 2) -> Dict:
    """batchconv (BN at .0, conv at .2) or batchconv0 (conv at .1)."""
    scale, bias = _fold_bn(state, base + ".0")
    w = np.asarray(state[f"{base}.{conv_idx}.weight"], np.float32)
    return {
        "scale": scale, "bias": bias,
        "kernel": np.transpose(w, (2, 3, 1, 0)),       # OIHW -> HWIO
        "conv_bias": np.asarray(state[f"{base}.{conv_idx}.bias"],
                                np.float32),
    }


def _bcs(state: Dict[str, np.ndarray], base: str) -> Dict:
    """batchconvstyle: .conv is a batchconv, .full a Linear."""
    return {
        "bc": _bc(state, base + ".conv"),
        "full_w": np.transpose(
            np.asarray(state[base + ".full.weight"], np.float32)),
        "full_b": np.asarray(state[base + ".full.bias"], np.float32),
    }


def cellpose_params_from_torch(state: Dict[str, np.ndarray]) -> Dict:
    """Map a cellpose CPnet state_dict (``cellpose/resnet_torch.py`` keys,
    as saved in the checkpoints the reference loads at
    cellpose_wsi_inference.py:148) to the pytree ``cpnet_forward`` takes.
    Reads ``diam_mean`` / ``diam_labels`` buffers when present."""
    n_down = len([k for k in state
                  if k.startswith("downsample.down.res_down_")
                  and k.endswith(".proj.0.weight")])
    down = []
    for n in range(n_down):
        base = f"downsample.down.res_down_{n}"
        down.append({
            "proj": _bc(state, base + ".proj", conv_idx=1),
            "conv": [_bc(state, f"{base}.conv.conv_{t}") for t in range(4)],
        })
    up = []
    for n in range(n_down):
        base = f"upsample.up.res_up_{n}"
        up.append({
            "proj": _bc(state, base + ".proj", conv_idx=1),
            "conv0": _bc(state, base + ".conv.conv_0"),
            "conv1": _bcs(state, base + ".conv.conv_1"),
            "conv2": _bcs(state, base + ".conv.conv_2"),
            "conv3": _bcs(state, base + ".conv.conv_3"),
        })
    params = {
        "down": down, "up": up,
        "output": _bc(state, "output"),
        "diam_mean": float(np.asarray(state.get("diam_mean", 30.0)).item())
        if "diam_mean" in state else 30.0,
        "diam_labels": float(np.asarray(state["diam_labels"]).item())
        if "diam_labels" in state else None,
    }
    return params


def load_cellpose_checkpoint(path: str) -> Dict:
    from .import_weights import load_state_dict

    return cellpose_params_from_torch(load_state_dict(path))


# ---------------------------------------------------------------------------
# tiled whole-image evaluation (cellpose models.eval tiling semantics)


def _taper(tile: int, edge: int) -> np.ndarray:
    """Separable cosine taper: weight 1 in the tile interior falling to
    ~0 at the border, so overlap-averaged tiles blend seam-free (cellpose
    averages with a sigmoid taper mask, transforms.average_tiles)."""
    r = np.ones(tile, np.float32)
    ramp = 0.5 - 0.5 * np.cos(np.linspace(0.0, np.pi, edge, dtype=np.float32))
    r[:edge] = np.maximum(ramp, 1e-3)
    r[-edge:] = np.minimum(r[-edge:], np.maximum(ramp[::-1], 1e-3))
    return np.outer(r, r)


def eval_flows(params: Dict, img: np.ndarray, tile: int = 224,
               overlap: int = 48, batch_size: int = 64
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Run CPnet over an arbitrary-size normalized image.

    ``img``: [H,W] or [H,W,1] float32 (already normalize99'd like the
    reference does before model.eval — cellpose_wsi_inference.py:191-200).
    The second network channel (chan2) is zero, matching channels=[0,0].
    Returns (dp [2,H,W] float32 with (dY, dX), cellprob [H,W] float32).

    Tiles of ``tile``x``tile`` with ``overlap`` px are taper-averaged; the
    net runs in fixed-shape jitted batches so XLA compiles once.
    """
    if img.ndim == 3:
        img = img[..., 0]
    h, w = img.shape
    # pad so every pixel is covered by a full tile and dims are /16
    ph = max(tile, int(np.ceil(h / 16.0)) * 16)
    pw = max(tile, int(np.ceil(w / 16.0)) * 16)
    padded = np.zeros((ph, pw), np.float32)
    padded[:h, :w] = img

    stride = tile - overlap
    ys = list(range(0, max(ph - tile, 0) + 1, stride))
    if ys[-1] != ph - tile:
        ys.append(ph - tile)
    xs = list(range(0, max(pw - tile, 0) + 1, stride))
    if xs[-1] != pw - tile:
        xs.append(pw - tile)
    positions = [(y, x) for y in ys for x in xs]

    taper = _taper(tile, max(overlap // 2, 8))
    acc = np.zeros((3, ph, pw), np.float32)
    wacc = np.zeros((ph, pw), np.float32)

    fwd = jax.jit(lambda p, t: cpnet_forward(p, t)[0])
    for i in range(0, len(positions), batch_size):
        chunk = positions[i:i + batch_size]
        batch = np.zeros((batch_size, tile, tile, 2), np.float32)
        for j, (y, x) in enumerate(chunk):
            batch[j, :, :, 0] = padded[y:y + tile, x:x + tile]
        out = np.asarray(fwd(params, jnp.asarray(batch)), np.float32)
        for j, (y, x) in enumerate(chunk):
            acc[:, y:y + tile, x:x + tile] += np.transpose(
                out[j], (2, 0, 1)) * taper
            wacc[y:y + tile, x:x + tile] += taper
    acc /= np.maximum(wacc, 1e-6)
    dp = acc[:2, :h, :w]
    cellprob = acc[2, :h, :w]
    return dp, cellprob

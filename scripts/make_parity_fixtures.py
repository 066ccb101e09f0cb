"""Freeze torch-oracle golden activations for import/compute parity.

VERDICT r3 #7: commit golden fixtures so weight-import + forward parity is
regression-locked without torch at test time, ready for day-one
released-weight comparison (BASELINE.json 0.5% Pearson budget).

The fixture model is the *flagship geometry* at reduced width: patch 14 on
256px tiles (18x18 grid + 1 cls + 4 reg = 329 tokens, the shape-sensitive
part of H-Optimus-0 — reference mipheivit.py:144-151), depth 40, head_dim
64 (the flagship's), swiglu + layerscale, bicubic 14->16 feature regrid,
full detail-capture decoder with 16 heads. Channel widths shrink
(embed 128) so the committed blob stays small and the test stays fast;
every import rule and interpolation grid is exercised at full fidelity.

Weights are NOT stored: the state dict is regenerated deterministically
from per-key numpy Philox streams (``synth_state_dict``), so the test
rebuilds the same torch-layout checkpoint without torch and re-runs the
import + forward against the frozen torch outputs.

Run (requires torch, regenerates tests/fixtures/parity_flagship_geom.npz):
    python scripts/make_parity_fixtures.py
"""

import hashlib
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

FIXTURE_PATH = REPO / "tests/fixtures/parity_flagship_geom.npz"
TAPS = (0, 20, 39)
# jax-vs-torch budgets, asserted at generation time with 2x margin and at
# test time as-is (f32, 40 blocks of accumulation)
TOL = {"tap": 1e-4, "enc": 2e-4, "out": 5e-4}

# UNETR fixture (VERDICT r4 #10): same flagship ViT geometry, but through
# the UNETR pyramid — extract_layers linspace over depth 40, patch-14 ->
# /16 nearest re-grid ahead of the deconv pyramids, 312-bottleneck CellViT
# decoder (embed < 512 branch), 16 attention seg heads. Locks
# unetr_from_torch + UnetrViT against the torch oracle.
UNETR_FIXTURE_PATH = REPO / "tests/fixtures/parity_unetr_geom.npz"
UNETR_TOL = {"out": 5e-4}

# HEMIT-hybrid fixture (VERDICT r4 #10, third family): HybridSwinT at the
# production channel plan (embed 96, cnn 16/32/64, 4 stages) with
# depths (2,2,3,1) and window 4 so stage 0 (grid 8 > win 4) runs a real
# shifted-window block (mask + roll) and deeper stages exercise the
# per-block window clamp. Locks hybrid_swint_from_torch + HybridSwinT
# against an independent timm-semantics torch oracle.
HYBRID_FIXTURE_PATH = REPO / "tests/fixtures/parity_hybrid_geom.npz"
HYBRID_GEOM = dict(out_channels=3, cnn_channels=(16, 32, 64), embed_dim=96,
                   depths=(2, 2, 3, 1), num_heads=(3, 6, 12, 24),
                   window_size=4, patch_size=4)
HYBRID_TOL = {"out": 5e-4}


def fixture_vit_cfg():
    from mipheivit_tpu.models import ViTConfig

    return ViTConfig(
        img_size=(256, 256), patch_size=14, embed_dim=128, depth=40,
        num_heads=2, mlp_hidden_dim=256, mlp_type="swiglu",
        init_values=1e-5, reg_tokens=4, no_embed_class=True,
        attn_impl="xla", remat=False)


def _stream(name: str) -> np.random.Generator:
    seed = int.from_bytes(hashlib.sha256(name.encode()).digest()[:8],
                          "little")
    return np.random.Generator(np.random.Philox(seed))


def synth_value(name: str, shape) -> np.ndarray:
    """Deterministic, path-keyed plausible value for one state-dict entry."""
    rng = _stream(name)
    shape = tuple(int(s) for s in shape)
    if "running_var" in name:
        return rng.uniform(0.5, 1.5, shape).astype(np.float32)
    if "running_mean" in name:
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)
    if name.endswith("gamma"):
        # layerscale: trained-checkpoint magnitude (~0.1), NOT the 1e-5
        # init — at 1e-5 the blocks barely perturb the residual stream and
        # a block-internals import bug would hide under the tolerance
        return (rng.uniform(0.5, 1.5, shape) * 0.1).astype(np.float32)
    if len(shape) == 1 and name.endswith(".weight"):  # LN/BN scale
        return rng.uniform(0.9, 1.1, shape).astype(np.float32)
    if len(shape) == 1:                               # biases
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)
    return (rng.standard_normal(shape) * 0.02).astype(np.float32)


def synth_state_dict(keys_shapes) -> dict:
    return {name: synth_value(name, shape) for name, shape in keys_shapes}


def synth_input() -> np.ndarray:
    return _stream("input").standard_normal((1, 256, 256, 3)).astype(
        np.float32)


def run_jax(keys_shapes):
    """Torch-free side: synth checkpoint -> import -> forward + taps."""
    import jax
    import jax.numpy as jnp

    from mipheivit_tpu.models import MipheiViT, VisionTransformer
    from mipheivit_tpu.models.import_weights import mipheivit_from_torch

    cfg = fixture_vit_cfg()
    state = synth_state_dict(keys_shapes)
    params, batch_stats = mipheivit_from_torch(state, cfg, out_chans=16)
    model = MipheiViT(vit_cfg=cfg, out_chans=16)
    x = jnp.asarray(synth_input())
    out = np.asarray(model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False))
    enc = VisionTransformer(cfg, intermediates=TAPS)
    enc_final, taps = jax.jit(enc.apply)(
        {"params": params["encoder"]["vit"]}, x)
    return (np.asarray(enc_final), [np.asarray(t) for t in taps], out)


def run_jax_unetr(keys_shapes):
    """Torch-free side: synth UNETR checkpoint -> import -> forward."""
    import jax.numpy as jnp

    from mipheivit_tpu.models.import_weights import unetr_from_torch
    from mipheivit_tpu.models.unetr import UnetrViT

    cfg = fixture_vit_cfg()
    state = synth_state_dict(keys_shapes)
    params, batch_stats = unetr_from_torch(state, cfg, out_chans=16)
    model = UnetrViT(vit_cfg=cfg, out_chans=16)
    x = jnp.asarray(synth_input())
    return np.asarray(model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False))


def main_unetr():
    import torch

    from torch_oracle import OracleUnetr, OracleViT

    vit = OracleViT(img_size=256, patch=14, dim=128, depth=40, heads=2,
                    hidden=256, reg_tokens=4, swiglu=True, ls=True,
                    no_embed_class=True)
    oracle = OracleUnetr(vit, img_size=256, patch=14, out_chans=16).eval()

    keys_shapes = [(k, tuple(v.shape))
                   for k, v in oracle.state_dict().items()
                   if v.dtype.is_floating_point]
    state = synth_state_dict(keys_shapes)
    missing, unexpected = oracle.load_state_dict(
        {k: torch.from_numpy(v) for k, v in state.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing

    x = synth_input()
    with torch.no_grad():
        out_t = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out_t = out_t.transpose(0, 2, 3, 1)

    out_j = run_jax_unetr(keys_shapes)
    d = float(np.max(np.abs(out_t - out_j)))
    assert d < UNETR_TOL["out"] / 2, (d, UNETR_TOL)
    print(f"unetr out: torch-vs-jax max|diff| = {d:.2e} "
          f"(budget {UNETR_TOL['out']:.0e})")

    UNETR_FIXTURE_PATH.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        UNETR_FIXTURE_PATH,
        meta=np.str_(json.dumps({
            "keys_shapes": [[k, list(s)] for k, s in keys_shapes],
            "tol": UNETR_TOL, "gen_diff": d})),
        out=out_t)
    print(f"wrote {UNETR_FIXTURE_PATH} "
          f"({UNETR_FIXTURE_PATH.stat().st_size / 1e6:.2f} MB)")


def run_jax_hybrid(keys_shapes):
    """Torch-free side: synth HybridSwinT checkpoint -> import -> forward."""
    import jax.numpy as jnp

    from mipheivit_tpu.models.hemit_hybrid import HybridSwinT
    from mipheivit_tpu.models.import_hemit import hybrid_swint_from_torch

    model = HybridSwinT(**HYBRID_GEOM)
    state = synth_state_dict(keys_shapes)
    params, batch_stats = hybrid_swint_from_torch(state, model, (256, 256))
    x = jnp.asarray(synth_input())
    return np.asarray(model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False))


def main_hybrid():
    import torch

    from torch_oracle import OracleHybridSwinT

    oracle = OracleHybridSwinT(img_size=256, **HYBRID_GEOM).eval()
    keys_shapes = [(k, tuple(v.shape))
                   for k, v in oracle.state_dict().items()
                   if v.dtype.is_floating_point]
    state = synth_state_dict(keys_shapes)
    missing, unexpected = oracle.load_state_dict(
        {k: torch.from_numpy(v) for k, v in state.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing

    x = synth_input()
    with torch.no_grad():
        out_t = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out_t = out_t.transpose(0, 2, 3, 1)

    out_j = run_jax_hybrid(keys_shapes)
    d = float(np.max(np.abs(out_t - out_j)))
    assert d < HYBRID_TOL["out"] / 2, (d, HYBRID_TOL)
    print(f"hybrid out: torch-vs-jax max|diff| = {d:.2e} "
          f"(budget {HYBRID_TOL['out']:.0e})")

    HYBRID_FIXTURE_PATH.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        HYBRID_FIXTURE_PATH,
        meta=np.str_(json.dumps({
            "keys_shapes": [[k, list(s)] for k, s in keys_shapes],
            "tol": HYBRID_TOL, "gen_diff": d})),
        out=out_t)
    print(f"wrote {HYBRID_FIXTURE_PATH} "
          f"({HYBRID_FIXTURE_PATH.stat().st_size / 1e6:.2f} MB)")


def main():
    import torch

    from torch_oracle import OracleDecoder, OracleMiphei, OracleViT

    vit = OracleViT(img_size=256, patch=14, dim=128, depth=40, heads=2,
                    hidden=256, reg_tokens=4, swiglu=True, ls=True,
                    no_embed_class=True)
    dec = OracleDecoder(emb=128, out_chans=16)
    oracle = OracleMiphei(vit, dec, num_prefix=5, grid=18,
                          target_grid=16).eval()

    keys_shapes = [(k, tuple(v.shape))
                   for k, v in oracle.state_dict().items()
                   if v.dtype.is_floating_point]
    state = synth_state_dict(keys_shapes)
    missing, unexpected = oracle.load_state_dict(
        {k: torch.from_numpy(v) for k, v in state.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing

    taps_t = {}

    def _hook(i):
        def fn(mod, inp, out):
            taps_t[i] = out.detach().numpy()
        return fn

    for i in TAPS:
        vit.blocks[i].register_forward_hook(_hook(i))
    enc_t = {}

    def _enc_hook(mod, inp, out):
        enc_t["final"] = out.detach().numpy()

    vit.register_forward_hook(_enc_hook)

    x = synth_input()
    with torch.no_grad():
        out_t = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out_t = out_t.transpose(0, 2, 3, 1)

    enc_j, taps_j, out_j = run_jax(keys_shapes)
    diffs = {}
    for n, (a, b, tol) in {
        **{f"tap{i}": (taps_t[i], taps_j[k], TOL["tap"])
           for k, i in enumerate(TAPS)},
        "enc": (enc_t["final"], enc_j, TOL["enc"]),
        "out": (out_t, out_j, TOL["out"]),
    }.items():
        d = float(np.max(np.abs(a - b)))
        diffs[n] = d
        assert d < tol / 2, (n, d, tol)
        print(f"{n}: torch-vs-jax max|diff| = {d:.2e} (budget {tol:.0e})")

    FIXTURE_PATH.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        FIXTURE_PATH,
        meta=np.str_(json.dumps({
            "keys_shapes": [[k, list(s)] for k, s in keys_shapes],
            "taps": list(TAPS), "tol": TOL, "gen_diffs": diffs})),
        out=out_t, enc=enc_t["final"],
        **{f"tap{i}": taps_t[i] for i in TAPS})
    print(f"wrote {FIXTURE_PATH} "
          f"({FIXTURE_PATH.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["flagship", "unetr", "hybrid"],
                    default=None)
    a = ap.parse_args()
    if a.only in (None, "flagship"):
        main()
    if a.only in (None, "unetr"):
        main_unetr()
    if a.only in (None, "hybrid"):
        main_hybrid()

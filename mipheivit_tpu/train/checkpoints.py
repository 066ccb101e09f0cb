"""Checkpointing: orbax train-state snapshots + reference-format exchange.

Two formats:
  * **orbax** — full TrainState (params, BN stats, both optimizer states,
    spectral-norm state, step) for mid-training resume. The reference has no
    mid-training resume path at all (SURVEY.md §5 checkpoint/resume); this
    is new capability.
  * **safetensors exchange** — the reference's released-checkpoint format:
    generator state dict with reference key names, optionally with the
    frozen foundation encoder stripped so only LoRA + decoder ship
    (reference: scripts/ckpt_remove_foundation_model.py:7-22,
    src/inference.py:135-153). Round-trips with
    ``import_weights.mipheivit_from_torch``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ..models.vit import ViTConfig


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _conv_back(k):
    """flax HWIO -> torch OIHW."""
    return np.ascontiguousarray(np.asarray(k).transpose(3, 2, 0, 1))


def vit_state_dict(params: Dict, cfg: ViTConfig, prefix: str = "",
                   wrap_qkv_lora: bool = False,
                   include_frozen: bool = True) -> Dict[str, np.ndarray]:
    """Reverse of ``import_weights.vit_params_from_torch``."""
    out: Dict[str, np.ndarray] = {}

    def put(key, val):
        out[prefix + key] = np.asarray(val)

    if include_frozen:
        put("patch_embed.proj.weight", _conv_back(params["patch_embed"]["kernel"]))
        put("patch_embed.proj.bias", params["patch_embed"]["bias"])
        if cfg.class_token:
            put("cls_token", params["cls_token"])
        if cfg.reg_tokens:
            put("reg_token", params["reg_token"])
        put("pos_embed", params["pos_embed"])
        put("norm.weight", params["norm"]["scale"])
        put("norm.bias", params["norm"]["bias"])

    qkv_name = "attn.qkv.qkv" if wrap_qkv_lora else "attn.qkv"
    for i in range(cfg.depth):
        if cfg.scan_blocks:
            layer = {k: np.asarray(v)[i] if not isinstance(v, dict) else
                     {kk: np.asarray(vv)[i] if not isinstance(vv, dict) else
                      {k3: np.asarray(v3)[i] for k3, v3 in vv.items()}
                      for kk, vv in v.items()}
                     for k, v in params["blocks"].items()}
        else:
            layer = params[f"blocks_{i}"]
        base = f"blocks.{i}."
        if include_frozen:
            put(base + "norm1.weight", layer["norm1"]["scale"])
            put(base + "norm1.bias", layer["norm1"]["bias"])
            put(base + "norm2.weight", layer["norm2"]["scale"])
            put(base + "norm2.bias", layer["norm2"]["bias"])
            put(base + f"{qkv_name}.weight", _t(layer["attn"]["qkv"]["kernel"]))
            put(base + f"{qkv_name}.bias", layer["attn"]["qkv"]["bias"])
            put(base + "attn.proj.weight", _t(layer["attn"]["proj"]["kernel"]))
            put(base + "attn.proj.bias", layer["attn"]["proj"]["bias"])
            put(base + "mlp.fc1.weight", _t(layer["mlp"]["fc1"]["kernel"]))
            put(base + "mlp.fc1.bias", layer["mlp"]["fc1"]["bias"])
            put(base + "mlp.fc2.weight", _t(layer["mlp"]["fc2"]["kernel"]))
            put(base + "mlp.fc2.bias", layer["mlp"]["fc2"]["bias"])
            if cfg.init_values is not None:
                put(base + "ls1.gamma", layer["ls1"])
                put(base + "ls2.gamma", layer["ls2"])
        if cfg.lora_rank > 0 and "lora_q" in layer["attn"]:
            for lq in ("lora_q", "lora_v"):
                put(base + f"attn.qkv.{lq}.A", layer["attn"][lq]["A"])
                put(base + f"attn.qkv.{lq}.B", layer["attn"][lq]["B"])
    return out


def decoder_state_dict(params: Dict, batch_stats: Dict, out_chans: int,
                       prefix: str = "decoder.") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def put_conv(key, p, bias=True):
        out[key + ".weight"] = _conv_back(p["kernel"])
        if bias:
            out[key + ".bias"] = np.asarray(p["bias"])

    def put_bn(key, p, s):
        out[key + ".weight"] = np.asarray(p["scale"])
        out[key + ".bias"] = np.asarray(p["bias"])
        out[key + ".running_mean"] = np.asarray(s["mean"])
        out[key + ".running_var"] = np.asarray(s["var"])
        out[key + ".num_batches_tracked"] = np.asarray(0, np.int64)

    for i in range(3):
        p = params["convstream"][f"convs_{i}"]
        s = batch_stats["convstream"][f"convs_{i}"]
        put_conv(f"{prefix}convstream.convs.{i}.conv", p["conv"], bias=False)
        put_bn(f"{prefix}convstream.convs.{i}.bn", p["bn"], s["bn"])
    for i in range(4):
        p = params[f"fusion_blks_{i}"]["conv"]
        s = batch_stats[f"fusion_blks_{i}"]["conv"]
        put_conv(f"{prefix}fusion_blks.{i}.conv.conv", p["conv"], bias=False)
        put_bn(f"{prefix}fusion_blks.{i}.conv.bn", p["bn"], s["bn"])
    for k in range(out_chans):
        p = params[f"segmentation_head_{k}"]
        s = batch_stats[f"segmentation_head_{k}"]
        base = f"{prefix}segmentation_head_{k}"
        put_conv(f"{base}.0.psi.0", p["attention"]["psi_conv1"])
        put_bn(f"{base}.0.psi.1", p["attention"]["psi_bn"],
               s["attention"]["psi_bn"])
        put_conv(f"{base}.0.psi.3", p["attention"]["psi_conv2"])
        put_conv(f"{base}.1", p["conv"])
    return out


def mipheivit_state_dict(params: Dict, batch_stats: Dict, cfg: ViTConfig,
                         out_chans: int,
                         strip_foundation: bool = False) -> Dict[str, np.ndarray]:
    """Full generator in reference key layout (encoder.vit.* + decoder.*)."""
    wrap = cfg.lora_rank > 0
    out = vit_state_dict(params["encoder"]["vit"], cfg, "encoder.vit.",
                         wrap_qkv_lora=wrap,
                         include_frozen=not strip_foundation)
    out.update(decoder_state_dict(params["decoder"],
                                  batch_stats.get("decoder", {}), out_chans))
    return out


def save_safetensors(state_dict: Dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in state_dict.items()},
              str(path))


# ---------------------------------------------------------------------------
# orbax full-state snapshots


def fetch_local(tree):
    """np copy of every leaf via its locally-addressable replica.

    ``np.asarray`` raises on multi-host global arrays (they are not fully
    addressable from one process); for the *replicated* state this trainer
    keeps, each host's first addressable shard IS the full value. A leaf
    whose local shard does not cover the global shape (genuinely sharded)
    raises instead of silently exporting one shard."""
    import jax

    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            local = x.addressable_data(0)
            if local.shape != x.shape:
                raise ValueError(
                    f"fetch_local: leaf is sharded across hosts "
                    f"(local {local.shape} != global {x.shape}); gather it "
                    "before export")
            return np.asarray(local)
        return np.asarray(x)

    return jax.tree.map(get, tree)


def save_train_state(state, ckpt_dir: str, step: Optional[int] = None,
                     keep_last: int = 2) -> str:
    """Orbax full-state snapshot. MUST be called from EVERY process on a
    multi-host runtime: orbax synchronizes processes internally (a
    main-only call deadlocks the caller at the barrier), and it wants the
    live global jax.Arrays so it can write per-process shards itself. On
    a single process the tree is np-ified first (cheap, avoids holding
    device buffers during the write).

    ``keep_last``: snapshots embed the frozen 1.1B encoder (~4.5 GB at
    flagship scale), so older ``state_*`` dirs beyond the newest
    ``keep_last`` are pruned after a successful save (main process only;
    orbax's internal barrier guarantees all hosts finished writing).
    Pass 0 to keep everything."""
    import jax
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute()
    path.mkdir(parents=True, exist_ok=True)
    step = int(state.step) if step is None else step
    target = path / f"state_{step}"
    tree = state if jax.process_count() > 1 else fetch_local(state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(target, tree, force=True)
    if keep_last and jax.process_index() == 0:
        import shutil

        snaps = sorted((p for p in path.glob("state_*") if p.is_dir()),
                       key=lambda p: int(p.name.split("_")[-1]))
        for old in snaps[:-keep_last]:
            shutil.rmtree(old, ignore_errors=True)
    return str(target)


def restore_train_state(ckpt_path: str, abstract_state):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(ckpt_path).absolute(), abstract_state)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    path = Path(ckpt_dir)
    if not path.exists():
        return None
    steps = []
    for child in path.iterdir():
        if child.name.startswith("state_"):
            try:
                steps.append((int(child.name.split("_")[1]), child))
            except ValueError:
                pass
    if not steps:
        return None
    return str(max(steps)[1])


def flax_state_dict(params: Dict, batch_stats: Optional[Dict] = None
                    ) -> Dict[str, np.ndarray]:
    """Flatten a flax variable tree to dotted-key numpy arrays — the
    generator-export format for models without a reference torch layout
    (reference exports every generator, src/callbacks.py:121-149; MIPHEI
    keeps its reference-layout export via mipheivit_state_dict)."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = ".".join(str(getattr(k, "key", k)) for k in path)
        flat[f"params.{key}"] = np.asarray(leaf)
    if batch_stats:
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                batch_stats)[0]:
            key = ".".join(str(getattr(k, "key", k)) for k in path)
            flat[f"batch_stats.{key}"] = np.asarray(leaf)
    return flat


def load_flax_state_dict(state_dict: Dict[str, np.ndarray]
                         ) -> Tuple[Dict, Dict]:
    """Inverse of flax_state_dict: dotted keys -> (params, batch_stats)."""
    params: Dict = {}
    stats: Dict = {}
    for key, value in state_dict.items():
        coll, _, rest = key.partition(".")
        tree = params if coll == "params" else stats
        parts = rest.split(".")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(value)
    return params, stats

"""Ablation profiler for the flagship forward pass on the real chip.

The tunneled single-chip setup can't export device traces, so the per-op
breakdown is established by ablation: run the encoder with pieces swapped
for cheaper stand-ins and attribute the deltas. Timing uses the same
on-device lax.scan + two-point slope fit as bench.py (dispatch latency and
the tunnel's result cache cancel out).

Usage: python scripts/profile_fwd.py VARIANT [BATCH]
Variants:
  full         whole generator (encoder+decoder, fused heads)
  encoder      ViT-g encoder only
  enc_flash    encoder with the Pallas flash kernel forced
  enc_noattn   encoder with softmax(QK^T)V replaced by identity(v)
               (isolates the attention chain incl. logits/softmax traffic)
  enc_unroll4  encoder with nn.scan unroll=4
  enc_noremat  encoder with remat disabled
  decoder      decoder only (encoder output faked)
"""

import sys
import time

import numpy as np


def slope_time(fn, params, x, sizes=(2, 6)):
    import jax
    import jax.numpy as jnp

    times = []
    for n in sizes:
        @jax.jit
        def loop(p, x, seed, n=n):
            def body(c, i):
                out = fn(p, x + (seed + i.astype(jnp.float32)) * 1e-6)
                return c + out.mean().astype(jnp.float32), None
            return jax.lax.scan(body, 0.0, jnp.arange(n))[0]

        float(loop(params, x, 0.0))
        t0 = time.time()
        float(loop(params, x, float(np.random.default_rng().integers(1, 1 << 20))))
        times.append(time.time() - t0)
    return (times[1] - times[0]) / (sizes[1] - sizes[0])


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax
    import jax.numpy as jnp

    from mipheivit_tpu.config import compose
    from mipheivit_tpu.models import get_generator
    from mipheivit_tpu.models import vit as vit_mod

    if variant == "enc_noattn":
        # vit.py consumes attention_qkv / attention_bshd (fused-qkv layout)
        def fake_attn_qkv(qkv, num_heads, *, impl="auto"):
            hd = qkv.shape[-1] // 3
            return qkv[..., 2 * hd:]

        def fake_attn_bshd(q, k, v, num_heads, *, impl="auto"):
            return v
        vit_mod.attention_qkv = fake_attn_qkv
        vit_mod.attention_bshd = fake_attn_bshd

    cfg = compose(["+default_configs=miphei-vit"])
    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    model = get_generator("myvitmatte", 256, 3, 16, cfg, dtype=dtype)

    vcfg = model.vit_cfg
    if variant == "enc_flash":
        vcfg = vcfg.replace(attn_impl="flash")
    if variant == "enc_noremat":
        vcfg = vcfg.replace(remat=False)

    if variant.startswith("enc") or variant == "encoder":
        enc_kw = {}
        if variant == "enc_unroll4":
            # thread unroll through a config clone; nn.scan unroll
            vcfg = vcfg.replace(scan_unroll=4) if hasattr(vcfg, "scan_unroll") else vcfg
        enc = vit_mod.VisionTransformer(vcfg, **enc_kw)
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3))
        params = jax.jit(lambda k: enc.init(k, x[:1]))(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        per = slope_time(lambda p, xx: enc.apply(p, xx), params, x)
    elif variant == "decoder":
        # decoder only: drive DetailCapture directly with the full model's
        # decoder params and a fixed fake encoder feature map
        from mipheivit_tpu.infer.loading import to_fast_heads
        from mipheivit_tpu.models.mipheivit import DetailCapture

        params_full = jax.jit(
            lambda k: model.init(k, jnp.zeros((1, 256, 256, 3)), train=False)
        )(jax.random.PRNGKey(0))
        model2, params2 = to_fast_heads(model, params_full)
        dc = DetailCapture(16, fast_heads=True)
        dvars = {"params": params2["params"]["decoder"],
                 "batch_stats": params2["batch_stats"]["decoder"]}
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3))
        cd = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        feats = jax.random.normal(
            jax.random.PRNGKey(2), (batch, 16, 16, model2.vit_cfg.embed_dim),
            cd)
        per = slope_time(
            lambda p, xx: dc.apply(p, feats, xx.astype(cd), train=False),
            dvars, x)
    else:
        from mipheivit_tpu.infer.loading import to_fast_heads
        params = jax.jit(
            lambda k: model.init(k, jnp.zeros((1, 256, 256, 3)), train=False)
        )(jax.random.PRNGKey(0))
        model, params = to_fast_heads(model, params)
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3))
        per = slope_time(lambda p, xx: model.apply(p, xx, train=False),
                         params, x)

    print(f"{variant} B={batch}: {per * 1e3:.1f} ms/batch  "
          f"{batch / per:.1f} tiles/s")


if __name__ == "__main__":
    main()

"""Round-3 train-step speed-of-light: decompose the 1080 ms GAN step.

The r2 verdict: the flagship GAN step (ViT-g + LoRA + PatchGAN, B=16)
measured 1080 ms with no breakdown — unknown how much goes to encoder
recompute under remat, the double discriminator pass, or spectral-norm
power iteration. This script times, by ablation on the real
``make_train_step`` (train/steps.py), each of:

  fwd            generator forward only (inference mode)      — the floor
  gen_step       generator fwd+bwd+Adam, gan_train=False
  gan_step       full production GAN step (= BASELINE.md 1080 ms)
  gan-gen        -> adversarial surcharge: disc fwd in gen loss + full
                    disc update (incl. spectral-norm power iteration)
  remat ablation gen_step with remat on vs off at reduced batch — the
                    price of recomputing 40 ViT-g blocks in the backward

Timing: on-device lax.scan threading TrainState through the carry, body
perturbed by the loop index (tunnel-dispatch latency cancels in the
two-point slope; see bench.py). Envelope matches the reference trainer:
B=16, bf16 compute, frozen encoder partition (configs/config.yaml:17-23).

Usage: python scripts/profile_train_r3.py   (solo on the tunneled chip)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_timer(train_step, state, batch, metrics_zero):
    import jax
    import jax.numpy as jnp

    def timeit(sizes=(2, 6), reps=2):
        loops = {}
        for n in sizes:
            @jax.jit
            def loop(state, batch, seed, n=n):
                def body(carry, i):
                    st, mt = carry
                    b = dict(batch)
                    b["image"] = b["image"] + (
                        seed + i.astype(jnp.float32)) * 1e-6
                    st, mt, lg = train_step(st, b, mt)
                    return (st, mt), lg["gen_loss_sim"]
                (st, mt), losses = jax.lax.scan(
                    body, (state, metrics_zero), jnp.arange(n))
                return st.step, losses[-1]
            out = loop(state, batch, 0.0)
            jax.block_until_ready(out)     # compile
            loops[n] = loop
        best = float("inf")
        for _ in range(reps):
            times = []
            for n in sizes:
                seed = float(np.random.default_rng().integers(1, 1 << 20))
                t0 = time.time()
                jax.block_until_ready(loops[n](state, batch, seed))
                times.append(time.time() - t0)
            best = min(best, (times[1] - times[0]) / (sizes[1] - sizes[0]))
        return best
    return timeit


def build(batch_size, remat=True, dtype="bfloat16"):
    import jax
    from mipheivit_tpu.config import compose
    from mipheivit_tpu.models import get_generator
    from mipheivit_tpu.models.discriminator import DiscriminatorPatch
    from mipheivit_tpu.train.losses import weighted_mse_loss
    from mipheivit_tpu.train.optim import (
        build_discriminator_optimizer, build_generator_optimizer)
    from mipheivit_tpu.train.steps import create_train_state

    cfg = compose(["+default_configs=miphei-vit"])
    model = get_generator("myvitmatte", 256, 3, 16, cfg, dtype=dtype)
    if not remat:
        model = model.clone(vit_cfg=model.vit_cfg.replace(remat=False))
    disc = DiscriminatorPatch(norm_layer_type=None)
    loss_fn = weighted_mse_loss(50.0, np.ones(16, np.float32))
    gen_opt = build_generator_optimizer("myvitmatte", 2e-4 * 4, 1000)
    disc_opt = build_discriminator_optimizer(2e-4 * 4, 1000)

    rng = np.random.default_rng(0)
    batch = {
        "image": jax.numpy.asarray(
            rng.standard_normal((batch_size, 256, 256, 3)), "float32"),
        "target": jax.numpy.asarray(
            rng.uniform(-0.9, 0.9, (batch_size, 256, 256, 16)), "float32"),
    }
    state = create_train_state(
        jax.random.PRNGKey(0), model, gen_opt, disc, disc_opt,
        sample_batch={k: np.asarray(v) for k, v in batch.items()},
        freeze_model_name="myvitmatte", frozen_dtype=dtype)
    return model, disc, loss_fn, gen_opt, disc_opt, state, batch


def main():
    import jax
    from mipheivit_tpu.metrics import PixelMetrics
    from mipheivit_tpu.train.steps import StepConfig, make_train_step

    b = 16
    print(f"backend={jax.default_backend()}  B={b}", flush=True)
    model, disc, loss_fn, gen_opt, disc_opt, state, batch = build(b)
    metrics0 = PixelMetrics.zeros()

    def report(name, t):
        print(f"{name:28s} {t*1e3:8.1f} ms/step   "
              f"{b/t:6.1f} tiles/s", flush=True)

    # 1) full production GAN step
    gan_step = jax.jit(make_train_step(
        model, loss_fn, gen_opt, disc, disc_opt,
        StepConfig(gan_train=True, freeze_model_name="myvitmatte")))
    t_gan = make_timer(gan_step, state, batch, metrics0)()
    report("gan_step (production)", t_gan)

    # 2) generator-only step
    gen_step = jax.jit(make_train_step(
        model, loss_fn, gen_opt, None, None,
        StepConfig(gan_train=False, freeze_model_name="myvitmatte")))
    t_gen = make_timer(gen_step, state, batch, metrics0)()
    report("gen_step (no gan)", t_gen)
    report("-> adversarial surcharge", t_gan - t_gen)

    # 3) forward floor (inference apply, same params)
    import jax.numpy as jnp
    variables = {"params": state.gen_params,
                 "batch_stats": state.gen_batch_stats}

    times = []
    for n in (2, 6):
        @jax.jit
        def loop(v, x, seed, n=n):
            def body(c, i):
                out = model.apply(
                    v, x + (seed + i.astype(jnp.float32)) * 1e-6, train=False)
                return c + out.mean(), None
            return jax.lax.scan(body, 0.0, jnp.arange(n))[0]
        float(loop(variables, batch["image"], 0.0))
        t0 = time.time()
        float(loop(variables, batch["image"], 1.0))
        times.append(time.time() - t0)
    t_fwd = (times[1] - times[0]) / 4
    report("fwd only (train=False)", t_fwd)
    report("-> bwd+opt surcharge", t_gen - t_fwd)

    # 4) remat ablation at reduced batch (remat-off at B=16 may not fit)
    for remat in (True, False):
        try:
            bb = 8
            (model2, _, loss2, gopt2, _, state2, batch2) = build(bb, remat=remat)
            step2 = jax.jit(make_train_step(
                model2, loss2, gopt2, None, None,
                StepConfig(gan_train=False, freeze_model_name="myvitmatte")))
            t2 = make_timer(step2, state2, batch2, metrics0)()
            print(f"gen_step B={bb} remat={remat!s:5s} {t2*1e3:8.1f} ms/step"
                  f"   {bb/t2:6.1f} tiles/s", flush=True)
        except Exception as e:
            print(f"remat={remat} B=8: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()

"""Round-3b: selective-remat (dots_saveable) train step vs full remat.

The r3 SoL table (profile_train_r3.py): gen_step 465.8 ms @ B=16 = forward
141.9 + bwd/opt 323.9, with remat=False failing to even compile at B=8 —
the full-block recompute is mandatory for fitting but costs roughly one
extra forward of the matmul path (~30% of the step). ``remat_policy=
"dots"`` keeps every dot_general output (~7 GB bf16 at B=16) so the
backward re-runs only the elementwise chain.

Usage: python scripts/profile_train_r3b.py   (solo on the tunneled chip)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    from mipheivit_tpu.metrics import PixelMetrics
    from mipheivit_tpu.train.steps import StepConfig, make_train_step
    from scripts.profile_train_r3 import build, make_timer

    import ast

    cases = ast.literal_eval(sys.argv[1]) if len(sys.argv) > 1 else \
        [("full", 16), ("dots", 16)]
    print(f"backend={jax.default_backend()}", flush=True)
    metrics0 = PixelMetrics.zeros()

    for policy, b in cases:
        try:
            model, disc, loss_fn, gen_opt, disc_opt, state, batch = build(b)
            if policy != "full":
                model = model.clone(vit_cfg=model.vit_cfg.replace(
                    remat_policy=policy))
            step = jax.jit(make_train_step(
                model, loss_fn, gen_opt, disc, disc_opt,
                StepConfig(gan_train=True, freeze_model_name="myvitmatte")))
            t = make_timer(step, state, batch, metrics0)()
            print(f"gan_step remat_policy={policy:5s} B={b:3d} "
                  f"{t*1e3:8.1f} ms/step   {b/t:6.1f} tiles/s", flush=True)
        except Exception as e:
            print(f"remat_policy={policy}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()

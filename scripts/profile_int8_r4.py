"""Diagnose the round-4 int8 serving regression (39.0 vs 180.8 tiles/s).

bench.py --int8 measured the W8A8 forward 4.6x SLOWER than bf16 on the
v5e chip (logs/chip_r4/bench_int8.log), the opposite of the 2x-MXU
expectation. This isolates the loss at encoder matmul shapes:

  1. bf16 dot                      — the production baseline rate
  2. s8 x s8 -> s32 dot alone      — is XLA's int8 lowering MXU-native?
  3. (2) + f32 dequant epilogue    — does the [M,N] f32 scale-mult pay?
  4. full ops.quant.int8_matmul    — adds dynamic per-row activation quant
  5. int8 weights, bf16 activations (weight-only W8A16 dequant-then-dot)

If (2) is already ~2x slower than (1), the toolchain's int8 dot is not
riding the MXU's 394 TOPS path and W8A8 serving is a documented negative
on this stack; if (2) is fast but (4) is slow, the dynamic quant chain is
the problem and a fused Pallas quant or static activation scales are the
fix. Run solo on the tunneled chip.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, reps=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)          # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from mipheivit_tpu.ops.quant import int8_matmul, quantize_weight

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    # flagship encoder shapes at B=96 serving: M = 96 tiles x 329 tokens
    # (padded 336 in-kernel, but the Dense matmuls see 329); qkv/proj/fc1
    # packed/fc2 contractions from models/vit.py.
    m = 96 * 329
    for k, n, tag in [(1536, 4608, "qkv"), (1536, 1536, "proj"),
                      (1536, 8192, "fc1x2"), (4096, 1536, "fc2")]:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
        w_i8, w_scale = quantize_weight(w)
        w_bf, w_i8, w_scale = (jnp.asarray(w, jnp.bfloat16),
                               jnp.asarray(w_i8), jnp.asarray(w_scale))
        x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32)), -127,
                        127).astype(jnp.int8)
        gflop = 2 * m * k * n / 1e9

        bf16 = jax.jit(lambda a, b: a @ b)
        t = timeit(bf16, x, w_bf)
        print(f"[{tag}] bf16 dot            {t*1e3:7.2f} ms "
              f"{gflop/t/1e3:6.1f} TF/s", flush=True)

        i8dot = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        t = timeit(i8dot, x_i8, w_i8)
        print(f"[{tag}] s8s8->s32 dot       {t*1e3:7.2f} ms "
              f"{gflop/t/1e3:6.1f} TOP/s", flush=True)

        i8deq = jax.jit(lambda a, b, s: (jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
            * s[None, :]).astype(jnp.bfloat16))
        t = timeit(i8deq, x_i8, w_i8, w_scale)
        print(f"[{tag}] s8 dot + dequant    {t*1e3:7.2f} ms "
              f"{gflop/t/1e3:6.1f} TOP/s", flush=True)

        full = jax.jit(lambda a, b, s: int8_matmul(a, b, s))
        t = timeit(full, x, w_i8, w_scale)
        print(f"[{tag}] int8_matmul (W8A8)  {t*1e3:7.2f} ms "
              f"{gflop/t/1e3:6.1f} TOP/s", flush=True)

        w8a16 = jax.jit(lambda a, b, s: a @ (
            b.astype(jnp.bfloat16) * s[None, :].astype(jnp.bfloat16)))
        t = timeit(w8a16, x, w_i8, w_scale)
        print(f"[{tag}] W8A16 dequant-dot   {t*1e3:7.2f} ms "
              f"{gflop/t/1e3:6.1f} TF/s", flush=True)

    # where does the int8 dot actually lower? (text HLO spot check)
    lowered = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)).lower(
        jax.ShapeDtypeStruct((m, 1536), jnp.int8),
        jax.ShapeDtypeStruct((1536, 4608), jnp.int8))
    txt = lowered.compile().as_text()
    kws = [ln.strip()[:120] for ln in txt.splitlines()
           if "convert" in ln or "dot" in ln]
    print("\ncompiled int8 dot HLO (dot/convert lines, first 12):")
    for ln in kws[:12]:
        print(" ", ln, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()

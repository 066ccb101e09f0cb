"""Round-3 attention-kernel sweep at the ViT-g flagship shape.

The r2 verdict: the BSHD kernel runs at ~34 TF/s ([336,64,336] matmuls,
hpb=12 chosen by a VMEM budget that predates the 64 MB scoped-VMEM raise).
This sweep re-measures heads_per_block under the raised cap and tries
alternative kernel bodies:
  * hpb in {4, 6, 8, 12, 24} with vmem_limit_bytes=64MB
  * batched dot_general over the head axis (one [hpb,S,S] batched matmul
    instead of a Python loop of [S,S] matmuls)
  * direct per-head output stores (no final concatenate)
Usage: python scripts/profile_attn_r3.py  (solo on the tunneled chip)
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mipheivit_tpu.ops import attention as A

    b, h, s, d = 64, 24, 329, 64
    hd = h * d
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (b, s, hd), jnp.bfloat16)
               for kk in jax.random.split(key, 3))

    def slope(fn, sizes=(4, 16)):
        times = []
        for n in sizes:
            @jax.jit
            def loop(q, k, v, seed, n=n):
                def body(c, i):
                    out = fn(q + (seed + i.astype(jnp.bfloat16)) * 1e-3, k, v)
                    return c + out.mean().astype(jnp.float32), None
                return jax.lax.scan(body, 0.0, jnp.arange(n))[0]
            float(loop(q, k, v, 0.0))
            t0 = time.time()
            float(loop(q, k, v,
                       float(np.random.default_rng().integers(1, 1 << 20))))
            times.append(time.time() - t0)
        return (times[1] - times[0]) / (sizes[1] - sizes[0])

    flop = 2 * 2 * b * h * s * s * d  # score + pv matmuls

    def report(name, t):
        print(f"{name:34s} {t*1e3:8.3f} ms   {flop/t/1e12:6.1f} TF/s",
              flush=True)

    # --- current production path -------------------------------------------
    report("prod attention_bshd (auto)",
           slope(lambda q, k, v: A.attention_bshd(q, k, v, h)))

    # --- looped kernel, hpb sweep under 64 MB cap ---------------------------
    def looped_kernel(q_ref, k_ref, v_ref, o_ref, *, head_dim, hpb,
                      store_direct):
        scale = float(np.log2(np.e) / np.sqrt(head_dim))
        outs = []
        for g in range(hpb):
            sl = slice(g * head_dim, (g + 1) * head_dim)
            qq = q_ref[0][:, sl]
            kk = k_ref[0][:, sl]
            logits = jax.lax.dot_general(
                qq, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp2(logits - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0][:, sl],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            if store_direct:
                o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)
            else:
                outs.append(acc / l)
        if not store_direct:
            o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)

    def run(kernel_body, hpb, **kw):
        kern = functools.partial(kernel_body, head_dim=d, hpb=hpb, **kw)

        def f(q, k, v):
            return pl.pallas_call(
                kern,
                grid=(b, h // hpb),
                in_specs=[pl.BlockSpec((1, s, hpb * d), lambda i, j: (i, 0, j))] * 3,
                out_specs=pl.BlockSpec((1, s, hpb * d), lambda i, j: (i, 0, j)),
                out_shape=jax.ShapeDtypeStruct((b, s, hd), q.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                    vmem_limit_bytes=64 * 1024 * 1024,
                ),
            )(q, k, v)
        return f

    ref_out = np.asarray(
        A._attn_reference(
            *(t.reshape(b, s, h, d).transpose(0, 2, 1, 3) for t in (q, k, v)),
            s,
        ).transpose(0, 2, 1, 3).reshape(b, s, hd), dtype=np.float32)

    def check(f):
        got = np.asarray(f(q, k, v), dtype=np.float32)
        err = np.max(np.abs(got - ref_out))
        return f"maxerr={err:.4f}"

    for hpb in (4, 6, 8, 12, 24):
        try:
            f = run(looped_kernel, hpb, store_direct=False)
            t = slope(f)
            report(f"looped hpb={hpb}", t)
        except Exception as e:
            print(f"looped hpb={hpb}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    for hpb in (8, 12, 24):
        try:
            f = run(looped_kernel, hpb, store_direct=True)
            t = slope(f)
            report(f"looped-direct hpb={hpb}", t)
        except Exception as e:
            print(f"looped-direct hpb={hpb}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # --- batched dot_general over the head axis -----------------------------
    def batched_kernel(q_ref, k_ref, v_ref, o_ref, *, head_dim, hpb):
        scale = float(np.log2(np.e) / np.sqrt(head_dim))
        ss = q_ref.shape[1]
        qq = q_ref[0].reshape(ss, hpb, head_dim)
        kk = k_ref[0].reshape(ss, hpb, head_dim)
        vv = v_ref[0].reshape(ss, hpb, head_dim)
        # [S,hpb,D] x [S,hpb,D] batched over hpb, contracting D -> [hpb,S,S]
        logits = jax.lax.dot_general(
            qq, kk, (((2,), (2,)), ((1,), (1,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp2(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # [hpb,S,S] x [S,hpb,D] batched over hpb, contracting S -> [hpb,S,D]
        acc = jax.lax.dot_general(
            p.astype(vv.dtype), vv, (((2,), (0,)), ((0,), (1,))),
            preferred_element_type=jnp.float32)
        out = (acc / l).transpose(1, 0, 2).reshape(ss, hpb * head_dim)
        o_ref[0] = out.astype(o_ref.dtype)

    for hpb in (4, 8, 12):
        try:
            f = run(batched_kernel, hpb)
            t = slope(f)
            print(f"  ({check(f)})", flush=True)
            report(f"batched hpb={hpb}", t)
        except Exception as e:
            print(f"batched hpb={hpb}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

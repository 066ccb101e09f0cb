"""Round-3 focused attention sweep at the ViT-g flagship shape (low noise).

The r3a broad sweep (profile_attn_r3.py) showed the 64 MB scoped-VMEM raise
already brought the production BSHD kernel from 1.27 to ~0.85 ms/block, with
looped hpb=24 and direct-store hpb=12 statistically tied (~0.83-0.85 ms) at
sizes=(4,16) slope noise. This run uses longer loops + repeats to separate
them, and adds batch-packed variants (bpb batch items per program) that
raise the score-matmul M dimension from 336 to bpb*336 so the k operand is
MXU-stationary over more rows — the kernel's measured 50 TF/s is ~half the
d=64 contraction ceiling (~95 TF/s).

Usage: python scripts/profile_attn_r3b.py   (solo on the tunneled chip)
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


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

    def slope(fn, sizes=(8, 40), reps=2):
        best = float("inf")
        loops = {}
        for n in sizes:
            @jax.jit
            def loop(q, k, v, seed, n=n):
                def body(c, i):
                    out = fn(q + (seed + i.astype(jnp.bfloat16)) * 1e-3, k, v)
                    return c + out.mean().astype(jnp.float32), None
                return jax.lax.scan(body, 0.0, jnp.arange(n))[0]
            float(loop(q, k, v, 0.0))  # compile
            loops[n] = loop
        for _ in range(reps):
            times = []
            for n in sizes:
                seed = float(np.random.default_rng().integers(1, 1 << 20))
                t0 = time.time()
                float(loops[n](q, k, v, seed))
                times.append(time.time() - t0)
            best = min(best, (times[1] - times[0]) / (sizes[1] - sizes[0]))
        return best

    flop = 2 * 2 * b * h * s * s * d

    def report(name, t):
        print(f"{name:34s} {t*1e3:8.3f} ms   {flop/t/1e12:6.1f} TF/s",
              flush=True)

    ref_out = None

    def check(f):
        nonlocal ref_out
        if ref_out is None:
            ref_out = np.asarray(
                A._attn_reference(
                    *(t.reshape(b, s, h, d).transpose(0, 2, 1, 3)
                      for t in (q, k, v)), s,
                ).transpose(0, 2, 1, 3).reshape(b, s, hd), dtype=np.float32)
        got = np.asarray(f(q, k, v), dtype=np.float32)
        return float(np.max(np.abs(got - ref_out)))

    def looped_kernel(q_ref, k_ref, v_ref, o_ref, *, head_dim, hpb, bpb):
        scale = float(np.log2(np.e) / np.sqrt(head_dim))
        for bi in range(bpb):
            for g in range(hpb):
                sl = slice(g * head_dim, (g + 1) * head_dim)
                qq = q_ref[bi][:, sl]
                kk = k_ref[bi][:, sl]
                logits = jax.lax.dot_general(
                    qq, kk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                m = jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp2(logits - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                acc = jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_ref[bi][:, sl],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_ref[bi, :, sl] = (acc / l).astype(o_ref.dtype)

    def batchpack_kernel(q_ref, k_ref, v_ref, o_ref, *, head_dim, hpb, bpb):
        """Stack bpb batch items' rows for one head into a [bpb*S, D] q so
        the score matmul runs [bpb*S, D] x [D, S] per (head, batch-item):
        k stays MXU-stationary over bpb*S rows."""
        scale = float(np.log2(np.e) / np.sqrt(head_dim))
        ss = q_ref.shape[1]
        for g in range(hpb):
            sl = slice(g * head_dim, (g + 1) * head_dim)
            qq = jnp.concatenate([q_ref[bi][:, sl] for bi in range(bpb)],
                                 axis=0)                    # [bpb*S, D]
            for bi in range(bpb):
                kk = k_ref[bi][:, sl]
                logits = jax.lax.dot_general(
                    qq[bi * ss:(bi + 1) * ss], kk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                m = jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp2(logits - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                acc = jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_ref[bi][:, sl],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_ref[bi, :, sl] = (acc / l).astype(o_ref.dtype)

    def run(kernel_body, hpb, bpb=1, **kw):
        kern = functools.partial(kernel_body, head_dim=d, hpb=hpb, bpb=bpb,
                                 **kw)

        def f(q, k, v):
            return pl.pallas_call(
                kern,
                grid=(b // bpb, h // hpb),
                in_specs=[pl.BlockSpec((bpb, s, hpb * d),
                                       lambda i, j: (i, 0, j))] * 3,
                out_specs=pl.BlockSpec((bpb, s, hpb * d),
                                       lambda i, j: (i, 0, j)),
                out_shape=jax.ShapeDtypeStruct((b, s, hd), q.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(q, k, v)
        return f

    report("prod attention_bshd (auto)",
           slope(lambda q, k, v: A.attention_bshd(q, k, v, h)))

    for name, hpb, bpb in (
        ("direct hpb=12", 12, 1),
        ("direct hpb=24", 24, 1),
        ("direct hpb=12 bpb=2", 12, 2),
        ("direct hpb=24 bpb=2", 24, 2),
        ("direct hpb=24 bpb=4", 24, 4),
        ("direct hpb=8  bpb=4", 8, 4),
    ):
        try:
            f = run(looped_kernel, hpb, bpb)
            err = check(f)
            t = slope(f)
            report(f"{name} (err={err:.4f})", t)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()

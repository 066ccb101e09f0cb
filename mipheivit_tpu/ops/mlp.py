"""Fused SwiGLU fc1 for the ViT MLP: matmul + gate in one Pallas kernel.

The reference encoder (timm SwiGLUPacked, H-Optimus-0) computes
``h = silu(x @ W1 + b1) * (x @ W2 + b2)`` with W1|W2 packed in one fc1.
Under XLA this materializes the full [M, 2H] fc1 output in HBM, then an
elementwise pass reads it back and writes the [M, H] gated product —
~520 MB of pure HBM traffic per ViT-g block at B=64 (the measured MLP rate
was 148 TF/s vs 187 on the bare matmuls). This kernel computes both halves
per output tile and stores only the gated product: the [M, 2H]
intermediate never exists.

The packed fc1 weight is passed once and read twice through shifted block
index maps (same trick as ops.attention.attention_qkv), so no split copies
exist either. Backward recomputes in XLA (fc1 is cheap to rebuild and the
trainable path is LoRA+decoder anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bm(m: int) -> int:
    """Largest row block <= 3072 that divides m and is sublane-aligned;
    fall back to 1024 (Pallas masks the ragged tail block)."""
    best = 0
    for bm in range(3072, 63, -8):
        if m % bm == 0:
            best = bm
            break
    return best or 1024


def _ln_rows(x, lns, lnb, eps: float):
    """Row LayerNorm in f32 (flax-equivalent stats), cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * lns.astype(jnp.float32)
            + lnb.astype(jnp.float32)).astype(x.dtype)


def _swiglu_kernel(x_ref, w1_ref, w2_ref, b1_ref, b2_ref, o_ref, xn_ref, *,
                   ln: bool, eps: float, lns_ref=None, lnb_ref=None):
    if ln:
        # LN once per row block (j == 0), cached in VMEM for the N sweep
        @pl.when(pl.program_id(1) == 0)
        def _ln():
            xn_ref[...] = _ln_rows(x_ref[...], lns_ref[...], lnb_ref[...],
                                   eps)
        x = xn_ref[...]
    else:
        x = x_ref[...]
    a = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...].astype(jnp.float32)
    g = jax.lax.dot_general(
        x, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = (a * jax.lax.logistic(a) * g).astype(o_ref.dtype)


def _swiglu_kernel_noln(x_ref, w1_ref, w2_ref, b1_ref, b2_ref, o_ref):
    _swiglu_kernel(x_ref, w1_ref, w2_ref, b1_ref, b2_ref, o_ref, None,
                   ln=False, eps=0.0)


def _swiglu_kernel_ln(lns_ref, lnb_ref, x_ref, w1_ref, w2_ref, b1_ref,
                      b2_ref, o_ref, xn_ref, *, eps: float):
    _swiglu_kernel(x_ref, w1_ref, w2_ref, b1_ref, b2_ref, o_ref, xn_ref,
                   ln=True, eps=eps, lns_ref=lns_ref, lnb_ref=lnb_ref)


def _swiglu_forward(x2d, w, b, hidden: int, interpret: bool, ln=None,
                    eps: float = 1e-6):
    m, k = x2d.shape
    bm = _pick_bm(m)
    bn = 256
    nb = hidden // bn

    def wspec(shift):
        return pl.BlockSpec((k, bn), lambda i, j, shift=shift: (0, j + shift))

    def bspec(shift):
        return pl.BlockSpec((1, bn), lambda i, j, shift=shift: (0, j + shift))

    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
        wspec(0), wspec(nb), bspec(0), bspec(nb),
    ]
    operands = [x2d, w, w, b, b]
    scratch = []
    if ln is None:
        kernel = _swiglu_kernel_noln
    else:
        lns, lnb = ln
        kernel = functools.partial(_swiglu_kernel_ln, eps=eps)
        in_specs = [pl.BlockSpec((1, k), lambda i, j: (0, 0)),
                    pl.BlockSpec((1, k), lambda i, j: (0, 0))] + in_specs
        operands = [lns.reshape(1, k).astype(jnp.float32),
                    lnb.reshape(1, k).astype(jnp.float32)] + operands
        scratch = [pltpu.VMEM((bm, k), x2d.dtype)]

    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, bm), nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, hidden), x2d.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # the LN-scratch cache needs the N sweep in order per row block
            dimension_semantics=("parallel",
                                 "arbitrary" if ln is not None
                                 else "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def _swiglu_reference(x, w, b, hidden: int):
    x12 = x @ w.astype(x.dtype) + b[0].astype(x.dtype)
    # named so remat_policy="fc1" (vit.py) can pin the packed dot output —
    # the dominant recompute of the training backward (12.6 MFLOP/token of
    # the block's ~28) — while everything else rematerializes
    x12 = checkpoint_name(x12, "fc1_out")
    x1 = x12[..., :hidden]
    x2 = x12[..., hidden:]
    return jax.nn.silu(x1) * x2


def _ln_reference(x, lns, lnb, eps: float):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * lns.astype(jnp.float32)
            + lnb.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _swiglu_fc1(x2d, w, b, hidden: int, interpret: bool):
    return _swiglu_forward(x2d, w, b, hidden, interpret)


def _swiglu_fwd_rule(x2d, w, b, hidden, interpret):
    return _swiglu_forward(x2d, w, b, hidden, interpret), (x2d, w, b)


def _swiglu_bwd_rule(hidden, interpret, residuals, dh):
    """XLA recompute backward: rebuild a/g, then standard matmul grads."""
    x, w, b = residuals
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    bf = b[0].astype(jnp.float32)
    a = xf @ wf[:, :hidden] + bf[:hidden]
    g = xf @ wf[:, hidden:] + bf[hidden:]
    sig = jax.lax.logistic(a)
    silu = a * sig
    dhf = dh.astype(jnp.float32)
    da = dhf * g * (sig + silu * (1.0 - sig))
    dg = dhf * silu
    dx = da @ wf[:, :hidden].T + dg @ wf[:, hidden:].T
    dw = jnp.concatenate([xf.T @ da, xf.T @ dg], axis=-1)
    db = jnp.concatenate([da.sum(0), dg.sum(0)])[None]
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(b.dtype)


_swiglu_fc1.defvjp(_swiglu_fwd_rule, _swiglu_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _swiglu_fc1_ln(x2d, lns, lnb, w, b, hidden: int, eps: float,
                   interpret: bool):
    return _swiglu_forward(x2d, w, b, hidden, interpret, ln=(lns, lnb),
                           eps=eps)


def _swiglu_ln_fwd_rule(x2d, lns, lnb, w, b, hidden, eps, interpret):
    out = _swiglu_forward(x2d, w, b, hidden, interpret, ln=(lns, lnb),
                          eps=eps)
    return out, (x2d, lns, lnb, w, b)


def _swiglu_ln_bwd_rule(hidden, eps, interpret, residuals, dh):
    x2d, lns, lnb, w, b = residuals
    _, vjp = jax.vjp(
        lambda x, s, bb, ww, bc: _swiglu_reference(
            _ln_reference(x, s, bb, eps), ww.astype(x.dtype),
            bc.reshape(1, -1), hidden),
        x2d, lns, lnb, w, b)
    return vjp(dh)


_swiglu_fc1_ln.defvjp(_swiglu_ln_fwd_rule, _swiglu_ln_bwd_rule)


def swiglu_fc1(x, w, b, *, ln=None, eps: float = 1e-6, impl: str = "auto"):
    """``silu(x @ W1 + b1) * (x @ W2 + b2)`` with W1|W2 = packed ``w``.

    x: [..., K]; w: [K, 2H]; b: [2H] or [1, 2H]. Returns [..., H].
    ``ln=(scale, bias)`` fuses a leading LayerNorm into the kernel (the
    normed activations never reach HBM).
    impl: "auto" (Pallas on TPU when shapes allow), "pallas",
    "pallas_interpret", or "xla".
    """
    hidden = w.shape[-1] // 2
    b2d = b.reshape(1, -1)
    lead = x.shape[:-1]
    k = x.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    # "auto" routes to the XLA chain: the fused kernel wins the standalone
    # chain microbench (profile_mlp_r3.py) but measures 31 ms/B64 SLOWER in
    # the full flagship forward (393.6 vs 362.9 ms, profile_mlp_inmodel_r3)
    # — inside the scanned block XLA fuses the gate into the fc1 epilogue
    # and overlaps fc1/fc2 better than the opaque pallas_call boundary
    # allows. Kept behind impl="pallas" for shapes where the [M,2H]
    # intermediate genuinely blows HBM (whole-region M ~ 21k tokens).
    use_kernel = (
        impl in ("pallas", "pallas_interpret")
    ) and hidden % 256 == 0 and k % 128 == 0
    if not use_kernel:
        if ln is not None:
            x = _ln_reference(x, ln[0], ln[1], eps)
        return _swiglu_reference(x, w.astype(x.dtype), b2d, hidden)
    interpret = impl == "pallas_interpret" or not on_tpu
    x2d = x.reshape(-1, k)
    if ln is not None:
        out = _swiglu_fc1_ln(x2d, ln[0], ln[1], w.astype(x.dtype),
                             b2d.astype(x.dtype), hidden, eps, interpret)
    else:
        out = _swiglu_fc1(x2d, w.astype(x.dtype), b2d.astype(x.dtype),
                          hidden, interpret)
    return out.reshape(*lead, hidden)


# ---------------------------------------------------------------------------
# Generic fused LayerNorm + matmul (used for the qkv projection: the normed
# residual stream never reaches HBM).


def _ln_matmul_kernel(lns_ref, lnb_ref, x_ref, w_ref, b_ref, o_ref, xn_ref,
                      *, eps: float):
    @pl.when(pl.program_id(1) == 0)
    def _ln():
        xn_ref[...] = _ln_rows(x_ref[...], lns_ref[...], lnb_ref[...], eps)
    acc = jax.lax.dot_general(
        xn_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _ln_matmul_forward(x2d, lns, lnb, w, b, eps: float, interpret: bool):
    m, k = x2d.shape
    n = w.shape[-1]
    bm = _pick_bm(m)
    bn = 512 if n % 512 == 0 else 256
    return pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps),
        grid=(pl.cdiv(m, bm), n // bn),
        in_specs=[
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bm, k), x2d.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lns.reshape(1, k).astype(jnp.float32),
      lnb.reshape(1, k).astype(jnp.float32), x2d, w, b.reshape(1, n))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _ln_matmul(x2d, lns, lnb, w, b, eps: float, interpret: bool):
    return _ln_matmul_forward(x2d, lns, lnb, w, b, eps, interpret)


def _ln_matmul_fwd_rule(x2d, lns, lnb, w, b, eps, interpret):
    out = _ln_matmul_forward(x2d, lns, lnb, w, b, eps, interpret)
    return out, (x2d, lns, lnb, w, b)


def _ln_matmul_bwd_rule(eps, interpret, residuals, dy):
    x2d, lns, lnb, w, b = residuals
    _, vjp = jax.vjp(
        lambda x, s, bb, ww, bc: _ln_reference(x, s, bb, eps)
        @ ww.astype(x.dtype) + bc.astype(x.dtype),
        x2d, lns, lnb, w, b)
    return vjp(dy)


_ln_matmul.defvjp(_ln_matmul_fwd_rule, _ln_matmul_bwd_rule)


def ln_matmul(x, lns, lnb, w, b, *, eps: float = 1e-6, impl: str = "auto"):
    """``LayerNorm(x) @ w + b`` fused (LN stats in f32, flax semantics).

    x: [..., K]; w: [K, N]; b: [N]. Returns [..., N].
    """
    k = x.shape[-1]
    n = w.shape[-1]
    lead = x.shape[:-1]
    on_tpu = jax.default_backend() == "tpu"
    use_kernel = (
        impl in ("pallas", "pallas_interpret")
        or (impl == "auto" and on_tpu)
    ) and n % 256 == 0 and k % 128 == 0
    if not use_kernel:
        return _ln_reference(x, lns, lnb, eps) @ w.astype(x.dtype) \
            + b.astype(x.dtype)
    interpret = impl == "pallas_interpret" or not on_tpu
    out = _ln_matmul(x.reshape(-1, k), lns, lnb, w.astype(x.dtype),
                     b.astype(x.dtype), eps, interpret)
    return out.reshape(*lead, n)

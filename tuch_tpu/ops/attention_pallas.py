"""Fused multi-head self-attention Pallas kernel for the ViT backbone.

Why this exists: the unfused attention in models/vit.py materializes the
fp32 logits tensor in HBM -- (B, H, N, N) = 236 MB per block at
B=256/vit_s16 -- and softmax makes several more passes over it, an
HBM-bandwidth tax on an otherwise matmul-shaped backbone. On-chip
numbers for fused vs unfused are in docs/PERFORMANCE.md "ViT backbone
(r05)". At
HMR's token counts (N = (224/16)^2 = 196) the ENTIRE per-head attention
fits in VMEM, so no online-softmax machinery is needed: one program
computes logits, the fp32 softmax, and the value contraction without any
HBM round trip. HBM traffic per block drops from ~1.5 GB to the qkv read
+ out write (~200 MB).

Layout: the (B, N, 3C) qkv tensor (the fused Dense output, head-major
within each third: column ((i3*H)+h)*hd+d, matching models/vit.py's
reshape) is blocked one full (Np, 3C) row-group per batch item -- Mosaic
requires block last dims of 128 or full array width, and hd=64 per-head
blocks violate that -- so the head split is a static in-kernel lane
slice. No host-side transposes anywhere.

Gradients: callers use fused_mha, a custom_vjp whose backward recomputes
attention with the plain jnp reference (mha_reference) and differentiates
that -- exact VJP of the same math, costing one extra reference forward
only on the training path. The reference trains on ResNet-50
(/root/reference/tuch/models/hmr.py:27-130); the ViT path is opt-in and
serving-focused, so forward speed is what matters.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tuch_tpu.ops.contact_pallas import pallas_available

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_NEG = np.float32(-1e30)  # masked-logit fill; exp(-1e30 - max) == 0


def mha_reference(qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Plain-jnp multi-head attention on the fused qkv tensor.

    qkv: (B, N, 3C) with head-major thirds (models/vit.py Attention
    layout). Returns (B, N, C) in qkv.dtype. Softmax in fp32; the value
    contraction accumulates fp32 and casts back (bit-compatible with the
    MXU's internal accumulation for bf16 inputs).
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    x = qkv.reshape(B, N, 3, heads, hd)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * (1.0 / np.sqrt(hd))
    probs = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    out = jnp.einsum('bhqk,bkhd->bqhd', probs, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, N, C).astype(qkv.dtype)


def _mha_kernel(qkv_ref, out_ref, *, heads, n_valid, scale):
    """One batch-item program: all heads' softmax(q k^T) v in VMEM.

    qkv_ref: (1, Np, 3C) padded qkv block (head-major thirds); out_ref:
    (1, Np, C). Heads are static python-loop iterations over 64-wide lane
    slices (Mosaic requires BLOCK last dims of 128 or full-width, so the
    head split happens in-kernel, not in the BlockSpec). Padded key
    columns (>= n_valid) are masked to _NEG before the softmax; padded
    query rows produce garbage that the wrapper slices off.
    """
    x = qkv_ref[0]                     # (Np, 3C)
    C = x.shape[1] // 3
    hd = C // heads
    np_ = x.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    for h in range(heads):
        q = x[:, h * hd:(h + 1) * hd]              # (Np, hd)
        k = x[:, C + h * hd:C + (h + 1) * hd]
        v = x[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (Np, Np) fp32
        if n_valid < np_:
            logits = jnp.where(col < n_valid, logits, _NEG)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=1, keepdims=True)
        probs = (e / s).astype(v.dtype)
        out = jax.lax.dot_general(
            probs, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (Np, hd) fp32
        out_ref[0, :, h * hd:(h + 1) * hd] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('heads', 'interpret'))
def mha_pallas(qkv: jnp.ndarray, heads: int,
               interpret: bool = False) -> jnp.ndarray:
    """Fused attention via the VMEM kernel. qkv (B, N, 3C) -> (B, N, C).

    N is padded to a multiple of 128 so the logits' lane dimension is
    tile-aligned and the in-kernel reductions see explicitly masked
    columns only (HMR serving: N=196 -> 256).
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    assert heads * hd * 3 == C3, (heads, qkv.shape)
    npad = (-N) % 128
    Np = N + npad
    x = jnp.pad(qkv, ((0, 0), (0, npad), (0, 0))) if npad else qkv

    out = pl.pallas_call(
        functools.partial(_mha_kernel, heads=heads, n_valid=N,
                          scale=np.float32(1.0 / np.sqrt(hd))),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Np, C3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Np, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * Np * Np * hd,
            bytes_accessed=qkv.dtype.itemsize * 4 * B * Np * C,
            transcendentals=B * heads * Np * Np),
        interpret=interpret,
    )(x)
    return out[:, :N, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_mha(qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Dispatching attention: Pallas kernel on TPU, jnp elsewhere.

    Differentiable: the VJP recomputes through mha_reference (identical
    math), so the ViT training path works regardless of which forward
    implementation ran. TUCH_DISABLE_FUSED_MHA=1 forces the jnp
    reference even on TPU (read at trace time) -- the measurement
    switch for the fused-vs-unfused A/B (tools/mfu_experiments.py).
    """
    import os
    if (_HAS_PALLAS and pallas_available()
            and os.environ.get('TUCH_DISABLE_FUSED_MHA') != '1'):
        return mha_pallas(qkv, heads)
    return mha_reference(qkv, heads)


def _fused_mha_fwd(qkv, heads):
    return fused_mha(qkv, heads), qkv


def _fused_mha_bwd(heads, qkv, g):
    _, vjp = jax.vjp(lambda x: mha_reference(x, heads), qkv)
    return vjp(g)


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)

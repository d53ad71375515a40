"""Fused-attention kernel tests (interpret mode on CPU).

The compiled path is exercised on the real chip by bench.py's hmr_vit
stage and tools/mfu_experiments.py. See ops/attention_pallas.py for why
the kernel exists (HBM logits traffic measured in docs/PERFORMANCE.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tuch_tpu.ops import attention_pallas as ap


def _qkv(rng, B, N, C, dtype=np.float32):
    return jnp.asarray(rng.randn(B, N, 3 * C).astype(np.float32)).astype(
        dtype)


@pytest.mark.skipif(not ap._HAS_PALLAS, reason='pallas unavailable')
def test_kernel_matches_reference_unaligned_n(rng):
    # N=196 is the HMR serving token count: pads to 256, so the masked
    # softmax columns are exercised.
    qkv = _qkv(rng, 2, 196, 96)
    out_k = ap.mha_pallas(qkv, heads=6, interpret=True)
    out_r = ap.mha_reference(qkv, heads=6)
    assert out_k.shape == (2, 196, 96)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-6)


@pytest.mark.skipif(not ap._HAS_PALLAS, reason='pallas unavailable')
def test_kernel_matches_reference_aligned_n(rng):
    qkv = _qkv(rng, 3, 128, 64)
    out_k = ap.mha_pallas(qkv, heads=2, interpret=True)
    out_r = ap.mha_reference(qkv, heads=2)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-6)


@pytest.mark.skipif(not ap._HAS_PALLAS, reason='pallas unavailable')
def test_kernel_bf16_io_fp32_softmax(rng):
    qkv = _qkv(rng, 2, 64, 64, dtype=jnp.bfloat16)
    out_k = ap.mha_pallas(qkv, heads=2, interpret=True)
    out_r = ap.mha_reference(qkv, heads=2)
    assert out_k.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_r, np.float32),
        atol=1e-2)


def test_reference_matches_explicit_einsum_math(rng):
    # mha_reference IS the module math of models/vit.py Attention; pin it
    # against a from-scratch per-head computation.
    B, N, C, H = 2, 10, 24, 3
    hd = C // H
    qkv = _qkv(rng, B, N, C)
    x = np.asarray(qkv).reshape(B, N, 3, H, hd)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    want = np.zeros((B, N, C), np.float32)
    for b in range(B):
        for h in range(H):
            logits = q[b, :, h] @ k[b, :, h].T / np.sqrt(hd)
            e = np.exp(logits - logits.max(1, keepdims=True))
            p = e / e.sum(1, keepdims=True)
            want[b, :, h * hd:(h + 1) * hd] = p @ v[b, :, h]
    got = np.asarray(ap.mha_reference(qkv, H))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_mha_grad_flows(rng):
    # custom_vjp wiring: gradients flow and match differentiating the
    # reference directly (on CPU fused_mha forward IS the reference; the
    # point is that the custom VJP produces the same cotangents).
    qkv = _qkv(rng, 2, 12, 24)

    def loss_fused(x):
        return jnp.sum(ap.fused_mha(x, 3) ** 2)

    def loss_ref(x):
        return jnp.sum(ap.mha_reference(x, 3) ** 2)

    g_f = jax.grad(loss_fused)(qkv)
    g_r = jax.grad(loss_ref)(qkv)
    assert np.isfinite(np.asarray(g_f)).all()
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=1e-5)


def test_vit_block_uses_fused_path_and_is_finite(rng):
    # End-to-end through the module (CPU -> jnp fallback inside
    # fused_mha): the Attention rewrite must keep the block differentiable
    # and shape-stable.
    from tuch_tpu.models import vit as V
    m = V.ViT(width=32, depth=1, heads=2, patch=8)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out, vjp = jax.vjp(lambda p: m.apply(p, x), params)
    assert out.shape == (2, 32)
    grads = vjp(jnp.ones_like(out))[0]
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)

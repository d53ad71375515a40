"""ViT backbone variant for the HMR regressor (opt-in, MXU-oriented).

The reference ships exactly one backbone, ResNet-50
(/root/reference/tuch/models/hmr.py:27-130). This module is a capability
EXTENSION, not a parity item: conv stacks on the v5e plateau at ~23% bf16
MFU through XLA no matter which lever is pulled (measured lever table:
docs/MFU_r04.json / docs/PERFORMANCE.md "MFU headroom probes"), while
transformer blocks are matmul-shaped and map directly onto the 128x128
MXU. An HMR with a ViT backbone is also the architecture of the
HMR2.0-class successors of the reference model family. It is opt-in
(``--backbone vit_s16``) and random-weights-only: no reference checkpoint
exists to convert, so accuracy work needs real pretraining data that is
not available in this container.

TPU-first design decisions:
  * Patch embedding is an explicit reshape + Dense. A 16x16/stride-16
    conv and a patch matmul are the same linear map, but the reshape form
    is guaranteed to lower to a single MXU matmul with a fat contraction
    dim (patch*patch*3 = 768) instead of relying on conv lowering.
  * Fixed 2D sin-cos position embeddings (MAE-style), not a learned
    table: resolution-independent, so the backbone stays shape-polymorphic
    like the ResNet path (init traces at 64x64, serving runs 224x224).
  * Pre-LN blocks. LayerNorms and softmax accumulate in fp32; the
    matmuls (qkv / proj / mlp) run in the compute dtype (bf16 on TPU).
  * Mean-pool over tokens -> (B, width) features; no CLS token. The IEF
    head consumes the pooled feature exactly as it does the ResNet's
    2048-wide pooled feature (input width is inferred at init).
  * Tensor-parallel friendly: qkv/proj and mlp fc1/fc2 kernels carry the
    same split-then-consume column layout the IEF head uses, so
    parallel/mesh.shard_params_tp extends to them with the same rules.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# name -> (width, depth, heads, patch). Widths follow the standard ViT
# sizing (S/16, B/16); vit_t8 is a toy config for tests and the multichip
# dry run.
VIT_CONFIGS = {
    'vit_t8': (64, 2, 2, 8),
    'vit_s16': (384, 12, 6, 16),
    'vit_b16': (768, 12, 12, 16),
}


def sincos_posemb_2d(h: int, w: int, dim: int) -> jnp.ndarray:
    """Fixed 2D sin-cos position embedding, (h*w, dim) fp32.

    Half the channels encode the row coordinate, half the column, each as
    interleaved sin/cos over a geometric frequency ladder (the MAE/ViT
    convention). Pure function of static shapes: under jit this constant
    folds, costing nothing at run time.
    """
    assert dim % 4 == 0, f'posemb dim must be divisible by 4, got {dim}'
    quarter = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float32)
                               / quarter))

    def axis_emb(n):
        pos = np.arange(n, dtype=np.float32)
        ang = np.einsum('p,f->pf', pos, omega)
        return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)

    row = np.repeat(axis_emb(h), w, axis=0)          # (h*w, dim/2)
    col = np.tile(axis_emb(w), (h, 1))               # (h*w, dim/2)
    return jnp.asarray(np.concatenate([row, col], axis=-1))


class Attention(nn.Module):
    """Multi-head self-attention with a fused qkv projection.

    The (B, N, 3C) qkv tensor is head-major within each third (column
    ((i3*heads)+h)*hd + d) -- the layout ops/attention_pallas.py's fused
    kernel block-indexes directly. On TPU the whole
    logits -> fp32 softmax -> value contraction runs in one VMEM kernel
    (no HBM logits tensor); elsewhere the identical-math jnp reference
    runs. Both paths keep fp32 logits/softmax: bf16 logit accumulation
    visibly degrades attention entropy.
    """
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from tuch_tpu.ops.attention_pallas import fused_mha
        qkv = nn.Dense(3 * self.width, use_bias=True, dtype=self.dtype,
                       name='qkv')(x)
        out = fused_mha(qkv, self.heads)
        return nn.Dense(self.width, dtype=self.dtype, name='proj')(out)


class Block(nn.Module):
    """Pre-LN transformer block: x + MHA(LN(x)); x + MLP(LN(x))."""
    width: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # LayerNorm in fp32 (param_dtype default), output cast back to the
        # compute dtype for the matmuls.
        h = nn.LayerNorm(dtype=jnp.float32, name='ln1')(
            x.astype(jnp.float32)).astype(self.dtype)
        x = x + Attention(self.width, self.heads, dtype=self.dtype,
                          name='attn')(h)
        h = nn.LayerNorm(dtype=jnp.float32, name='ln2')(
            x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(self.mlp_ratio * self.width, dtype=self.dtype,
                     name='fc1')(h)
        h = nn.gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name='fc2')(h)
        return x + h


class ViT(nn.Module):
    """ViT feature extractor -> (B, width) mean-pooled token features."""
    width: int = 384
    depth: int = 12
    heads: int = 6
    patch: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BatchNorm/Dropout in the backbone
        B, H, W, C = x.shape
        p = self.patch
        if H % p or W % p:
            raise ValueError(
                f'ViT patch {p} needs H, W divisible by it, got {H}x{W}')
        gh, gw = H // p, W // p
        x = x.astype(self.dtype)
        x = x.reshape(B, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh * gw, p * p * C)
        x = nn.Dense(self.width, dtype=self.dtype, name='embed')(x)
        x = x + sincos_posemb_2d(gh, gw, self.width).astype(self.dtype)
        for i in range(self.depth):
            x = Block(self.width, self.heads, dtype=self.dtype,
                      name=f'block{i}')(x)
        x = nn.LayerNorm(dtype=jnp.float32, name='ln_final')(
            x.astype(jnp.float32))
        return x.mean(axis=1)  # (B, width) fp32


def create_vit(name: str, dtype=jnp.float32) -> ViT:
    if name not in VIT_CONFIGS:
        raise ValueError(
            f'unknown ViT config {name!r}; have {sorted(VIT_CONFIGS)}')
    width, depth, heads, patch = VIT_CONFIGS[name]
    return ViT(width=width, depth=depth, heads=heads, patch=patch,
               dtype=dtype)


def vit_fwd_flops(name: str, img_res: int = 224) -> float:
    """Analytic forward FLOPs per image (MACs x2) for MFU accounting.

    Per block: 2NC*(3C qkv + C proj + 8C mlp) + 4N^2*C attention, plus the
    patch-embed matmul. LayerNorms/softmax are vector ops and excluded,
    matching how RESNET50_FWD_FLOPS_224 excludes BN/ReLU (bench.py).
    """
    width, depth, heads, patch = VIT_CONFIGS[name]
    del heads
    n = (img_res // patch) ** 2
    c = width
    per_block = 2 * n * c * (12 * c) + 4 * n * n * c
    embed = 2 * n * (patch * patch * 3) * c
    return float(depth * per_block + embed)

"""Pallas TPU kernels for batched row gather / scatter-add by index.

XLA:TPU lowers `jnp.take_along_axis(verts, argmin[..., None], axis=1)` to
a serialized gather (~6 ms at B=64, V=6890 on v5e) and its transpose to a
serialized scatter-add (~20-25 ms) -- together they dominated the
SMPLify-DC body iteration once the quadratic kernels were paid only on
refreshes (the reference hits the same pattern at
tuch/smplify/losses.py:98, where the nearest-vertex re-gather backprops a
scatter into the vertex tensor; CUDA has fast atomics, the TPU does not).

Both directions are expressed as one-hot matmuls that ride the MXU: the
VPU builds a (TM, TQ) 0/1 tile by comparing an index vector against a
row iota, and a (3, TM) x (TM, TQ) dot selects (gather) or accumulates
(scatter) the coordinate rows. The cost floor is one compare + cast per
candidate pair on the VPU (~3.4 ms/pass at B=64, V=6890). Measured:
scatter 25 -> 7.8 ms (the production win -- XLA serializes scatter-adds);
gather 6.7 vs 5.9 for XLA's native take_along_axis and 4.8 for a flat
jnp.take, so the gather kernel is a documented neutral result kept for
the equivalence tests and the differentiable wrapper uses the flat take.

Exactness: fp32 values are split into three bf16 planes (hi/mid/lo cover
all 24 mantissa bits; each split-subtraction is exact by Sterbenz), each
plane's products with the exact-0/1 one-hot are exact on the MXU's fp32
accumulator, and their sum reconstructs the fp32 value exactly. The
gather is therefore BITWISE equal to take_along_axis; the scatter-add
matches .at[].add up to fp32 summation order (each plane reduces
separately), which tests bound at ~1e-6 relative.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _split3(v):
    """f32 -> three bf16 planes whose (f32) sum is exactly v."""
    hi = v.astype(jnp.bfloat16)
    r = v - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot3(vals, oh):
    """Exact-fp32 (3, TM) x (TM, TQ) via three bf16 MXU passes."""
    hi, mid, lo = _split3(vals)
    return (jnp.dot(hi, oh, preferred_element_type=jnp.float32)
            + jnp.dot(mid, oh, preferred_element_type=jnp.float32)
            + jnp.dot(lo, oh, preferred_element_type=jnp.float32))


def _gather_kernel(idx_ref, vals_ref, out_ref):
    """out[:, q] += vals[:, m] where m == idx[q], over the src grid dim.

    idx_ref: (1, 1, TQ) int32 (rows of the source to pick, -1 = none);
    vals_ref: (1, 3, TM) f32 source coordinates; out_ref: (1, 3, TQ).
    """
    mi = pl.program_id(2)
    tm = vals_ref.shape[2]
    idx = idx_ref[0]                                    # (1, TQ)
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (tm, idx.shape[1]), 0) + mi * tm
    oh = (rows == idx).astype(jnp.bfloat16)             # (TM, TQ)
    part = _dot3(vals_ref[0], oh)[None]                 # (1, 3, TQ)

    @pl.when(mi == 0)
    def _():
        out_ref[...] = part

    @pl.when(mi > 0)
    def _():
        out_ref[...] = out_ref[...] + part


def _scatter_kernel(idx_ref, vals_ref, out_ref):
    """out[:, j] += sum_i vals[:, i] * (idx[i] == j), over the src grid dim.

    idx_ref: (1, TM, 1) int32 destinations per source row; vals_ref:
    (1, 3, TM) f32 contributions; out_ref: (1, 3, TN).
    """
    di = pl.program_id(1)
    si = pl.program_id(2)
    tn = out_ref.shape[2]
    idx = idx_ref[0]                                    # (TM, 1)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (idx.shape[0], tn), 1) + di * tn
    oh = (idx == cols).astype(jnp.bfloat16)             # (TM, TN)
    part = _dot3(vals_ref[0], oh)[None]                 # (1, 3, TN)

    @pl.when(si == 0)
    def _():
        out_ref[...] = part

    @pl.when(si > 0)
    def _():
        out_ref[...] = out_ref[...] + part


@functools.partial(jax.jit, static_argnames=('tq', 'tm', 'interpret'))
def gather_rows_pallas(values: jnp.ndarray, idx: jnp.ndarray,
                       tq: int = 1024, tm: int = 512,
                       interpret: bool = False) -> jnp.ndarray:
    """values (B, V, 3), idx (B, Q) int32 in [0, V) -> (B, Q, 3).

    Bitwise equal to jnp.take_along_axis(values, idx[..., None], axis=1).
    Out-of-range indices (e.g. -1 padding) return 0 rows.
    """
    B, V, C = values.shape
    Q = idx.shape[1]
    assert C == 3, values.shape
    qpad = (-Q) % tq
    vpad = (-V) % tm
    vals_t = jnp.swapaxes(values, 1, 2)                 # (B, 3, V)
    if vpad:
        vals_t = jnp.pad(vals_t, ((0, 0), (0, 0), (0, vpad)))
    idxp = jnp.pad(idx, ((0, 0), (0, qpad)),
                   constant_values=-1) if qpad else idx
    Qp, Vp = Q + qpad, V + vpad

    grid = (B, Qp // tq, Vp // tm)
    out = pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tq), lambda b, qi, mi: (b, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, qi, mi: (b, 0, mi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, tq), lambda b, qi, mi: (b, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, Qp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=(2 + 18) * B * Qp * Vp,
            bytes_accessed=4 * B * (Qp + 3 * Vp + 3 * Qp),
            transcendentals=0),
        interpret=interpret,
    )(idxp[:, None, :], vals_t)
    return jnp.swapaxes(out[:, :, :Q], 1, 2)


@functools.partial(jax.jit,
                   static_argnames=('num_rows', 'tn', 'tm', 'interpret'))
def scatter_add_rows_pallas(contrib: jnp.ndarray, idx: jnp.ndarray,
                            num_rows: int, tn: int = 1024, tm: int = 512,
                            interpret: bool = False) -> jnp.ndarray:
    """contrib (B, Q, 3), idx (B, Q) int32 -> (B, num_rows, 3) scatter-add.

    Equals zeros.at[b, idx[b, q]].add(contrib[b, q]) up to fp32 summation
    order. Out-of-range indices (e.g. -1 padding) are dropped.
    """
    B, Q, C = contrib.shape
    assert C == 3, contrib.shape
    V = num_rows
    qpad = (-Q) % tm
    vpad = (-V) % tn
    vals_t = jnp.swapaxes(contrib, 1, 2)                # (B, 3, Q)
    if qpad:
        vals_t = jnp.pad(vals_t, ((0, 0), (0, 0), (0, qpad)))
    idxp = jnp.pad(idx, ((0, 0), (0, qpad)),
                   constant_values=-1) if qpad else idx
    Qp, Vp = Q + qpad, V + vpad

    grid = (B, Vp // tn, Qp // tm)
    out = pl.pallas_call(
        _scatter_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, 1), lambda b, ni, si: (b, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, ni, si: (b, 0, si),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, tn), lambda b, ni, si: (b, 0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, Vp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=(2 + 18) * B * Qp * Vp,
            bytes_accessed=4 * B * (Qp + 3 * Qp + 3 * Vp),
            transcendentals=0),
        interpret=interpret,
    )(idxp[..., None], vals_t)
    return jnp.swapaxes(out[:, :, :V], 1, 2)


def _pallas_ok() -> bool:
    # honors the TUCH_PALLAS=0 escape hatch (see contact_pallas)
    from tuch_tpu.ops.contact_pallas import pallas_available
    return pallas_available()


@jax.custom_vjp
def gather_rows(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Differentiable batched row gather: (B, V, 3), (B, Q) -> (B, Q, 3).

    Forward stays XLA's native take_along_axis: a flat jnp.take measures
    slightly faster single-chip (4.8 vs 5.9 ms at B=64, Q=V=6890 on
    v5e) but merges the batch axis into the index arithmetic, which
    GSPMD cannot partition over a dp-sharded mesh; the one-hot MXU
    kernel above measures 6.7 ms (the VPU compare+cast floor). The
    backward scatter-adds the cotangent into the picked rows: that is
    where XLA's serialized scatter cost 25 ms, and the one-hot MXU
    kernel wins 3.2x.
    """
    return jnp.take_along_axis(values, idx[..., None], axis=1)


def _gather_rows_fwd(values, idx):
    return gather_rows(values, idx), (idx, values.shape[1])


def _gather_rows_bwd(res, ct):
    idx, V = res
    if _pallas_ok() and ct.dtype == jnp.float32:
        dvalues = scatter_add_rows_pallas(ct, idx, V)
    else:
        B = idx.shape[0]
        dvalues = jnp.zeros((B, V, 3), ct.dtype).at[
            jnp.arange(B)[:, None], idx].add(ct)
    return dvalues, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def gather_rows_ref(values, idx):
    """jnp reference used by equivalence tests."""
    return jnp.take_along_axis(values, idx[..., None], axis=1)


def scatter_add_rows_ref(contrib, idx, num_rows):
    """jnp reference used by equivalence tests."""
    B = idx.shape[0]
    return jnp.zeros((B, num_rows, contrib.shape[-1]), contrib.dtype).at[
        jnp.arange(B)[:, None], idx].add(contrib)

"""Segment ("allowed self-intersection") tables and the fused kernel path.

The fused layout packs all S segments into one rectangular winding problem
(one kernel launch); these tests pin its equivalence to the straightforward
per-segment evaluation (reference semantics:
/root/reference/tuch/utils/segmentation.py:81-99 + train/loss.py:264-266).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tuch_tpu import assets
from tuch_tpu.ops import contact_pallas as cpk
from tuch_tpu.ops.segments import (build_segment_tables,
                                   forgive_segment_interiors,
                                   segment_exterior_fused,
                                   segment_exterior_per_segment)


@pytest.fixture(scope='module')
def seg_problem():
    model, extras = assets.synthetic_smpl(num_verts=170, seed=0)
    tables = build_segment_tables(extras.segments, np.asarray(model.faces),
                                  model.v_template.shape[0])
    rng = np.random.RandomState(7)
    B = 3
    verts = (np.asarray(model.v_template)[None]
             + 0.01 * rng.randn(B, model.v_template.shape[0], 3)
             ).astype(np.float32)
    return tables, jnp.asarray(verts)


def test_fused_tables_shapes(seg_problem):
    tables, verts = seg_problem
    S = len(tables.names)
    assert tables.fused_vidx.shape[0] == S
    assert tables.fused_faces.shape[0] == S
    # every real vertex id appears in the fused table exactly where masked
    for si, vidx in enumerate(tables.vidx):
        np.testing.assert_array_equal(
            tables.fused_vidx[si, :len(vidx)], vidx)
        assert tables.fused_vmask[si, :len(vidx)].all()
        assert not tables.fused_vmask[si, len(vidx):].any()
    # padding faces point at the far vertex (zero solid angle)
    C = tables.ring_idx.shape[0]
    far = tables.num_verts + C
    assert (tables.fused_faces <= far).all()


def test_fused_matches_per_segment(seg_problem):
    tables, verts = seg_problem
    fused = np.asarray(segment_exterior_fused(tables, verts))
    per_seg = segment_exterior_per_segment(tables, verts)
    for si, ext_s in enumerate(per_seg):
        ns = ext_s.shape[1]
        np.testing.assert_array_equal(fused[:, si, :ns], np.asarray(ext_s))
    # padded slots read exterior ("nothing to forgive")
    for si, vidx in enumerate(tables.vidx):
        assert fused[:, si, len(vidx):].all()


def test_forgive_scatter_equivalent(seg_problem):
    tables, verts = seg_problem
    B, V = verts.shape[0], verts.shape[1]
    rng = np.random.RandomState(3)
    exterior = jnp.asarray(rng.rand(B, V) > 0.5)
    got = np.asarray(forgive_segment_interiors(tables, verts, exterior))

    # straightforward per-segment loop (the pre-fused implementation)
    want = np.asarray(exterior).copy()
    for vidx, ext_s in zip(tables.vidx,
                           segment_exterior_per_segment(tables, verts)):
        upd = ~np.asarray(ext_s)
        want[:, vidx] |= upd
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not cpk._HAS_PALLAS, reason='pallas unavailable')
def test_fused_pallas_interpret_matches_jnp(seg_problem):
    tables, verts = seg_problem
    fused_jnp = np.asarray(segment_exterior_fused(tables, verts))
    fused_k = np.asarray(segment_exterior_fused(tables, verts,
                                                interpret=True))
    np.testing.assert_array_equal(fused_k, fused_jnp)

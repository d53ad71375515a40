"""ctypes bindings for the native rasterizer/warp library.

Compiles tuch_tpu/viz/native.cpp with g++ on first use (cached .so next to
the source). Falls back to pure-numpy implementations when no compiler is
available, so the viz path never hard-fails.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'native.cpp')
_SO = os.path.join(_HERE, 'libtuchviz.so')
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ['g++', '-O3', '-shared', '-fPIC', _SRC, '-o', _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    with open(_SO + '.srchash', 'w') as f:
        f.write(_src_hash())


def _src_hash() -> str:
    import hashlib
    with open(_SRC, 'rb') as f:
        return hashlib.sha256(f.read()).hexdigest()


def _needs_build() -> bool:
    """Rebuild when the .so is missing or built from different source.

    A content hash, not mtimes: git checkouts do not preserve mtimes, so
    a stale committed .so could otherwise shadow newer native.cpp."""
    if not os.path.exists(_SO):
        return True
    try:
        with open(_SO + '.srchash') as f:
            return f.read().strip() != _src_hash()
    except OSError:
        return True


def _load():
    if _needs_build():
        _build()
    return ctypes.CDLL(_SO)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            try:
                lib = _load()
            except OSError:
                # a committed .so may not match this host's arch/ABI:
                # force a source rebuild and retry once
                _build()
                lib = ctypes.CDLL(_SO)
            f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
            i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
            lib.rasterize_mesh.argtypes = [
                f32p, ctypes.c_int, i32p, ctypes.c_int, f32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_float, f32p, f32p]
            lib.rasterize_mesh.restype = None
            lib.affine_warp_f32.argtypes = [
                f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
                ctypes.c_int, ctypes.c_int, f32p]
            lib.affine_warp_f32.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def rasterize(verts: np.ndarray, faces: np.ndarray, colors: np.ndarray,
              height: int, width: int, focal: float, cx: float, cy: float,
              ambient: float = 0.4):
    """Rasterize camera-space mesh -> (rgb (H, W, 3), mask (H, W))."""
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    colors = np.ascontiguousarray(colors, np.float32)
    rgb = np.zeros((height, width, 3), np.float32)
    mask = np.zeros((height, width), np.float32)
    lib = get_lib()
    if lib is not None:
        lib.rasterize_mesh(verts, verts.shape[0], faces, faces.shape[0],
                           colors, height, width, focal, cx, cy, ambient,
                           rgb, mask)
        return rgb, mask
    return _rasterize_numpy(verts, faces, colors, height, width, focal,
                            cx, cy, ambient, rgb, mask)


def _rasterize_numpy(verts, faces, colors, H, W, f, cx, cy, ambient,
                     rgb, mask):
    """Slow but dependency-free fallback (flat shading, per-face loop)."""
    z = verts[:, 2]
    ok = z > 1e-6
    px = np.where(ok, f * verts[:, 0] / np.maximum(z, 1e-6) + cx, -1e9)
    py = np.where(ok, f * verts[:, 1] / np.maximum(z, 1e-6) + cy, -1e9)
    zbuf = np.full((H, W), np.inf, np.float32)
    order = np.argsort(-verts[faces].mean(axis=1)[:, 2])  # far to near
    for t in order:
        i0, i1, i2 = faces[t]
        if not (ok[i0] and ok[i1] and ok[i2]):
            continue
        xs = np.array([px[i0], px[i1], px[i2]])
        ys = np.array([py[i0], py[i1], py[i2]])
        ix0, ix1 = int(max(0, xs.min())), int(min(W - 1, xs.max()) + 1)
        iy0, iy1 = int(max(0, ys.min())), int(min(H - 1, ys.max()) + 1)
        if ix0 >= ix1 or iy0 >= iy1:
            continue
        yy, xx = np.mgrid[iy0:iy1, ix0:ix1]
        denom = ((ys[1] - ys[2]) * (xs[0] - xs[2])
                 + (xs[2] - xs[1]) * (ys[0] - ys[2]))
        if abs(denom) < 1e-12:
            continue
        l0 = ((ys[1] - ys[2]) * (xx - xs[2])
              + (xs[2] - xs[1]) * (yy - ys[2])) / denom
        l1 = ((ys[2] - ys[0]) * (xx - xs[2])
              + (xs[0] - xs[2]) * (yy - ys[2])) / denom
        l2 = 1 - l0 - l1
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
        if not inside.any():
            continue
        zp = (l0 * z[i0] + l1 * z[i1] + l2 * z[i2])
        e1 = verts[i1] - verts[i0]
        e2 = verts[i2] - verts[i0]
        n = np.cross(e1, e2)
        shade = ambient + (1 - ambient) * abs(
            n[2] / (np.linalg.norm(n) + 1e-12))
        col = shade * (colors[i0] + colors[i1] + colors[i2]) / 3
        zb = zbuf[iy0:iy1, ix0:ix1]
        upd = inside & (zp < zb)
        zb[upd] = zp[upd]
        rgb[iy0:iy1, ix0:ix1][upd] = col
        mask[iy0:iy1, ix0:ix1][upd] = 1.0
    return rgb, mask


def affine_warp(img: np.ndarray, inv_t: np.ndarray, out_h: int,
                out_w: int) -> np.ndarray:
    """Native bilinear affine warp.

    Callers (data/transforms.crop_image) check get_lib() first and fall
    back to the numpy warp themselves when the library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError('native warp unavailable')
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    out = np.zeros((out_h, out_w, img.shape[2]), np.float32)
    lib.affine_warp_f32(img, img.shape[0], img.shape[1], img.shape[2],
                        np.ascontiguousarray(inv_t, np.float32).reshape(9),
                        out_h, out_w, out)
    return out

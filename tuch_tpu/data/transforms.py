"""Image/keypoint augmentation transforms for the input pipeline.

Replaces tuch/utils/imutils.py. The reference crops with a chain of
pad -> rotate -> unpad -> resize on the host (its own comment at
imutils.py:70 says "very slow"); here the crop+rotate+resize collapse into
ONE affine warp with bilinear sampling (numpy reference implementation; a
C++ kernel in tuch_tpu/viz/native.cpp accelerates it when built).
Keypoints use the same continuous 3x3 matrix (the reference rounds through
ints, imutils.py:58-65 -- we keep sub-pixel precision).
"""

from typing import Tuple

import numpy as np

from tuch_tpu import constants


def get_transform(center, scale, res: Tuple[int, int], rot: float = 0.0
                  ) -> np.ndarray:
    """3x3 matrix mapping original-image coords -> crop coords.

    Same convention as the reference (imutils.py:32-56): the crop covers a
    square of side h = 200*scale around `center`, mapped to `res` pixels,
    then rotated by `rot` degrees about the crop center.
    """
    h = 200.0 * float(scale)
    t = np.eye(3)
    t[0, 0] = res[1] / h
    t[1, 1] = res[0] / h
    t[0, 2] = res[1] * (-float(center[0]) / h + 0.5)
    t[1, 2] = res[0] * (-float(center[1]) / h + 0.5)
    if rot != 0:
        rad = -rot * np.pi / 180.0
        sn, cs = np.sin(rad), np.cos(rad)
        rot_mat = np.array([[cs, -sn, 0], [sn, cs, 0], [0, 0, 1]])
        t_to = np.eye(3)
        t_to[0, 2] = -res[1] / 2
        t_to[1, 2] = -res[0] / 2
        t_back = np.eye(3)
        t_back[0, 2] = res[1] / 2
        t_back[1, 2] = res[0] / 2
        t = t_back @ rot_mat @ t_to @ t
    return t


def bbox_center_scale(bbox) -> Tuple[np.ndarray, float]:
    """[x, y, w, h] -> (center (2,), scale) in the SPIN crop convention
    (crop square side = 200 * scale px; reference demo_tuch.py:67-78).
    Shared by demo_tuch and the serving endpoint so a bbox always means
    the same crop."""
    bbox = np.asarray(bbox, np.float32).reshape(4)
    center = bbox[:2] + 0.5 * bbox[2:]
    return center, float(max(bbox[2], bbox[3]) / 200.0)


def full_image_center_scale(height: int, width: int
                            ) -> Tuple[np.ndarray, float]:
    """Whole-frame crop box (the no-bbox fallback, demo_tuch.py:80-90)."""
    return (np.array([width // 2, height // 2], np.float32),
            max(height, width) / 200.0)


def transform_points(pts: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Apply a 3x3 transform to (N, 2) points (continuous, no rounding)."""
    ones = np.ones((pts.shape[0], 1))
    homog = np.concatenate([pts, ones], axis=1)
    out = homog @ t.T
    return out[:, :2]


def crop_image(img: np.ndarray, center, scale, res: Tuple[int, int],
               rot: float = 0.0) -> np.ndarray:
    """Fused affine crop: one inverse-warp bilinear resample.

    img: (H, W, C) float or uint8. Returns (res[0], res[1], C) float32.
    Replaces the reference's crop() (imutils.py:67-106). Uses the native
    C++ warp (tuch_tpu/viz/native.cpp) when built, numpy otherwise.
    """
    t = get_transform(center, scale, res, rot)
    t_inv = np.linalg.inv(t)

    # The warp only samples inside the crop quad: slice the source to its
    # bounding box BEFORE the float32 conversion, so a 2048^2 frame costs
    # a crop-sized allocation, not a ~50 MB full-frame one (the reference
    # instead pre-resizes the whole frame, base_dataset.py:258-264).
    H, W = img.shape[:2]
    corners = np.array([[0.5, 0.5], [res[1] - 0.5, 0.5],
                        [0.5, res[0] - 0.5],
                        [res[1] - 0.5, res[0] - 0.5]])
    src_c = transform_points(corners, t_inv)
    x_lo = max(int(np.floor(src_c[:, 0].min() - 1.0)), 0)
    y_lo = max(int(np.floor(src_c[:, 1].min() - 1.0)), 0)
    x_hi = min(int(np.ceil(src_c[:, 0].max() + 1.0)) + 1, W)
    y_hi = min(int(np.ceil(src_c[:, 1].max() + 1.0)) + 1, H)
    if x_hi <= x_lo or y_hi <= y_lo:
        # crop box entirely outside the image: all samples zero-fill
        C = img.shape[2] if img.ndim == 3 else 1
        return np.zeros((res[0], res[1], C), np.float32)
    if (x_hi - x_lo) * (y_hi - y_lo) < H * W:
        img = img[y_lo:y_hi, x_lo:x_hi]
        shift = np.eye(3)
        shift[0, 2] = -x_lo
        shift[1, 2] = -y_lo
        t_inv = shift @ t_inv

    try:
        from tuch_tpu.viz import native
        if native.get_lib() is not None:
            return native.affine_warp(np.asarray(img, np.float32), t_inv,
                                      res[0], res[1])
    except Exception:
        pass

    ys, xs = np.meshgrid(np.arange(res[0]), np.arange(res[1]),
                         indexing='ij')
    # +0.5 pixel-center convention for the warp sample positions.
    dst = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], axis=1)
    src = transform_points(dst, t_inv) - 0.5
    sx, sy = src[:, 0], src[:, 1]

    H, W = img.shape[:2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = (sx - x0).astype(np.float32)
    fy = (sy - y0).astype(np.float32)

    def sample(yy, xx):
        inside = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        yy = np.clip(yy, 0, H - 1)
        xx = np.clip(xx, 0, W - 1)
        vals = img[yy, xx].astype(np.float32)
        vals[~inside] = 0.0
        return vals

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    fx = fx[:, None]
    fy = fy[:, None]
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return out.reshape(res[0], res[1], -1)


def uncrop_image(img: np.ndarray, center, scale,
                 orig_shape: Tuple[int, int], rot: float = 0.0
                 ) -> np.ndarray:
    """Inverse of crop_image: paste the crop back into original coords.

    Replaces imutils.py:108-133 (used for mask/part evaluation).
    """
    res = img.shape[:2]
    t = get_transform(center, scale, res, rot)
    ys, xs = np.meshgrid(np.arange(orig_shape[0]), np.arange(orig_shape[1]),
                         indexing='ij')
    dst = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], axis=1)
    src = transform_points(dst, t) - 0.5
    sx = np.round(src[:, 0]).astype(np.int64)
    sy = np.round(src[:, 1]).astype(np.int64)
    inside = (sy >= 0) & (sy < res[0]) & (sx >= 0) & (sx < res[1])
    out = np.zeros(orig_shape + img.shape[2:], dtype=img.dtype)
    flat_idx = np.where(inside)[0]
    out.reshape(-1, *img.shape[2:])[flat_idx] = \
        img[np.clip(sy, 0, res[0] - 1), np.clip(sx, 0, res[1] - 1)][inside]
    return out


def flip_img(img: np.ndarray) -> np.ndarray:
    """Horizontal flip, channels-last (imutils.py:148-153)."""
    return np.ascontiguousarray(img[:, ::-1])


def flip_kp(kp: np.ndarray) -> np.ndarray:
    """Flip keypoints; handles the 24- and 49-joint conventions
    (imutils.py:155-163)."""
    if len(kp) == 24:
        perm = constants.J24_FLIP_PERM
    elif len(kp) == 49:
        perm = constants.J49_FLIP_PERM
    else:
        raise ValueError(f'unsupported keypoint count {len(kp)}')
    kp = kp[perm].copy()
    kp[:, 0] = -kp[:, 0]
    return kp


def flip_pose_np(pose: np.ndarray) -> np.ndarray:
    """Flip 72-dim SMPL pose (imutils.py:165-174)."""
    pose = pose[constants.SMPL_POSE_FLIP_PERM].copy()
    pose[1::3] = -pose[1::3]
    pose[2::3] = -pose[2::3]
    return pose


def aa_to_rotmat_np(aa: np.ndarray) -> np.ndarray:
    """Axis-angle (3,) -> rotation matrix, pure-numpy Rodrigues (the
    host-side analog of utils.rotations.batch_rodrigues)."""
    angle = np.linalg.norm(aa)
    if angle < 1e-8:
        return np.eye(3)
    axis = aa / angle
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def rotmat_to_aa_np(M: np.ndarray) -> np.ndarray:
    """Rotation matrix -> axis-angle, with the near-pi degenerate branch
    (sin(a) ~ 0 there, so the antisymmetric-part formula breaks down)."""
    cos_a = np.clip((np.trace(M) - 1) / 2, -1, 1)
    a = np.arccos(cos_a)
    if a < 1e-8:
        return np.zeros(3, np.float32)
    if np.pi - a < 1e-6:  # near-pi: extract axis from M + I
        # at angle pi, (M + I) / 2 == axis axis^T exactly: take the row
        # of the LARGEST diagonal entry so the pivot is never ~0, and
        # read the other two components (with signs) from that row
        A = (M + np.eye(3)) / 2
        k = int(np.argmax(np.diag(A)))
        axis = A[k] / max(np.sqrt(max(A[k, k], 1e-12)), 1e-12)
        axis /= max(np.linalg.norm(axis), 1e-12)
        return (axis * a).astype(np.float32)
    axis = np.array([M[2, 1] - M[1, 2], M[0, 2] - M[2, 0],
                     M[1, 0] - M[0, 1]]) / (2 * np.sin(a))
    return (axis * a).astype(np.float32)


def rot_aa_np(aa: np.ndarray, rot: float) -> np.ndarray:
    """Rotate global orientation by `rot` image degrees (imutils.py:135-146),
    numpy path for the host-side loader (pure Rodrigues, no cv2)."""
    if rot == 0:
        return aa.astype(np.float32)
    rad = np.deg2rad(-rot)
    R = np.array([[np.cos(rad), -np.sin(rad), 0],
                  [np.sin(rad), np.cos(rad), 0], [0, 0, 1]])
    return rotmat_to_aa_np(R @ aa_to_rotmat_np(aa))


def j2d_processing(kp: np.ndarray, center, scale, res: int, rot: float,
                   flip: bool) -> np.ndarray:
    """Transform GT 2D keypoints into normalized crop coords
    (base_dataset.py:207-219)."""
    t = get_transform(center, scale, (res, res), rot)
    kp = kp.copy()
    kp[:, :2] = transform_points(kp[:, :2], t)
    kp[:, :-1] = 2.0 * kp[:, :-1] / res - 1.0
    if flip:
        kp = flip_kp(kp)
    return kp.astype(np.float32)


def j3d_processing(S: np.ndarray, rot: float, flip: bool,
                   apply_rotation: bool = False) -> np.ndarray:
    """In-plane-rotate + flip 3D keypoints (base_dataset.py:221-238).

    apply_rotation=False is the REFERENCE default: its if/elif structure
    builds the rotation matrix when r != 0 but the apply branch is only
    reachable when r == 0 (where it is the identity) -- so the reference
    never rotates 3D keypoints, leaving the 3D supervision unrotated
    under image-rotation augmentation. apply_rotation=True opts into the
    corrected (SPIN-intended) behavior.
    """
    S = S.copy()
    if apply_rotation and rot != 0:
        rad = -rot * np.pi / 180
        sn, cs = np.sin(rad), np.cos(rad)
        R = np.eye(3)
        R[0, :2] = [cs, -sn]
        R[1, :2] = [sn, cs]
        S[:, :3] = S[:, :3] @ R.T
    if flip:
        S = flip_kp(S)
    return S.astype(np.float32)


def pose_processing(pose: np.ndarray, rot: float, flip: bool) -> np.ndarray:
    """Rotate global orient + optionally flip SMPL pose
    (base_dataset.py:240-248)."""
    pose = pose.copy()
    pose[:3] = rot_aa_np(pose[:3], rot)
    if flip:
        pose = flip_pose_np(pose)
    return pose.astype(np.float32)


def normalize_image(img01: np.ndarray) -> np.ndarray:
    """ImageNet-normalize an (H, W, 3) image in [0, 1]."""
    mean = np.asarray(constants.IMG_NORM_MEAN, np.float32)
    std = np.asarray(constants.IMG_NORM_STD, np.float32)
    return ((img01 - mean) / std).astype(np.float32)

"""Headless visualization: frame overlays and top-down map renders.

Counterpart of the reference's Pangolin GUI stack (FrameDrawer.cc:54
DrawFrame keypoint overlay, MapDrawer.cc:58-232 points/keyframes/graph) as
pure-numpy image synthesis — usable in notebooks, logged to disk, or served
by any frontend, with no GL dependency.
"""

from __future__ import annotations

import numpy as np

GREEN = np.array([40, 220, 60], np.uint8)
BLUE = np.array([80, 140, 255], np.uint8)
RED = np.array([230, 60, 40], np.uint8)
WHITE = np.array([240, 240, 240], np.uint8)
YELLOW = np.array([250, 220, 40], np.uint8)


def draw_frame(image: np.ndarray, xy: np.ndarray, valid: np.ndarray,
               tracked: np.ndarray | None = None, size: int = 2) -> np.ndarray:
    """Keypoint overlay (reference FrameDrawer::DrawFrame): tracked points in
    green squares, untracked detections in blue.  Returns [H, W, 3] uint8."""
    h, w = image.shape
    canvas = np.repeat(np.clip(image, 0, 255).astype(np.uint8)[:, :, None], 3, axis=2)
    xs = xy[:, 0].astype(int)
    ys = xy[:, 1].astype(int)
    for i in np.nonzero(valid)[0]:
        x, y = xs[i], ys[i]
        if not (size <= x < w - size and size <= y < h - size):
            continue
        color = GREEN if (tracked is not None and tracked[i]) else BLUE
        canvas[y - size : y + size + 1, x - size] = color
        canvas[y - size : y + size + 1, x + size] = color
        canvas[y - size, x - size : x + size + 1] = color
        canvas[y + size, x - size : x + size + 1] = color
    return canvas


def _to_px(pts_xz, bounds, size):
    (x0, x1, z0, z1) = bounds
    sx = (size - 1) / max(x1 - x0, 1e-6)
    sz = (size - 1) / max(z1 - z0, 1e-6)
    s = min(sx, sz)
    px = ((pts_xz[:, 0] - x0) * s).astype(int)
    py = (size - 1 - (pts_xz[:, 1] - z0) * s).astype(int)
    return px, py


def draw_map_topdown(pt_pos: np.ndarray, pt_valid: np.ndarray,
                     kf_centers: np.ndarray, kf_valid: np.ndarray,
                     trajectory_centers: np.ndarray | None = None,
                     size: int = 512) -> np.ndarray:
    """Top-down (x-z plane) map view (reference MapDrawer::DrawMapPoints +
    DrawKeyFrames): map points white, keyframes red, trajectory yellow."""
    canvas = np.zeros((size, size, 3), np.uint8)
    pts = pt_pos[pt_valid]
    allxz = [pts[:, [0, 2]]] if len(pts) else []
    kfc = kf_centers[kf_valid]
    if len(kfc):
        allxz.append(kfc[:, [0, 2]])
    if trajectory_centers is not None and len(trajectory_centers):
        allxz.append(trajectory_centers[:, [0, 2]])
    if not allxz:
        return canvas
    cat = np.concatenate(allxz)
    pad = 0.5
    bounds = (cat[:, 0].min() - pad, cat[:, 0].max() + pad,
              cat[:, 1].min() - pad, cat[:, 1].max() + pad)

    if len(pts):
        px, py = _to_px(pts[:, [0, 2]], bounds, size)
        ok = (px >= 0) & (px < size) & (py >= 0) & (py < size)
        canvas[py[ok], px[ok]] = WHITE
    if trajectory_centers is not None and len(trajectory_centers):
        px, py = _to_px(trajectory_centers[:, [0, 2]], bounds, size)
        for i in range(len(px) - 1):
            n = max(abs(px[i + 1] - px[i]), abs(py[i + 1] - py[i]), 1)
            xs = np.linspace(px[i], px[i + 1], n + 1).astype(int)
            ys = np.linspace(py[i], py[i + 1], n + 1).astype(int)
            ok = (xs >= 0) & (xs < size) & (ys >= 0) & (ys < size)
            canvas[ys[ok], xs[ok]] = YELLOW
    if len(kfc):
        px, py = _to_px(kfc[:, [0, 2]], bounds, size)
        for x, y in zip(px, py):
            if 1 <= x < size - 1 and 1 <= y < size - 1:
                canvas[y - 1 : y + 2, x - 1 : x + 2] = RED
    return canvas


def render_system(slam) -> np.ndarray:
    """One-call top-down snapshot of a System's map + trajectory."""
    import jax.numpy as jnp

    from ..models import map_state as ms

    m = slam.map
    centers = np.asarray(ms.keyframe_positions(m))
    _, poses = slam.get_trajectory()
    traj_c = (
        -np.einsum("nij,ni->nj", poses[:, :3, :3], poses[:, :3, 3])
        if len(poses) else None
    )
    return draw_map_topdown(
        np.asarray(m.pt_pos), np.asarray(m.pt_valid),
        centers, np.asarray(m.kf_valid), traj_c,
    )


def save_png(path: str, image: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(image).save(path)

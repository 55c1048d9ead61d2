"""Synthetic odometry-drift injection for reference-length loop benchmarks.

The synthetic renderer is noiseless, so our tracking accumulates no natural
drift over a re-traversed orbit — but the reference's signature behavior is
drift accumulating over thousands of frames until a loop closure + pose graph
+ GBA bends the whole map back (reference src/LoopClosing.cc:571-880; KITTI
00's big loop).  To exercise and MEASURE that path at reference length, these
helpers displace all map content OLDER than the newest few keyframes by a
small similarity increment each call — content created at keyframe j
accumulates displacement dD^(n-j), building smoothly along the chain exactly
like integrated odometry error.  Device-side (jittable, donates the map): the
injection costs the stream one fused elementwise pass, no host round trip.

The same harness (host-side numpy) validates loop closing at test scale in
tests/test_loop_closing.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.map_state import MapState
from ..ops import se3


def displace_old_content(
    m: MapState,
    dD: jnp.ndarray,              # [4, 4] SE3 increment applied to old world
    scale: jnp.ndarray,           # scalar: similarity scale (1.0 = rigid)
    keep_recent: int = 6,
) -> MapState:
    """One drift increment: world content older than the newest `keep_recent`
    keyframes moves by the similarity (scale, dD).

    Points:     p'   = scale * (R p + t)
    Keyframes:  R'cw = Rcw R^T,  t'cw = scale * (tcw - Rcw R^T t)
    so the transformed pose sees the transformed content at the ORIGINAL
    pixels with depth scaled by `scale` — the old sector stays internally
    consistent but displaced (and, for mono scale drift, re-scaled), exactly
    what integrated odometry error looks like at a revisit.
    """
    cutoff = jnp.max(jnp.where(m.kf_valid, m.kf_seq, -1)) - keep_recent
    kf_sel = (m.kf_seq >= 0) & (m.kf_seq <= cutoff) & m.kf_valid
    pt_sel = (m.pt_first_kf <= cutoff) & m.pt_valid

    R = dD[:3, :3]
    t = dD[:3, 3]
    p_new = scale * (m.pt_pos @ R.T + t)
    n_new = m.pt_normal @ R.T

    Rcw = m.kf_Tcw[:, :3, :3]
    tcw = m.kf_Tcw[:, :3, 3]
    Rcw_new = jnp.einsum("kij,lj->kil", Rcw, R)  # Rcw @ R^T
    # x_cam' = R'cw p' + t'cw = s*Rcw p + s*Rcw R^T t + t'cw = s*x_cam
    # requires t'cw = s*(tcw - Rcw R^T t)
    tcw_new = scale * (tcw - jnp.einsum("kij,j->ki", Rcw_new, t))
    T_new = m.kf_Tcw.at[:, :3, :3].set(Rcw_new).at[:, :3, 3].set(tcw_new)

    return m._replace(
        kf_Tcw=jnp.where(kf_sel[:, None, None], T_new, m.kf_Tcw),
        pt_pos=jnp.where(pt_sel[:, None], p_new, m.pt_pos),
        pt_normal=jnp.where(pt_sel[:, None], n_new, m.pt_normal),
    )


def make_injector(keep_recent: int = 6):
    """Jitted drift injector with the map donated through it (zero-copy on
    device between chunks)."""
    import functools

    return jax.jit(
        functools.partial(displace_old_content, keep_recent=keep_recent),
        donate_argnums=0)


def se3_increment(twist) -> jnp.ndarray:
    """Small SE3 increment from a 6-vector [t, omega] (host convenience)."""
    return se3.se3_exp(jnp.asarray(twist, jnp.float32))

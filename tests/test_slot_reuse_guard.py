"""Carried-observation slot-reuse guard (CheckReplacedInLastFrame analogue).

carry.last_obs_pt holds point IDs across frames.  A cull + free-list reuse
between two tracked frames can rebind a slot to a DIFFERENT 3D point; the
naked pt_valid check would silently accept the alias (the reference guards
the analogous replaced-point case with Tracking::CheckReplacedInLastFrame,
/root/reference/src/Tracking.cc:1152, via MapPoint::Replace forwarding,
/root/reference/src/MapPoint.cc:244).  Our guard stamps every point with a
unique birth id (map_state.add_points) and captures the stamps alongside the
carried ids; a stamp mismatch drops the carried association.
"""

import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.models import tracking
from self_commit_orb_slam2_tpu.models.system import System
from self_commit_orb_slam2_tpu.utils.synthetic import generate_sequence
from tests.test_slam_rgbd import make_config


def _tracked_system(n=6):
    seq = generate_sequence(n_frames=n + 1, width=320, height=240, seed=5)
    slam = System(make_config())
    for i in range(n):
        slam.track_rgbd(seq.images[i], seq.depths[i], float(i) / 30.0)
    return slam, seq


def test_birth_stamps_unique_and_carried():
    slam, _ = _tracked_system()
    m = slam.map
    birth = np.asarray(m.pt_birth)[np.asarray(m.pt_valid)]
    assert len(np.unique(birth)) == len(birth), "birth stamps must be unique"
    ids = np.asarray(slam.carry.last_obs_pt)
    stamps = np.asarray(slam.carry.last_obs_birth)
    sel = ids >= 0
    assert sel.sum() > 50
    np.testing.assert_array_equal(stamps[sel], np.asarray(m.pt_birth)[ids[sel]])


def test_reused_slot_is_dropped_by_guard():
    """Force a cull->reuse between two tracked frames: the same slot now
    holds a different point (new birth stamp).  With the guard the carried
    id must NOT be used; without it the alias WOULD be accepted (which is
    what makes this a real regression test, not a vacuous one)."""
    slam, seq = _tracked_system()
    m, carry = slam.map, slam.carry
    ids = np.asarray(carry.last_obs_pt)
    carried = np.unique(ids[ids >= 0])
    victim = int(carried[len(carried) // 2])

    # simulate cull + free-list reuse of slot `victim`: same slot, new point
    # (same position keeps it matchable, so only the stamp distinguishes it)
    slam.map = m = m._replace(pt_birth=m.pt_birth.at[victim].add(10_000))

    frame = carry.last_frame  # re-track the same frame: guaranteed matchable
    guarded = tracking.track_motion(
        slam.config, m, frame, carry.Tcw, jnp.eye(4), carry.last_frame,
        carry.last_obs_pt, jnp.float32(15.0),
        last_obs_birth=carry.last_obs_birth)
    unguarded = tracking.track_motion(
        slam.config, m, frame, carry.Tcw, jnp.eye(4), carry.last_frame,
        carry.last_obs_pt, jnp.float32(15.0))

    assert victim in np.asarray(unguarded.obs_pt), (
        "test premise broken: without the guard the alias is not even "
        "matchable — the guarded assertion below would be vacuous")
    assert victim not in np.asarray(guarded.obs_pt), (
        "carried observation of a reused slot survived the birth-stamp guard")

    # end-to-end: the full step must also run clean on the mutated map
    slam.track_rgbd(seq.images[6], seq.depths[6], 6 / 30.0)
    ids2 = np.asarray(slam.carry.last_obs_pt)
    stamps2 = np.asarray(slam.carry.last_obs_birth)
    sel = ids2 >= 0
    np.testing.assert_array_equal(
        stamps2[sel], np.asarray(slam.map.pt_birth)[ids2[sel]],
        err_msg="post-step carry stamps must be re-captured fresh")

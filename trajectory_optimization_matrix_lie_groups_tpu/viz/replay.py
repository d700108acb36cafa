"""Optional 3-D trajectory replay via the `rerun` viewer.

Host-side twin of the reference's rerun streaming
(`main_SE3ddp_tracking_exact_ms.py:216-250`): log the solved SE(3)
trajectory (and optionally the reference path) as timestamped
Points3D + Transform3D entities.  `rerun` is an optional dependency — when
absent, `replay_trajectory` degrades to the quat-pos `.npy` export
(`plots.export_quatpos`) that any external viewer (including a rerun
session elsewhere) can consume.
"""

import numpy as np


def _try_import_rerun():
    try:
        import rerun as rr  # type: ignore

        return rr
    except ImportError:
        return None


def replay_trajectory(qs, dt, q_ref=None, app_id="traopt_replay",
                      entity="solution", spawn=True, fallback_path=None):
    """Stream an SE(3) matrix trajectory ``qs`` (T+1, 4, 4) to rerun.

    Returns "rerun" when streamed, else the fallback `.npy` path (written
    when ``fallback_path`` is given) or None.
    """
    import jax.numpy as jnp

    from trajectory_optimization_matrix_lie_groups_tpu.ops import se3

    qp = np.asarray(se3.quatpos_from_matrix(jnp.asarray(qs)))  # (T+1, 7) wxyz+pos
    rr = _try_import_rerun()
    if rr is None:
        if fallback_path is not None:
            np.save(fallback_path, qp)
            return fallback_path
        return None

    rr.init(app_id, spawn=spawn)
    positions = qp[:, 4:]
    if q_ref is not None:
        ref_p = np.asarray(jnp.asarray(q_ref))[:, :3, 3]
        rr.log(f"{entity}/reference",
               rr.LineStrips3D([ref_p]), static=True)
    for step in range(qp.shape[0]):
        rr.set_time_seconds("sim_time", float(dt) * step)
        rr.log(f"{entity}/position", rr.Points3D(positions[step]))
        w, x, y, z = qp[step, :4]
        rr.log(f"{entity}/body",
               rr.Transform3D(translation=positions[step],
                              rotation=rr.Quaternion(xyzw=[x, y, z, w]),
                              axis_length=1.0))
    return "rerun"

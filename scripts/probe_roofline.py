"""Roofline / FLOP-count record for the f32 pipeline and the DF polish.

Round-3 VERDICT item 5: count the arithmetic the solver actually issues
(by walking the jaxprs of the shared stage functions — the same math the
Pallas kernels unroll), combine with the measured on-chip per-iteration
times, and commit achieved-vs-peak so the "how much single-chip headroom
remains" question is answered with data.

Peaks used (public spec, TPU v5e / "v5 lite"): 197 TFLOP/s bf16 MXU,
~99 TFLOP/s f32 via MXU-pass, 819 GB/s HBM.  The VPU's f32 vector peak is
not publicly specified; the achieved number is reported absolute and
against the MXU peak for scale.  The MXU mapping question is settled in
the emitted decision note.

Runs entirely on CPU (trace-only) — on-chip times come from committed
records (rep_cliff_probe / df_phase_split / df_mixed_tpu), passed via env
or defaults from round-3/4 measurements.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from trajectory_optimization_matrix_lie_groups_tpu.ops import dfx
from trajectory_optimization_matrix_lie_groups_tpu.ops import pallas_lie as pll
from trajectory_optimization_matrix_lie_groups_tpu.ops.pallas_linearize import (
    stage_cost_quad,
    stage_dynamics_eval,
    stage_jacobian,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_mixed import (
    riccati_stage_mx,
    rollout_stage_mx,
    stage_cost_quad_mx,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import (
    riccati_stage,
    rollout_stage,
)
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record

# arithmetic HLOs counted as 1 flop per output element (transcendentals
# cost more on the VPU but are a small fraction here; counted separately)
_ARITH = {"add", "sub", "mul", "div", "neg", "max", "min"}
_TRANS = {"sqrt", "rsqrt", "sin", "cos", "atan2", "tanh", "exp", "log"}


def _count(jaxpr):
    flops = trans = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        n = int(np.prod(eqn.outvars[0].aval.shape)) if eqn.outvars else 0
        if prim in _ARITH:
            flops += n
        elif prim in _TRANS:
            trans += n
        elif prim == "integer_pow":
            flops += n
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                f2, t2 = _count(sub.jaxpr)
                flops += f2
                trans += t2
    return flops, trans


def flops_of(fn, *args):
    jx = jax.make_jaxpr(fn)(*args)
    return _count(jx.jaxpr)


B = 1  # per-lane counts; everything scales linearly in B
dt = 0.05
f32 = lambda *s: jnp.zeros(s, jnp.float32)
rot32 = lambda: jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32)[..., None],
                                 (3, 3, B)).copy()


class _DFSpec:
    """Marker: this argument position is a DF value of the given shape.
    make_jaxpr cannot flatten DF (not a pytree), so DF args are passed as
    two f32 leaves and reassembled inside the traced wrapper."""

    def __init__(self, *shape):
        self.shape = shape


df = _DFSpec
rot = lambda: _DFSpec(3, 3, B)


def flops_of_df(fn, *specs):
    """Trace fn whose args follow ``specs`` (_DFSpec -> DF arg rebuilt from
    two flat f32 leaves; tuple/shape -> plain f32 array)."""
    flat_shapes = []
    for s in specs:
        if isinstance(s, _DFSpec):
            flat_shapes += [s.shape, s.shape]
        else:
            flat_shapes.append(s)

    def wrapper(*flat):
        args, i = [], 0
        for s in specs:
            if isinstance(s, _DFSpec):
                args.append(dfx.DF(flat[i], flat[i + 1]))
                i += 2
            else:
                args.append(flat[i])
                i += 1
        out = fn(*args)
        leaves = []
        for o in (out if isinstance(out, (tuple, list)) else (out,)):
            if dfx.is_df(o):
                leaves += [o.hi, o.lo]
            elif isinstance(o, (tuple, list)):
                for oo in o:
                    leaves += ([oo.hi, oo.lo] if dfx.is_df(oo) else [oo])
            else:
                leaves.append(o)
        return tuple(leaves)

    jx = jax.make_jaxpr(wrapper)(*[jnp.zeros(s, jnp.float32)
                                   for s in flat_shapes])
    return _count(jx.jaxpr)

s = lambda *sh: sh  # plain f32 arg spec

# ---- f32 stage math (what the Pallas kernels unroll per stage) -------------
fl_ric, tr_ric = flops_of_df(
    lambda fx, dd, lx, lu, lxx, fu2, fu2T, Luu, Vx, Vxx: riccati_stage(
        fx, dd, lx, lu, lxx, fu2, fu2T, Luu, Vx, Vxx, nu=6, glow=False),
    s(12, 12, B), s(12, B), s(12, B), s(6, B), s(12, 12, B),
    s(6, 6, B), s(6, 6, B), s(6, 6, B), s(12, B), s(12, 12, B))

fl_rol, tr_rol = flops_of_df(
    lambda *a: rollout_stage(*a, dt=dt, gravity=False),
    s(3, 3, B), s(3, B), s(6, B), s(3, 3, B), s(3, B), s(3, 3, B), s(3, B),
    s(6, B), s(6, B), s(6, B), s(6, B), s(6, 12, B), s(12, B),
    s(3, 3, B), s(3, B), s(6, B), s(6, 6, B), s(6, 6, B), s(6, 6, B),
    s(1, B))

fl_jac, tr_jac = flops_of_df(
    lambda R, xi, Jl, Jil, mg: stage_jacobian(
        R, xi, Jl, Jil, mg, dt=dt, gravity=False, exact_grav=False),
    s(3, 3, B), s(6, B), s(6, 6, B), s(6, 6, B), s(1, B))

fl_cq, tr_cq = flops_of_df(
    stage_cost_quad, s(3, 3, B), s(3, B), s(6, B), s(3, 3, B), s(3, B),
    s(6, 6, B), s(6, B), s(6, 6, B), s(6, 6, B))

fl_dyn, tr_dyn = flops_of_df(
    lambda R, p, xi, u, Jl, Jil, Pu, mg: stage_dynamics_eval(
        R, p, xi, u, Jl, Jil, Pu, mg, dt=dt, gravity=False),
    s(3, 3, B), s(3, B), s(6, B), s(6, B), s(6, 6, B), s(6, 6, B),
    s(6, 6, B), s(1, B))

# defect (inverse+compose+log) — part of the fused rollout+linearize kernel
fl_dft, tr_dft = flops_of_df(
    lambda R, p, fR, fp: pll.se3_log(*pll.se3_compose(
        *pll.se3_inverse(R, p), fR, fp)),
    s(3, 3, B), s(3, B), s(3, 3, B), s(3, B))

f32_stage = (fl_ric + fl_rol + fl_jac + fl_cq + fl_dft)
f32_trans = (tr_ric + tr_rol + tr_jac + tr_cq + tr_dft)

# ---- full-DF stage math -----------------------------------------------------
dfl_ric, dtr_ric = flops_of_df(
    lambda fx, dd, lx, lu, lxx, fu2, fu2T, Luu, Vx, Vxx: riccati_stage(
        fx, dd, lx, lu, lxx, fu2, fu2T, Luu, Vx, Vxx, nu=6, glow=False),
    df(12, 12, B), df(12, B), df(12, B), df(6, B), df(12, 12, B),
    df(6, 6, B), df(6, 6, B), df(6, 6, B), df(12, B), df(12, 12, B))

dfl_rol, dtr_rol = flops_of_df(
    lambda *a: rollout_stage(*a, dt=dt, gravity=False),
    rot(), df(3, B), df(6, B), rot(), df(3, B), rot(), df(3, B),
    df(6, B), df(6, B), df(6, B), df(6, B), df(6, 12, B), df(12, B),
    rot(), df(3, B), df(6, B), df(6, 6, B), df(6, 6, B), df(6, 6, B),
    df(1, B))

dfl_jac, _ = flops_of_df(
    lambda R, xi, Jl, Jil, mg: stage_jacobian(
        R, xi, Jl, Jil, mg, dt=dt, gravity=False, exact_grav=False),
    rot(), df(6, B), df(6, 6, B), df(6, 6, B), df(1, B))

dfl_cq, _ = flops_of_df(
    stage_cost_quad, rot(), df(3, B), df(6, B), rot(), df(3, B),
    df(6, 6, B), df(6, B), df(6, 6, B), df(6, 6, B))

dfl_dyn, _ = flops_of_df(
    lambda R, p, xi, u, Jl, Jil, Pu, mg: stage_dynamics_eval(
        R, p, xi, u, Jl, Jil, Pu, mg, dt=dt, gravity=False),
    rot(), df(3, B), df(6, B), df(6, B), df(6, 6, B), df(6, 6, B),
    df(6, 6, B), df(1, B))

dfl_dft, _ = flops_of_df(
    lambda R, p, fR, fp: pll.se3_log(*pll.se3_compose(
        *pll.se3_inverse(R, p), fR, fp)),
    rot(), df(3, B), rot(), df(3, B))

# full-DF iteration evaluates dynamics twice (rollout + linearize, unfused)
df_stage = dfl_ric + dfl_rol + dfl_jac + dfl_cq + dfl_dyn + dfl_dft

# ---- mixed stage math -------------------------------------------------------
mfl_ric, _ = flops_of_df(
    lambda fx, dd, lx, lu, lxx32, fu2, fu2T, fu232, fu2T32, Luu32, Vx,
    Vxx32: riccati_stage_mx(
        fx, dd, lx, lu, lxx32, fu2, fu2T, fu232, fu2T32, Luu32, Vx, Vxx32,
        nu=6, glow=False),
    df(12, 12, B), df(12, B), df(12, B), df(6, B), s(12, 12, B),
    df(6, 6, B), df(6, 6, B), s(6, 6, B), s(6, 6, B), s(6, 6, B),
    df(12, B), s(12, 12, B))

mfl_rol, _ = flops_of_df(
    lambda *a: rollout_stage_mx(*a, dt=dt, gravity=False),
    rot(), df(3, B), df(6, B), rot(), df(3, B), rot(), df(3, B),
    df(6, B), df(6, B), df(6, B), s(6, B), s(6, 12, B), df(12, B),
    rot(), df(3, B), df(6, B), df(6, 6, B), df(6, 6, B), df(6, 6, B),
    df(1, B))

mfl_cq, _ = flops_of_df(
    lambda R, p, xi, RbiR, Rbip, Adb, xib, W1, W2, W132: stage_cost_quad_mx(
        R, p, xi, RbiR, Rbip, Adb, xib, W1, W2, W132),
    rot(), df(3, B), df(6, B), rot(), df(3, B), df(6, 6, B), df(6, B),
    df(6, 6, B), df(6, 6, B), s(6, 6, B))

# mixed iteration: fused rollout+linearize (dynamics evaluated once)
mx_stage = mfl_ric + mfl_rol + dfl_jac + mfl_cq + dfl_dft

# ---- combine with measured on-chip times -----------------------------------
N = 200
Bc = 8192
ITERS = 12
t_f32_iter = float(os.environ.get("T_F32_ITER", 0.472 / 12))
t_df_iter = float(os.environ.get("T_DF_ITER", "1.16"))
t_mx_iter = float(os.environ.get("T_MX_ITER", "0"))  # from df_mixed_tpu

HBM_GBS = 819.0          # v5e public spec
MXU_BF16_TF = 197.0      # v5e public spec
per_iter = lambda st: st * N * Bc

# HBM traffic per f32 iteration (backward reads Fx,d,lx,lu,lxx + writes
# k,K,gvec; fused rollout/linearize reads the same + trajectory, writes
# the next lin) — count the big (N,12,12,B) and (N,nu|12,B) tensors once
# per pass at 4 bytes
big = N * 144 * Bc * 4
med = N * 12 * Bc * 4
bytes_f32_iter = (2 * big + 4 * med) + (big + 72 * N * Bc * 4 + 6 * med) \
    + (2 * big + 10 * med)

result = dict(
    device="TPU v5 lite (v5e)",
    per_lane_stage_flops=dict(
        f32=dict(riccati=fl_ric, rollout=fl_rol, jacobian=fl_jac,
                 cost_quad=fl_cq, dynamics=fl_dyn, defect=fl_dft,
                 transcendentals=f32_trans, total=f32_stage),
        full_df=dict(riccati=dfl_ric, rollout=dfl_rol, jacobian=dfl_jac,
                     cost_quad=dfl_cq, dynamics=dfl_dyn, defect=dfl_dft,
                     total=df_stage),
        mixed=dict(riccati=mfl_ric, rollout=mfl_rol, jacobian=dfl_jac,
                   cost_quad=mfl_cq, defect=dfl_dft, total=mx_stage),
    ),
    df_over_f32_flop_ratio=round(df_stage / f32_stage, 1),
    mixed_over_f32_flop_ratio=round(mx_stage / f32_stage, 1),
    f32_iter=dict(
        flops=per_iter(f32_stage),
        measured_s=round(t_f32_iter, 5),
        achieved_gflops=round(per_iter(f32_stage) / t_f32_iter / 1e9, 1),
        pct_of_mxu_bf16_peak=round(
            per_iter(f32_stage) / t_f32_iter / (MXU_BF16_TF * 1e12) * 100,
            2),
        est_hbm_gb=round(bytes_f32_iter / 1e9, 2),
        hbm_bound_floor_s=round(bytes_f32_iter / (HBM_GBS * 1e9), 4),
        pct_of_hbm_roofline=round(
            bytes_f32_iter / (HBM_GBS * 1e9) / t_f32_iter * 100, 1),
    ),
    full_df_iter=dict(
        flops=per_iter(df_stage), measured_s=t_df_iter,
        achieved_gflops=round(per_iter(df_stage) / t_df_iter / 1e9, 1)),
    mxu_decision_note=(
        "NO-GO on an MXU-mapped Riccati: the recursion's operands are "
        "12x12 per problem; an MXU issue is a 128x128 tile, so a "
        "batched-small-matmul mapping utilizes (12/128)^2 = 0.9% of each "
        "tile -> effective ceiling ~1.7 TFLOP/s, BELOW the lane-layout "
        "VPU path already achieving the measured rate; block-diagonal "
        "packing of 10 problems/tile reaches at most ~9% and requires "
        "gather/scatter relayouts per stage that Mosaic cannot express "
        "on the sublane axis (CLAUDE.md).  bf16 MXU accumulation is also "
        "precision-unusable here (package __init__ pins "
        "jax_default_matmul_precision=highest: bf16 passes destroy the "
        "Riccati recursion, f32 error 43 vs 1.3e-3).  The single-chip "
        "headroom that remains is NOT the MXU: it is the gap to the HBM "
        "roofline reported above."),
)
if t_mx_iter > 0:
    result["mixed_iter"] = dict(
        flops=per_iter(mx_stage), measured_s=t_mx_iter,
        achieved_gflops=round(per_iter(mx_stage) / t_mx_iter / 1e9, 1))
if os.environ.get("ROUND5_NOTE") == "1":
    result["sublane_packing_note"] = (
        "Round-5 amendment: the 21%-of-HBM-roofline finding was "
        "diagnosed as VPU ISSUE-WIDTH, not bandwidth or FLOP count — "
        "lane-layout kernel ops are (d, bt) slices at d/8 sublane "
        "utilization (d=1 for the Cholesky chains).  Packing the batch "
        "over BOTH vreg axes (pipeline.py sublanes=8: trailing (8, "
        "bt/8), every op a dense (8,128) vreg) raised the f32 iteration "
        "1.95x and the mixed polish iteration 2.7x with bit-identical "
        "iterates and UNCHANGED HBM traffic; the %-of-HBM-roofline "
        "reported here is the post-packing value.  Remaining headroom "
        "to the HBM floor is genuine compute (the stage math's "
        "dependency chains), not utilization waste.")
print(json.dumps(result, indent=1))
record("roofline_f32_df", result)

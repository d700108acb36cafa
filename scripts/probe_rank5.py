"""Mosaic feasibility probe: rank-5 blocks (chunk, d1, d2, 8, L) with the
batch riding (sublane, lane) — the round-5 sublane-packed layout candidate.
Checks compile + numerics of a riccati-stage-shaped op mix in both layouts.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, CK = 64, 4
D = 12


def kernel_lane(A_ref, v_ref, o_ref, acc, *, chunk):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc[:] = v_ref[0]
    x = acc[:]
    for t in range(chunk):
        A = A_ref[t]
        # matvec + a scalar-slice chain like the Cholesky's
        x = sum(A[:, k, :] * x[k:k + 1] for k in range(D)) + v_ref[t]
        s = x[0]
        for j in range(1, D):
            s = s * 0.5 + x[j]
        x = x + s[None]
        o_ref[t] = x
    acc[:] = x


def run(layout, B, interpret=False):
    # layout 'lane': (..., B); 'sub': (..., 8, B//8)
    bshape = (B,) if layout == "lane" else (8, B // 8)
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(N, D, D) + bshape) * 0.1, jnp.float32)
    v = jnp.asarray(rng.normal(size=(N, D) + bshape), jnp.float32)

    def spec(a):
        r = len(a.shape)
        return pl.BlockSpec((CK,) + a.shape[1:],
                            lambda b, i, r=r: (i,) + (0,) * (r - 1))

    f = pl.pallas_call(
        functools.partial(kernel_lane, chunk=CK),
        grid=(1, N // CK),
        out_shape=jax.ShapeDtypeStruct((N, D) + bshape, jnp.float32),
        in_specs=[spec(A), spec(v)], out_specs=spec(v),
        scratch_shapes=[pltpu.VMEM((D,) + bshape, jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    return jax.jit(f)(A, v)


if __name__ == "__main__":
    B = 1024
    t0 = time.perf_counter()
    out_lane = np.asarray(run("lane", B))
    print("lane ok", time.perf_counter() - t0, out_lane.shape)
    t0 = time.perf_counter()
    out_sub = np.asarray(run("sub", B))
    print("sub ok", time.perf_counter() - t0, out_sub.shape)
    # same numbers under the reshape b = s*(B//8) + l
    np.testing.assert_allclose(
        out_lane.reshape(N, D, 8, B // 8), out_sub, rtol=1e-6, atol=1e-6)
    print("MATCH")

"""Serial per-step oracle of the MS-iLQR iteration (reference control flow,
our Lie ops) used to cross-check the vectorized solver's intermediates.

This is NOT production code: plain Python loops, one stage at a time,
structured exactly like `traopt_controller.py:iLQR_Tracking_SE3_MS` so any
divergence between the scan/vmap engine and the reference semantics can be
bisected quantity-by-quantity.
"""

import numpy as np

import jax.numpy as jnp


def linearize(model, params, qs, xis, us):
    N = us.shape[0]
    d, Fx, Fu = [], [], []
    L, Lx, Lu, Lxx, Lux, Luu = [], [], [], [], [], []
    g = model.group
    for i in range(N):
        fq, fxi = model.step(params, qs[i], xis[i], us[i], i)
        d.append(np.concatenate([np.asarray(g.rminus(fq, qs[i + 1])),
                                 np.asarray(fxi - xis[i + 1])]))
        fx, fu = model.jac(params, qs[i], xis[i], us[i], i)
        Fx.append(np.asarray(fx)); Fu.append(np.asarray(fu))
        l, lx, lu, lxx, lux, luu = model.stage_quad(params, qs[i], xis[i], us[i], i)
        L.append(float(l)); Lx.append(np.asarray(lx)); Lu.append(np.asarray(lu))
        Lxx.append(np.asarray(lxx)); Lux.append(np.asarray(lux)); Luu.append(np.asarray(luu))
    lN, lNx, lNxx = model.term_quad(params, qs[N], xis[N], N)
    L.append(float(lN)); Lx.append(np.asarray(lNx)); Lxx.append(np.asarray(lNxx))
    return (np.array(d), np.array(Fx), np.array(Fu), np.array(L), np.array(Lx),
            np.array(Lu), np.array(Lxx), np.array(Lux), np.array(Luu))


def is_pos_def(A):
    if not np.array_equal(A, A.T):
        return False
    try:
        np.linalg.cholesky(A)
        return True
    except np.linalg.LinAlgError:
        return False


def backward(d, Fx, Fu, Lx, Lu, Lxx, Lux, Luu, mu, delta,
             mu_min=1e-6, mu_max=1e10, delta_0=2.0):
    """ref `_backward_pass` (traopt_controller.py:2912 / :1637)."""
    N = Fu.shape[0]
    n = Fx.shape[1]
    m = Fu.shape[2]
    V_x = np.empty((N + 1, n)); V_xx = np.empty((N + 1, n, n))
    V_x[N] = Lx[-1]; V_xx[N] = Lxx[-1]
    k = np.empty((N, m)); K = np.empty((N, m, n))
    for i in range(N - 1, -1, -1):
        while True:
            reg = mu * np.eye(n)
            Q_x = Lx[i] + Fx[i].T @ (V_x[i + 1] + V_xx[i + 1] @ d[i])
            Q_u = Lu[i] + Fu[i].T @ (V_x[i + 1] + V_xx[i + 1] @ d[i])
            Q_xx = Lxx[i] + Fx[i].T @ V_xx[i + 1] @ Fx[i]
            Q_ux = Lux[i] + Fu[i].T @ (V_xx[i + 1] + reg) @ Fx[i]
            Q_uu = Luu[i] + Fu[i].T @ (V_xx[i + 1] + reg) @ Fu[i]
            if not is_pos_def(Q_uu + Q_uu.T):
                delta = max(1.0, delta) * delta_0
                mu = max(mu_min, mu * delta)
                if mu >= mu_max:
                    break
            else:
                delta = min(1.0, delta) / delta_0
                mu *= delta
                if mu <= mu_min:
                    mu = 0.0
                break
        k[i] = -np.linalg.solve(Q_uu, Q_u)
        K[i] = -np.linalg.solve(Q_uu, Q_ux)
        V_x[i] = Q_x + K[i].T @ Q_uu @ k[i] + K[i].T @ Q_u + Q_ux.T @ k[i]
        V_xx[i] = Q_xx + K[i].T @ Q_uu @ K[i] + K[i].T @ Q_ux + Q_ux.T @ K[i]
        V_xx[i] = 0.5 * (V_xx[i] + V_xx[i].T)
    return k, K, V_x, V_xx, mu, delta


def gradient(d, Fu, Lu, V_x, V_xx):
    N = Fu.shape[0]
    gs = np.empty((N, Fu.shape[2]))
    s = 0.0
    for t in range(N - 1, -1, -1):
        gs[t] = Lu[t] + Fu[t].T @ (V_x[t + 1] + V_xx[t + 1].T @ d[t])
        s += np.linalg.norm(gs[t])
    return gs, s / N


def rollout_nonlinear(model, params, qs, xis, us, k, K, d, alpha=1.0):
    """ref `_rollout` nonlinear branch (traopt_controller.py:2697-2718)."""
    g = model.group
    N = us.shape[0]
    qs_new = [np.asarray(qs[0])]; xis_new = [np.asarray(xis[0])]
    us_new = np.empty_like(np.asarray(us))
    dim = g.dim
    for i in range(N):
        q_new, xi_new = jnp.asarray(qs_new[i]), jnp.asarray(xis_new[i])
        q, xi = qs[i], xis[i]
        xs_err = np.concatenate([np.asarray(g.rminus(q_new, q)),
                                 np.asarray(xi_new - xi)])
        us_err = alpha * k[i] + K[i] @ xs_err
        us_new[i] = np.asarray(us[i]) + us_err
        fq_new, fxi_new = model.step(params, q_new, xi_new, jnp.asarray(us_new[i]), i)
        fq, fxi = model.step(params, q, xi, us[i], i)
        q_nn = np.asarray(qs[i + 1]) @ np.asarray(g.exp(alpha * jnp.asarray(d[i][:dim]))) \
            @ np.asarray(g.inverse(fq)) @ np.asarray(fq_new)
        xi_nn = np.asarray(xis[i + 1]) + np.asarray(fxi_new) - np.asarray(fxi) + alpha * d[i][dim:]
        qs_new.append(q_nn); xis_new.append(xi_nn)
    return np.array(qs_new), np.array(xis_new), us_new

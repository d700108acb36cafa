// Serial SE(3) multiple-shooting iLQR runtime (C++, double precision).
//
// Native executor for the MPC/throughput configuration of the framework's
// solvers (fixed iteration budget, mu = 0, alpha = 1 gap-closing rollout) —
// the same iterate sequence as solvers/batched.FastBatchSolver /
// backward='sequential_fixed' in solvers/lie_ilqr.py, so it cross-checks the
// JAX engines implementation-independently and serves as a deployable
// host/embedded runtime where a TPU is not attached.  The reference gets the
// equivalent role from Python loops over manif C++ calls
// (traoptlibrary/traopt_controller.py:2641-2821); here the whole hot loop is
// native.
//
// Models: SE(3) free rigid body, rigid body under gravity, and the 4-input
// drone (6x4 Pu projection) — semi-implicit Euler (traopt_dynamics.py:763,
// 1049, 1373) with the reference's f_x coadjoint-swap quirk
// (traopt_dynamics.py:819,832) and its gravity-Jacobian quirk (no m*g
// factor in J_xi_q, traopt_dynamics.py:1121-1134); see models/dynamics.py.
// Cost: left-difference Gauss-Newton tracking (traopt_cost.py:578-702).
#include <cstring>
#include <vector>

#include "lie.hpp"

namespace traopt {
namespace {

constexpr int NX = 12;
constexpr int NU = 6;  // max control dim; the model's nu may be smaller

struct Model {
  double J[36];
  double Jinv[36];
  double dt;
  double Q1[36], Q2[36], R[NU * NU], P1[36], P2[36];
  double Pu[6 * NU];  // (6, nu) input projection (identity for free body)
  double mg;          // m * g (0 disables the gravity wrench + Fx block)
  bool gravity;
  int nu;
  std::vector<SE3> q_ref, q_ref_inv;
  std::vector<double> Ad_ref;  // (N+1) * 36
  std::vector<double> xi_ref;  // (N+1) * 6
};

// R^T * (0,0,-1): body-frame down direction
void body_down(const SE3& q, double* out) {
  out[0] = -q.R[6];
  out[1] = -q.R[7];
  out[2] = -q.R[8];
}

// xi_next = xi + dt * Jinv (coad(xi) J xi + [0; m g R^T down] + Pu u)
// (models/dynamics.py:196 free body, :287 gravity/drone)
void twist_step(const Model& M, const SE3& q, const double* xi,
                const double* u, double* xi_next) {
  double Jxi[6], C[36], w[6];
  mat_vec(Jxi, M.J, xi, 6, 6);
  se3_coad(C, xi);
  mat_vec(w, C, Jxi, 6, 6);
  double pu_u[6];
  mat_vec(pu_u, M.Pu, u, 6, M.nu);
  for (int i = 0; i < 6; ++i) w[i] += pu_u[i];
  if (M.gravity) {
    double dwn[3];
    body_down(q, dwn);
    for (int i = 0; i < 3; ++i) w[3 + i] += M.mg * dwn[i];
  }
  double dxi[6];
  mat_vec(dxi, M.Jinv, w, 6, 6);
  for (int i = 0; i < 6; ++i) xi_next[i] = xi[i] + M.dt * dxi[i];
}

void pose_step(const Model& M, const SE3& q, const double* xi, SE3* q_next) {
  double tau[6];
  for (int i = 0; i < 6; ++i) tau[i] = xi[i] * M.dt;
  SE3 E;
  se3_exp(&E, tau);
  se3_compose(q_next, q, E);
  se3_normalize(q_next);
}

// Fx per models/dynamics.py:234 (with ref_coad_swap); the gravity family
// adds J_xi_q = Jinv [[0,0],[hat(R^T down),0]] dt (the reference omits the
// m*g factor — quirk #2, models/dynamics.py; traopt_dynamics.py:1121-1134)
void dynamics_jacobian(const Model& M, const SE3& q, const double* xi,
                       double* Fx) {
  double tau[6], ntau[6];
  for (int i = 0; i < 6; ++i) { tau[i] = xi[i] * M.dt; ntau[i] = -tau[i]; }
  SE3 Einv;
  se3_exp(&Einv, ntau);
  double Jqq[36], Jqxi[36];
  se3_Ad(Jqq, Einv);                 // Ad(Exp(tau))^-1
  se3_right_jacobian(Jqxi, tau);     // * dt below
  // H = Jinv (coad(swap(xi)) J + G),  G = [[hat(Ib w), m hat(v)],[m hat(v),0]]
  double xi_sw[6] = {xi[3], xi[4], xi[5], xi[0], xi[1], xi[2]};
  double C[36], CJ[36], G[36], Gw[9], Gv[9], S[36], H[36];
  se3_coad(C, xi_sw);
  mat_mul(CJ, C, M.J, 6, 6, 6);
  double Ibw[3];
  // Ib = J[:3,:3]; m = J[4][4]
  for (int i = 0; i < 3; ++i) {
    Ibw[i] = 0.0;
    for (int j = 0; j < 3; ++j) Ibw[i] += M.J[i * 6 + j] * xi[j];
  }
  so3_hat(Gw, Ibw);
  double mv[3] = {M.J[28] * xi[3], M.J[28] * xi[4], M.J[28] * xi[5]};
  so3_hat(Gv, mv);
  std::memset(G, 0, sizeof(G));
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      G[i * 6 + j] = Gw[i * 3 + j];
      G[i * 6 + (j + 3)] = Gv[i * 3 + j];
      G[(i + 3) * 6 + j] = Gv[i * 3 + j];
    }
  for (int i = 0; i < 36; ++i) S[i] = CJ[i] + G[i];
  mat_mul(H, M.Jinv, S, 6, 6, 6);
  std::memset(Fx, 0, NX * NX * sizeof(double));
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 6; ++j) {
      Fx[i * NX + j] = Jqq[i * 6 + j];
      Fx[i * NX + (j + 6)] = Jqxi[i * 6 + j] * M.dt;
      Fx[(i + 6) * NX + (j + 6)] = (i == j ? 1.0 : 0.0) + M.dt * H[i * 6 + j];
    }
  if (M.gravity) {
    double dwn[3], hd[9], B6[36], L[36];
    body_down(q, dwn);
    so3_hat(hd, dwn);
    std::memset(B6, 0, sizeof(B6));
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) B6[(3 + r) * 6 + c] = hd[r * 3 + c];
    mat_mul(L, M.Jinv, B6, 6, 6, 6);
    for (int i = 0; i < 6; ++i)
      for (int j = 0; j < 6; ++j) Fx[(i + 6) * NX + j] = M.dt * L[i * 6 + j];
  }
}

// GN tracking quadratization at stage i with weights (W1, W2)
// (models/costs.py:103: e = Log(q q_ref^-1), J_e_x = Jr^-1(e) Ad_ref)
void cost_quad(const Model& M, const SE3& q, const double* xi, int i,
               const double* W1, const double* W2, double* l, double* lx,
               double* lxx) {
  SE3 Eq;
  se3_compose(&Eq, q, M.q_ref_inv[i]);
  double e[6], ev[6];
  se3_log(e, Eq);
  for (int k = 0; k < 6; ++k) ev[k] = xi[k] - M.xi_ref[i * 6 + k];
  double Jri[36], Jex[36], JT[36], JTW[36], He[36];
  se3_right_jacobian_inv(Jri, e);
  mat_mul(Jex, Jri, M.Ad_ref.data() + i * 36, 6, 6, 6);
  mat_T(JT, Jex, 6, 6);
  mat_mul(JTW, JT, W1, 6, 6, 6);
  mat_mul(He, JTW, Jex, 6, 6, 6);
  double W1e[6], W2ev[6], g1[6];
  mat_vec(W1e, W1, e, 6, 6);
  mat_vec(W2ev, W2, ev, 6, 6);
  mat_vec(g1, JT, W1e, 6, 6);
  std::memset(lxx, 0, NX * NX * sizeof(double));
  for (int a = 0; a < 6; ++a) {
    lx[a] = 2.0 * g1[a];
    lx[a + 6] = 2.0 * W2ev[a];
    for (int b = 0; b < 6; ++b) {
      lxx[a * NX + b] = 2.0 * He[a * 6 + b];
      lxx[(a + 6) * NX + (b + 6)] = 2.0 * W2[a * 6 + b];
    }
  }
  double s = 0.0;
  for (int a = 0; a < 6; ++a) s += e[a] * W1e[a] + ev[a] * W2ev[a];
  *l = s;
}

struct Workspace {
  std::vector<SE3> qs, fq;
  std::vector<double> xis, fxi, Fx, d, lx, lxx, lu, k, K, l;
  void resize(int N, int nu) {
    qs.resize(N + 1);
    fq.resize(N);
    xis.resize((N + 1) * 6);
    fxi.resize(N * 6);
    Fx.resize(N * NX * NX);
    d.resize(N * NX);
    lx.resize((N + 1) * NX);
    lxx.resize((N + 1) * NX * NX);
    lu.resize(N * nu);
    k.resize(N * nu);
    K.resize(N * nu * NX);
    l.resize(N + 1);
  }
};

int solve_one(const Model& M, int N, int iters, const SE3& q0,
              const double* xi0, double* us, double* J_out,
              double* grad_out) {
  const int nu = M.nu;
  Workspace W;
  W.resize(N, nu);
  // init: x0 + reference tail (solvers/batched.py:209)
  W.qs[0] = q0;
  std::memcpy(&W.xis[0], xi0, 6 * sizeof(double));
  for (int i = 1; i <= N; ++i) {
    W.qs[i] = M.q_ref[i];
    std::memcpy(&W.xis[i * 6], &M.xi_ref[i * 6], 6 * sizeof(double));
  }
  double JiPu[6 * NU];
  mat_mul(JiPu, M.Jinv, M.Pu, 6, 6, nu);
  double Fu[NX * NU];
  std::memset(Fu, 0, NX * nu * sizeof(double));
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < nu; ++j) Fu[(i + 6) * nu + j] = JiPu[i * nu + j] * M.dt;
  double Luu[NU * NU];
  for (int i = 0; i < nu * nu; ++i) Luu[i] = 2.0 * M.R[i];

  double J_total = 0.0, grad_mean = 0.0;
  for (int it = 0; it < iters; ++it) {
    // ---- linearize ------------------------------------------------------
    J_total = 0.0;
    for (int i = 0; i < N; ++i) {
      const SE3& q = W.qs[i];
      const double* xi = &W.xis[i * 6];
      const double* u = &us[i * nu];
      pose_step(M, q, xi, &W.fq[i]);
      twist_step(M, q, xi, u, &W.fxi[i * 6]);
      dynamics_jacobian(M, q, xi, &W.Fx[i * NX * NX]);
      // defect d = [Log(q_{i+1}^-1 fq), fxi - xi_{i+1}]
      SE3 qn_inv, D;
      se3_inverse(&qn_inv, W.qs[i + 1]);
      se3_compose(&D, qn_inv, W.fq[i]);
      se3_log(&W.d[i * NX], D);
      for (int a = 0; a < 6; ++a)
        W.d[i * NX + 6 + a] = W.fxi[i * 6 + a] - W.xis[(i + 1) * 6 + a];
      cost_quad(M, q, xi, i, M.Q1, M.Q2, &W.l[i], &W.lx[i * NX],
                &W.lxx[i * NX * NX]);
      double Ru[NU];
      mat_vec(Ru, M.R, u, nu, nu);
      for (int a = 0; a < nu; ++a) {
        W.lu[i * nu + a] = 2.0 * Ru[a];
        W.l[i] += u[a] * Ru[a];
      }
      J_total += W.l[i];
    }
    cost_quad(M, W.qs[N], &W.xis[N * 6], N, M.P1, M.P2, &W.l[N],
              &W.lx[N * NX], &W.lxx[N * NX * NX]);
    J_total += W.l[N];

    // ---- Riccati backward (mu = 0) --------------------------------------
    double Vx[NX], Vxx[NX * NX];
    std::memcpy(Vx, &W.lx[N * NX], sizeof(Vx));
    std::memcpy(Vxx, &W.lxx[N * NX * NX], sizeof(Vxx));
    double grad_sum = 0.0;
    for (int i = N - 1; i >= 0; --i) {
      const double* fx = &W.Fx[i * NX * NX];
      const double* dd = &W.d[i * NX];
      double Vmod[NX];
      mat_vec(Vmod, Vxx, dd, NX, NX);
      for (int a = 0; a < NX; ++a) Vmod[a] += Vx[a];
      double Qx[NX], Qu[NU], fxT[NX * NX], fuT[NU * NX];
      mat_T(fxT, fx, NX, NX);
      mat_T(fuT, Fu, NX, nu);
      mat_vec(Qx, fxT, Vmod, NX, NX);
      mat_vec(Qu, fuT, Vmod, nu, NX);
      for (int a = 0; a < NX; ++a) Qx[a] += W.lx[i * NX + a];
      for (int a = 0; a < nu; ++a) Qu[a] += W.lu[i * nu + a];
      // gradient bookkeeping: g_i = lu + Fu^T (Vx1 + Vxx1 d)
      {
        double n = 0.0;
        for (int a = 0; a < nu; ++a) n += Qu[a] * Qu[a];
        grad_sum += std::sqrt(n);
      }
      double VF[NX * NX], Qxx[NX * NX], Qux[NU * NX], Quu[NU * NU];
      mat_mul(VF, Vxx, fx, NX, NX, NX);
      mat_mul(Qxx, fxT, VF, NX, NX, NX);
      mat_mul(Qux, fuT, VF, nu, NX, NX);
      double VFu[NX * NU];
      mat_mul(VFu, Vxx, Fu, NX, NX, nu);
      mat_mul(Quu, fuT, VFu, nu, NX, nu);
      for (int a = 0; a < NX * NX; ++a) Qxx[a] += W.lxx[i * NX * NX + a];
      for (int a = 0; a < nu * nu; ++a) Quu[a] += Luu[a];
      double* k_i = &W.k[i * nu];
      double* K_i = &W.K[i * nu * NX];
      if (!chol_solve(K_i, Quu, Qux, nu, NX)) return 1;
      double ksol[NU];
      if (!chol_solve(ksol, Quu, Qu, nu, 1)) return 1;
      for (int a = 0; a < nu * NX; ++a) K_i[a] = -K_i[a];
      for (int a = 0; a < nu; ++a) k_i[a] = -ksol[a];
      // Vx  = Qx + K^T Quu k + K^T Qu + Qux^T k
      // Vxx = Qxx + K^T Quu K + K^T Qux + Qux^T K   (symmetrized)
      double KT[NX * NU], KTQ[NX * NU], QuxT[NX * NU];
      mat_T(KT, K_i, nu, NX);
      mat_mul(KTQ, KT, Quu, NX, nu, nu);
      mat_T(QuxT, Qux, nu, NX);
      double t1[NX], t2[NX], t3[NX];
      mat_vec(t1, KTQ, k_i, NX, nu);
      mat_vec(t2, KT, Qu, NX, nu);
      mat_vec(t3, QuxT, k_i, NX, nu);
      for (int a = 0; a < NX; ++a) Vx[a] = Qx[a] + t1[a] + t2[a] + t3[a];
      double M1[NX * NX], M2[NX * NX], M3[NX * NX];
      mat_mul(M1, KTQ, K_i, NX, nu, NX);
      mat_mul(M2, KT, Qux, NX, nu, NX);
      mat_mul(M3, QuxT, K_i, NX, nu, NX);
      for (int a = 0; a < NX; ++a)
        for (int b = 0; b < NX; ++b) {
          double vab = Qxx[a * NX + b] + M1[a * NX + b] + M2[a * NX + b] +
                       M3[a * NX + b];
          Vxx[a * NX + b] = vab;
        }
      for (int a = 0; a < NX; ++a)
        for (int b = a + 1; b < NX; ++b) {
          double s = 0.5 * (Vxx[a * NX + b] + Vxx[b * NX + a]);
          Vxx[a * NX + b] = Vxx[b * NX + a] = s;
        }
    }
    grad_mean = grad_sum / N;

    // ---- gap-closing rollout, alpha = 1 (solvers/batched.py:164) --------
    // Every stage reads the OLD trajectory (qs, xis); the new one goes into
    // separate buffers and is swapped in afterwards.
    std::vector<SE3> qs_new(N + 1);
    std::vector<double> xis_new((N + 1) * 6);
    qs_new[0] = W.qs[0];
    std::memcpy(&xis_new[0], &W.xis[0], 6 * sizeof(double));
    SE3 q_new = W.qs[0];
    double xi_new[6];
    std::memcpy(xi_new, &W.xis[0], sizeof(xi_new));
    for (int i = 0; i < N; ++i) {
      double xs_err[NX];
      SE3 qi_inv, Eq;
      se3_inverse(&qi_inv, W.qs[i]);
      se3_compose(&Eq, qi_inv, q_new);
      se3_log(xs_err, Eq);
      for (int a = 0; a < 6; ++a)
        xs_err[6 + a] = xi_new[a] - W.xis[i * 6 + a];
      double u_new[NU];
      mat_vec(u_new, &W.K[i * nu * NX], xs_err, nu, NX);
      for (int a = 0; a < nu; ++a)
        u_new[a] += us[i * nu + a] + W.k[i * nu + a];
      SE3 fq_new;
      double fxi_new[6];
      pose_step(M, q_new, xi_new, &fq_new);
      twist_step(M, q_new, xi_new, u_new, fxi_new);
      // q_nn = normalize(q_{i+1} Exp(d_q) fq_old^-1 fq_new)
      SE3 Ed, fq_inv, A, B, q_nn;
      se3_exp(&Ed, &W.d[i * NX]);
      se3_inverse(&fq_inv, W.fq[i]);
      se3_compose(&A, W.qs[i + 1], Ed);
      se3_compose(&B, A, fq_inv);
      se3_compose(&q_nn, B, fq_new);
      se3_normalize(&q_nn);
      double xi_nn[6];
      for (int a = 0; a < 6; ++a)
        xi_nn[a] = W.xis[(i + 1) * 6 + a] + fxi_new[a] - W.fxi[i * 6 + a] +
                   W.d[i * NX + 6 + a];
      std::memcpy(&us[i * nu], u_new, nu * sizeof(double));
      q_new = q_nn;
      std::memcpy(xi_new, xi_nn, sizeof(xi_nn));
      qs_new[i + 1] = q_nn;
      std::memcpy(&xis_new[(i + 1) * 6], xi_nn, sizeof(xi_nn));
    }
    W.qs.swap(qs_new);
    W.xis.swap(xis_new);
  }
  if (J_out) *J_out = J_total;
  if (grad_out) *grad_out = grad_mean;
  return 0;
}

// g = 0 + Pu = null selects the free body (identity projection, nu = 6);
// g > 0 enables the gravity wrench + Fx block; Pu (6 x nu) the drone family.
void build_model(Model* M, const double* J6, double dt, double g,
                 const double* Pu, int nu, const double* Q12,
                 const double* Rnu, const double* P12, const double* q_ref,
                 const double* xi_ref, int N) {
  std::memcpy(M->J, J6, sizeof(M->J));
  double I6[36];
  std::memset(I6, 0, sizeof(I6));
  for (int i = 0; i < 6; ++i) I6[i * 6 + i] = 1.0;
  chol_solve(M->Jinv, J6, I6, 6, 6);
  M->dt = dt;
  M->nu = nu;
  // m = J[3,3] (translational block is m*I, models/dynamics.py:268)
  M->mg = J6[3 * 6 + 3] * g;
  M->gravity = g != 0.0;
  std::memset(M->Pu, 0, sizeof(M->Pu));
  if (Pu) {
    std::memcpy(M->Pu, Pu, 6 * nu * sizeof(double));
  } else {
    for (int i = 0; i < 6 && i < nu; ++i) M->Pu[i * nu + i] = 1.0;
  }
  for (int a = 0; a < 6; ++a)
    for (int b = 0; b < 6; ++b) {
      M->Q1[a * 6 + b] = Q12[a * 12 + b];
      M->Q2[a * 6 + b] = Q12[(a + 6) * 12 + (b + 6)];
      M->P1[a * 6 + b] = P12[a * 12 + b];
      M->P2[a * 6 + b] = P12[(a + 6) * 12 + (b + 6)];
    }
  std::memcpy(M->R, Rnu, nu * nu * sizeof(double));
  M->q_ref.resize(N + 1);
  M->q_ref_inv.resize(N + 1);
  M->Ad_ref.resize((N + 1) * 36);
  M->xi_ref.assign(xi_ref, xi_ref + (N + 1) * 6);
  for (int i = 0; i <= N; ++i) {
    const double* T = q_ref + i * 16;
    for (int r = 0; r < 3; ++r) {
      for (int c = 0; c < 3; ++c) M->q_ref[i].R[r * 3 + c] = T[r * 4 + c];
      M->q_ref[i].p[r] = T[r * 4 + 3];
    }
    se3_inverse(&M->q_ref_inv[i], M->q_ref[i]);
    se3_Ad(M->Ad_ref.data() + i * 36, M->q_ref[i]);
  }
}

}  // namespace
}  // namespace traopt

extern "C" {

// Solve one rigid-body tracking MS-iLQR problem (free body: g = 0,
// Pu = null, nu = 6; gravity: g > 0; drone: Pu 6x4, nu = 4).  Layout:
// row-major doubles; q_ref (N+1)x4x4 homogeneous, us Nxnu in/out.
int traopt_rb_ms_ilqr_solve(const double* J6, double dt, double g,
                            const double* Pu, int nu, const double* Q12,
                            const double* Rnu, const double* P12,
                            const double* q_ref, const double* xi_ref, int N,
                            int iters, const double* q0_16, const double* xi0,
                            double* us, double* J_out, double* grad_out) {
  traopt::Model M;
  traopt::build_model(&M, J6, dt, g, Pu, nu, Q12, Rnu, P12, q_ref, xi_ref, N);
  traopt::SE3 q0;
  for (int r = 0; r < 3; ++r) {
    for (int c = 0; c < 3; ++c) q0.R[r * 3 + c] = q0_16[r * 4 + c];
    q0.p[r] = q0_16[r * 4 + 3];
  }
  return traopt::solve_one(M, N, iters, q0, xi0, us, J_out, grad_out);
}

// Batch front-end: B independent problems sharing the model/reference.
int traopt_rb_ms_ilqr_solve_batch(const double* J6, double dt, double g,
                                  const double* Pu, int nu,
                                  const double* Q12, const double* Rnu,
                                  const double* P12, const double* q_ref,
                                  const double* xi_ref, int N, int iters,
                                  int B, const double* q0s_16,
                                  const double* xi0s, double* us,
                                  double* J_outs, double* grad_outs) {
  traopt::Model M;
  traopt::build_model(&M, J6, dt, g, Pu, nu, Q12, Rnu, P12, q_ref, xi_ref, N);
  int rc = 0;
  for (int b = 0; b < B; ++b) {
    traopt::SE3 q0;
    const double* T = q0s_16 + b * 16;
    for (int r = 0; r < 3; ++r) {
      for (int c = 0; c < 3; ++c) q0.R[r * 3 + c] = T[r * 4 + c];
      q0.p[r] = T[r * 4 + 3];
    }
    int r1 = traopt::solve_one(M, N, iters, q0, xi0s + b * 6,
                               us + b * N * nu,
                               J_outs ? J_outs + b : nullptr,
                               grad_outs ? grad_outs + b : nullptr);
    if (r1) rc = r1;
  }
  return rc;
}

// Back-compat free-body entry points (identity Pu, nu = 6, g = 0).
int traopt_se3_ms_ilqr_solve(const double* J6, double dt, const double* Q12,
                             const double* R6, const double* P12,
                             const double* q_ref, const double* xi_ref, int N,
                             int iters, const double* q0_16, const double* xi0,
                             double* us, double* J_out, double* grad_out) {
  return traopt_rb_ms_ilqr_solve(J6, dt, 0.0, nullptr, 6, Q12, R6, P12,
                                 q_ref, xi_ref, N, iters, q0_16, xi0, us,
                                 J_out, grad_out);
}

int traopt_se3_ms_ilqr_solve_batch(const double* J6, double dt,
                                   const double* Q12, const double* R6,
                                   const double* P12, const double* q_ref,
                                   const double* xi_ref, int N, int iters,
                                   int B, const double* q0s_16,
                                   const double* xi0s, double* us,
                                   double* J_outs, double* grad_outs) {
  return traopt_rb_ms_ilqr_solve_batch(J6, dt, 0.0, nullptr, 6, Q12, R6, P12,
                                       q_ref, xi_ref, N, iters, B, q0s_16,
                                       xi0s, us, J_outs, grad_outs);
}
}

"""Reference-architecture CPU baseline for the cube-toss benchmark.

The reference stack (Drake + drake_pytorch + sappy) cannot run in this
image, so this script measures a faithful stand-in: the same ContactNets
training-step math — cube terms (mass matrix, box-plane contact kinematics,
contact Jacobian), Lorentz-cone QP solve by projected gradient, loss, and
``loss.backward()`` + Adam — implemented in PyTorch CPU float64, exactly
the reference's execution model (single-process torch CPU, float64 per
``/root/reference/dair_pll/inertia.py:96``). Batching uses torch
broadcasting, which is *more* favorable than the reference's
``max_batch_dim=1`` serialization (``system.py:113-124``), so the measured
baseline is an upper bound on reference throughput.

Writes ``baseline_cpu.json`` with contact transitions/sec. Run once; the
result is cached for ``bench.py``.
"""
import json
import time

import torch

torch.set_default_dtype(torch.float64)

CUBE_MASS = 0.37
CUBE_INERTIA = 0.00081
CUBE_HALF = 0.0524
CUBE_MU_COMBINED = 2 * 1.0 * 0.15 / (1.0 + 0.15)
DT = 0.0068
N_C = 4  # box-plane witness points
SOLVER_ITERS = 200

_CORNERS = torch.tensor(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
     for sz in (-1.0, 1.0)])


def quat_to_matrix(q):
    w, x, y, z = q.unbind(-1)
    return torch.stack([
        torch.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                     2 * (x * z + w * y)], -1),
        torch.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                     2 * (y * z - w * x)], -1),
        torch.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                     1 - 2 * (x * x + y * y)], -1),
    ], -2)


def cube_terms(q, v, half_lengths, mu, inertia_diag, mass):
    """phi, J, M, a_nc for the cube-on-plane system (batched)."""
    B = q.shape[0]
    R = quat_to_matrix(q[:, :4])
    pos = q[:, 4:7]
    vertices = _CORNERS.to(q) * half_lengths.abs()
    corners_w = torch.einsum("bij,cj->bci", R, vertices) + pos[:, None, :]
    heights = corners_w[..., 2]
    idx = heights.topk(N_C, dim=-1, largest=False).indices
    batch_arange = torch.arange(B)[:, None]
    phi = heights[batch_arange, idx]
    p_c_w = torch.einsum(
        "bij,bcj->bci", R, vertices[None].expand(B, -1, -1)[
            batch_arange, idx])

    # Contact Jacobian wrt v = [omega_B, v_W]: v_c = v_W + R(omega_B x r_B)
    # => J_w block = -S(p_c_w) R, J_v block = I.
    def skew(p):
        zero = torch.zeros_like(p[..., 0])
        return torch.stack([
            torch.stack([zero, -p[..., 2], p[..., 1]], -1),
            torch.stack([p[..., 2], zero, -p[..., 0]], -1),
            torch.stack([-p[..., 1], p[..., 0], zero], -1)], -2)

    Jw = -skew(p_c_w) @ R[:, None]
    Jv = torch.eye(3).expand(B, N_C, 3, 3)
    J_pt = torch.cat((Jw, Jv), -1)                     # (B, N_C, 3, 6)
    J_n = J_pt[:, :, 2, :]
    J_t = (mu * J_pt[:, :, :2, :]).reshape(B, 2 * N_C, 6)
    J = torch.cat((J_n, J_t), 1)                       # (B, 3N_C, 6)

    M = torch.zeros(B, 6, 6, dtype=q.dtype)
    I_world = R @ torch.diag_embed(inertia_diag.abs().expand(B, 3)) @ \
        R.transpose(-1, -2)
    M[:, :3, :3] = torch.einsum(
        "bij,bjk->bik", R.transpose(-1, -2) @ I_world, R)
    M[:, 3:, 3:] = mass.abs() * torch.eye(3)
    # body-frame angular convention: M_ww = I_body (R^T I_world R).
    a_nc = torch.zeros(B, 6, dtype=q.dtype)
    a_nc[:, 5] = -9.81
    return phi, J, M, a_nc


def project_cone(x):
    k = x.shape[-1] // 3
    n = x[..., :k]
    t = x[..., k:].reshape(*x.shape[:-1], k, 2)
    s = t.norm(dim=-1).clamp_min(1e-15)
    inside = s <= n
    polar = s <= -n
    h = 0.5 * (n + s)
    n_new = torch.where(inside, n, torch.where(polar, torch.zeros_like(n),
                                               h))
    scale = torch.where(inside, torch.ones_like(s),
                        torch.where(polar, torch.zeros_like(s), h / s))
    t_new = (t * scale[..., None]).reshape(*x.shape[:-1], 2 * k)
    return torch.cat((n_new, t_new), -1)


def solve_qp(Q, q_vec, iters=SOLVER_ITERS):
    L = torch.linalg.matrix_norm(Q, ord=2).unsqueeze(-1) * 1.1
    x = torch.zeros_like(q_vec)
    y = x.clone()
    t = torch.ones(Q.shape[0], 1, dtype=Q.dtype)
    for _ in range(iters):
        grad = torch.einsum("bij,bj->bi", Q, y) + q_vec
        x_new = project_cone(y - grad / L)
        t_new = 0.5 * (1 + (1 + 4 * t * t).sqrt())
        y = x_new + ((t - 1) / t_new) * (x_new - x)
        x, t = x_new, t_new
    return x


def _cone_rows(k):
    """Stacked-layout row indices per cone: [normal, t_x, t_y]."""
    return [[c, k + 2 * c, k + 2 * c + 1] for c in range(k)]


def _projection_jacobian_blocks(z):
    """Per-cone generalized projection Jacobians ``(B, k, 3, 3)`` at the
    cone-major points ``z (B, k, 3)``."""
    n = z[..., 0]
    t = z[..., 1:]
    s = t.norm(dim=-1).clamp_min(1e-15)
    hat = t / s[..., None]
    in_cone = s <= n
    in_polar = s <= -n
    h_over_s = (0.5 * (n + s) / s)[..., None, None]
    eye2 = torch.eye(2, dtype=z.dtype)
    hhT = hat[..., :, None] * hat[..., None, :]
    b_tt = h_over_s * (eye2 - hhT) + 0.5 * hhT
    b_nt = 0.5 * hat
    top = torch.cat((torch.full_like(n, 0.5)[..., None, None],
                     b_nt[..., None, :]), -1)
    bottom = torch.cat((b_nt[..., :, None], b_tt), -1)
    D = torch.cat((top, bottom), -2)
    eye3 = torch.eye(3, dtype=z.dtype)
    D = torch.where(in_cone[..., None, None], eye3, D)
    return torch.where(in_polar[..., None, None], torch.zeros_like(D), D)


def solve_qp_sap_newton(M, J, q_vec, eps, iters=10, ls_steps=12):
    r"""Newton-type SAP solve (the reference sappy's algorithm class,
    Castro et al.; reference ``multibody_learnable_system.py:179-184``)
    on the velocity primal ``l(w) = 0.5 w'Mw + eps/2 ||P_K(-(Jw+q)/eps)||^2``,
    with backtracking line search — the *stronger* CPU stand-in solver
    (VERDICT round-1 item 8: few Newton iterations instead of APGD-200).
    """
    B, n = q_vec.shape
    k = n // 3
    rows = torch.tensor(_cone_rows(k)).reshape(-1)
    Jc = J[:, rows, :].reshape(B, k, 3, 6)
    qc = q_vec[:, rows].reshape(B, k, 3)
    w = torch.zeros(B, 6, dtype=q_vec.dtype)

    def cost(w):
        z = -(torch.einsum("bkin,bn->bki", Jc, w) + qc) / eps
        gamma = project_cone(
            torch.cat((z[..., 0], z[..., 1:].reshape(B, 2 * k)), -1))
        return 0.5 * torch.einsum("bi,bij,bj->b", w, M, w) + \
            0.5 * eps * (gamma * gamma).sum(-1)

    for _ in range(iters):
        z = -(torch.einsum("bkin,bn->bki", Jc, w) + qc) / eps
        gamma_st = project_cone(
            torch.cat((z[..., 0], z[..., 1:].reshape(B, 2 * k)), -1))
        gamma = torch.cat(
            (gamma_st[:, :k, None],
             gamma_st[:, k:].reshape(B, k, 2)), -1)
        grad = torch.einsum("bij,bj->bi", M, w) - \
            torch.einsum("bkin,bki->bn", Jc, gamma)
        D = _projection_jacobian_blocks(z)
        H = M + torch.einsum("bkin,bkij,bkjm->bnm", Jc, D, Jc) / eps + \
            1e-10 * torch.eye(6, dtype=q_vec.dtype)
        dw = -torch.linalg.solve(H, grad)
        # Backtracking line search on the primal cost (batched).
        c0 = cost(w)
        best_w = w
        best_c = c0
        alpha = torch.ones(B, 1, dtype=q_vec.dtype)
        for _ in range(ls_steps):
            cand = w + alpha * dw
            c = cost(cand)
            better = c < best_c
            best_w = torch.where(better[:, None], cand, best_w)
            best_c = torch.where(better, c, best_c)
            alpha = alpha * 0.5
        w = best_w
    z = -(torch.einsum("bkin,bn->bki", Jc, w) + qc) / eps
    # cat((normals, tangents)) IS the standard stacked layout.
    return project_cone(
        torch.cat((z[..., 0], z[..., 1:].reshape(B, 2 * k)), -1))


def contactnets_step(batch_x, batch_xp, params, opt, solver="apgd"):
    half_lengths, mu, inertia_diag, mass = params
    opt.zero_grad()
    q, v = batch_x[:, :7], batch_x[:, 7:]
    qp, vp = batch_xp[:, :7], batch_xp[:, 7:]
    phi, J, M, a_nc = cube_terms(qp, vp, half_lengths, mu, inertia_diag,
                                 mass)
    B = q.shape[0]
    Minv = torch.inverse(M)
    D = J @ Minv @ J.transpose(-1, -2)
    Q = D + 1e-3 * torch.eye(3 * N_C)
    J_t = J[:, N_C:, :]
    sliding = torch.einsum("bij,bj->bi", J_t, vp)
    speeds = sliding.reshape(B, N_C, 2).norm(dim=-1)
    dv = vp - (v + a_nc * DT)
    q_pred = -torch.einsum("bij,bj->bi", J, dv)
    q_comp = torch.cat((phi.abs(), torch.zeros(B, 2 * N_C)), -1)
    q_diss = DT * torch.cat((speeds, sliding), -1)
    q_vec = q_pred + q_comp + q_diss
    with torch.no_grad():
        if solver == "newton":
            force = solve_qp_sap_newton(M.detach(), J.detach(),
                                        q_vec.detach(), 1e-3)
        else:
            force = solve_qp(Q, q_vec)
    pen = (torch.clamp(-phi, min=0) ** 2).sum(-1)
    constant = 0.5 * torch.einsum("bi,bij,bj->b", dv, M, dv) + pen
    loss = (0.5 * torch.einsum("bi,bij,bj->b", force, Q, force) +
            (force * q_vec).sum(-1) + constant).mean()
    loss.backward()
    opt.step()
    return float(loss)


def main():
    torch.manual_seed(0)
    B = 256  # the reference's canonical batch (contactnets_simple.py:86)
    x = torch.randn(B, 13)
    x[:, :4] /= x[:, :4].norm(dim=-1, keepdim=True)
    x[:, 6] = 0.06 + 0.05 * torch.rand(B)
    xp = x + 0.01 * torch.randn(B, 13)
    xp[:, :4] /= xp[:, :4].norm(dim=-1, keepdim=True)

    params = (torch.full((3,), CUBE_HALF, requires_grad=True),
              torch.tensor(CUBE_MU_COMBINED, requires_grad=True),
              torch.full((3,), CUBE_INERTIA, requires_grad=True),
              torch.tensor(CUBE_MASS, requires_grad=True))
    opt = torch.optim.Adam(params, lr=1e-3)

    # Sanity: the two stand-in solvers agree on the QP (objective gap).
    with torch.no_grad():
        phi, J, M, a_nc = cube_terms(
            xp[:, :7], xp[:, 7:], params[0], params[1], params[2],
            params[3])
        D = J @ torch.inverse(M) @ J.transpose(-1, -2)
        Q = D + 1e-3 * torch.eye(3 * N_C)
        q_vec = -torch.einsum("bij,bj->bi", J, xp[:, 7:] - x[:, 7:])
        f_a = solve_qp(Q, q_vec)
        f_n = solve_qp_sap_newton(M, J, q_vec, 1e-3)

        def obj(f):
            return 0.5 * torch.einsum("bi,bij,bj->b", f, Q, f) + \
                (f * q_vec).sum(-1)
        gap = (obj(f_n) - obj(f_a)).abs().max()
        print(f"solver objective agreement |apgd - newton|: {gap:.3e}")

    # Measure BOTH stand-in solvers (VERDICT round-1 item 8) and report
    # the stronger: APGD-200 (first-order) and SAP-Newton-10 (the
    # reference sappy's algorithm class).
    per_solver = {}
    for solver in ("apgd", "newton"):
        contactnets_step(x, xp, params, opt, solver)  # warmup
        n_steps = 10
        start = time.time()
        for _ in range(n_steps):
            contactnets_step(x, xp, params, opt, solver)
        elapsed = time.time() - start
        per_solver[solver] = n_steps * B / elapsed
    strongest = max(per_solver, key=per_solver.get)
    result = {
        "metric": "contactnets train transitions/sec (torch cpu f64, "
                  "strongest of APGD-200 / SAP-Newton-10 stand-ins)",
        "batch": B,
        "transitions_per_sec": per_solver[strongest],
        "strongest_solver": strongest,
        "per_solver_transitions_per_sec": per_solver,
    }
    with open("baseline_cpu.json", "w", encoding="utf-8") as handle:
        json.dump(result, handle, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

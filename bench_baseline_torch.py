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


def contactnets_step(batch_x, batch_xp, params, opt):
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

    contactnets_step(x, xp, params, opt)  # warmup
    n_steps = 10
    start = time.time()
    for _ in range(n_steps):
        contactnets_step(x, xp, params, opt)
    elapsed = time.time() - start
    transitions_per_sec = n_steps * B / elapsed
    result = {
        "metric": "contactnets train transitions/sec (torch cpu f64)",
        "batch": B,
        "transitions_per_sec": transitions_per_sec,
        "seconds_per_step": elapsed / n_steps,
    }
    with open("baseline_cpu.json", "w", encoding="utf-8") as handle:
        json.dump(result, handle, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""NumPy oracles transcribing the reference CUDA kernel semantics.

These are deliberately written as straight per-(rollout, map) scalar loops —
the slowest, most obviously-correct form — so the vectorized TPU engine can
be validated at matched noise and matched sampled maps (SURVEY §4, §6).
Semantics follow reference: mppi_numba/mppi.py:613-1191 and the barebone
notebook kernels.
"""

import math

import numpy as np

F = np.float32


def decode(grid_int8, lb, ratio):
    return F(lb) + F(ratio) * F(grid_int8)


def rollout_cost_single(lin_grid, ang_grid, obstacle, unknown,
                        lin_lb, lin_ratio, ang_lb, ang_ratio,
                        res, xlim0, ylim0, vrange, wrange, xgoal,
                        v_post_rollout, obs_cost, unknown_cost,
                        goal_tolerance, lambda_weight, u_std,
                        x0, dt, dist_weight, noise_k, u_cur,
                        risk_grid=None):
    """Cost of one (control sequence, sampled map) pair.

    ``risk_grid`` switches to the speed-map stage cost
    (reference: mppi_numba/mppi.py:1095-1096).
    """
    T = len(u_cur)
    x = np.array(x0, dtype=F).copy()
    cost = F(0.0)
    goal_reached = False
    tol2 = F(goal_tolerance) ** 2
    dist2 = F(1e9)

    for t in range(T):
        xi = int((x[0] - xlim0) // res)
        yi = int((x[1] - ylim0) // res)
        vtr = decode(lin_grid[yi, xi], lin_lb, lin_ratio)
        wtr = decode(ang_grid[yi, xi], ang_lb, ang_ratio)

        v_nom = u_cur[t, 0] + noise_k[t, 0]
        w_nom = u_cur[t, 1] + noise_k[t, 1]
        v = max(vrange[0], min(vrange[1], v_nom))
        w = max(wrange[0], min(wrange[1], w_nom))

        x[0] += dt * vtr * v * math.cos(x[2])
        x[1] += dt * vtr * v * math.sin(x[2])
        x[2] += dt * wtr * w

        dist2 = (xgoal[0] - x[0]) ** 2 + (xgoal[1] - x[1]) ** 2
        if risk_grid is None:
            dt_eff = dt
        else:
            eff = decode(risk_grid[yi, xi], lin_lb, lin_ratio)
            dt_eff = dt / (eff + 1e-6)
        cost += dt_eff + dist_weight * math.sqrt(dist2)
        cost += obstacle[yi, xi] * obs_cost
        cost += unknown[yi, xi] * unknown_cost

        if dist2 <= tol2:
            goal_reached = True
            break

    for t in range(T):
        cost += lambda_weight * (
            (u_cur[t, 0] / (u_std[0] ** 2)) * noise_k[t, 0]
            + (u_cur[t, 1] / (u_std[1] ** 2)) * noise_k[t, 1])

    cost += (1 - float(goal_reached)) * math.sqrt(dist2) / (v_post_rollout + 1e-6)
    return float(cost)


def cvar_reduce(costs_m, alpha):
    """Mean of the worst ceil(M*alpha) costs (reference: mppi.py:719-755)."""
    M = len(costs_m)
    numel = math.ceil(M * alpha)
    if alpha < 1:
        srt = np.sort(costs_m)[::-1]
    else:
        srt = np.asarray(costs_m)
    return float(np.sum(srt[:numel]) / numel)


def update_useq(costs, noise, u_cur, lambda_weight, vrange, wrange):
    """Softmax-weighted update (reference: mppi.py:1113-1191)."""
    beta = np.min(costs)
    w = np.exp(-1.0 / lambda_weight * (costs - beta))
    w = w / np.sum(w)
    u_new = u_cur + np.einsum("k,ktc->tc", w, noise)
    u_new[:, 0] = np.clip(u_new[:, 0], vrange[0], vrange[1])
    u_new[:, 1] = np.clip(u_new[:, 1], wrange[0], wrange[1])
    return u_new, w


def barebone_rollout_cost(vrange, wrange, xgoal, obs_cost, obs_pos, obs_r,
                          goal_tolerance, lambda_weight, u_std, x0, dt,
                          dist_weight, noise_k, u_cur):
    """Barebone kernel semantics (reference: barebone_mppi_numba.ipynb[cell 3])."""
    T = len(u_cur)
    x = np.array(x0, dtype=F).copy()
    cost = 0.0
    goal_reached = False
    tol2 = goal_tolerance ** 2
    dist2 = 1e9

    for t in range(T):
        v = max(vrange[0], min(vrange[1], u_cur[t, 0] + noise_k[t, 0]))
        w = max(wrange[0], min(wrange[1], u_cur[t, 1] + noise_k[t, 1]))
        x[0] += dt * v * math.cos(x[2])
        x[1] += dt * v * math.sin(x[2])
        x[2] += dt * w
        dist2 = (xgoal[0] - x[0]) ** 2 + (xgoal[1] - x[1]) ** 2
        cost += dist_weight * dist2
        for op, r in zip(obs_pos, obs_r):
            dd = (x[0] - op[0]) ** 2 + (x[1] - op[1]) ** 2 - r ** 2
            cost += (1 - float(dd > 0)) * obs_cost
        if dist2 <= tol2:
            goal_reached = True
            break

    cost += (1 - float(goal_reached)) * dist2
    for t in range(T):
        cost += lambda_weight * (
            (u_cur[t, 0] / (u_std[0] ** 2)) * noise_k[t, 0]
            + (u_cur[t, 1] / (u_std[1] ** 2)) * noise_k[t, 1])
    return float(cost)


# --- terrain PMF-construction oracles (reference: terrain.py:183-343) -------

def det_dyn_pmf_cell(values, pmf, alpha, num_bins):
    """Per-cell det-dynamics PMF condensation, direct CDF walk."""
    out = np.zeros(num_bins, dtype=np.int8)
    if alpha == 1.0:
        expected = 0.0
        for val, mass in zip(values, pmf):
            expected += mass * val
        for bi, vval in enumerate(values):
            if expected <= vval:
                out[bi] = 100
                break
    else:
        cum = 0.0
        expected = 0.0
        for val, mass in zip(values, pmf):
            cum += mass
            expected += mass * val
            if cum >= alpha:
                if cum > 0:
                    expected /= cum
                for bi, vval in enumerate(values):
                    if expected <= vval:
                        out[bi] = 100
                        break
                break
    return out


def sample_grid_cell(pmf_col, qbin_values, u, alpha_dyn):
    """Per-cell inverse-CDF draw (reference: terrain.py:679-694)."""
    sampled = math.ceil(u * 100.0 * alpha_dyn)
    cum = 0
    for bi in range(len(pmf_col)):
        cum += int(pmf_col[bi])
        if sampled <= cum:
            return qbin_values[bi]
    return qbin_values[-1]

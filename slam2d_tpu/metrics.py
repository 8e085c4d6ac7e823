"""Trajectory metrics: ATE and RPE (SURVEY.md §7 "Metrics / logging").

ATE uses a closed-form 2D alignment (Umeyama restricted to SE(2) — rotation +
translation, no scale) of the estimated trajectory onto ground truth before
the RMSE, which is the standard way the reference's trajectories would be
compared on the Radish logs.
"""

from __future__ import annotations

import numpy as np


def align_se2(est_xy: np.ndarray, gt_xy: np.ndarray):
    """Best-fit rotation R and translation t with gt ≈ R @ est + t."""
    mu_e = est_xy.mean(axis=0)
    mu_g = gt_xy.mean(axis=0)
    E = est_xy - mu_e
    G = gt_xy - mu_g
    H = E.T @ G
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, d])
    R = Vt.T @ D @ U.T
    t = mu_g - R @ mu_e
    return R, t


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray, align: bool = True):
    """Absolute trajectory error (RMSE over xy) after SE(2) alignment."""
    est_xy = np.asarray(est_poses)[:, :2].astype(np.float64)
    gt_xy = np.asarray(gt_poses)[:, :2].astype(np.float64)
    if align:
        R, t = align_se2(est_xy, gt_xy)
        est_xy = est_xy @ R.T + t
    err = est_xy - gt_xy
    return float(np.sqrt((err**2).sum(axis=1).mean()))


def rpe_rmse(est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1):
    """Relative pose error (RMSE of translational delta error)."""
    est = np.asarray(est_poses).astype(np.float64)
    gt = np.asarray(gt_poses).astype(np.float64)

    def rel(p):
        a, b = p[:-delta], p[delta:]
        c, s = np.cos(a[:, 2]), np.sin(a[:, 2])
        dx = b[:, 0] - a[:, 0]
        dy = b[:, 1] - a[:, 1]
        return np.stack([c * dx + s * dy, -s * dx + c * dy], axis=1)

    err = rel(est) - rel(gt)
    return float(np.sqrt((err**2).sum(axis=1).mean()))

"""Host (NumPy, float64) TPS factorisation — same math as ops/tps.py.

Why it exists: the factorisation is O(n^3) on a few hundred to a few thousand
knots — microscopic next to the knots-by-cells prediction — but QR+eigh
compile slowly through TPU toolchains.  The production split is therefore:
factorise on the host in f64 (this module), stream the heavy prediction
matvec on the TPU (ops/pallas_tps.py).  Results match ops/tps.py to solver
precision; tests assert that.
"""
from __future__ import annotations

import numpy as np

from .tps import TPSModel


def _phi_np(r2):
    out = np.zeros_like(r2)
    pos = r2 > 0
    out[pos] = 0.5 * r2[pos] * np.log(r2[pos])
    return out


def tps_fit_host(coords, y, lam=None, ngrid: int = 200, refine: int = 40) -> TPSModel:
    """GCV thin-plate smoothing spline on the host; returns a TPSModel (f32
    fields as float64 numpy arrays wrapped by jnp on first use)."""
    import jax.numpy as jnp

    coords = np.asarray(coords, np.float64)
    ycols = np.asarray(y, np.float64)
    single = ycols.ndim == 1
    if single:
        ycols = ycols[:, None]
    n, n_resp = ycols.shape

    cmin = coords.min(axis=0)
    crange = np.where(coords.max(axis=0) > cmin, coords.max(axis=0) - cmin, 1.0)
    x = (coords - cmin) / crange

    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    k = _phi_np(d2)
    t = np.concatenate([np.ones((n, 1)), x], axis=1)
    q, r = np.linalg.qr(t, mode="complete")
    q1, q2 = q[:, :3], q[:, 3:]
    m = q2.T @ k @ q2
    evals, u = np.linalg.eigh(0.5 * (m + m.T))
    evals = np.maximum(evals, 0.0)
    q2u = q2 @ u
    u_coef = (q2u.T @ ycols)                       # (n-3, R)

    if lam is None:
        dmax = max(evals.max(), 1.0)
        grid = np.exp(np.linspace(np.log(dmax * 1e-12 + 1e-300), np.log(dmax * 1e4), ngrid))
        shrink = grid[None, :, None] / (evals[:, None, None] + grid[None, :, None])
        rss = np.sum((u_coef[:, None, :] * shrink) ** 2, axis=0)     # (G, R)
        tr = np.sum(shrink[:, :, 0], axis=0)                          # (G,)
        v = n * rss / np.maximum(tr[:, None], 1e-300) ** 2
        idx = np.argmin(v, axis=0)
        lo = np.log(grid[np.maximum(idx - 1, 0)])
        hi = np.log(grid[np.minimum(idx + 1, ngrid - 1)])
        invphi = (np.sqrt(5.0) - 1) / 2

        def vval(rho):                                # rho (R,)
            sh = rho[None, :] / (evals[:, None] + rho[None, :])
            rss = np.sum((u_coef * sh) ** 2, axis=0)
            tr = np.sum(sh, axis=0)
            return n * rss / np.maximum(tr, 1e-300) ** 2

        for _ in range(refine):
            c1 = hi - invphi * (hi - lo)
            c2 = lo + invphi * (hi - lo)
            smaller = vval(np.exp(c1)) < vval(np.exp(c2))
            lo = np.where(smaller, lo, c1)
            hi = np.where(smaller, c2, hi)
        rho = np.exp((lo + hi) / 2)
    else:
        rho = np.broadcast_to(np.asarray(lam, np.float64) * n, (n_resp,)).copy()

    gamma = u_coef / (evals[:, None] + rho[None, :])
    c = q2u @ gamma
    bmat = q1.T @ (k @ q2u)
    rhs = q1.T @ ycols - bmat @ gamma
    d = np.linalg.solve(r[:3, :3], rhs)
    residuals = rho[None, :] * c
    fitted = ycols - residuals
    sh = rho[None, :] / (evals[:, None] + rho[None, :])
    gcv = n * np.sum((u_coef * sh) ** 2, axis=0) / np.maximum(np.sum(sh, axis=0), 1e-300) ** 2
    eff_df = n - np.sum(sh, axis=0)

    if single:
        c, d, fitted, residuals = c[:, 0], d[:, 0], fitted[:, 0], residuals[:, 0]
        rho, gcv, eff_df = rho[0], gcv[0], eff_df[0]
    return TPSModel(
        knots=jnp.asarray(x), c=jnp.asarray(c), d=jnp.asarray(d),
        shift=jnp.asarray(cmin), scale=jnp.asarray(crange),
        lam=jnp.asarray(rho / n), gcv=jnp.asarray(gcv),
        fitted=jnp.asarray(fitted), residuals=jnp.asarray(residuals),
        eff_df=jnp.asarray(eff_df),
    )

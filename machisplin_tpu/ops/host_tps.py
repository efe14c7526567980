"""Host (NumPy/LAPACK, float64) TPS factorisation — same math as ops/tps.py.

Why it exists: the factorisation is O(n^3) on a few hundred to a few thousand
knots — microscopic next to the knots-by-cells prediction — but QR+eigh
compile slowly through TPU toolchains.  The production split is therefore:
factorise on the host in f64 (this module), stream the heavy prediction
matvec on the TPU (ops/pallas_tps.py).  Results match ops/tps.py to solver
precision; tests assert that.

Large-n design (BASELINE config 3, 10k x 19 on one core): the null-space
projection never materialises Q.  The complete (n, n) orthogonal factor of
the (n, 3) polynomial basis is only ever APPLIED — dormqr with the three
Householder reflectors, O(n^2) — so the two dense O(n^3) projection matmuls
(Q2' K Q2, Q2 @ U) of the naive formulation disappear and the eigh is the
single cubic step.  Pairwise distances accumulate per-dimension in place,
bounding peak memory at ~3 (n, n) f64 buffers instead of the (n, n, 2)
broadcast intermediate.
"""
from __future__ import annotations

import numpy as np

from .tps import TPSModel


def _phi_np(r2):
    """phi(r) = 0.5 r^2 log r^2 elementwise, phi(0) = 0, without fancy
    indexing (mask gathers copy the whole (n, n) matrix twice at 10k)."""
    with np.errstate(divide="ignore"):
        lg = np.log(np.maximum(r2, np.finfo(np.float64).tiny))
    out = 0.5 * r2 * lg
    out[r2 <= 0] = 0.0
    return out


def _pairwise_r2_np(x):
    """Squared pairwise distances, per-dimension in-place accumulation."""
    d2 = np.subtract.outer(x[:, 0], x[:, 0])
    np.multiply(d2, d2, out=d2)
    for j in range(1, x.shape[1]):
        dj = np.subtract.outer(x[:, j], x[:, j])
        np.multiply(dj, dj, out=dj)
        d2 += dj
    return d2


class _ImplicitQ:
    """The complete orthogonal factor of a thin (n, k) basis, held as its
    Householder reflectors and applied via LAPACK dormqr (O(k n) per
    column) — never materialised."""

    def __init__(self, t):
        from scipy.linalg import get_lapack_funcs

        t = np.asfortranarray(np.asarray(t, np.float64))
        geqrf, ormqr = get_lapack_funcs(("geqrf", "ormqr"), (t,))
        self._ormqr = ormqr
        self.qr_raw, self.tau, _, info = geqrf(t)
        assert info == 0, f"geqrf failed: {info}"
        self.k = t.shape[1]
        self.r = np.triu(self.qr_raw[: self.k, : self.k])

    def apply(self, c, side="L", trans="N"):
        """Q @ c ('L','N'), Q' @ c ('L','T'), c @ Q ('R','N'), ..."""
        c = np.asfortranarray(np.asarray(c, np.float64))
        _, work, info = self._ormqr(side, trans, self.qr_raw, self.tau, c, lwork=-1)
        out, _, info = self._ormqr(
            side, trans, self.qr_raw, self.tau, c, lwork=int(work[0])
        )
        assert info == 0, f"ormqr failed: {info}"
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

    k = _phi_np(_pairwise_r2_np(x))
    t = np.concatenate([np.ones((n, 1)), x], axis=1)
    q = _ImplicitQ(t)
    # Q' K Q by two reflector applications (O(n^2) each, k symmetric);
    # row/col blocks of the result replace every use of Q1/Q2 below.
    qkq = q.apply(q.apply(k, "L", "T"), "R", "N")
    del k
    m = qkq[3:, 3:]
    evals, u = np.linalg.eigh(0.5 * (m + m.T))
    evals = np.maximum(evals, 0.0)
    qty = q.apply(ycols, "L", "T")                 # (n, R): [Q1'y; Q2'y]
    u_coef = u.T @ qty[3:]                         # (n-3, R)

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
    ug = u @ gamma                                 # (n-3, R) eigen -> Q2 basis
    pad = np.zeros((n, n_resp))
    pad[3:] = ug
    c = q.apply(pad, "L", "N")                     # Q2 @ (U gamma)
    # bmat @ gamma = (Q1' K Q2 U) gamma = qkq[:3, 3:] @ ug
    rhs = qty[:3] - qkq[:3, 3:] @ ug
    d = np.linalg.solve(q.r, rhs)
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

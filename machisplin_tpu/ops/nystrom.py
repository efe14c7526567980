"""Low-rank (Nystrom / reduced-basis) thin-plate splines for large n.

fields::Tps is dense O(n^3); the reference never runs more than ~800 knots at
once and tiles everything larger (V73:650-681).  For the continental-scale
configs (BASELINE.json configs 4-5: 50k-500k stations), this module fits the
penalised reduced-basis spline

    f(x) = sum_j c_j phi(|x - z_j|) + d . [1, x, y]
    min  |y - K_nz c - T d|^2  +  lam * c' K_zz c

with m << n landmark knots z_j (uniform subsample or a few k-means sweeps).
GCV over lam costs ONE (m+3) eigendecomposition of the whitened penalty
(Cholesky of B'B, eigh of R^-T P R^-1): RSS(lam) and the effective df
tr((I + lam M)^-1) are then closed-form in the eigenvalues, vectorised over a
lambda grid — the same Demmler-Reinsch trick as ops/tps.py at rank m.

Cross-products K_nz' K_nz stream over the stations in chunks (MXU matmuls),
so HBM holds O(n_chunk * m), never n x n.  Prediction reuses the Pallas grid
kernel with the landmarks as knots.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .tps import TPSModel, _pairwise_r2, _phi

__all__ = ["select_landmarks", "nystrom_tps_fit"]


def select_landmarks(key, coords, m: int, kmeans_iters: int = 5):
    """m landmark points: random subsample refined by a few k-means sweeps."""
    n = coords.shape[0]
    idx = jax.random.choice(key, n, (min(m, n),), replace=False)
    centers = coords[idx]

    def sweep(centers, _):
        d2 = _pairwise_r2(coords, centers)                 # (n, m)
        assign = jnp.argmin(d2, axis=1)
        one_hot = (assign[:, None] == jnp.arange(centers.shape[0])[None, :]).astype(
            coords.dtype
        )
        counts = jnp.maximum(one_hot.sum(axis=0), 1.0)
        new = (one_hot.T @ coords) / counts[:, None]
        # keep empty clusters where they were
        new = jnp.where((one_hot.sum(axis=0) > 0)[:, None], new, centers)
        return new, None

    if kmeans_iters > 0 and n > m:
        centers, _ = jax.lax.scan(sweep, centers, None, length=kmeans_iters)
    return centers


def nystrom_tps_fit(
    coords,
    y,
    landmarks=None,
    m: int = 2048,
    lam=None,
    key=None,
    chunk: int = 65536,
    ngrid: int = 128,
    ridge: float | None = None,
    mesh=None,
) -> TPSModel:
    """Fit the reduced-basis smoothing spline; returns a TPSModel whose knots
    are the (range-scaled) landmarks, so every TPS prediction path applies.

    y may be (n,) or (n, R); lambda is GCV-selected per response when None.

    ``mesh``: optional device mesh — the two O(n x m) streamed passes (the
    B'B / B'y cross-products and the fitted-values pass) shard over the
    STATION axis via shard_map (independent per-device accumulation + one
    psum); the (m+3)-rank solve tail replicates.  This is the north-star
    multi-chip layout for configs 4-5 (100k-500k stations): the
    station-dependent share of the solve scales with the mesh, the m^3
    tail does not.

    Runs at HIGHEST matmul precision throughout: the normal-equations
    accumulation squares the conditioning, so TPU's default bfloat16
    matmul inputs are fatal here (see ops/tps._pairwise_r2 note).
    """
    with jax.default_matmul_precision("highest"):
        return _nystrom_tps_fit_impl(
            coords, y, landmarks, m, lam, key, chunk, ngrid, ridge, mesh
        )


def _stream_stats(xs_p, y_p, w_p, z, chunk, dtype, vary_axis=None):
    """Streamed normal-equation pieces over one (padded) station block:
    G = B'B, B'y, y'y with B = [T, K_nz], rows masked by ``w_p``.

    ``vary_axis``: set to the mesh axis name when called inside shard_map —
    the scan's zero init must carry the same varying-axis type as the
    shard-dependent outputs."""
    n_resp = y_p.shape[1]
    p_dim = 3 + z.shape[0]

    def chunk_stats(carry, start):
        g, bty, yy = carry
        xi = jax.lax.dynamic_slice(xs_p, (start, 0), (chunk, 2))
        yi = jax.lax.dynamic_slice(y_p, (start, 0), (chunk, n_resp))
        wi = jax.lax.dynamic_slice(w_p, (start,), (chunk,))[:, None]
        xi = xi * wi + 0.5 * (1 - wi)
        yi = yi * wi
        k_i = _phi(_pairwise_r2(xi, z), dtype) * wi
        t_i = jnp.concatenate([jnp.ones((chunk, 1), dtype), xi], axis=1) * wi
        b_i = jnp.concatenate([t_i, k_i], axis=1)          # (chunk, 3+m)
        g = g + b_i.T @ b_i
        bty = bty + b_i.T @ yi
        yy = yy + jnp.sum(yi * yi, axis=0)
        return (g, bty, yy), None

    n_chunks = xs_p.shape[0] // chunk
    init = (
        jnp.zeros((p_dim, p_dim), dtype),
        jnp.zeros((p_dim, n_resp), dtype),
        jnp.zeros((n_resp,), dtype),
    )
    if vary_axis is not None:
        init = jax.tree.map(lambda a: jax.lax.pvary(a, vary_axis), init)
    starts = jnp.arange(n_chunks) * chunk
    (g, bty, yy), _ = jax.lax.scan(chunk_stats, init, starts)
    return g, bty, yy


def _stream_fitted(xs_p, w_p, z, d, c, chunk, dtype):
    """Streamed fitted values over one (padded) station block -> (rows, R)."""

    def chunk_fit(_, start):
        xi = jax.lax.dynamic_slice(xs_p, (start, 0), (chunk, 2))
        wi = jax.lax.dynamic_slice(w_p, (start,), (chunk,))[:, None]
        xi = xi * wi + 0.5 * (1 - wi)
        k_i = _phi(_pairwise_r2(xi, z), dtype) * wi
        t_i = jnp.concatenate([jnp.ones((chunk, 1), dtype), xi], axis=1) * wi
        return None, t_i @ d + k_i @ c                     # (chunk, R)

    n_chunks = xs_p.shape[0] // chunk
    starts = jnp.arange(n_chunks) * chunk
    _, fit_chunks = jax.lax.scan(chunk_fit, None, starts)
    return fit_chunks.reshape(n_chunks * chunk, -1)


def _nystrom_tps_fit_impl(coords, y, landmarks, m, lam, key, chunk, ngrid, ridge, mesh=None):
    coords = jnp.asarray(coords)
    y = jnp.asarray(y)
    single = y.ndim == 1
    ycols = y[:, None] if single else y
    n, n_resp = ycols.shape
    dtype = coords.dtype
    if ridge is None:
        # f32 Cholesky of the whitened normal equations needs a firmer ridge
        ridge = max(100.0 * float(jnp.finfo(dtype).eps), 1e-8)

    cmin = jnp.min(coords, axis=0)
    crange = jnp.maximum(jnp.max(coords, axis=0) - cmin, 1e-30)
    xs = (coords - cmin) / crange

    if landmarks is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        z = select_landmarks(key, xs, m)
    else:
        z = (jnp.asarray(landmarks) - cmin) / crange
    m_eff = z.shape[0]

    kzz = _phi(_pairwise_r2(z, z), dtype)

    # streamed cross-products: G = B'B, bty = B'y with B = [T, K_nz].
    # With a mesh the station axis shards: each device accumulates its own
    # chunks, one psum combines — the O(n m^2) phase scales with the mesh.
    p_dim = 3 + m_eff
    if mesh is not None:
        import numpy as onp_

        from jax.sharding import PartitionSpec as P

        ax = mesh.axis_names[0]
        n_dev = int(onp_.prod(mesh.devices.shape))
        chunk_eff = min(chunk, max(-(-n // n_dev), 1))
        per_dev = -(-n // (n_dev * chunk_eff))
        n_pad = n_dev * per_dev * chunk_eff
    else:
        chunk_eff = chunk
        n_pad = -(-n // chunk) * chunk
    pad = n_pad - n
    xs_p = jnp.pad(xs, ((0, pad), (0, 0)), constant_values=0.5)
    y_p = jnp.pad(ycols, ((0, pad), (0, 0)))
    w_p = (jnp.arange(n_pad) < n).astype(dtype)
    xs, ycols = xs_p, y_p

    if mesh is not None:
        def local_stats(xl, yl, wl):
            g_l, bty_l, yy_l = _stream_stats(
                xl, yl, wl, z, chunk_eff, dtype, vary_axis=ax
            )
            return (
                jax.lax.psum(g_l, ax),
                jax.lax.psum(bty_l, ax),
                jax.lax.psum(yy_l, ax),
            )

        g, bty, yy = jax.jit(jax.shard_map(
            local_stats, mesh=mesh,
            in_specs=(P(ax), P(ax), P(ax)),
            out_specs=(P(), P(), P()),
        ))(xs_p, y_p, w_p)
    else:
        g, bty, yy = _stream_stats(xs_p, y_p, w_p, z, chunk_eff, dtype)

    # Solve tail: the (m+3)^2 system is tiny next to the streamed
    # cross-products, but badly conditioned — in f32 the Cholesky can go NaN
    # at m ~ 2000 (and a NaN-fed eigh has been observed to take the TPU
    # worker down).  When the inputs are concrete, run the tail on the host
    # in f64; inside a trace, fall back to the in-graph f32 path.
    concrete = not isinstance(g, jax.core.Tracer)
    if concrete:
        import numpy as onp

        g64 = onp.asarray(g, onp.float64)
        kzz64 = onp.asarray(kzz, onp.float64)
        scale = onp.sqrt(onp.maximum(onp.diag(g64), 1e-300))
        # coincident landmarks (k-means can collapse centers) make exact
        # duplicate columns: escalate the ridge until the Cholesky holds
        r_np = None
        rr = 1e-10
        while r_np is None:
            try:
                gn = g64 / onp.outer(scale, scale) + rr * onp.eye(p_dim)
                r_np = onp.linalg.cholesky(gn).T
            except onp.linalg.LinAlgError:
                rr *= 100.0
                if rr > 1e-2:
                    raise
        pen = onp.zeros((p_dim, p_dim))
        pen[3:, 3:] = kzz64 / onp.outer(scale[3:], scale[3:])
        rinv = onp.linalg.solve(r_np, onp.eye(p_dim))
        mmat = rinv.T @ pen @ rinv
        evals_np, u_np = onp.linalg.eigh(0.5 * (mmat + mmat.T))
        evals = jnp.asarray(onp.maximum(evals_np, 0.0), dtype)
        u = jnp.asarray(u_np, dtype)
        un64 = onp.asarray(bty, onp.float64) / scale[:, None]
        uu = jnp.asarray(u_np.T @ onp.linalg.solve(r_np.T, un64), dtype)
        r = jnp.asarray(r_np, dtype)
        scale = jnp.asarray(scale, dtype)
    else:
        scale = jnp.sqrt(jnp.maximum(jnp.diag(g), 1e-30))
        gn = g / jnp.outer(scale, scale) + ridge * jnp.eye(p_dim, dtype=dtype)
        r = jnp.linalg.cholesky(gn, upper=True)
        pen = jnp.zeros((p_dim, p_dim), dtype).at[3:, 3:].set(
            kzz / jnp.outer(scale[3:], scale[3:])
        )
        rinv_t = jax.scipy.linalg.solve_triangular(
            r, jnp.eye(p_dim, dtype=dtype), trans="T", lower=False
        )
        mmat = rinv_t @ pen @ rinv_t.T
        evals, u = jnp.linalg.eigh(0.5 * (mmat + mmat.T))
        evals = jnp.maximum(evals, 0.0)
        un = bty / scale[:, None]
        uu = u.T @ jax.scipy.linalg.solve_triangular(r, un, trans="T", lower=False)

    if lam is None:
        grid = jnp.logspace(-10, 6, ngrid, dtype=dtype)        # (G,)
        s = 1.0 / (1.0 + grid[:, None, None] * evals[None, :, None])  # (G, p, R)
        fit_term = jnp.sum(uu[None] ** 2 * s * (2.0 - s), axis=1)     # (G, R)
        rss = jnp.maximum(yy[None, :] - fit_term, 0.0)
        df = jnp.sum(s, axis=1)                                        # (G, 1->R)
        gcv = n * rss / jnp.maximum(n - df, 1.0) ** 2
        lam_sel = grid[jnp.argmin(gcv, axis=0)]                        # (R,)
        gcv_min = jnp.min(gcv, axis=0)
    else:
        lam_sel = jnp.broadcast_to(jnp.asarray(lam, dtype), (n_resp,))
        s = 1.0 / (1.0 + lam_sel[None, :] * evals[:, None])
        fit_term = jnp.sum(uu**2 * s * (2.0 - s), axis=0)
        gcv_min = n * jnp.maximum(yy - fit_term, 0.0) / jnp.maximum(
            n - jnp.sum(s, axis=0), 1.0
        ) ** 2

    s = 1.0 / (1.0 + lam_sel[None, :] * evals[:, None])        # (p, R)
    gamma = u @ (s * uu)                                       # (p, R)
    beta = jax.scipy.linalg.solve_triangular(r, gamma, lower=False) / scale[:, None]
    d = beta[:3]
    c = beta[3:]

    # fitted values / residuals: one more streamed pass over the stations
    # (O(n_chunk x m) matmuls; the outputs are only (n, R)); sharded over
    # stations on a mesh like the cross-products above
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        fitted_pad = jax.jit(jax.shard_map(
            lambda xl, wl: _stream_fitted(xl, wl, z, d, c, chunk_eff, dtype),
            mesh=mesh, in_specs=(P(ax), P(ax)), out_specs=P(ax),
        ))(xs_p, w_p)
    else:
        fitted_pad = _stream_fitted(xs_p, w_p, z, d, c, chunk_eff, dtype)
    fitted = fitted_pad[:n]
    residuals = ycols[:n] - fitted
    eff_df = jnp.sum(s, axis=0)
    if single:
        c, d = c[:, 0], d[:, 0]
        lam_sel, gcv_min, eff_df = lam_sel[0], gcv_min[0], eff_df[0]
        fitted, residuals = fitted[:, 0], residuals[:, 0]
    return TPSModel(
        knots=z, c=c, d=d, shift=cmin, scale=crange,
        lam=lam_sel, gcv=gcv_min, fitted=fitted, residuals=residuals, eff_df=eff_df,
    )

"""Thin-plate smoothing spline solver with GCV smoothing selection.

TPU-native replacement for ``fields::Tps`` as the reference uses it
(V73:722 tiled residual spline, V73:751 single-tile path; prediction via
``terra::interpolate`` V73:726/753; V73 =
/root/reference/R/ensemble.machine.learning.thin.plate.splines.V73.R).

Semantics implemented (matching fields' model for m=2, d=2):

* radial basis  phi(r) = r^2 * log(r)  with the {1, x, y} polynomial null
  space; coordinates range-scaled per dimension (fields ``scale.type='range'``);
* smoothing parameter chosen by minimising the GCV function
  ``V(lam) = n * RSS(lam) / tr(I - A(lam))^2`` via the Demmler-Reinsch
  eigendecomposition of the null-space-projected kernel matrix;
* solve:  (K + rho*I) c + T d = y,  T' c = 0  with rho = n*lam, giving the
  identity  y - fitted = rho * c  used for RSS and residuals.

TPU-first design choices (not in the reference):

* **Masked knots.**  ``tps_factor`` accepts a 0/1 mask so tiles with
  different point counts pad to one static shape and batch under vmap /
  shard_map.  Masked knots are spliced into the system as exact eigenpairs
  with a known eigenvalue ``kappa`` (K_tilde = M K M + kappa*(I-M)); their
  contribution to tr(I-A) is subtracted in closed form, so GCV and the fit
  are *exactly* the fit on the active subset — not an approximation.
* **Shared factorisation.**  One QR + eigendecomposition serves any number
  of response columns: GCV search and coefficient solves are vectorised
  over responses (BASELINE.json config 3's batched GCV sweep).
* **Streaming prediction.**  Grid prediction is a knots-by-cells matvec
  evaluated tile-by-tile so the (cells x knots) matrix never materialises
  in HBM (Pallas kernel in ops/pallas_tps.py; jnp fallback here).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..grid import GridSpec

__all__ = [
    "TPSFactor",
    "TPSModel",
    "tps_factor",
    "tps_solve",
    "tps_fit",
    "tps_fit_auto",
    "tps_predict",
    "tps_predict_grid",
    "gcv_curve",
]


def _phi(r2, dtype):
    """phi(r) = r^2 log r = 0.5 * r^2 * log(r^2), with phi(0) = 0."""
    safe = jnp.maximum(r2, jnp.finfo(dtype).tiny)
    return jnp.where(r2 > 0, 0.5 * r2 * jnp.log(safe), 0.0).astype(dtype)


def _pairwise_r2(a, b):
    """Squared distances between (n,2) and (m,2) by explicit differences.

    The |a|^2 + |b|^2 - 2ab' matmul expansion is avoided deliberately: on
    TPU the default matmul precision truncates inputs to bfloat16 and the
    expansion cancels catastrophically near r=0, which poisons phi(r) and
    (through the huge oscillating radial coefficients of a near-
    interpolating spline) the whole surface — the round-1 "TPS correction
    made R^2 worse" regression.  The difference form is exact f32 VPU work
    and the d=2 contraction was never MXU-shaped anyway.
    """
    dx = a[:, 0][:, None] - b[:, 0][None, :]
    dy = a[:, 1][:, None] - b[:, 1][None, :]
    return dx * dx + dy * dy


class TPSFactor(NamedTuple):
    """Reusable factorisation of the TPS system for one knot set."""

    knots: jax.Array        # (n, 2) scaled coords (masked rows arbitrary)
    mask: jax.Array         # (n,) 1.0 active / 0.0 padded
    shift: jax.Array        # (2,) range-scaling offset
    scale: jax.Array        # (2,) range-scaling divisor
    q2u: jax.Array          # (n, n-3) Q2 @ U — maps eigenbasis -> knot space
    evals: jax.Array        # (n-3,) eigenvalues of projected kernel
    q1: jax.Array           # (n, 3)
    rmat: jax.Array         # (3, 3) upper-triangular from QR of T
    bmat: jax.Array         # (3, n-3) = Q1' K Q2U  (for the polynomial solve)
    kappa: jax.Array        # () masked-direction eigenvalue
    n_active: jax.Array     # () number of active knots
    n_masked: jax.Array     # () number of padded knots


class TPSModel(NamedTuple):
    """Fitted spline: everything needed to predict at new points."""

    knots: jax.Array        # (n, 2) scaled coords
    c: jax.Array            # (n,) or (n, R) radial coefficients
    d: jax.Array            # (3,) or (3, R) polynomial coefficients [1, x, y]
    shift: jax.Array        # (2,)
    scale: jax.Array        # (2,)
    lam: jax.Array          # () or (R,) smoothing parameter (rho / n_active)
    gcv: jax.Array          # () or (R,) minimised GCV value
    fitted: jax.Array       # (n,) or (n, R) fitted values at knots (0 at padded)
    residuals: jax.Array    # (n,) or (n, R) y - fitted (0 at padded)
    eff_df: jax.Array       # () or (R,) tr(A), effective degrees of freedom


# --- TPU eigh tuning (the solve is 100% eigh at pipeline scale:
# artifacts/round3/SOLVE_PROFILE.json).  jnp.linalg.eigh on TPU dispatches
# to jax's QDWH + spectral divide-and-conquer with an internal
# precision='float32' (6-pass bf16 matmuls) and termination_size=256
# (base cases go to Jacobi).  These knobs expose that choice so
# benchmarks/eigh_precision_ab.py can A/B cheaper internal precisions
# against the f64 host twin; defaults reproduce jnp.linalg.eigh exactly.
# NOTE precision is trace-time state: changing the globals only affects
# functions traced afterwards.
_EIGH_PRECISION = "float32"
_EIGH_TERMINATION = 256


def _eigh_sym(m):
    """Symmetric eigendecomposition with TPU-path tuning knobs."""
    if m.dtype == jnp.float32 and jax.default_backend() == "tpu" and (
        _EIGH_PRECISION != "float32" or _EIGH_TERMINATION != 256
    ):
        try:
            from jax._src.tpu.linalg.eigh import eigh as _tpu_eigh

            return _tpu_eigh(
                m,
                precision=_EIGH_PRECISION,
                termination_size=_EIGH_TERMINATION,
            )
        except ImportError:  # private API moved: keep the public behavior
            pass
    return jnp.linalg.eigh(m)


def tps_factor(coords, mask=None) -> TPSFactor:
    """Factorise the TPS system for one set of knots.

    coords: (n, 2) raw coordinates (e.g. LONG, LAT).
    mask:   optional (n,) 0/1; padded rows are excluded exactly.

    All matmuls (including those inside QR/eigh) run at HIGHEST precision:
    the kernel matrix is severely ill-conditioned and TPU's default
    bfloat16 matmul inputs visibly degrade the GCV fit (round-1 regression).
    """
    with jax.default_matmul_precision("highest"):
        return _tps_factor_impl(coords, mask)


def _tps_factor_impl(coords, mask):
    coords = jnp.asarray(coords)
    n = coords.shape[0]
    dtype = coords.dtype
    if mask is None:
        mask = jnp.ones((n,), dtype)
    else:
        mask = jnp.asarray(mask, dtype)
    n_active = jnp.sum(mask)
    n_masked = n - n_active

    # fields scale.type='range': per-dimension scaling by active min/range.
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    cmin = jnp.min(jnp.where(mask[:, None] > 0, coords, big), axis=0)
    cmax = jnp.max(jnp.where(mask[:, None] > 0, coords, -big), axis=0)
    scale = jnp.where(cmax > cmin, cmax - cmin, 1.0)
    x = (coords - cmin) / scale
    # Park padded knots on a harmless finite spot inside the unit box.
    x = jnp.where(mask[:, None] > 0, x, 0.5)

    k = _phi(_pairwise_r2(x, x), dtype)
    # Splice masked rows in as exact eigenpairs with eigenvalue kappa.
    m_out = jnp.outer(mask, mask)
    kappa = 2.0 * jnp.max(jnp.sum(jnp.abs(k * m_out), axis=1))  # Gershgorin bound
    kappa = jnp.maximum(kappa, jnp.asarray(1.0, dtype))
    k_t = k * m_out + kappa * jnp.diag(1.0 - mask)

    t = jnp.concatenate([mask[:, None], x * mask[:, None]], axis=1)  # (n, 3)
    q, r = jnp.linalg.qr(t, mode="complete")
    q1, q2 = q[:, :3], q[:, 3:]
    m_proj = q2.T @ k_t @ q2
    evals, u = _eigh_sym(0.5 * (m_proj + m_proj.T))
    evals = jnp.maximum(evals, 0.0)  # kernel is c.p.d. of order 2 on this subspace
    q2u = q2 @ u
    bmat = q1.T @ (k_t @ q2u)
    return TPSFactor(
        knots=x, mask=mask, shift=cmin, scale=scale, q2u=q2u, evals=evals,
        q1=q1, rmat=r[:3, :3], bmat=bmat, kappa=kappa,
        n_active=n_active, n_masked=n_masked,
    )


def _gcv_terms(factor: TPSFactor, u_coef, rho):
    """RSS(rho) and active tr(I - A)(rho) from eigen coordinates.

    u_coef: (..., n-3) eigen coordinates of y (masked dirs contribute 0).
    rho broadcastable against leading dims.
    """
    d = factor.evals
    shrink = rho[..., None] / (d + rho[..., None])          # (..., n-3)
    rss = jnp.sum((u_coef * shrink) ** 2, axis=-1)
    tr = jnp.sum(shrink, axis=-1) - factor.n_masked * rho / (factor.kappa + rho)
    return rss, tr


def gcv_curve(factor: TPSFactor, y, rho):
    """GCV values V(rho) over a rho grid; y (n,) or (n, R); rho (G,).

    Returns (G,) for a single response or (R, G) for a stack."""
    y = jnp.asarray(y)
    single = y.ndim == 1
    ycols = (y[:, None] if single else y) * factor.mask[:, None]
    u_coef = (factor.q2u.T @ ycols).T                      # (R, n-3)
    rho = jnp.asarray(rho)
    v = _gcv_value(factor, u_coef[:, None, :], rho[None, :])  # (R, G)
    return v[0] if single else v


def _gcv_value(factor, u_coef, rho):
    rss, tr = _gcv_terms(factor, u_coef, rho)
    n_a = factor.n_active
    return n_a * rss / jnp.maximum(tr, jnp.finfo(rss.dtype).tiny) ** 2


def _gcv_search(factor: TPSFactor, u_coef, ngrid: int, refine: int):
    """Minimise V(rho) per response: log-space grid + golden-section refine.

    u_coef: (R, n-3).  Returns rho (R,).
    """
    dtype = u_coef.dtype
    dmax = jnp.maximum(jnp.max(factor.evals), 1.0)
    lo = jnp.log(dmax * 1e-12 + jnp.finfo(dtype).tiny)
    hi = jnp.log(dmax * 1e4)
    grid = jnp.exp(jnp.linspace(lo, hi, ngrid, dtype=dtype))          # (G,)
    v = _gcv_value(factor, u_coef[:, None, :], grid[None, :])          # (R, G)
    idx = jnp.argmin(v, axis=1)
    step = (hi - lo) / (ngrid - 1)
    log_grid = jnp.log(grid)
    a = log_grid[jnp.maximum(idx - 1, 0)]
    b = log_grid[jnp.minimum(idx + 1, ngrid - 1)]

    invphi = (jnp.sqrt(jnp.asarray(5.0, dtype)) - 1.0) / 2.0

    def body(_, ab):
        a, b = ab
        c = b - invphi * (b - a)
        d = a + invphi * (b - a)
        vc = _gcv_value(factor, u_coef, jnp.exp(c))
        vd = _gcv_value(factor, u_coef, jnp.exp(d))
        smaller = vc < vd
        return (jnp.where(smaller, a, c), jnp.where(smaller, d, b))

    a, b = jax.lax.fori_loop(0, refine, body, (a, b))
    del step
    return jnp.exp((a + b) / 2.0)


def tps_solve(
    factor: TPSFactor,
    y,
    lam=None,
    ngrid: int = 200,
    refine: int = 40,
) -> TPSModel:
    """Solve for spline coefficients; GCV-select smoothing if lam is None.

    y: (n,) or (n, R) — responses at the factor's knots (padded rows ignored).
    lam: fixed smoothing parameter(s) (fields' lambda = rho / n_active); None
         selects per-response lambda by GCV.
    """
    with jax.default_matmul_precision("highest"):
        return _tps_solve_impl(factor, y, lam, ngrid, refine)


def _tps_solve_impl(factor, y, lam, ngrid, refine):
    y = jnp.asarray(y)
    single = y.ndim == 1
    ycols = y[:, None] if single else y                    # (n, R)
    ym = ycols * factor.mask[:, None]
    u_coef = (factor.q2u.T @ ym).T                         # (R, n-3)

    if lam is None:
        rho = _gcv_search(factor, u_coef, ngrid, refine)   # (R,)
    else:
        rho = jnp.broadcast_to(
            jnp.asarray(lam, y.dtype) * factor.n_active, (ycols.shape[1],)
        )
    gcv = _gcv_value(factor, u_coef, rho)
    rss_dirs, tr = _gcv_terms(factor, u_coef, rho)
    del rss_dirs
    eff_df = factor.n_active - tr

    gamma = (u_coef / (factor.evals[None, :] + rho[:, None])).T   # (n-3, R)
    c = factor.q2u @ gamma                                        # (n, R)
    rhs = factor.q1.T @ ym - factor.bmat @ gamma                  # (3, R)
    d = jax.scipy.linalg.solve_triangular(factor.rmat, rhs)       # (3, R)
    residuals = rho[None, :] * c * factor.mask[:, None]
    fitted = (ym - residuals) * factor.mask[:, None]

    if single:
        c, d, fitted, residuals = c[:, 0], d[:, 0], fitted[:, 0], residuals[:, 0]
        rho, gcv, eff_df = rho[0], gcv[0], eff_df[0]
    return TPSModel(
        knots=factor.knots,
        c=c,
        d=d,
        shift=factor.shift,
        scale=factor.scale,
        lam=rho / factor.n_active,
        gcv=gcv,
        fitted=fitted,
        residuals=residuals,
        eff_df=eff_df,
    )


def tps_fit(coords, y, mask=None, lam=None, ngrid: int = 200, refine: int = 40) -> TPSModel:
    """Convenience: factor + solve (the ``fields::Tps(xy, y)`` call shape)."""
    return tps_solve(tps_factor(coords, mask), y, lam=lam, ngrid=ngrid, refine=refine)


# XLA's QDWH eigh workspace exceeds one v5e chip's 16 GB HBM past ~9k knots
# (measured: n=10000 wants 17.3 GB); above this the factorisation routes to
# the f64 host path.  O(n^3) dense TPS is host-viable well past this point —
# larger problems should use ops/nystrom.py regardless.
MAX_DEVICE_EIGH_KNOTS = 8192


def tps_fit_auto(coords, y, lam=None, ngrid: int = 200, refine: int = 40,
                 max_device_knots: int | None = None, method: str = "auto",
                 landmarks: int | None = None, key=None, mask=None) -> TPSModel:
    """``tps_fit`` with the production scale policy (BASELINE configs 3-5).

    Routing (``method="auto"``):

    * n <= ``max_device_knots`` (default 8192, the device-eigh HBM ceiling):
      **exact** dense factorisation (ops/tps.py, one GCV eigendecomposition).
    * n above the ceiling: **Nyström reduced-basis fit** (ops/nystrom.py)
      with ``landmarks`` centers (default 2048 up to 64k stations, 4096
      beyond).  This is a deliberate default, not just an OOM fallback —
      measured at the config-3 shape (10k stations x 19 responses, one v5e
      chip, round 3): exact host-f64 717 s vs Nyström-2048 10.3 s (70x).
      Measured against the exact fit directly (benchmarks/nystrom_vs_exact.py,
      6k stations x 2 responses, 2048 landmarks): the Nyström surface
      reproduces the exact fit's held-out predictions to R^2 >= 0.9998, and
      its held-out error against truth stays within 1.4x of the exact
      fit's — both being ~1% of the signal scale, i.e. noise-floor
      differences.  At TPS smoothing scales the reduced basis is not a
      meaningful accuracy sacrifice; the O(n^3) exact path is.

    ``method="exact"`` forces the dense factorisation at any n: on device
    below the HBM ceiling, else the f64 host path (ops/host_tps.py) — on
    EVERY backend, including CPU, where LAPACK f64 is both faster and more
    GCV-accurate than the f32 device-path twin (round-3 ADVICE).
    ``method="nystrom"`` forces the reduced-basis fit at any n.

    Dense rows only: ``mask`` raises (use tps_factor/tps_solve's mask-exact
    batching for padded tiles — the mltps tile path)."""
    if mask is not None:
        raise ValueError(
            "tps_fit_auto fits dense rows only; use tps_factor(coords, mask) "
            "+ tps_solve for the masked/padded-tile path"
        )
    limit = MAX_DEVICE_EIGH_KNOTS if max_device_knots is None else max_device_knots
    n = coords.shape[0]
    if method == "auto":
        method = "exact" if n <= limit else "nystrom"
    if method == "nystrom":
        from .nystrom import nystrom_tps_fit

        m = landmarks if landmarks is not None else (2048 if n <= 65536 else 4096)
        return nystrom_tps_fit(coords, y, m=min(m, n), lam=lam, key=key)
    if method != "exact":
        raise ValueError(f"unknown method {method!r}")
    if n <= limit:
        return tps_fit(coords, y, lam=lam, ngrid=ngrid, refine=refine)
    from .host_tps import tps_fit_host

    return tps_fit_host(coords, y, lam=lam, ngrid=ngrid, refine=refine)


def _predict_block(model: TPSModel, pts_scaled):
    """Spline evaluation at (m, 2) scaled points -> (m,) or (m, R).

    The phi @ c contraction runs at HIGHEST precision: c oscillates with
    large magnitude when lambda is small, so bfloat16 matmul inputs (the
    TPU default) wreck the cancellation the spline depends on.
    """
    with jax.default_matmul_precision("highest"):
        r2 = _pairwise_r2(pts_scaled, model.knots)
        phi = _phi(r2, pts_scaled.dtype)
        poly = jnp.concatenate(
            [jnp.ones((pts_scaled.shape[0], 1), pts_scaled.dtype), pts_scaled], axis=1
        )
        return phi @ model.c + poly @ model.d


def tps_predict(model: TPSModel, points) -> jax.Array:
    """Evaluate the spline at raw-coordinate points (m, 2)."""
    pts = (jnp.asarray(points) - model.shift) / model.scale
    return _predict_block(model, pts)


def tps_predict_grid(
    model: TPSModel,
    grid: GridSpec,
    block_rows: int = 256,
    use_pallas: bool | None = None,
    dtype=None,
) -> jax.Array:
    """Evaluate the spline at every cell center of ``grid``.

    Streams the cells-x-knots matvec in row blocks so HBM holds only the
    output; uses the Pallas kernel on TPU for the fused distance/phi/matvec
    (ops/pallas_tps.py), with a jnp fallback elsewhere.
    Returns (H, W) or (H, W, R).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .pallas_tps import tps_grid_pallas

        return tps_grid_pallas(model, grid, block_rows=block_rows, dtype=dtype)
    dtype = dtype or model.c.dtype
    xs = (grid.x_coords(dtype) - model.shift[0]) / model.scale[0]
    ys = (grid.y_coords(dtype) - model.shift[1]) / model.scale[1]

    def eval_rows(y_rows):
        pts = jnp.stack(
            [
                jnp.broadcast_to(xs[None, :], (y_rows.shape[0], grid.ncols)).reshape(-1),
                jnp.broadcast_to(y_rows[:, None], (y_rows.shape[0], grid.ncols)).reshape(-1),
            ],
            axis=1,
        )
        out = _predict_block(model, pts)
        out_shape = (y_rows.shape[0], grid.ncols) + out.shape[1:]
        return out.reshape(out_shape)

    blocks = []
    for r0 in range(0, grid.nrows, block_rows):
        blocks.append(eval_rows(ys[r0 : r0 + block_rows]))
    return jnp.concatenate(blocks, axis=0)

"""MARS — multivariate adaptive regression splines (additive, degree 1).

Mirrors the reference's ``earth::earth(form, data, nfold=10)`` (V73:250 CV,
V73:539 final): forward selection of reflected hinge pairs
(max(x_v - t, 0), max(t - x_v, 0)), then backward pruning by the GCV
criterion  GCV(M) = RSS/n / (1 - C(M)/n)^2  with effective parameter count
C(M) = terms + penalty*(terms-1)/2 and earth's additive-model penalty = 2.
(earth's ``nfold`` only adds CV variance estimates; pruning stays GCV-driven,
so it is not replicated here.)  Variable importance follows ``earth::evimp``
(V73:541): per-variable RSS and GCV criteria over the pruned model.

Forward-pass semantics follow earth's published algorithm (Friedman 1991
eqs. 43/45; earth's ForwardPass):

* **minspan/endspan knot filtering** — candidate knots sit only at training
  observations spaced ``minspan`` apart and at least ``endspan`` from either
  end of each variable's sorted values, with the automatic spans
  minspan = max(1, floor(-log2(-(1/(N*p)) * log(1-alpha)) / 2.5)) and
  endspan = max(1, floor(3 - log2(alpha/p))), alpha = 0.05;
* **RSq-delta stopping** — the pass stops before adding a pair whose best
  achievable RSq improvement is < ``thresh`` (earth default 0.001), or once
  RSq >= 1 - thresh, so the surviving term count is data-dependent;
* the maximum pair budget ``n_pairs`` mirrors earth's default
  nk = min(200, max(20, 2p+1)) + 1 (= 10 pairs for p <= 9).

TPU-native shape discipline: all candidate gains are computed in one batched
2x2-solve sweep over a static (variable, knot-rank) grid, the stop decision
rides a carried boolean (stopped pairs contribute zeroed basis columns), and
the backward pass prunes over a static mask — so the whole fit jits once and
vmaps across CV folds while reproducing earth's data-dependent behavior.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import as_weight

from ..utils.precision import highest_precision


class MARSState(NamedTuple):
    vars: jax.Array      # (T,) int32 variable per hinge pair
    knots: jax.Array     # (T,) knot location (raw scale)
    coef: jax.Array      # (2T + 1,) coefficients, 0 where pruned
    active: jax.Array    # (2T + 1,) float 0/1 column mask after pruning
    gcv: jax.Array       # () best GCV
    rss: jax.Array       # () RSS of the pruned model
    pair_active: jax.Array  # (T,) 0/1 — pairs the forward pass actually added
    parent: jax.Array    # (T,) int32 design-column index of each pair's parent
    #                      term (0 = intercept -> plain degree-1 hinges;
    #                      2i+1 / 2i+2 -> product with an earlier hinge column)


def _design(x, vars_, knots, parent=None):
    """Design matrix [1, t1+, t1-, t2+, t2-, ...] of shape (n, 2T+1).

    Degree 1 (``parent`` None or all-zero): columns are the reflected hinge
    pairs max(x_v - t, 0) / max(t - x_v, 0).  With interactions, pair i's
    columns are parent_col * hinge where ``parent[i]`` indexes an EARLIER
    design column (0 = intercept).  The sequential build is exact for the
    degree-1 case too (1.0 * h == h bitwise), so one path serves both."""
    n = x.shape[0]
    xv = x[:, vars_]                                   # (n, T)
    plus = jnp.maximum(xv - knots[None, :], 0.0)
    minus = jnp.maximum(knots[None, :] - xv, 0.0)
    if parent is None:
        cols = jnp.stack([plus, minus], axis=2).reshape(n, -1)
        return jnp.concatenate([jnp.ones((n, 1), x.dtype), cols], axis=1)
    t = vars_.shape[0]
    ncols = 2 * t + 1
    cols = jnp.zeros((n, ncols), x.dtype)
    cols = cols.at[:, 0].set(1.0)
    for i in range(t):
        # gather-free parent column: one-hot matmul over the built prefix
        pcol = cols @ jax.nn.one_hot(parent[i], ncols, dtype=x.dtype)
        cols = cols.at[:, 2 * i + 1].set(pcol * plus[:, i])
        cols = cols.at[:, 2 * i + 2].set(pcol * minus[:, i])
    return cols


def _masked_rss(bmat, ysw, mask, ridge=None):
    """RSS + coefficients of the OLS fit restricted to mask (0/1 columns).

    Two robustness requirements drive this implementation: columns are
    scale-normalised (hinges on raw covariates span many orders of
    magnitude), and the RSS is computed directly from the residual vector —
    reflected hinge pairs on one variable are *exactly* collinear with the
    intercept (plus - minus = x - t), so the Gram system is structurally
    rank-deficient and the textbook  yy - b'coef  shortcut is numerically
    meaningless there.  The ridge picks one of the equivalent solutions;
    the fit itself is unaffected."""
    if ridge is None:
        # f32 needs a much firmer ridge than f64: the hinge Gram is nearly
        # singular and an underrun here turns whole CV folds non-finite
        ridge = max(100.0 * float(jnp.finfo(bmat.dtype).eps), 1e-8)
    s = jnp.sqrt(jnp.maximum(jnp.sum(bmat * bmat, axis=0), 1e-30))
    bn = bmat / s[None, :]
    m = mask
    gm = (bn.T @ bn) * jnp.outer(m, m) + jnp.diag(1.0 - m) + ridge * jnp.diag(m)
    rhs = (bn.T @ ysw) * m
    coef_n = jnp.linalg.solve(gm, rhs)
    resid = ysw - bn @ (coef_n * m)
    return jnp.sum(resid * resid), coef_n * m / s


@highest_precision
def fit(
    key,
    x,
    y,
    *,
    sample_weight=None,
    n_pairs: int = 10,
    n_knots: int = 64,
    penalty: float = 2.0,
    ridge: float | None = None,
    thresh: float = 1e-3,
    minspan: int = 0,
    endspan: int = 0,
    degree: int = 1,
) -> MARSState:
    """``minspan``/``endspan`` = 0 selects earth's automatic spans from the
    (weighted) training count; ``thresh`` = 0 disables RSq-delta stopping
    (always spends the full ``n_pairs`` budget, the pre-fidelity behavior).

    ``degree`` mirrors earth's ``degree``: 1 (the default at every reference
    call site, V73:250/539 — earth's own default) builds additive hinge
    pairs; 2 allows product terms — each forward step picks the best
    (parent term, variable, knot) triple where the parent is the intercept
    or an existing degree-1 column on OTHER variables, and adds the
    reflected pair parent*h+/parent*h-.  earth's penalty for interactive
    models is 3 (its gcv docs); callers wanting that pass ``penalty=3``.
    Deviation from earth noted: interaction knot candidates reuse the
    global span-filtered grid rather than re-filtering within the parent's
    support (documented TPU-shape tradeoff: the candidate grid stays
    static).  When ``degree == 1`` the original single-parent code path
    runs unchanged (golden-stable)."""
    del key
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n, p = x.shape
    w = as_weight(sample_weight, n, x.dtype)
    n_eff = jnp.maximum(jnp.sum(w), 1.0)
    sw = jnp.sqrt(w)

    # spans (Friedman eq. 43/45, alpha=.05), on the weighted training count
    alpha = 0.05
    if minspan > 0:
        ms = jnp.asarray(float(minspan), x.dtype)
    else:
        ms = jnp.floor(
            -jnp.log2(-(1.0 / (n_eff * p)) * jnp.log1p(-alpha)) / 2.5
        )
        ms = jnp.maximum(ms, 1.0)
    if endspan > 0:
        es = jnp.asarray(float(endspan), x.dtype)
    else:
        es = jnp.maximum(jnp.floor(3.0 - jnp.log2(alpha / p)), 1.0)

    # knot candidates: training observations at sorted ranks es, es+step,
    # es+2*step, ... (earth's span-filtered knot set), one static (p, K) grid.
    # The stride is max(minspan, span/K) so the K candidates COVER the whole
    # span-eligible range [es, n_eff-es-1] — a bare ms stride caps candidates
    # at order statistic es+ms*(K-1), which for typical n leaves no knots in
    # the upper half of any covariate (hinges there fit R^2 ~0.5 instead of
    # ~1; earth filters ALL observations, it does not bottom-anchor).
    # Ranks past n_eff - es - 1 are invalid; their gains are masked out.
    order = jnp.argsort(x, axis=0)                              # (n, p)
    xs_sorted = jnp.take_along_axis(x, order, axis=0)
    w_sorted = w[order]
    cw = jnp.cumsum(w_sorted, axis=0)                           # (n, p) counts
    step = jnp.maximum(ms, (n_eff - 2.0 * es) / n_knots)
    ranks = es + step * jnp.arange(n_knots, dtype=x.dtype)      # (K,)
    rank_valid = ranks <= n_eff - es - 1.0                      # (K,)
    rank_valid = rank_valid.at[0].set(True)  # never an empty candidate set
    # first sorted index whose cumulative train count reaches rank+1
    idx = jnp.sum(cw[None, :, :] < (ranks + 1.0)[:, None, None], axis=1)  # (K, p)
    idx = jnp.clip(idx, 0, n - 1)
    knot_grid = jnp.take_along_axis(xs_sorted, idx, axis=0).T   # (p, K)
    cand_valid = jnp.broadcast_to(rank_valid[None, :], (p, n_knots)).reshape(-1)

    # all candidate hinge columns, raw and in sqrt-weight space
    xv = x.T[:, None, :]                                        # (p, 1, n)
    kg = knot_grid[:, :, None]                                  # (p, K, 1)
    raw_plus = jnp.maximum(xv - kg, 0.0).reshape(p * n_knots, n)
    raw_minus = jnp.maximum(kg - xv, 0.0).reshape(p * n_knots, n)
    cand_plus = raw_plus * sw[None, :]
    cand_minus = raw_minus * sw[None, :]

    ysw = y * sw
    q0 = sw / jnp.sqrt(n_eff)                                   # weighted intercept, unit norm
    tiny = jnp.asarray(1e-10, x.dtype)

    resid0 = ysw - (ysw @ q0) * q0
    tss = jnp.maximum(jnp.sum(resid0 * resid0), tiny)

    def forward_step(carry, _):
        q_basis, resid, stopped = carry                         # (n, M), (n,), ()
        # project candidates off the current basis
        pa = cand_plus - (cand_plus @ q_basis) @ q_basis.T      # (C, n)
        pb = cand_minus - (cand_minus @ q_basis) @ q_basis.T
        aa = jnp.sum(pa * pa, axis=1)
        bb = jnp.sum(pb * pb, axis=1)
        ab = jnp.sum(pa * pb, axis=1)
        ar = pa @ resid
        br = pb @ resid
        det = aa * bb - ab * ab
        # joint 2x2 gain, falling back to the better single column when the
        # pair is (near) collinear with the basis
        gain2 = jnp.where(
            det > tiny * jnp.maximum(aa * bb, tiny),
            (bb * ar * ar - 2 * ab * ar * br + aa * br * br) / jnp.maximum(det, tiny),
            0.0,
        )
        gain1 = jnp.maximum(
            jnp.where(aa > tiny, ar * ar / jnp.maximum(aa, tiny), 0.0),
            jnp.where(bb > tiny, br * br / jnp.maximum(bb, tiny), 0.0),
        )
        gain = jnp.maximum(gain2, gain1)
        gain = jnp.where(cand_valid, gain, -1.0)  # span-filtered knots only
        best = jnp.argmax(gain)
        # earth's ForwardPass termination: stop BEFORE adding a pair whose
        # RSq improvement falls below thresh, or once RSq >= 1 - thresh
        rss_cur = jnp.sum(resid * resid)
        rsq_cur = 1.0 - rss_cur / tss
        delta_rsq = jnp.maximum(gain[best], 0.0) / tss
        stopped = stopped | (delta_rsq < thresh) | (rsq_cur >= 1.0 - thresh)
        add = jnp.where(stopped, 0.0, 1.0).astype(x.dtype)
        # orthonormalise the chosen pair into the basis (zeroed if stopped,
        # which leaves basis and residual unchanged for the remaining steps)
        u1 = pa[best]
        n1 = jnp.sqrt(jnp.maximum(jnp.sum(u1 * u1), tiny))
        e1 = jnp.where(n1 > 1e-6, u1 / n1, 0.0) * add
        u2 = pb[best] - (pb[best] @ e1) * e1
        n2 = jnp.sqrt(jnp.maximum(jnp.sum(u2 * u2), tiny))
        e2 = jnp.where(n2 > 1e-6, u2 / n2, 0.0) * add
        resid = resid - (resid @ e1) * e1 - (resid @ e2) * e2
        q_basis = jnp.concatenate([q_basis, e1[:, None], e2[:, None]], axis=1)
        return (q_basis, resid, stopped), (best, add)

    # lax.scan would be natural here, but the basis grows each step; with a
    # static small n_pairs a Python loop unrolls fine under jit.
    q_basis = q0[:, None]
    resid = resid0
    stopped = jnp.asarray(False)
    picks, adds, parents = [], [], []
    if degree <= 1:
        for _ in range(n_pairs):
            (q_basis, resid, stopped), (best, add) = forward_step(
                (q_basis, resid, stopped), None
            )
            picks.append(best)
            adds.append(add)
            parents.append(jnp.asarray(0, jnp.int32))
    else:
        # general (interaction) forward pass: candidates are (parent term,
        # hinge pair) products.  Parent columns are carried RAW (no sw) so a
        # product with the sw-weighted hinge candidates lands in sqrt-weight
        # space exactly once; the intercept parent row of ones reproduces the
        # degree-1 candidate set bitwise.
        n_cand = p * n_knots
        p_max = 2 * n_pairs + 1
        cand_var = jnp.arange(n_cand, dtype=jnp.int32) // n_knots
        parent_raw = jnp.zeros((p_max, n), x.dtype).at[0].set(1.0)
        parent_ok = jnp.zeros((p_max,), x.dtype).at[0].set(1.0)
        used_vars = jnp.zeros((p_max, p), x.dtype)
        col_deg = jnp.zeros((p_max,), x.dtype)

        for i in range(n_pairs):
            qb, rs = q_basis, resid  # close over this step's shapes

            def per_parent(args):
                pr, uv, pok = args
                ca = pr[None, :] * cand_plus                   # (C, n)
                cb = pr[None, :] * cand_minus
                pa = ca - (ca @ qb) @ qb.T
                pb = cb - (cb @ qb) @ qb.T
                aa = jnp.sum(pa * pa, axis=1)
                bb = jnp.sum(pb * pb, axis=1)
                ab = jnp.sum(pa * pb, axis=1)
                ar = pa @ rs
                br = pb @ rs
                det = aa * bb - ab * ab
                gain2 = jnp.where(
                    det > tiny * jnp.maximum(aa * bb, tiny),
                    (bb * ar * ar - 2 * ab * ar * br + aa * br * br)
                    / jnp.maximum(det, tiny),
                    0.0,
                )
                gain1 = jnp.maximum(
                    jnp.where(aa > tiny, ar * ar / jnp.maximum(aa, tiny), 0.0),
                    jnp.where(bb > tiny, br * br / jnp.maximum(bb, tiny), 0.0),
                )
                gain = jnp.maximum(gain2, gain1)
                valid = cand_valid & (pok > 0) & (uv[cand_var] == 0)
                return jnp.where(valid, gain, -1.0)

            gains = jax.lax.map(per_parent, (parent_raw, used_vars, parent_ok))
            best = jnp.argmax(gains)                           # flat (P*C)
            bp = (best // n_cand).astype(jnp.int32)
            bc = (best % n_cand).astype(jnp.int32)
            rss_cur = jnp.sum(resid * resid)
            rsq_cur = 1.0 - rss_cur / tss
            delta_rsq = jnp.maximum(gains.reshape(-1)[best], 0.0) / tss
            stopped = stopped | (delta_rsq < thresh) | (rsq_cur >= 1.0 - thresh)
            add = jnp.where(stopped, 0.0, 1.0).astype(x.dtype)

            prow = parent_raw[bp]
            ca1 = prow * cand_plus[bc]
            cb1 = prow * cand_minus[bc]
            pa1 = ca1 - q_basis @ (q_basis.T @ ca1)
            pb1 = cb1 - q_basis @ (q_basis.T @ cb1)
            n1 = jnp.sqrt(jnp.maximum(jnp.sum(pa1 * pa1), tiny))
            e1 = jnp.where(n1 > 1e-6, pa1 / n1, 0.0) * add
            u2 = pb1 - (pb1 @ e1) * e1
            n2 = jnp.sqrt(jnp.maximum(jnp.sum(u2 * u2), tiny))
            e2 = jnp.where(n2 > 1e-6, u2 / n2, 0.0) * add
            resid = resid - (resid @ e1) * e1 - (resid @ e2) * e2
            q_basis = jnp.concatenate([q_basis, e1[:, None], e2[:, None]], axis=1)

            # bookkeeping for future steps' parent set
            c_plus, c_minus = 2 * i + 1, 2 * i + 2
            parent_raw = (
                parent_raw.at[c_plus].set(prow * raw_plus[bc] * add)
                .at[c_minus].set(prow * raw_minus[bc] * add)
            )
            nd = col_deg[bp] + 1.0
            col_deg = col_deg.at[c_plus].set(nd).at[c_minus].set(nd)
            elig = add * jnp.where(nd < degree, 1.0, 0.0)
            parent_ok = parent_ok.at[c_plus].set(elig).at[c_minus].set(elig)
            uvn = used_vars[bp].at[cand_var[bc]].set(1.0)
            used_vars = used_vars.at[c_plus].set(uvn * add).at[c_minus].set(uvn * add)

            picks.append(bc)
            adds.append(add)
            parents.append(bp)
    picks = jnp.stack(picks)
    pair_active = jnp.stack(adds)                               # (T,) 0/1
    parent_arr = jnp.stack(parents).astype(jnp.int32)
    vars_ = (picks // n_knots).astype(jnp.int32)
    flat_knots = knot_grid.reshape(-1)
    knots = flat_knots[picks]

    # ---- backward pruning by GCV over the static design -------------------
    b_full = _design(
        x, vars_, knots, parent_arr if degree > 1 else None
    ) * sw[:, None]                                             # (n, 2T+1)
    ncols = b_full.shape[1]

    def gcv_of(rss, m_count):
        c = m_count + penalty * (m_count - 1.0) / 2.0
        denom = jnp.maximum(1.0 - c / n_eff, 1.0 / n_eff) ** 2
        return rss / n_eff / denom

    col_ids = jnp.arange(ncols)

    def prune_step(carry, _):
        mask, best_gcv, best_mask = carry
        # try removing each active non-intercept column
        def rss_without(j):
            mj = mask * (col_ids != j)
            rss, _ = _masked_rss(b_full, ysw, mj, ridge)
            return rss

        cand_rss = jax.vmap(rss_without)(col_ids)
        removable = (mask > 0) & (col_ids > 0)
        cand_rss = jnp.where(removable, cand_rss, jnp.inf)
        j = jnp.argmin(cand_rss)
        new_mask = mask * (col_ids != j)
        m_count = jnp.sum(new_mask)
        gcv = gcv_of(cand_rss[j], m_count)
        better = gcv < best_gcv
        best_gcv = jnp.where(better, gcv, best_gcv)
        best_mask = jnp.where(better, new_mask, best_mask)
        return (new_mask, best_gcv, best_mask), None

    # pairs the forward pass never added (RSq-delta stop) start pruned out
    full_mask = jnp.concatenate(
        [jnp.ones((1,), x.dtype), jnp.repeat(pair_active, 2)]
    )
    rss_full, _ = _masked_rss(b_full, ysw, full_mask, ridge)
    best_gcv0 = gcv_of(rss_full, jnp.sum(full_mask))
    (final_mask, best_gcv, best_mask), _ = jax.lax.scan(
        prune_step, (full_mask, best_gcv0, full_mask), None, length=ncols - 1
    )
    del final_mask
    rss_best, coef = _masked_rss(b_full, ysw, best_mask, ridge)
    return MARSState(
        vars=vars_, knots=knots, coef=coef, active=best_mask, gcv=best_gcv,
        rss=rss_best, pair_active=pair_active, parent=parent_arr,
    )


@highest_precision
def predict(state: MARSState, x) -> jax.Array:
    b = _design(jnp.asarray(x), state.vars, state.knots, state.parent)
    return b @ (state.coef * state.active)


def importance(state: MARSState, x, y, names, sample_weight=None) -> dict:
    """evimp-style report: per variable, number of surviving terms and the RSS
    increase from deleting all of its terms (normalised to 100 for the worst).
    A term "involves" a variable when it appears anywhere in the term's factor
    chain (itself or via the parent product), so degree-2 terms count for both
    of their variables — matching evimp's term-subset accounting."""
    import numpy as np

    x = jnp.asarray(x)
    y = jnp.asarray(y)
    w = as_weight(sample_weight, x.shape[0], x.dtype)
    sw = jnp.sqrt(w)
    b = _design(x, state.vars, state.knots, state.parent) * sw[:, None]
    ysw = y * sw
    p = len(names)
    t = int(state.vars.shape[0])
    vars_np = np.asarray(state.vars)
    parent_np = np.asarray(state.parent)
    invol = np.zeros((2 * t + 1, p), bool)  # column -> variables in its chain
    for i in range(t):
        chain = invol[parent_np[i]].copy()
        chain[vars_np[i]] = True
        invol[2 * i + 1] = invol[2 * i + 2] = chain
    out = {}
    deltas = []
    nterms = []
    active_np = np.asarray(state.active)
    for v in range(p):
        mv = state.active * jnp.asarray(~invol[:, v], state.active.dtype)
        rss_v, _ = _masked_rss(b, ysw, mv)
        deltas.append(float(rss_v - state.rss))
        nterms.append(int((active_np * invol[:, v]).sum()))
    dmax = max(max(deltas), 1e-12)
    for i, n in enumerate(names):
        out[n] = {"nsubsets": nterms[i], "rss": 100.0 * deltas[i] / dmax}
    return out

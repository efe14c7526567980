"""mltps — the end-to-end ensemble + thin-plate-spline downscaling pipeline.

Equivalent of ``machisplin.mltps(int.values, covar.ras, tps,
smooth.outputs.only, trouble)`` (V73:114-968), restructured TPU-first:

part 0  input prep: LONG/LAT bands appended to the covariate stack, stack
        values gathered at the stations, NA rows dropped with the <75%
        coverage warning (V73:123-195);
part 1  10-fold CV of the six algorithms (vmapped folds) and the 0-1 weight
        search over summed squared weighted residuals, with the reference's
        rounded-weight > 5%-of-total keep rule (V73:204-429);
part 2  final refits of the kept algorithms on all rows, weighted raster
        prediction streamed over the grid in row blocks, weighted point
        residuals, per-algorithm variable importance (V73:430-631);
part 3  thin-plate spline of the ensemble residuals, auto-tiled into
        1500-px blocks with +-20% fit / +-2.5% mosaic overlaps, <10-point
        tiles short-circuiting to zero surfaces (V73:636-753) — tiles are
        solved as ONE batched masked TPS factorisation instead of a serial
        R loop;
part 4  linear-ramp feathering of tile seams (V73:756-896 via ops/feather);
part 5  final = ensemble + error surface, final R^2 at the stations, and the
        keep-the-correction-only-if-R^2-improves rule (V73:898-965).

Output mirrors the reference's per-layer ``omega[[i]]`` contract: $final
raster, $residuals (residual, long, lat), $var.imp, $summary, $n.layers.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ensemble.cv import CVConfig, residual_matrix, run_cv
from ..ensemble.weights import WeightResult, optimize_weights_lbfgsb, optimize_weights_sweep
from ..grid import GridSpec, Raster, crop, extract, lonlat_rasters, mosaic, stack
from ..models import brt, gam, gbm_step, mars, nn, rf, svm
from ..models.base import LETTER_TO_NAME
from ..ops.feather import feather_blend
from ..ops.tps import tps_fit, tps_predict_grid
from ..utils.precision import highest_precision
from .importance import breakdown_importance

log = logging.getLogger("machisplin")

SMOOTH_LETTERS = "gnmv"  # BRT and RF excluded under smooth.outputs.only (V73:366-393)


@dataclasses.dataclass(frozen=True)
class MLTPSConfig:
    """Pipeline hyperparameters; defaults mirror the reference call sites."""

    cv: CVConfig = dataclasses.field(default_factory=CVConfig)
    final_brt: dict = dataclasses.field(
        default_factory=lambda: dict(
            tree_complexity=5, learning_rate=0.001, bag_fraction=0.5,
            step_size=50, max_trees=10000,
        )
    )
    final_rf: dict = dataclasses.field(default_factory=lambda: dict(ntree=500))
    final_nn: dict = dataclasses.field(default_factory=lambda: dict(hidden=10, maxit=10000))
    final_mars: dict = dataclasses.field(default_factory=dict)
    final_svm: dict = dataclasses.field(default_factory=dict)
    final_gam: dict = dataclasses.field(default_factory=dict)
    tps_tile_px: int = 1500          # V73:656-660
    tps_fit_overlap: float = 0.2     # V73:673
    tps_mosaic_overlap: float = 0.025  # V73:680
    min_tile_points: int = 10        # V73:710
    tps_batch_tiles: bool = True     # one vmapped masked solve for all tiles
    tps_tile_chunk: int = 16         # tiles solved/predicted per device batch
    weight_optimizer: str = "lbfgsb"  # or "sweep" (TPU batched candidate sweep)
    batch_final_brt: bool = True  # batch gbm.step final fits across responses
    batch_final_rf: bool = True   # merge RF finals into one raster pass
    letters_pool: str | None = None  # restrict the algorithm pool (extension)
    predict_block_rows: int = 256
    svm_importance_sample: int = 200  # V73:564
    use_pallas: bool | None = None
    # device mesh for multi-chip runs: TPS tiles shard across it (spatial
    # parallelism over the reference's serial tile loop, V73:690-738), raster
    # prediction shards row panels, and the vmappable CV algorithms shard
    # their (response x fold) batch axis.  None = single device.
    mesh: Any = None


@dataclasses.dataclass
class LayerResult:
    """Per-response output, the reference's omega[[i]] contract (V73:955)."""

    name: str
    final: Raster
    residuals: np.ndarray           # (n, 3) residual, long, lat (V73:627/914)
    var_imp: dict[str, Any]
    summary: dict[str, Any]
    n_layers: int
    ensemble: Raster | None = None  # pre-correction ensemble surface
    tps_surface: Raster | None = None
    weights: WeightResult | None = None


def predict_over_stack(predict_fn, rast_stack: Raster, block_rows: int = 256, mesh=None,
                       out_cols: int | None = None):
    """Stream model prediction over the grid in row blocks -> (H, W).

    Replaces terra::predict(rast_stack, model) (V73:468/497/521/543/582/604).
    Cells with any NaN covariate predict NaN.  Functions marked
    ``prefers_host=True`` (tree ensembles routed to the C++ predictor) are
    called with concrete blocks instead of being jitted.  With a ``mesh``,
    each block's cell rows shard across the devices (the model parameters
    replicate — dp over cells), so every chip predicts its panel of the grid.

    ``out_cols``: set when predict_fn returns (m, R) — a response-batched
    final model (one program predicts every response's surface in a single
    grid pass); the result is then (H, W, R).
    """
    c, h, w = rast_stack.data.shape
    rows = []
    host = getattr(predict_fn, "prefers_host", False)
    # Pallas kernels (the forest predictors' device path) cannot be
    # auto-partitioned by GSPMD — those fns shard through an explicit
    # shard_map over the cell-row axis instead (each device runs the kernel
    # on its panel; the leaf tables are closed-over constants, replicated)
    manual = getattr(predict_fn, "manual_shard", False)

    def masked(x):
        ok = jnp.all(jnp.isfinite(x), axis=1)
        pred = predict_fn(jnp.where(ok[:, None], x, 0.0))
        if out_cols is not None:
            return jnp.where(ok[:, None], pred, jnp.nan)
        return jnp.where(ok, pred, jnp.nan)

    pad_to = 1
    if host:
        fn = masked
    elif mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(mesh.axis_names[0])
        if manual:
            fn = jax.jit(
                jax.shard_map(masked, mesh=mesh, in_specs=spec, out_specs=spec)
            )
        else:
            s = NamedSharding(mesh, spec)
            fn = jax.jit(masked, in_shardings=s, out_shardings=s)
        pad_to = int(np.prod(mesh.devices.shape))
    else:
        fn = jax.jit(masked)
    for r0 in range(0, h, block_rows):
        blk = rast_stack.data[:, r0 : r0 + block_rows, :]
        x = jnp.moveaxis(blk, 0, -1).reshape(-1, c)
        m = x.shape[0]
        rem = (-m) % pad_to  # sharded cell axis must divide the mesh
        if rem:
            x = jnp.concatenate([x, jnp.full((rem, c), jnp.nan, x.dtype)])
        out_shape = (
            (blk.shape[1], w) if out_cols is None else (blk.shape[1], w, out_cols)
        )
        rows.append(fn(x)[:m].reshape(out_shape))
    return jnp.concatenate(rows, axis=0)


def _prepare_inputs(int_values, covar_ras: Raster):
    """Part 0: stack assembly + station extraction (V73:123-195)."""
    arr = np.asarray(int_values)
    if arr.dtype.names:
        names = list(arr.dtype.names)
        cols = np.stack([arr[n] for n in names], axis=1).astype(np.float64)
    else:
        raise ValueError(
            "int_values must be a structured array with named columns "
            "(long, lat, <responses...>)"
        )
    if names[0].lower() not in ("long", "lon", "x") or names[1].lower() not in ("lat", "y"):
        log.warning("first two columns expected to be long, lat; got %s", names[:2])
    resp_names = names[2:]

    if isinstance(covar_ras.data, np.ndarray):
        # HOST covariates (large-landscape workflows build them with
        # Raster.host): the station extraction is a tiny one-time gather —
        # numpy does it in microseconds, while routing it through the
        # device costs uploading the whole stack over the axon tunnel plus
        # a TPU gather compile (~20 min at config-3's 16 Mcell stack,
        # round 5).  The LONG/LAT bands stay numpy too; predict_over_stack
        # device_puts row blocks as it streams, so nothing else changes.
        g = covar_ras.grid
        xs_c = g.xmin + (np.arange(g.ncols, dtype=np.float64) + 0.5) * g.dx
        ys_c = g.ymax - (np.arange(g.nrows, dtype=np.float64) + 0.5) * g.dy
        cdat = covar_ras.data if covar_ras.data.ndim == 3 else covar_ras.data[None]
        dt = cdat.dtype
        stack_np = np.concatenate([
            cdat,
            np.broadcast_to(xs_c.astype(dt)[None, None, :], (1,) + g.shape),
            np.broadcast_to(ys_c.astype(dt)[:, None][None], (1,) + g.shape),
        ])
        rast_stack = Raster(
            stack_np, g, tuple(covar_ras.names) + ("LONG", "LAT")
        )
        # cell-center semantics identical to grid.extract (V73:145)
        col = np.floor((cols[:, 0] - g.xmin) / g.dx).astype(np.int64)
        row = np.floor((g.ymax - cols[:, 1]) / g.dy).astype(np.int64)
        inside = (row >= 0) & (row < g.nrows) & (col >= 0) & (col < g.ncols)
        rs = np.clip(row, 0, g.nrows - 1)
        cs = np.clip(col, 0, g.ncols - 1)
        vals = stack_np[:, rs, cs].T.astype(np.float64)      # (n, C+2)
        vals[~inside] = np.nan
    else:
        rast_stack = stack(
            [covar_ras, lonlat_rasters(covar_ras.grid, covar_ras.data.dtype)]
        )
        # extraction runs under ONE jit: the round-4 eager caution (a >60
        # min stall once coincided with a jit attempt, but reproduced after
        # the revert — pool-side) was finally A/B'd on a calm round-5 pool:
        # jit 25.7 ms vs eager 38.6 ms warm, and one dispatch instead of ~8
        # tunnel round trips cold (artifacts/round5, input_prep A/B).
        # The raster DATA is a jit argument, not a closure: a closed-over
        # array bakes into the program as a constant, and at config-4 scale
        # (1e8-cell stack) the remote-compile upload exceeds the axon
        # tunnel's request cap (HTTP 413, round-5 config4_pipeline).
        grid_, names_ = rast_stack.grid, rast_stack.names
        vals = np.asarray(
            jax.jit(
                lambda data, lo, la: extract(Raster(data, grid_, names_), lo, la)
            )(rast_stack.data, cols[:, 0], cols[:, 1])
        )                                                    # (n, C+2)
    full = np.concatenate([cols, vals], axis=1)
    keep = np.all(np.isfinite(full), axis=1)
    if keep.mean() < 0.75:
        log.warning(
            "Warning! %d points fell outside of input co-variate rasters (of %d "
            "total input). Consider using co-variates that match the full extent "
            "of the input data",
            int((~keep).sum()), len(keep),
        )
    full = full[keep]
    covar_names = list(rast_stack.names)
    x = full[:, len(names):]                 # station covariates (incl LONG, LAT)
    responses = {rn: full[:, 2 + i] for i, rn in enumerate(resp_names)}
    coords = full[:, :2]
    return rast_stack, covar_names, coords, x, responses


def _forest_tables(trees, n_feat: int, mesh=None):
    """Bin-interval leaf tables for the device forest predictor; None on a
    single-device CPU run (where raster tree prediction routes to the C++
    host path instead).  With a mesh the tables are always built — the
    bin-interval predictor (jnp twin on CPU, Pallas kernel on TPU) is the
    only forest path that shards across devices."""
    if mesh is None and jax.default_backend() == "cpu":
        return None
    from ..ops.pallas_forest import build_leaf_bins

    return build_leaf_bins(trees, n_feat=n_feat)


def _fit_final(letter, key, x, y, names, config: MLTPSConfig):
    """Final-fit one algorithm on all rows; returns (predict_fn, var_imp).

    predict_fn maps (m, p) covariates -> (m,) response (raster + stations)."""
    if letter == "g":
        state = gam.fit(None, x, y, **config.final_gam)
        return (lambda q: gam.predict(state, q)), gam.importance(state, names)
    if letter == "n":
        y_np = np.asarray(y)
        y_min = float(y_np.min())
        y_max = float((y_np - y_min).max())
        state = nn.fit(key, x, (y - y_min) / y_max, **config.final_nn)
        imp = nn.importance(state, names)
        return (lambda q: nn.predict(state, q) * y_max + y_min), imp
    if letter == "m":
        state = mars.fit(None, x, y, **config.final_mars)
        imp = mars.importance(state, x, y, names)
        return (lambda q: mars.predict(state, q)), imp
    if letter == "v":
        state = svm.fit(key, x, y, **config.final_svm)
        imp = breakdown_importance(
            lambda q: svm.predict(state, q), np.asarray(x), names,
            n_sample=config.svm_importance_sample, seed=1313,
        )
        return (lambda q: svm.predict(state, q)), imp
    if letter == "r":
        state = rf.fit(key, x, y, **config.final_rf)
        imp = rf.importance(state, x, y, names)
        tabs = _forest_tables(state.trees, np.asarray(x).shape[1], config.mesh)
        fn = lambda q: rf.predict(state, q, tables=tabs)
        # with device tables the bin-interval kernel is fully jittable, so
        # raster panels stream through ONE compiled program (the TPS-path
        # treatment), sharding across any mesh via shard_map; without them
        # (single-device CPU) blocks stay eager so the C++ host predictor
        # can take large batches
        fn.prefers_host = tabs is None
        fn.manual_shard = True
        return fn, imp
    if letter == "b":
        res = gbm_step.fit(key, x, y, **config.final_brt)
        imp = gbm_step.importance(res, names)
        # build leaf tables from the ACTIVE prefix only: trees beyond
        # best.trees were grown (static budget) but carry zero weight, and
        # the kernel's membership cost scales with total leaf slots whether
        # or not a leaf can contribute.  Exact: tree_active is a prefix
        # mask, and prefix-built tables index correctly into the full
        # forest at predict time.
        nt = max(int(res.best_trees), 1)
        trimmed = jax.tree_util.tree_map(lambda a: a[:nt], res.final.trees)
        tabs = _forest_tables(trimmed, np.asarray(x).shape[1], config.mesh)
        fn = lambda q: gbm_step.predict(res, q, tables=tabs)
        fn.prefers_host = tabs is None
        fn.manual_shard = True
        return fn, imp
    raise ValueError(letter)


_VMAP_FINAL = "gnmv"        # letters whose final fits batch across responses


def _state_slice(states, j):
    """Per-response view of a vmapped model state (leading batch axis)."""
    return jax.tree_util.tree_map(lambda a: a[j], states)


def _fit_final_batched(letter, keys, x, ycols, names, config: MLTPSConfig):
    """Final-fit one vmappable algorithm for SEVERAL responses in one
    program.  Returns (batched_predict_fn (m, p) -> (m, R), [per-response
    importance dicts]).

    The caller passes the same per-(response, letter) PRNG keys the serial
    path derives, so the fits are the same MODELS; agreement is
    statistical, not bitwise — batched matmuls reorder floating-point
    accumulation inside the training loops (~1e-3 in trained-model R²,
    the same caveat the mesh-sharded CV documents).  What changes is the
    execution: one fit program and ONE raster pass per letter instead of
    one per (letter x response) — the difference between O(R) and O(1)
    dispatch sequences for the part-2 phase at config-3's 19-response
    scale (measured on the bundled 2-response workload: NN final fit +
    raster pass 8.5 s -> 5.2 s).
    """
    ycols = jnp.asarray(ycols)
    n_resp = ycols.shape[1]
    if letter == "g":
        fit = jax.jit(jax.vmap(lambda yy: gam.fit(None, x, yy, **config.final_gam)))
        states = fit(ycols.T)
        fn = lambda q: jax.vmap(lambda s: gam.predict(s, q))(states).T
        imps = [gam.importance(_state_slice(states, j), names) for j in range(n_resp)]
        return fn, imps
    if letter == "n":
        # the reference's response min-shift/max-scale (V73:454-459), per column
        y_min = jnp.min(ycols, axis=0)
        y_max = jnp.maximum(jnp.max(ycols - y_min[None, :], axis=0), 1e-30)
        yn = (ycols - y_min[None, :]) / y_max[None, :]
        nn_cfg = dict(config.final_nn)
        maxit = int(nn_cfg.pop("maxit", 10000))
        from ..ensemble.cv import _NN_DISPATCH_WORK

        n_rows = int(np.asarray(x).shape[0])
        if n_resp * n_rows * maxit <= _NN_DISPATCH_WORK:
            fit = jax.jit(jax.vmap(
                lambda kk, yy: nn.fit(kk, x, yy, maxit=maxit, **nn_cfg)
            ))
            states = fit(keys, yn.T)
        else:
            # bounded-duration dispatches (the CV letter's segmented
            # driver, same bit-identical step sequence)
            seg = max(200, int(_NN_DISPATCH_WORK // max(n_resp * n_rows, 1)))
            init_kw = {k_: v for k_, v in nn_cfg.items() if k_ in ("hidden", "init_range")}
            decay = float(nn_cfg.get("decay", 0.0))
            init_v = jax.jit(jax.vmap(
                lambda kk, yy: nn.fit_carry_init(kk, x, yy, **init_kw)
            ))
            carry = init_v(keys, yn.T)
            segments = [seg] * (maxit // seg) + ([maxit % seg] if maxit % seg else [])
            step_cache = {}
            for s_ in segments:
                if s_ not in step_cache:
                    step_cache[s_] = jax.jit(jax.vmap(
                        lambda c, yy, s=s_: nn.fit_carry_steps(
                            c, x, yy, steps=s, decay=decay
                        )
                    ))
                carry = step_cache[s_](carry, yn.T)
            states = jax.vmap(nn.carry_to_state)(carry)
        fn = (
            lambda q: jax.vmap(lambda s: nn.predict(s, q))(states).T
            * y_max[None, :] + y_min[None, :]
        )
        imps = [nn.importance(_state_slice(states, j), names) for j in range(n_resp)]
        return fn, imps
    if letter == "m":
        fit = jax.jit(jax.vmap(lambda yy: mars.fit(None, x, yy, **config.final_mars)))
        states = fit(ycols.T)
        fn = lambda q: jax.vmap(lambda s: mars.predict(s, q))(states).T
        imps = [
            mars.importance(_state_slice(states, j), x, ycols[:, j], names)
            for j in range(n_resp)
        ]
        return fn, imps
    if letter == "v":
        fit = jax.jit(jax.vmap(lambda kk, yy: svm.fit(kk, x, yy, **config.final_svm)))
        # each fit holds an (n, n) kernel + solver temps: bound the vmapped
        # response width to ~2 GB (at config-3's 10k stations that is 1-2
        # responses per program; at the bundled 813 it is all of them)
        n_rows = int(np.asarray(x).shape[0])
        vchunk = max(1, int(0.5e9 // max(3 * n_rows * n_rows, 1)))
        if n_resp <= vchunk:
            states = fit(keys, ycols.T)
        else:
            parts = [
                fit(keys[s : s + vchunk], ycols.T[s : s + vchunk])
                for s in range(0, n_resp, vchunk)
            ]
            states = jax.tree_util.tree_map(
                lambda *a: jnp.concatenate(a, axis=0), *parts
            )
        fn = lambda q: jax.vmap(lambda s: svm.predict(s, q))(states).T
        imps = [
            breakdown_importance(
                lambda q, s=_state_slice(states, j): svm.predict(s, q),
                np.asarray(x), names,
                n_sample=config.svm_importance_sample, seed=1313,
            )
            for j in range(n_resp)
        ]
        return fn, imps
    raise ValueError(letter)


def _tps_tiles(grid: GridSpec, config: MLTPSConfig):
    """The reference's auto-tiling plan: fit extents (+-20%) and mosaic
    extents (+-2.5%) for ceil(n/1500)-per-axis blocks, row-major from the
    bottom-left (V73:650-681)."""
    n_rx = -(-grid.nrows // config.tps_tile_px)
    n_cx = -(-grid.ncols // config.tps_tile_px)
    xmin, xmax, ymin, ymax = grid.extent
    long_d = (xmax - xmin) / n_cx
    lat_d = (ymax - ymin) / n_rx
    fo, mo = config.tps_fit_overlap, config.tps_mosaic_overlap
    fit_exts, mosaic_exts = [], []
    for j in range(1, n_rx + 1):
        for h in range(1, n_cx + 1):
            fit_exts.append((
                xmin + long_d * (h - 1) - long_d * fo,
                xmin + long_d * h + long_d * fo,
                ymin + lat_d * (j - 1) - lat_d * fo,
                ymin + lat_d * j + lat_d * fo,
            ))
            mosaic_exts.append((
                xmin + long_d * (h - 1) - long_d * mo,
                xmin + long_d * h + long_d * mo,
                ymin + lat_d * (j - 1) - lat_d * mo,
                ymin + lat_d * j + lat_d * mo,
            ))
    return n_rx, n_cx, fit_exts, mosaic_exts


def _tps_error_surface(coords, res_mat, rast_stack: Raster, config: MLTPSConfig):
    """Part 3+4: tiled TPS of residuals, feathered into one surface.

    ``res_mat`` is (n,) or (n, R): EVERY response's residual field solves
    through ONE factorisation batch (the station coordinates — and hence
    the tile kernel matrices — are shared across responses; only the
    right-hand sides differ, V73:688's Full.cords observation made
    structural), and the R surfaces ride the band axis through crop/
    feather/mosaic.  Returns a Raster with data (R, H, W)."""
    grid = rast_stack.grid
    n_rx, n_cx, fit_exts, mosaic_exts = _tps_tiles(grid, config)
    n_tiles = n_rx * n_cx
    dtype = rast_stack.data.dtype
    res_mat = np.asarray(res_mat)
    single = res_mat.ndim == 1
    if single:
        res_mat = res_mat[:, None]
    n_resp = res_mat.shape[1]

    def to_bands(surf):  # (rows, cols, R) -> (R, rows, cols)
        return jnp.moveaxis(surf, -1, 0)

    def out(r: Raster):  # 1-D input keeps the legacy (H, W) contract
        return Raster(r.data[0], r.grid, r.names) if single else r

    if n_tiles == 1:
        model = tps_fit(jnp.asarray(coords, dtype), jnp.asarray(res_mat, dtype))
        surf = tps_predict_grid(model, grid, use_pallas=config.use_pallas)
        return out(Raster(to_bands(surf), grid)), n_tiles

    first_layer = rast_stack.band(0)
    crops = [crop(first_layer, fit_exts[h]) for h in range(n_tiles)]
    sels = []
    for h, rb in enumerate(crops):
        # stations inside the fit extent with a valid first covariate (V73:701-706)
        vals = np.asarray(extract(rb, coords[:, 0], coords[:, 1]))
        sels.append(np.isfinite(vals))

    if config.tps_batch_tiles:
        surfs = _batched_tile_surfaces(coords, res_mat, crops, sels, config, dtype)
    else:
        surfs = []
        for h, (rb, sel) in enumerate(zip(crops, sels)):
            if int(sel.sum()) < config.min_tile_points:
                log.info("tile %d: %d points -> zero surface", h + 1, int(sel.sum()))
                surfs.append(
                    Raster(jnp.zeros((n_resp,) + rb.grid.shape, dtype), rb.grid)
                )
            else:
                model = tps_fit(
                    jnp.asarray(coords[sel], dtype), jnp.asarray(res_mat[sel], dtype)
                )
                surf = tps_predict_grid(model, rb.grid, use_pallas=config.use_pallas)
                surfs.append(Raster(to_bands(surf), rb.grid))
    tiles = [crop(s, mosaic_exts[h]) for h, s in enumerate(surfs)]
    return out(feather_blend(tiles, n_rx, n_cx, grid)), n_tiles


def _batched_tile_surfaces(coords, res_mat, crops, sels, config, dtype):
    """All TPS tiles as ONE vmapped masked factorisation + traced-origin
    prediction (parallel/sharded.py) instead of a serial per-tile loop —
    the TPU-native replacement for the reference's R loop (V73:690-738).
    ``res_mat`` is (n, R): responses batch in the factorisation's trailing
    matmul dimension; each returned Raster carries (R, rows, cols).

    Tiles below the <10-point threshold become zero surfaces (V73:710-721).
    Edge tiles are smaller than interior ones; all evaluate at the maximal
    tile shape (traced origins) and crop down afterwards."""
    from ..parallel.sharded import batched_tile_solve, pack_tiles

    n_resp = res_mat.shape[1]
    n_tiles = len(crops)
    live = [h for h in range(n_tiles) if int(sels[h].sum()) >= config.min_tile_points]
    for h in range(n_tiles):
        if h not in live:
            log.info("tile %d: %d points -> zero surface", h + 1, int(sels[h].sum()))
    surfs: list = [None] * n_tiles
    for h in range(n_tiles):
        if h not in live:
            surfs[h] = Raster(
                jnp.zeros((n_resp,) + crops[h].grid.shape, dtype), crops[h].grid
            )
    if not live:
        return surfs

    budget = -(-max(int(sels[h].sum()) for h in live) // 64) * 64
    c_list = [coords[sels[h]] for h in live]
    y_list = [res_mat[sels[h]] for h in live]
    ct, yt, mt_ = pack_tiles(c_list, y_list, pad_to=budget)
    ct = ct.astype(dtype)
    yt = yt.astype(dtype)
    mt_ = mt_.astype(dtype)

    if config.mesh is not None:
        # multi-chip: one shard_mapped solve+predict program — each device
        # factorises its tile batch and evaluates its surface block (spatial
        # parallelism over the reference's serial tile loop, V73:690-738).
        # Edge tiles are smaller; all evaluate at the maximal tile shape from
        # traced origins and crop down (identical cell lattice: every tile
        # grid is a crop of the master grid).
        from ..parallel.sharded import batched_tile_tps

        n_dev = int(np.prod(config.mesh.devices.shape))
        n_live = len(live)
        pad_t = -(-n_live // n_dev) * n_dev - n_live
        if pad_t:
            rep = lambda a: jnp.concatenate([a, jnp.repeat(a[:1], pad_t, axis=0)], axis=0)
            ct, yt, mt_ = rep(ct), rep(yt), rep(mt_)
        origins = jnp.asarray(
            [(crops[h].grid.xmin, crops[h].grid.ymax) for h in live]
            + [(crops[live[0]].grid.xmin, crops[live[0]].grid.ymax)] * pad_t,
            dtype,
        )
        g0 = crops[live[0]].grid
        rows_max = max(crops[h].grid.nrows for h in live)
        cols_max = max(crops[h].grid.ncols for h in live)
        out = batched_tile_tps(
            ct, yt, mt_, origins,
            tile_shape=(rows_max, cols_max), cell=(g0.dx, g0.dy),
            mesh=config.mesh,
        )                               # (T, rows, cols, R)
        for i, h in enumerate(live):
            g = crops[h].grid
            surfs[h] = Raster(
                jnp.moveaxis(out[i][: g.nrows, : g.ncols], -1, 0), g
            )
        return surfs

    # solves batch (vmapped masked factorisations); predictions stream per
    # tile through the Pallas grid kernel, which never materialises the
    # (cells x knots) matrix (a full-res tile would need tens of GB)
    chunk = max(config.tps_tile_chunk, 1)
    models = []
    for s in range(0, len(live), chunk):
        models.append(
            batched_tile_solve(ct[s : s + chunk], yt[s : s + chunk], mt_[s : s + chunk])
        )
    for i, h in enumerate(live):
        m_chunk = models[i // chunk]
        model_i = jax.tree.map(lambda a: a[i % chunk], m_chunk)
        g = crops[h].grid
        surf = tps_predict_grid(model_i, g, use_pallas=config.use_pallas)
        surfs[h] = Raster(jnp.moveaxis(surf, -1, 0), g)
    return surfs


@highest_precision
def mltps(
    int_values,
    covar_ras: Raster,
    tps: bool = True,
    smooth_outputs_only: bool = False,
    trouble: bool = False,
    *,
    key=None,
    config: MLTPSConfig | None = None,
    log_file: str | None = None,
    timer=None,
) -> list[LayerResult]:
    """Main entry point; see module docstring.

    ``log_file`` tees progress to a run log (the reference's
    MachiSplin.LOG.txt sink, V73:200); ``timer`` is an optional
    utils.PhaseTimer collecting structured per-phase durations.
    """
    if log_file is not None:
        from ..utils.logging import run_log

        with run_log(log_file):
            return mltps(
                int_values, covar_ras, tps, smooth_outputs_only, trouble,
                key=key, config=config, log_file=None, timer=timer,
            )
    if timer is None:
        from ..utils.timing import PhaseTimer

        timer = PhaseTimer()
    config = config or MLTPSConfig()
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()  # rerun/second-response compiles hit the disk cache
    if key is None:
        key = jax.random.PRNGKey(0)
    with timer.phase("input_prep"):
        rast_stack, covar_names, coords, x, responses = _prepare_inputs(
            int_values, covar_ras
        )
    x = jnp.asarray(x, rast_stack.data.dtype)
    # algorithm-pool restriction: smooth.outputs.only is the reference's
    # switch (V73:366-393); config.letters_pool is a framework extension
    # letting callers run any subset (e.g. "br" to skip the slow letters)
    letters_pool = SMOOTH_LETTERS if smooth_outputs_only else "bgnmrv"
    if config.letters_pool is not None:
        letters_pool = "".join(l for l in letters_pool if l in config.letters_pool)
        if not letters_pool:
            raise ValueError(
                f"letters_pool {config.letters_pool!r} excludes every algorithm"
            )

    # part 1 for ALL responses at once: every (response, fold) model of the
    # vmappable algorithms trains in one batched program — the TPU-native
    # replacement for the reference's serial per-layer loop / dead snowfall
    # fan-out (V73:203, old/...V69.R:936-969)
    ys_all = np.stack([responses[rn] for rn in responses], axis=1)
    log.info("=== part 1 — CV of %s over %d response(s) ===", letters_pool, ys_all.shape[1])
    with timer.phase("cv_all_responses"):
        cv_all = run_cv(
            jax.random.fold_in(key, 777), x, jnp.asarray(ys_all, x.dtype),
            config=config.cv, algorithms=letters_pool, mesh=config.mesh,
        )

    # weights per response (deterministic given cv_all; pulled ahead of the
    # final fits so the vmappable letters can batch across responses)
    resp_names = list(responses.keys())
    wres_all, kept_all = [], []
    with timer.phase("ensemble_weights"):
        for i, name in enumerate(resp_names):
            cv_out = {
                letter: (res[i] if res.ndim == 2 else res)
                for letter, res in cv_all.items()
            }
            rmat = residual_matrix(cv_out, letters_pool)
            if config.weight_optimizer == "sweep":
                wres = optimize_weights_sweep(rmat, letters_pool)
            else:
                wres = optimize_weights_lbfgsb(rmat, letters_pool)
            mods_run = "b" if trouble else wres.letters
            kept = {"b": 1.0} if trouble else dict(zip(wres.letters, wres.kept_weights))
            log.info("layer %s kept: %s weights %s (%s%%)",
                     name, mods_run, wres.kept_weights, wres.percent_text)
            wres_all.append(wres)
            kept_all.append((mods_run, kept))

    # part 2 — final fits, letter-major: the vmappable letters AND gbm.step
    # batch across responses (one fit-program sequence per letter), with the
    # exact serial per-(response, letter) keys threaded through.  Each
    # letter's surfaces distribute into per-response weighted accumulators
    # as soon as its raster pass completes, so at most ONE letter's (H, W, R)
    # panel is alive at a time (at many-response x large-grid scale the old
    # hold-all-letters dict multiplied peak memory ~4Rx).
    n_resp = len(resp_names)
    ys_dev = {i: jnp.asarray(responses[resp_names[i]], x.dtype) for i in range(n_resp)}
    pred_accs: list = [None] * n_resp
    res_accs: list = [None] * n_resp
    var_imps: list[dict[str, Any]] = [dict() for _ in range(n_resp)]

    def _accumulate(i, letter, surf, pt_pred, imp):
        wgt = kept_all[i][1][letter]
        var_imps[i][letter] = imp
        contrib = (ys_dev[i] - pt_pred) * wgt
        pred_accs[i] = surf * wgt if pred_accs[i] is None else pred_accs[i] + surf * wgt
        res_accs[i] = contrib if res_accs[i] is None else res_accs[i] + contrib

    def _letter_keys(letter, sel):
        # the serial loop's fkey = fold_in(fold_in(key, i), 100 + position
        # of the letter in response i's kept dict)
        return [
            jax.random.fold_in(
                jax.random.fold_in(key, i),
                100 + list(kept_all[i][1]).index(letter),
            )
            for i in sel
        ]

    log.info("=== part 2 — final fits of %s ===", letters_pool)
    for letter in letters_pool:
        sel = [i for i, (_, kept) in enumerate(kept_all) if letter in kept]
        if not sel:
            continue
        names_sel = [resp_names[i] for i in sel]
        if letter in _VMAP_FINAL:
            keys_l = jnp.stack(_letter_keys(letter, sel))
            ycols = jnp.asarray(
                np.stack([responses[resp_names[i]] for i in sel], axis=1), x.dtype
            )
            with timer.phase(f"final_fit_{letter}_x{len(sel)}"):
                bfn, imps = _fit_final_batched(
                    letter, keys_l, x, ycols, covar_names, config
                )
            with timer.phase(f"raster_predict_{letter}_x{len(sel)}"):
                bsurf = predict_over_stack(
                    bfn, rast_stack, config.predict_block_rows,
                    mesh=config.mesh, out_cols=len(sel),
                )
            bpt = bfn(x)
            for j, i in enumerate(sel):
                _accumulate(i, letter, bsurf[..., j], bpt[:, j], imps[j])
            del bsurf
        elif letter == "b" and len(sel) > 1 and config.batch_final_brt:
            # response-batched gbm.step: every response's inner-fold chains
            # advance in the same bounded cycle programs (V73:447/493 —
            # one serial gbm.step per response in the reference)
            ycols = jnp.asarray(
                np.stack([responses[resp_names[i]] for i in sel], axis=1), x.dtype
            )
            with timer.phase(f"final_fit_b_x{len(sel)}"):
                results_b = gbm_step.fit_multi(
                    jnp.stack(_letter_keys("b", sel)), x, ycols,
                    **config.final_brt, mesh=config.mesh,
                )
            p_feat = np.asarray(x).shape[1]
            with timer.phase("importance_b"):
                imps_b = [gbm_step.importance(r, covar_names) for r in results_b]
            # merge every response's forest into ONE leaf table: the kernel's
            # membership algebra runs once per grid pass with a (T_total, R)
            # weight matrix zeroing foreign trees — one raster stream for ALL
            # responses instead of R (fit_multi budgets are shared, so the
            # per-response tree arrays stack directly)
            # trim each response's forest to its ACTIVE prefix before
            # merging: fit_multi grows every response to the shared padded
            # budget, but trees beyond a response's own best.trees carry
            # zero weight while their leaves would still cost full
            # membership work in the kernel (the round-4 raster_predict_b
            # regression: the weaker response's table was padded up to the
            # stronger one's budget)
            nts = [max(int(r.best_trees), 1) for r in results_b]
            merged_trees = jax.tree_util.tree_map(
                lambda *a: jnp.concatenate(a, axis=0),
                *[
                    jax.tree_util.tree_map(lambda a, k=nt: a[:k], r.final.trees)
                    for nt, r in zip(nts, results_b)
                ],
            )
            with timer.phase("forest_tables_b"):
                tabs = _forest_tables(merged_trees, p_feat, config.mesh)
            if tabs is not None:
                from ..ops.pallas_forest import forest_predict_bins

                wmat = np.zeros((sum(nts), len(sel)), np.float32)
                off = 0
                for j, (nt, r) in enumerate(zip(nts, results_b)):
                    wmat[off : off + nt, j] = (
                        np.asarray(r.final.tree_active)[:nt] * float(r.final.lr)
                    )
                    off += nt
                f0s = jnp.asarray(
                    [float(r.final.f0) for r in results_b], jnp.float32
                )
                wmat_d = jnp.asarray(wmat)
                bfn = lambda q: (
                    forest_predict_bins(merged_trees, q, wmat_d, tables=tabs)
                    + f0s[None, :]
                )
                bfn.manual_shard = True
                with timer.phase(f"raster_predict_b_x{len(sel)}"):
                    bsurf = predict_over_stack(
                        bfn, rast_stack, config.predict_block_rows,
                        mesh=config.mesh, out_cols=len(sel),
                    )
                for j, i in enumerate(sel):
                    _accumulate(
                        i, letter, bsurf[..., j],
                        jnp.asarray(results_b[j].final.train_fit), imps_b[j],
                    )
                del bsurf
            else:
                # single-device CPU: the C++ host predictor per response
                for j, i in enumerate(sel):
                    res_b = results_b[j]
                    fn = lambda q, r=res_b: gbm_step.predict(r, q)
                    fn.prefers_host = True
                    with timer.phase(f"{names_sel[j]}/raster_predict_b"):
                        surf = predict_over_stack(
                            fn, rast_stack, config.predict_block_rows,
                            mesh=config.mesh,
                        )
                    _accumulate(i, letter, surf, fn(x), imps_b[j])
        elif letter == "r" and len(sel) > 1 and config.batch_final_rf and (
            config.mesh is not None or jax.default_backend() != "cpu"
        ):
            # merged-forest RF finals (the BRT treatment, VERDICT r4 #3):
            # the fits are cheap (~0.05 s for 500 trees) and stay serial —
            # the win is ONE raster stream for all responses instead of R,
            # with a (T_total, R) weight matrix zeroing foreign trees.
            # Every response's forest has the same ntree (config.final_rf),
            # so blocks stack directly.
            keys_r = _letter_keys("r", sel)
            states_r, imps_r = [], []
            with timer.phase(f"final_fit_r_x{len(sel)}"):
                for j, i in enumerate(sel):
                    states_r.append(
                        rf.fit(keys_r[j], x, ys_dev[i], **config.final_rf)
                    )
            with timer.phase("importance_r"):
                for j, i in enumerate(sel):
                    imps_r.append(
                        rf.importance(states_r[j], x, ys_dev[i], covar_names)
                    )
            p_feat = np.asarray(x).shape[1]
            merged_trees = jax.tree_util.tree_map(
                lambda *a: jnp.concatenate(a, axis=0),
                *[s.trees for s in states_r],
            )
            with timer.phase("forest_tables_r"):
                tabs = _forest_tables(merged_trees, p_feat, config.mesh)
            from ..ops.pallas_forest import forest_predict_bins

            nts = [int(s.trees.feat.shape[0]) for s in states_r]
            wmat = np.zeros((sum(nts), len(sel)), np.float32)
            off = 0
            for j, nt in enumerate(nts):
                wmat[off : off + nt, j] = 1.0 / nt
                off += nt
            wmat_d = jnp.asarray(wmat)
            rfn = lambda q: forest_predict_bins(
                merged_trees, q, wmat_d, tables=tabs
            )
            rfn.manual_shard = True
            with timer.phase(f"raster_predict_r_x{len(sel)}"):
                rsurf = predict_over_stack(
                    rfn, rast_stack, config.predict_block_rows,
                    mesh=config.mesh, out_cols=len(sel),
                )
            # station predictions route through the SAME merged kernel (one
            # tiny dispatch) — exact parity with the serial path; the CV
            # phase is where the train_pred shortcut pays (120 models)
            rpt = rfn(x)
            for j, i in enumerate(sel):
                _accumulate(i, letter, rsurf[..., j], rpt[:, j], imps_r[j])
            del rsurf
        else:
            for i in sel:
                name = resp_names[i]
                fkey = _letter_keys(letter, [i])[0]
                with timer.phase(f"{name}/final_fit_{letter}"):
                    predict_fn, imp = _fit_final(
                        letter, fkey, x, ys_dev[i], covar_names, config
                    )
                with timer.phase(f"{name}/raster_predict_{letter}"):
                    surf = predict_over_stack(
                        predict_fn, rast_stack, config.predict_block_rows,
                        mesh=config.mesh,
                    )
                _accumulate(i, letter, surf, predict_fn(x), imp)

    # assemble each response's weighted ensemble (cheap raster algebra),
    # pulled ahead of part 3 so the TPS of residuals can batch EVERY
    # response through one factorisation (shared station coordinates)
    ens_rasters, res_finals = [], []
    for i, (name, y_np) in enumerate(responses.items()):
        wres = wres_all[i]
        total = wres.weight_total if not trouble else 1.0
        ens_rasters.append(
            Raster(pred_accs[i] / total, rast_stack.grid, (name,))
        )  # V73:619 quirk: unrounded total
        res_finals.append(np.asarray(res_accs[i]) / total)   # V73:620
        pred_accs[i] = None  # free the accumulator once consumed

    tps_multi = None
    if tps:
        log.info("=== part 3/4 — TPS error surfaces (all responses) ===")
        with timer.phase(f"tps_x{n_resp}"):
            tps_multi, n_tiles = _tps_error_surface(
                coords, np.stack(res_finals, axis=1), rast_stack, config
            )
        log.info("TPS tiled across %d tile(s)", n_tiles)

    results = []
    finalize_cm = timer.phase("finalize")
    finalize_cm.__enter__()
    for i, (name, y_np) in enumerate(responses.items()):
        wres = wres_all[i]
        mods_run, kept = kept_all[i]
        # per-algorithm importance in the response's kept-letter order (the
        # accumulation above runs letter-major)
        var_imp = {LETTER_TO_NAME[l]: var_imps[i][l] for l in kept}
        res_final = res_finals[i]
        ens_raster = ens_rasters[i]

        tss = float(np.sum((y_np - y_np.mean()) ** 2))
        rss_m = float(np.sum(res_final**2))
        rsq_model = 1.0 - rss_m / tss
        residuals_out = np.stack([res_final, coords[:, 0], coords[:, 1]], axis=1)
        summary = {
            "layer": name,
            "best model(s):": mods_run,
            "ensemble weights:": wres.percent_text,
            "r2 ensemble:": rsq_model,
        }

        final_raster = ens_raster
        tps_raster = None
        if tps:
            tps_raster = Raster(tps_multi.data[i], rast_stack.grid, (name,))
            summed = ens_raster.data + tps_raster.data
            final_c = Raster(summed, rast_stack.grid, (name,))
            f_at = np.asarray(extract(final_c, coords[:, 0], coords[:, 1]))
            rss_final = float(np.nansum((y_np - f_at) ** 2))
            rsq_final = 1.0 - rss_final / tss
            summary["r2 final:"] = rsq_final
            # the reference overwrites $residuals from the summed raster
            # UNCONDITIONALLY inside the tps==TRUE block (V73:914), even when
            # the correction is then discarded by the keep rule
            residuals_out = np.stack(
                [y_np - f_at, coords[:, 0], coords[:, 1]], axis=1
            )
            # keep the correction only if it improves R^2 (V73:925-930)
            if rsq_final > rsq_model:
                final_raster = final_c
        results.append(
            LayerResult(
                name=name,
                final=final_raster,
                residuals=residuals_out,
                var_imp=var_imp,
                summary=summary,
                n_layers=len(responses),
                ensemble=ens_raster,
                tps_surface=tps_raster,
                weights=wres,
            )
        )
    finalize_cm.__exit__(None, None, None)
    log.info("timing:\n%s", timer.report())
    return results

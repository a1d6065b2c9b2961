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

from ..panel import TIME, UNIT, feature_cols
from .spatial_grid import PG_STRIDE, embed_coords as _embedding

SMALL = 1e-3  # zero-frequency clamp, fourier_lag.py:93-96


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


def fourier_lag(
    df: DataFrame,
    dimensionality: int = 2,
    stride: int = PG_STRIDE,
) -> DataFrame:
    """2-D Fourier lag: −ln(d)-weighted spatial lag per (time, feature) slice
    (reference `get_fourier_lag`, `fourier_lag.py:8-75`). NaN -> 0 first.

    The 3-D variant (1/d weighting via a cube embed, `fourier_lag.py:158-262`)
    couples all timesteps into one transform and is deferred (raises).
    """
    if dimensionality != 2:
        raise NotImplementedError("only the 2-D Fourier lag is implemented")
    feats = feature_cols(df)
    schema = f"{TIME} long, {UNIT} long, " + ", ".join(f"{c} double" for c in feats)

    def solve_time_slice(pdf: pd.DataFrame) -> pd.DataFrame:
        units = pdf[UNIT].to_numpy()
        lons, lats, ncells = _embedding(units % stride, units // stride)
        out = {TIME: pdf[TIME].to_numpy(), UNIT: units}
        for c in feats:
            grid = np.zeros((ncells, ncells))
            grid[lons, lats] = np.nan_to_num(pdf[c].to_numpy(), nan=0.0)
            solved = _solve_slice(grid)
            out[c] = solved[lons, lats]
        return pd.DataFrame(out)

    return df.groupBy(TIME).applyInPandas(solve_time_slice, schema=schema)

"""Generate committed golden values for splag4d from the REFERENCE code.

Runs /root/reference's get_splag4d verbatim on a 3×3 fixture. The only
runtime scipy call is ndimage.convolve(raw, weights, mode='constant',
cval=0.0) with a symmetric kernel, which equals zero-padded correlation —
shimmed here with a ~10-line numpy implementation of that public API (no
reference code modified or copied). Output pasted into
tests/test_spatial.py::SPLAG4D_REFERENCE_GOLDENS.

Usage: python tools/gen_splag4d_goldens.py
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pandas as pd


def _ndimage_convolve(raw: np.ndarray, weights: np.ndarray, mode: str, cval: float) -> np.ndarray:
    assert mode == "constant" and cval == 0.0
    kx, ky = weights.shape
    px, py = kx // 2, ky // 2
    padded = np.pad(raw, ((px, px), (py, py)), constant_values=cval)
    out = np.zeros_like(raw, dtype=np.float64)
    flipped = weights[::-1, ::-1]  # ndimage.convolve flips the kernel
    for i in range(kx):
        for j in range(ky):
            out += flipped[i, j] * padded[i : i + raw.shape[0], j : j + raw.shape[1]]
    return out


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def main():
    ndimage = _stub("scipy.ndimage", convolve=_ndimage_convolve)
    _stub("scipy", ndimage=ndimage, fftpack=_stub("scipy.fftpack"),
          spatial=_stub("scipy.spatial", cKDTree=None))
    for attr in ("fft2", "ifft2", "dst", "idst"):
        setattr(sys.modules["scipy.fftpack"], attr, None)
    _stub("xarray")
    scratch = _stub("ingester3.scratch", fetch_data=None)
    country = _stub("ingester3.Country", Country=None)
    _stub("ingester3", Country=country, scratch=scratch)

    sys.path.insert(0, "/root/reference")
    from views_transformation_library import splag4d as ref

    rng = np.random.RandomState(23)
    vals = rng.rand(3, 3) * 10
    rows = []
    for month in (5, 6):
        for lat in range(3):
            for lon in range(3):
                v = float(vals[lon, lat]) * (1 if month == 5 else 2)
                rows.append((month, lat * 720 + lon, v))
    df = pd.DataFrame(rows, columns=["month", "pgid", "v"]).set_index(
        ["month", "pgid"]
    )

    for (ki, kw, kp, nk) in [(1, 1, 0, 0), (1, 2, 2, 1), (2, 1, 1, 0)]:
        out = ref.get_splag4d(df, kernel_inner=ki, kernel_width=kw,
                              kernel_power=kp, norm_kernel=nk)
        print(f"    ({ki}, {kw}, {kp}, {nk}): {{")
        for (month, pgid), row in out.iterrows():
            print(f"        ({month}, {pgid}): {row.iloc[0]!r},")
        print("    },")


if __name__ == "__main__":
    main()

"""Generate committed golden values for fourier_lag from the REFERENCE code.

Runs /root/reference/views_transformation_library's get_fourier_lag verbatim
on the tests/test_fourier.py grid16 fixture. The reference's solvers use
np.fft only; its scipy / xarray / ingester3 imports are load-time-only for
these paths, so they are satisfied with empty stub modules (no reference
code is modified or copied). Output is pasted into
tests/test_fourier.py::REFERENCE_GOLDENS — regenerate only if the fixture
changes.

Usage: python tools/gen_fourier_goldens.py
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pandas as pd


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def main():
    for name in [
        "scipy", "scipy.fftpack", "scipy.spatial", "scipy.ndimage",
        "xarray", "ingester3", "ingester3.Country", "ingester3.scratch",
    ]:
        _stub(name)
    sys.modules["scipy"].fftpack = sys.modules["scipy.fftpack"]
    sys.modules["scipy"].spatial = sys.modules["scipy.spatial"]
    for attr in ("fft2", "ifft2", "dst", "idst"):
        setattr(sys.modules["scipy.fftpack"], attr, None)
    sys.modules["scipy.spatial"].cKDTree = None
    sys.modules["scipy"].ndimage = sys.modules["scipy.ndimage"]
    sys.modules["ingester3"].Country = sys.modules["ingester3.Country"]
    sys.modules["ingester3.Country"].Country = None
    sys.modules["ingester3.scratch"].fetch_data = None
    sys.modules["ingester3"].scratch = sys.modules["ingester3.scratch"]

    sys.path.insert(0, "/root/reference")
    from views_transformation_library import fourier_lag as ref

    # 9-cell (3×3) fixture: the reference's flags_to_df scans the window
    # [1, range+1] and so silently drops boundary cells of grids that
    # exactly fill their power-of-2 embedding (e.g. 4×4 in ncells=4) — a
    # 3×3 grid embeds at offset 1 and round-trips faithfully
    rng = np.random.RandomState(11)
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

    for dim in (2, 3):
        out = ref.get_fourier_lag(df, dim)
        print(f"    {dim}: {{")
        for (month, pgid), row in out.iterrows():
            print(f"        ({month}, {pgid}): {row.iloc[0]!r},")  # column 'flag_v'
        print("    },")


if __name__ == "__main__":
    main()

"""Driver-attestable golden oracles for the non-SQL-expressible gates.

`fourier_lag` and `impute_mice` cannot be expressed in ANSI SQL, so their
driver CORRECTNESS rows were `no_oracle` through r3.  This module computes
their expected outputs OUTSIDE Spark — DuckDB builds the panel (the same
`panel_sql()` text every SQL oracle uses), plain numpy does the math on the
driver — so `oracle_sql()` can inline the expectations as a SQL VALUES table
(the mechanism the tree-lag oracles pioneered) and the driver gate can
hash-compare the Spark result against them byte-exactly.

What each golden attests:

- **fourier_lag**: the Spark orchestration (global embedding, per-time-slice
  `applyInPandas` fan-out, long-format repack) reproduces a local
  single-process solve of every slice.  The slice solvers here mirror the
  operator's op-for-op (required for byte-parity through the 6dp round —
  same pocketfft, same machine), and are *independently* validated against
  the committed reference goldens (`tests/test_fourier.py::REFERENCE_GOLDENS`,
  generated from /root/reference's own get_fourier_lag by
  tools/gen_fourier_goldens.py) in tests/test_golden_oracles.py — so the
  math is pinned to the reference without trusting the Spark path.
- **impute_mice**: the distributed plumbing — murmur3 hash-sharding,
  per-shard `applyInPandas` imputation, observed-bounds clipping — matches a
  local single-process run of the same estimator on identically-constructed
  shards.  The estimator itself (`_iterative_ridge_impute`) is shared: no
  independent implementation exists without sklearn (absent from this
  image); its statistical behavior is pytest-attested separately
  (convergence, clipping, genuine imputation).  The gate variant runs
  `sample_posterior=False` so the fixpoint is deterministic.

Spark-compatible Murmur3 (`spark_hash_long`) is re-derived from the public
Murmur3_x86_32 algorithm (Appleby, public domain; the same 4-byte-block
scheme Spark's `hash()` applies to LongType with seed 42) and pinned against
`F.hash` in tests/test_golden_oracles.py.
"""

from __future__ import annotations

import math

import numpy as np

SMALL = 1e-3  # zero-frequency clamp (reference fourier_lag.py:93-96)
LDIVISOR = 4  # 3-D mode reduction (reference fourier_lag.py:178-180)


# ---------------------------------------------------------------------------
# Spark-compatible Murmur3_x86_32 for LongType (seed 42)


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & 0xFFFFFFFF
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & 0xFFFFFFFF


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1


def spark_hash_long(value: int, seed: int = 42) -> int:
    """`F.hash()` of a LongType column: Murmur3_x86_32 over the 8-byte value
    as two little-endian 4-byte blocks (low word first), signed int32 out."""
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed & 0xFFFFFFFF, _mix_k1(v & 0xFFFFFFFF))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & 0xFFFFFFFF))
    h1 = _fmix(h1, 8)
    return h1 - 0x100000000 if h1 >= 0x80000000 else h1


def spark_pmod_hash_long(value: int, n: int, seed: int = 42) -> int:
    """`pmod(hash(col), n)` for a LongType col — the operator's shard key."""
    return spark_hash_long(value, seed) % n  # Python % is already positive


# ---------------------------------------------------------------------------
# panel via DuckDB (same SQL text as every other oracle)


def _duck_events(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con


def duck_panel(sf_dir: str):
    """Densified (time_id, unit_id, value) panel as a pandas frame, built by
    DuckDB with the package's own `panel_sql()` text (decimal-exact sums,
    0.0 fill) — byte-identical to what the Spark gate queries consume."""
    from views_transformation_library_spark import panel as P

    con = _duck_events(sf_dir)
    return con.execute(
        "WITH " + P.panel_sql().lstrip()
        + " SELECT time_id, unit_id, value FROM panel ORDER BY time_id, unit_id"
    ).df()


def duck_null_panel(sf_dir: str):
    """The fills' null-holed panel (densify with NULL, not 0.0)."""
    con = _duck_events(sf_dir)
    return con.execute(
        """
WITH
panel_agg AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))::BIGINT AS time_id,
         user_id AS unit_id,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2
)
SELECT g.time_id, g.unit_id, a.value
FROM (SELECT t.time_id, u.unit_id
      FROM (SELECT DISTINCT time_id FROM panel_agg) t
      CROSS JOIN (SELECT DISTINCT unit_id FROM panel_agg) u) g
LEFT JOIN panel_agg a USING (time_id, unit_id)
ORDER BY g.time_id, g.unit_id
"""
    ).df()


# ---------------------------------------------------------------------------
# fourier_lag golden: local single-process solve of every time slice


def _embed(lons: np.ndarray, lats: np.ndarray):
    """Centre cells in the smallest 2^p square covering the extent —
    integer-exact re-derivation of the reference embedding
    (utilities.py:145-216); must agree with the operator's
    `spatial_grid.embed_coords` (pinned in tests/test_golden_oracles.py)."""
    lons = np.asarray(lons) - np.asarray(lons).min()
    lats = np.asarray(lats) - np.asarray(lats).min()
    maxsize = max(int(lons.max()), int(lats.max()), 1)
    ncells = 2 ** (1 + int(math.log2(maxsize)))
    return (
        lons + int((ncells - lons.max()) / 2),
        lats + int((ncells - lats.max()) / 2),
        ncells,
    )


def _solve_2d(grid: np.ndarray) -> np.ndarray:
    """Poisson solve on one slice — op-for-op the published 2-D algorithm
    (reference fourier_lag.py:102-153): orthonormal FFT, 1/(j²+k²) with
    zero frequencies clamped to 1e-3, inverse, zero-level subtract, rescale
    to the input max."""
    rhomax = grid.max()
    rhohat = np.fft.fft2(grid, norm="ortho")
    freqsj = 2.0 * np.pi * np.fft.fftfreq(rhohat.shape[0])
    freqsk = 2.0 * np.pi * np.fft.fftfreq(rhohat.shape[1])
    freqsj[np.abs(freqsj) < SMALL] = SMALL
    freqsk[np.abs(freqsk) < SMALL] = SMALL
    divisor = 1.0 / (freqsj[:, None] ** 2 + freqsk[None, :] ** 2)
    phi = np.real(np.fft.ifft2(rhohat * divisor, norm="ortho"))
    phi -= phi.min()
    return phi * rhomax / max(phi.max(), 1.0)


def _solve_3d(grid: np.ndarray) -> np.ndarray:
    """Midplane-of-cube 3-D solve (reference fft_3D, fourier_lag.py:158-262):
    modes/LDIVISOR in the extra dimension, output is the midplane."""
    rangej = grid.shape[0]
    rangel = max(int(rangej / LDIVISOR), 1)
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
        freqsj[:, None, None] ** 2
        + freqsj[None, :, None] ** 2
        + freqsl[None, None, :] ** 2
    )
    phi = np.real(np.fft.ifftn(rhohat * divisor, norm="ortho"))
    phi -= phi.min()
    return phi[:, :, icentrel] * rhomax / max(phi.max(), 1.0)


def fourier_golden_rows(
    panel, dimensionality: int = 2, stride: int = 720
) -> list[tuple[int, int, float]]:
    """Expected (time_id, unit_id, value) rows for fourier_lag on a
    densified single-feature pandas panel: ONE global embedding from the
    full unit set (the operator's invariant), one solve per time slice."""
    solver = _solve_2d if dimensionality == 2 else _solve_3d
    units = np.sort(panel["unit_id"].unique())
    elons, elats, ncells = _embed(units % stride, units // stride)
    lon_of = dict(zip(units.tolist(), elons.tolist()))
    lat_of = dict(zip(units.tolist(), elats.tolist()))
    rows: list[tuple[int, int, float]] = []
    for t, slc in panel.groupby("time_id", sort=True):
        u = slc["unit_id"].to_numpy()
        lons = np.array([lon_of[x] for x in u])
        lats = np.array([lat_of[x] for x in u])
        grid = np.zeros((ncells, ncells))
        grid[lons, lats] = np.nan_to_num(slc["value"].to_numpy(), nan=0.0)
        solved = solver(grid)
        vals = solved[lons, lats]
        rows.extend(
            (int(t), int(uu), float(vv)) for uu, vv in zip(u.tolist(), vals)
        )
    return rows


def fourier_golden_sql(sf_dir: str, dimensionality: int = 2, stride: int = 720) -> str:
    """Inline-VALUES oracle: 6dp round + (-0.0 → +0.0) canonicalization
    happen in DuckDB so its HALF_UP round matches Spark's BigDecimal round
    (never re-implement java.math rounding in Python)."""
    rows = fourier_golden_rows(duck_panel(sf_dir), dimensionality, stride)
    vals = ",\n".join(f"({t}, {u}, {v!r})" for t, u, v in rows)
    return f"""
WITH golden(time_id, unit_id, v) AS (VALUES
{vals}
)
SELECT time_id::BIGINT AS time_id, unit_id::BIGINT AS unit_id,
       round(v::DOUBLE, 6) + 0.0 AS value
FROM golden
"""


# ---------------------------------------------------------------------------
# impute_mice golden: local replication of the deterministic gate draw


def mice_golden_rows(
    null_panel,
    n_shards: int = 8,
    seed: int = 1,
    max_iter: int = 10,
) -> list[tuple[int, int, float, float]]:
    """Expected (time_id, unit_id, value, value2) for the deterministic
    (sample_posterior=False) single-draw gate: value2 = 2*value with the
    same null holes, shards = pmod(hash(unit_id), n_shards), rows sorted by
    (time_id, unit_id) within each shard (the operator sorts identically, so
    BLAS reductions see the same row order), imputer run per shard, results
    clipped to the GLOBAL observed per-column bounds."""
    from views_transformation_library_spark.operators.missing import (
        _iterative_ridge_impute,
    )

    pdf = null_panel.copy()
    pdf["value2"] = pdf["value"] * 2.0
    feats = ["value", "value2"]
    lo = {c: pdf[c].min(skipna=True) for c in feats}
    hi = {c: pdf[c].max(skipna=True) for c in feats}
    pdf["__shard"] = [
        spark_pmod_hash_long(int(u), n_shards) for u in pdf["unit_id"]
    ]
    out: list[tuple[int, int, float, float]] = []
    for sh, part in pdf.groupby("__shard", sort=True):
        part = part.sort_values(["time_id", "unit_id"], ignore_index=True)
        shard_seed = (seed * 100_003 + int(sh)) % (2**31 - 1)
        vals = _iterative_ridge_impute(
            part[feats].to_numpy(dtype=np.float64, na_value=np.nan),
            seed=shard_seed,
            max_iter=max_iter,
            sample_posterior=False,
        )
        res = part.copy()
        res[feats] = vals
        for c in feats:
            if lo[c] is not None and not np.isnan(lo[c]):
                res[c] = res[c].clip(lower=lo[c], upper=hi[c])
        out.extend(
            (int(r.time_id), int(r.unit_id), float(r.value), float(r.value2))
            for r in res.itertuples()
        )
    return out


def mice_golden_sql(sf_dir: str, n_shards: int = 8) -> str:
    rows = mice_golden_rows(duck_null_panel(sf_dir), n_shards=n_shards)
    vals = ",\n".join(
        f"({t}, {u}, {v1!r}, {v2!r})" for t, u, v1, v2 in rows
    )
    return f"""
WITH golden(time_id, unit_id, v1, v2) AS (VALUES
{vals}
)
SELECT time_id::BIGINT AS time_id, unit_id::BIGINT AS unit_id,
       round(v1::DOUBLE, 6) + 0.0 AS value,
       round(v2::DOUBLE, 6) + 0.0 AS value2
FROM golden
"""


# ---------------------------------------------------------------------------
# pack_bins golden: local replication of the deterministic FFD packing


def pack_bins_golden_rows(
    sf_dir: str, capacity: int, shard_size: int
) -> list[tuple[int, int, int, int, int, int]]:
    """Expected (doc_id, n_tokens, n_packed, shard, bin, truncated):
    tokenization mirrors Spark's regexp_extract_all(lower(text), '\\S+')
    (re.findall('\\S+') — identical on the ASCII synthetic corpus) and
    the greedy loop is the operator's EXACT first-fit-decreasing order
    (packed length desc, doc_id asc, first bin with room). All-integer,
    so parity is trivial — no float surface at all."""
    import re

    import duckdb

    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()
    shards: dict[int, list[tuple[int, int]]] = {}
    n_tok = {}
    for did, text in docs:
        n = len(re.findall(r"\S+", (text or "").lower()))
        n_tok[did] = n
        shards.setdefault(did - did % shard_size, []).append(did)
    rows = []
    for shard, ids in shards.items():
        packed = {d: min(n_tok[d], capacity) for d in ids}
        order = sorted(ids, key=lambda d: (-packed[d], d))
        fills: list[int] = []
        for d in order:
            need = packed[d]
            placed = -1
            for b, fill in enumerate(fills):
                if fill + need <= capacity:
                    placed = b
                    break
            if placed < 0:
                placed = len(fills)
                fills.append(0)
            fills[placed] += need
            rows.append(
                (d, n_tok[d], packed[d], shard, placed,
                 1 if n_tok[d] > capacity else 0)
            )
    return sorted(rows)


def pack_bins_golden_sql(sf_dir: str, capacity: int, shard_size: int) -> str:
    rows = pack_bins_golden_rows(sf_dir, capacity, shard_size)
    vals = ",\n".join(
        f"({d}, {n}, {p}, {s}, {b}, {t})" for d, n, p, s, b, t in rows
    )
    return f"""
WITH golden(doc_id, n_tokens, n_packed, shard, bin, truncated) AS (VALUES
{vals}
)
SELECT doc_id::BIGINT AS doc_id, n_tokens::BIGINT AS n_tokens,
       n_packed::BIGINT AS n_packed, shard::BIGINT AS shard,
       bin::BIGINT AS bin, truncated::INT AS truncated
FROM golden
"""


# ---------------------------------------------------------------------------
# multimodal resize / frame-sample goldens (r8): the synthesized media is
# deterministic from (doc_id, text), so the expected RESIZED payload and
# SAMPLED frame payloads are computed here with the module's own pure
# byte-level functions (encode/decode/NN-resample — no Spark, no floats)
# and attested by md5 of the exact bytes. A VALUES gate over md5 digests is
# byte-parity by construction: any pixel-level divergence in the
# distributed path changes the digest.


def _doc_rows(sf_dir: str):
    import duckdb

    return duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()


def _operator_default(fn_name: str, param: str) -> int:
    """Read a synthesis constant straight off the operator's signature so
    a future default change can't silently desync these goldens (ADVICE
    r8). The height formula (8 + id % 8) has no parameter to read — it is
    pinned instead by tests/test_golden_oracles.py's byte-parity test."""
    import inspect

    from views_transformation_library_spark.operators import multimodal as M

    return inspect.signature(getattr(M, fn_name)).parameters[param].default


def _synth_image(did: int, text, width: int | None = None) -> bytes:
    """Replicates attach_image's synthesis (md5 hex tiled over a
    width x (8 + id % 8) raster)."""
    import hashlib

    from views_transformation_library_spark.operators import multimodal as M

    if width is None:
        width = _operator_default("attach_image", "width")
    h = 8 + int(did) % 8
    n = 3 * width * h
    digest = hashlib.md5(
        ("" if text is None else str(text)).encode("utf-8")
    ).hexdigest().encode("ascii")
    return M.encode_ppm(width, h, (digest * (n // len(digest) + 1))[:n])


def _synth_video(did: int, text, width: int | None = None, frame_ms: int | None = None):
    """Replicates attach_video's synthesis; returns (frames, duration)."""
    import hashlib

    from views_transformation_library_spark.operators import multimodal as M

    if width is None:
        width = _operator_default("attach_video", "width")
    if frame_ms is None:
        frame_ms = _operator_default("attach_video", "frame_ms")
    h = 8 + int(did) % 8
    n_frames = 2 + int(did) % 4
    npix = 3 * width * h
    frames = []
    for f in range(n_frames):
        digest = hashlib.md5(
            (f"{f}:" + ("" if text is None else str(text))).encode("utf-8")
        ).hexdigest().encode("ascii")
        frames.append(M.encode_ppm(width, h, (digest * (npix // len(digest) + 1))[:npix]))
    return frames, n_frames * frame_ms


def multimodal_resize_golden_sql(sf_dir: str, width: int, height: int) -> str:
    import hashlib

    from views_transformation_library_spark.operators import multimodal as M

    rows = []
    for did, text in _doc_rows(sf_dir):
        w, h, rgb = M.decode_image_rgb(_synth_image(did, text))
        payload = M.encode_ppm(width, height, M.resize_rgb(rgb, w, h, width, height))
        rows.append(
            (int(did), width, height, len(payload), hashlib.md5(payload).hexdigest())
        )
    vals = ",\n".join(f"({d}, {w}, {h}, {n}, '{m}')" for d, w, h, n, m in rows)
    return f"""
WITH golden(media_id, width, height, n_bytes, payload_md5) AS (VALUES
{vals}
)
SELECT media_id::BIGINT AS media_id, width::INT AS width,
       height::INT AS height, n_bytes::INT AS n_bytes,
       payload_md5 AS payload_md5
FROM golden
"""


def multimodal_frames_golden_sql(sf_dir: str, every_ms: int) -> str:
    import hashlib

    rows = []
    for did, text in _doc_rows(sf_dir):
        frames, dur = _synth_video(did, text)
        n = len(frames)
        w, h = 16, 8 + int(did) % 8
        for j in range(max(1, dur // every_ms)):
            t = j * every_ms
            fi = min(n - 1, t * n // dur) if dur > 0 else 0
            rows.append(
                (int(did), fi, t, w, h, len(frames[fi]),
                 hashlib.md5(frames[fi]).hexdigest())
            )
    vals = ",\n".join(
        f"({d}, {fi}, {t}, {w}, {h}, {n}, '{m}')" for d, fi, t, w, h, n, m in rows
    )
    return f"""
WITH golden(media_id, frame_idx, ts_ms, width, height, n_bytes, frame_md5) AS (VALUES
{vals}
)
SELECT media_id::BIGINT AS media_id, frame_idx::INT AS frame_idx,
       ts_ms::INT AS ts_ms, width::INT AS width, height::INT AS height,
       n_bytes::INT AS n_bytes, frame_md5 AS frame_md5
FROM golden
"""


# ---------------------------------------------------------------------------
# pagerank golden: the quantized integer fixpoint replicated on the same
# distinct edge set (pagerank_longs is shared verbatim with BOTH the driver
# fast path and, by bit-identical integer construction, the distributed
# Spark loop — dedup.pagerank's docstring has the exactness argument)


def pagerank_golden_rows(
    sf_dir: str, damping: float = 0.85, max_iters: int = 20, tol: float = 1e-9
) -> list[tuple[int, int]]:
    """(node, q) LONG pairs — integer rank mass at PR_SCALE, computed by
    the same pure numpy fixpoint the operator runs, over the same edge
    set (DuckDB pulls the identical distinct supplier->customer+1e6 link
    graph the entry query builds)."""
    import duckdb

    from views_transformation_library_spark.operators.dedup import pagerank_longs

    edges = duckdb.sql(
        f"""
        SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 1000000 AS dst
        FROM read_parquet('{sf_dir}/lineitem.parquet') l
        JOIN read_parquet('{sf_dir}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        WHERE l.l_suppkey IS NOT NULL AND o.o_custkey IS NOT NULL
        """
    ).fetchnumpy()
    nodes, q = pagerank_longs(
        edges["src"].astype(np.int64),
        edges["dst"].astype(np.int64),
        damping,
        max_iters,
        tol,
    )
    return list(zip(nodes.tolist(), q.tolist()))


def pagerank_golden_sql(
    sf_dir: str, damping: float = 0.85, max_iters: int = 20, tol: float = 1e-9
) -> str:
    """Inline-VALUES oracle over ALL-INTEGER state: the only float step is
    one BIGINT/literal division (IEEE-identical cross-engine) and the 6dp
    round goes through the divide_column shortest-repr DECIMAL recipe so
    DuckDB mirrors Spark's BigDecimal HALF_UP semantics."""
    from views_transformation_library_spark.operators.dedup import PR_SCALE

    rows = pagerank_golden_rows(sf_dir, damping, max_iters, tol)
    vals = ",\n".join(f"({n}, {q})" for n, q in rows)
    return f"""
WITH golden(node, q) AS (VALUES
{vals}
)
SELECT CAST(node AS BIGINT) AS node,
       round(CAST(CAST(CAST(CAST(q AS BIGINT) AS DOUBLE) / {float(PR_SCALE)!r}
                       AS VARCHAR) AS DECIMAL(38,17)), 6)::DOUBLE + 0.0 AS pagerank
FROM golden
"""


# ---------------------------------------------------------------------------
# pq_topk golden: full driver-side replication of the (now quantized) ADC
# pipeline — codebooks, encode, integer ADC sums, rerank — with Spark's
# BigDecimal round replicated exactly for the selection steps


def spark_round6(x: float) -> float:
    """Spark round(x, 6) == BigDecimal.valueOf(x).setScale(6, HALF_UP):
    quantize the SHORTEST DECIMAL REPR (python repr == Java Double.toString
    digits) half-up. Used where a golden's SELECTION depends on rounded
    values (the final VALUE columns still round in DuckDB)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)) + 0.0


def pq_golden_rows(
    sf_dir: str, k: int = 10, m: int = 8, k_codes: int = 16, seed: int = 42
) -> list[tuple[int, int, float, int]]:
    """(query_id, neighbor_id, raw_cosine, rank) for pq_topk(rerank="auto")
    — every numpy op copied op-for-op from the operator (train /
    encode / driver ADC loop / fold-exact rescore), all cross-engine
    surfaces integer or selection-only."""
    import duckdb

    from views_transformation_library_spark.operators import similarity as S

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    n = len(ids)
    assert max(1, -(-n // 100_000)) == 1, "pq golden assumes sample_mod == 1"
    X = S._stack_vectors([r[1] for r in rows])
    dim = X.shape[1]
    sub = dim // m
    rerank = S.auto_ann_params(n)["rerank"]
    # --- codebooks: train_pq_codebooks(normalize=True) on the full
    # id-ordered sample
    nrm_all = np.linalg.norm(X, axis=1)
    Xn = X[nrm_all > 0] / nrm_all[nrm_all > 0, None]
    books = [
        S.lloyd_kmeans(Xn[:, s * sub : (s + 1) * sub], k_codes, n_iters=5, seed=seed + s)
        for s in range(m)
    ]
    B = np.asarray(books, dtype=np.float64)
    # --- encode (pq_encode, normalize=True; row-independent, so one batch
    # is the same as Arrow's many)
    good = nrm_all > 0
    Xg = X[good] / nrm_all[good, None]
    Xs = Xg.reshape(len(Xg), m, sub)
    codes = np.empty((len(Xg), m), dtype=np.int64)
    for s in range(m):
        d2 = ((Xs[:, s, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d2.argmin(axis=1)
    gx = np.flatnonzero(good)  # good row -> X row
    nbr = np.asarray(ids, dtype=np.int64)[gx]
    # --- fold-exact norms over RAW vectors (the _norm left fold as a
    # column loop — elementwise bit-identical)
    nacc = np.zeros(len(X))
    for i in range(dim):
        nacc = nacc + X[:, i] * X[:, i]
    fold_norm = np.sqrt(nacc)
    # --- per-query ADC LUT (driver loop replication) + scoring
    scale = S.PQ_ADC_SCALE
    arangem = np.arange(m)
    n_keep = int(k) * int(rerank)
    out: list[tuple[int, int, float, int]] = []
    id_to_x = {v: i for i, v in enumerate(ids)}
    for qid in ids:
        if qid % 50 != 0:
            continue
        qv = X[id_to_x[qid]]
        nrm = float(np.linalg.norm(qv))
        if nrm == 0.0:
            continue
        qvn = qv / nrm
        lut = np.empty((m, k_codes), dtype=np.int64)
        for s in range(m):
            qs = qvn[s * sub : (s + 1) * sub]
            # the operator's driver ADC loop (and the distributed
            # zip_with/aggregate build) both evaluate this left-associated
            # column-loop fold — replicate it exactly (ADVICE r11)
            Bs = np.asarray(books[s], dtype=np.float64)
            diff = qs[None, :] - Bs
            sq = diff * diff
            acc = np.zeros(k_codes)
            for i in range(sub):
                acc = acc + sq[:, i]
            for ci in range(k_codes):
                lut[s, ci] = math.floor(float(acc[ci]) * scale)
        dist = lut[arangem[None, :], codes].sum(axis=1)
        approx = 1.0 - (dist.astype(np.float64) / scale) / 2.0
        r6a = np.array([spark_round6(v) for v in approx])
        idx = np.flatnonzero(nbr != qid)
        keep = idx[np.lexsort((nbr[idx], -r6a[idx]))][:n_keep]
        # --- exact rescore of the kept candidates (the _dot left fold)
        cand_x = gx[keep]
        acc = np.zeros(len(keep))
        for i in range(dim):
            acc = acc + qv[i] * X[cand_x, i]
        den = fold_norm[id_to_x[qid]] * fold_norm[cand_x]
        ok = den > 0
        cos = acc[ok] / den[ok]
        cnbr = nbr[keep][ok]
        r6c = np.array([spark_round6(v) for v in cos])
        order2 = np.lexsort((cnbr, -r6c))[: int(k)]
        for rank, j in enumerate(order2, start=1):
            out.append((int(qid), int(cnbr[j]), float(cos[j]), rank))
    return out


def pq_golden_sql(
    sf_dir: str, k: int = 10, m: int = 8, k_codes: int = 16, seed: int = 42
) -> str:
    rows = pq_golden_rows(sf_dir, k, m, k_codes, seed)
    vals = ",\n".join(
        f"({q}, {nb}, '{c!r}', {rk})" for q, nb, c, rk in rows
    )
    return f"""
WITH golden(query_id, neighbor_id, c, rank) AS (VALUES
{vals}
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       round(CAST(c AS DECIMAL(38,17)), 6)::DOUBLE + 0.0 AS cosine,
       CAST(rank AS INT) AS rank
FROM golden
"""

"""Streaming batch-equivalence artifact (VERDICT r8 #7): drive every
stateful streaming operator over REAL testdata micro-batches and compare
row counts + a canonical value hash against the batch operator on the
same files — the check_oracle-style committed gate for streaming parity.

For each op the tool:
  1. splits the sf_dir's events (or documents, with a synthesized
     id-ordered ts) into chronological micro-batch parquet files plus a
     far-future FLUSH event that marches the watermark past every real
     row (append-mode sinks only emit what the watermark has sealed);
  2. runs the streaming op with maxFilesPerTrigger=1 (real multi-batch
     state evolution, not one mega-batch);
  3. runs the batch counterpart over the identical files (flush rows
     excluded on both sides);
  4. records streamed/batch row counts and md5 hashes over the sorted
     canonical rows; ok = set equality (exactly-once included).

Ops covered (streaming module -> batch counterpart):
  sessionize_stream          -> relational.sessionize        (epoch-us)
  dedup_stream               -> dedup.dedup_keep             (id-ordered)
  sliding_sum_stream         -> batch F.window groupBy
  minhash_candidates_stream  -> minhash_signatures band collisions
  funnel_stream              -> relational.funnel            (epoch-us)
  panel_from_events_stream   -> batch DECIMAL-sum day groupBy
  hll_distinct_stream        -> sketches.hll_distinct        (integer-exact)

tick_time_since_stream is excluded: its batch counterpart consumes a
built panel, not raw events, so "same files" equivalence is already the
composition panel_from_events_stream ∘ tick (covered by the unit tests).

Usage: python tools/check_stream_equiv.py [sf_dir] [--json out.json]
Exits non-zero unless every op's streamed rows == batch rows exactly.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from pyspark.sql import functions as F

from views_transformation_library_spark.session import get_spark

FLUSH_USER = 999_999
N_BATCHES = 4


def _canon_hash(rows: set) -> str:
    """md5 over the sorted repr of canonical row tuples — stable across
    runs and engines for the integer/string tuples compared here."""
    h = hashlib.md5()
    for r in sorted(rows, key=repr):
        h.update(repr(r).encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def _write_batches(rows: pd.DataFrame, out_dir: str, n: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    step = (len(rows) + n - 1) // n
    for i in range(n):
        chunk = rows.iloc[i * step : (i + 1) * step]
        if len(chunk):
            chunk.to_parquet(
                f"{out_dir}/b{i:02d}.parquet",
                coerce_timestamps="us",
                allow_truncated_timestamps=True,
                index=False,
            )


def _run_stream(spark, stream_df, mode: str) -> list:
    name = "seq_" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


def _load_events(sf_dir: str) -> pd.DataFrame:
    """Events normalized to µs timestamps, chronological (the append-only
    ingest order a log-structured source delivers). Type-adaptive: the
    driver parquet has been both ns and µs physical across rounds."""
    import duckdb

    pdf = duckdb.sql(
        "SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value "
        f"FROM read_parquet('{sf_dir}/events.parquet') ORDER BY ts, user_id"
    ).df()
    return pdf


def _load_docs(sf_dir: str) -> pd.DataFrame:
    """Documents with a synthesized id-ordered ts (streams need event
    time; id-ordered arrival is the regime where first-arrival == min-id
    keep semantics, the documented equivalence contract)."""
    import duckdb

    pdf = duckdb.sql(
        "SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).df()
    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf.insert(0, "ts", [base + pd.Timedelta(seconds=int(i)) for i in range(len(pdf))])
    return pdf


def check_sessionize(spark, ev_dir: str) -> dict:
    from views_transformation_library_spark import panel as P
    from views_transformation_library_spark.operators import relational
    from views_transformation_library_spark.streaming.sessions import (
        sessionize_stream,
    )

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(ev_dir)
    )
    out = sessionize_stream(stream, gap_minutes=30, watermark="2 hours")
    streamed = {
        (r["user_id"], r["s"], r["e"], r["n_events"])
        for r in _run_stream(
            spark,
            out.select(
                "user_id",
                F.unix_micros("session_start").alias("s"),
                F.unix_micros("session_end").alias("e"),
                "n_events",
            ),
            "append",
        )
        if r["user_id"] != FLUSH_USER
    }
    ev = _read_batch(spark, ev_dir, EV_SCHEMA).filter(F.col("user_id") != FLUSH_USER)
    batch = {
        (r["unit_id"], r["start_tick"], r["end_tick"], r["n_events"])
        for r in relational.sessionize(
            ev.select("user_id", P.epoch_micros(ev).alias("ts")),
            gap_minutes=30,
            ts_unit="us",
        )
        .select("unit_id", "start_tick", "end_tick", "n_events")
        .collect()
    }
    return _verdict(streamed, batch)


def check_dedup(spark, doc_dir: str) -> dict:
    from views_transformation_library_spark.operators import dedup
    from views_transformation_library_spark.streaming.dedup import dedup_stream

    stream = (
        spark.readStream.schema("ts timestamp, doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(doc_dir)
    )
    streamed = {
        r["doc_id"]
        for r in _run_stream(
            spark, dedup_stream(stream, watermark="1 day").select("doc_id"), "append"
        )
    }
    batch = {
        r["doc_id"]
        for r in dedup.dedup_keep(_read_batch(spark, doc_dir, DOC_SCHEMA)).select("doc_id").collect()
    }
    return _verdict(streamed, batch)


def check_sliding_sum(spark, ev_dir: str) -> dict:
    from views_transformation_library_spark.streaming.windows import (
        sliding_sum_stream,
    )

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(ev_dir)
    )
    out = sliding_sum_stream(
        stream, window="7 days", slide="1 day", watermark="1 day"
    )
    # canonical value: DECIMAL(18,2)-quantized sum (the raw double sum is
    # reduction-order dependent; the round-trip makes both engines' cell
    # values identical for the 2dp testdata values)
    streamed = {
        (r["unit_id"], r["ws"], str(r["ms"]), r["n_events"])
        for r in _run_stream(
            spark,
            out.select(
                "unit_id",
                F.unix_micros("window_start").alias("ws"),
                F.col("moving_sum").cast("decimal(18,2)").alias("ms"),
                "n_events",
            ),
            "append",
        )
        if r["unit_id"] != FLUSH_USER
    }
    batch = {
        (r["unit_id"], r["ws"], str(r["ms"]), r["n_events"])
        for r in _read_batch(spark, ev_dir, EV_SCHEMA)
        .filter(F.col("user_id") != FLUSH_USER)
        .groupBy(
            F.window("ts", "7 days", "1 day").alias("__w"),
            F.col("user_id").alias("unit_id"),
        )
        .agg(F.sum("value").alias("moving_sum"), F.count("*").alias("n_events"))
        .select(
            "unit_id",
            F.unix_micros("__w.start").alias("ws"),
            F.col("moving_sum").cast("decimal(18,2)").alias("ms"),
            "n_events",
        )
        .collect()
    }
    return _verdict(streamed, batch)


def check_minhash(spark, doc_dir: str) -> dict:
    from views_transformation_library_spark.operators import dedup as bdedup
    from views_transformation_library_spark.streaming.dedup import (
        minhash_candidates_stream,
    )

    n, n_hashes, bands = 3, 24, 6
    stream = (
        spark.readStream.schema("ts timestamp, doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(doc_dir)
    )
    out = minhash_candidates_stream(stream, n=n, n_hashes=n_hashes, bands=bands)
    rows = _run_stream(
        spark, out.select("band", "a", "b", F.round("est_jaccard", 6).alias("ej")),
        "append",
    )
    streamed = {(r["band"], r["a"], r["b"], r["ej"]) for r in rows}
    exactly_once = len(rows) == len(streamed)

    # batch expectation: band collisions over the full corpus signatures
    docs = _read_batch(spark, doc_dir, DOC_SCHEMA)
    sig = bdedup.minhash_signatures(bdedup._shingles(docs, "doc_id", "text", n), n_hashes=n_hashes)
    sig_rows = {r["doc"]: [r[f"mh_{j}"] for j in range(n_hashes)] for r in sig.collect()}
    batch = set()
    width = n_hashes // bands
    for band in range(bands):
        buckets: dict = {}
        for doc, s in sig_rows.items():
            buckets.setdefault(tuple(s[band * width : (band + 1) * width]), []).append(doc)
        for ds in buckets.values():
            ds = sorted(ds)
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    est = sum(
                        1 for u, v in zip(sig_rows[ds[i]], sig_rows[ds[j]]) if u == v
                    ) / n_hashes
                    batch.add((band, ds[i], ds[j], round(est, 6)))
    v = _verdict(streamed, batch)
    v["exactly_once"] = exactly_once
    v["ok"] = v["ok"] and exactly_once
    return v


def check_funnel(spark, ev_dir: str) -> dict:
    from views_transformation_library_spark import panel as P
    from views_transformation_library_spark.operators import relational
    from views_transformation_library_spark.streaming.funnel import funnel_stream

    steps = ["signup", "click", "purchase"]
    stream = (
        spark.readStream.schema("ts timestamp, user_id long, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(ev_dir)
    )
    rows = _run_stream(
        spark, funnel_stream(stream, steps, watermark="2 hours"), "update"
    )
    # update mode: the memory sink appends updates in batch order — the
    # LAST row per user is the final state
    final: dict = {}
    for r in rows:
        final[r["user_id"]] = r
    streamed = {
        (u, r["step_1_ts"], r["step_2_ts"], r["step_3_ts"], r["steps_reached"])
        for u, r in final.items()
        if u != FLUSH_USER
    }
    ev = _read_batch(spark, ev_dir, EV_SCHEMA).filter(F.col("user_id") != FLUSH_USER)
    batch = {
        (r["unit_id"], r["step_1_ts"], r["step_2_ts"], r["step_3_ts"], r["steps_reached"])
        for r in relational.funnel(
            ev.select("user_id", "event_type", P.epoch_micros(ev).alias("__t")),
            steps,
            ts_col="__t",
        ).collect()
    }
    return _verdict(streamed, batch)


def check_panel(spark, ev_dir: str) -> dict:
    from views_transformation_library_spark.streaming.panel import (
        panel_from_events_stream,
    )

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(ev_dir)
    )
    out = panel_from_events_stream(stream, watermark="2 days")
    streamed = {
        (r["time_id"], r["unit_id"], str(r["v"]))
        for r in _run_stream(
            spark,
            out.select(
                "time_id", "unit_id", F.col("value").cast("decimal(18,2)").alias("v")
            ),
            "append",
        )
        if r["unit_id"] != FLUSH_USER
    }
    batch = {
        (r["time_id"], r["unit_id"], str(r["v"]))
        for r in _read_batch(spark, ev_dir, EV_SCHEMA)
        .filter(F.col("user_id") != FLUSH_USER)
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("time_id"),
            F.col("user_id").alias("unit_id"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("v")
        )
        .collect()
    }
    return _verdict(streamed, batch)


def check_hll(spark, ev_dir: str) -> dict:
    """Streaming HLL distinct users per event_type: the final update per
    group must equal the batch operator's integer summary EXACTLY (same
    JVM hash expressions, max-merged registers) — no approximation gap
    between the two sides."""
    from views_transformation_library_spark.operators import sketches
    from views_transformation_library_spark.streaming.sketches import (
        hll_distinct_stream,
    )

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(ev_dir)
    )
    out = hll_distinct_stream(
        stream.filter(F.col("user_id") != FLUSH_USER), "user_id", "event_type", p=8
    )
    final: dict = {}
    for r in _run_stream(spark, out, "update"):  # memory sink appends in batch order
        final[r["event_type"]] = (r["n_zero"], r["s_scaled"])
    streamed = {(g, nz, s) for g, (nz, s) in final.items()}
    batch = {
        (r["event_type"], r["n_zero"], r["s_scaled"])
        for r in sketches.hll_distinct(
            _read_batch(spark, ev_dir, EV_SCHEMA).filter(F.col("user_id") != FLUSH_USER),
            "user_id",
            ["event_type"],
            p=8,
        ).collect()
    }
    return _verdict(streamed, batch)


def check_hist_quantiles(spark, ev_dir: str) -> dict:
    """Streaming histogram quantiles of value per event_type: the final
    update per (group, percent) must equal approx_quantiles_hist's
    integer selection on the union of all micro-batches — same JVM
    bucket expression, additive integer state, same ceil-rank pick."""
    from views_transformation_library_spark.operators import profiling
    from views_transformation_library_spark.streaming.sketches import (
        hist_quantiles_stream,
    )

    LO, HI, NB, PCTS = 0.0, 1000.0, 256, (25, 50, 75, 90)
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(ev_dir)
    )
    out = hist_quantiles_stream(
        stream.filter(F.col("user_id") != FLUSH_USER),
        "value", "event_type", LO, HI, NB, PCTS,
    )
    final: dict = {}
    for r in _run_stream(spark, out, "update"):  # memory sink, batch order
        final[(r["event_type"], r["percent"])] = (r["bucket"], r["rank"], r["n"])
    streamed = {(g, p, b, rk, n) for (g, p), (b, rk, n) in final.items()}
    batch = {
        (r["event_type"], r["percent"], r["bucket"], r["rank"], r["n"])
        for r in profiling.approx_quantiles_hist(
            _read_batch(spark, ev_dir, EV_SCHEMA).filter(
                F.col("user_id") != FLUSH_USER
            ),
            "value", LO, HI, NB, PCTS, group_cols=["event_type"],
        ).collect()
    }
    return _verdict(streamed, batch)


EV_SCHEMA = "ts timestamp, user_id long, event_type string, value double"
DOC_SCHEMA = "ts timestamp, doc_id long, text string"


def _read_batch(spark, path: str, schema: str):
    """Batch read with the SAME explicit schema the stream side uses —
    the pandas-written parquet reads as TIMESTAMP_NTZ otherwise, which
    unix_micros/window reject."""
    return spark.read.schema(schema).parquet(path)


def _verdict(streamed: set, batch: set) -> dict:
    return {
        "streamed_rows": len(streamed),
        "batch_rows": len(batch),
        "streamed_hash": _canon_hash(streamed),
        "batch_hash": _canon_hash(batch),
        "ok": streamed == batch and len(streamed) > 0,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_path = None
    for i, a in enumerate(sys.argv[1:]):
        if a == "--json" and i + 2 <= len(sys.argv[1:]):
            out_path = sys.argv[1:][i + 1]
        elif a.startswith("--json="):
            out_path = a.split("=", 1)[1]

    spark = get_spark("stream_equiv")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tmp = tempfile.mkdtemp(prefix="stream_equiv_")
    try:
        ev = _load_events(sf_dir)
        ev_dir = os.path.join(tmp, "events")
        _write_batches(ev, ev_dir, N_BATCHES)
        # far-future flush: one event far past every real row's watermark
        # deadline so append-mode state ALL seals
        flush_ts = ev["ts"].max() + pd.Timedelta(days=365)
        pd.DataFrame(
            {
                "ts": [flush_ts],
                "user_id": [FLUSH_USER],
                "event_type": ["flush"],
                "value": [0.0],
            }
        ).to_parquet(
            f"{ev_dir}/zz_flush.parquet", coerce_timestamps="us",
            allow_truncated_timestamps=True, index=False,
        )

        docs = _load_docs(sf_dir)
        doc_dir = os.path.join(tmp, "documents")
        _write_batches(docs, doc_dir, N_BATCHES)

        checks = {
            "sessionize_stream": lambda: check_sessionize(spark, ev_dir),
            "dedup_stream": lambda: check_dedup(spark, doc_dir),
            "sliding_sum_stream": lambda: check_sliding_sum(spark, ev_dir),
            "minhash_candidates_stream": lambda: check_minhash(spark, doc_dir),
            "funnel_stream": lambda: check_funnel(spark, ev_dir),
            "panel_from_events_stream": lambda: check_panel(spark, ev_dir),
            "hll_distinct_stream": lambda: check_hll(spark, ev_dir),
            "hist_quantiles_stream": lambda: check_hist_quantiles(spark, ev_dir),
        }
        results = {}
        for name, fn in checks.items():
            results[name] = fn()
            status = "ok" if results[name]["ok"] else "MISMATCH"
            print(
                f"# {name}: {status} streamed={results[name]['streamed_rows']} "
                f"batch={results[name]['batch_rows']}",
                file=sys.stderr,
            )
        doc = {
            "sf_dir": sf_dir,
            "n_events": int(len(ev)),
            "n_docs": int(len(docs)),
            "micro_batches": N_BATCHES,
            "flush": "365 days past max ts",
            "ops": results,
        }
        text = json.dumps(doc, indent=2)
        print(text)
        if out_path:
            with open(out_path, "w") as f:
                f.write(text + "\n")
        if not all(r["ok"] for r in results.values()):
            bad = [n for n, r in results.items() if not r["ok"]]
            print(f"STREAM EQUIVALENCE FAILURE: {bad}", file=sys.stderr)
            sys.exit(1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

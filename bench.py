#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a full materialization (count of a
write-free action) after a shared-session warmup; value = total
wall-clock over the headline set. Every per-query number carries its
run count in "query_runs" (r3 verdict item #3: best-of-1 numbers are
not attributable round-over-round). "headline_r3_total" re-sums the
round-3 headline set so the headline trend stays comparable after the
set grew.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The round-3 headline set - kept as a stable comparison basis.
HEADLINE_R3 = [
    # reference-parity dataflows
    "rle_event_runs",
    "status_downtime_totals",
    "downtime_bi_dataset",
    "minute_status_rollup",
    "minute_chart_grid",
    "latest_status_per_user",
    "rollover_production_totals",
    "session_stats",
    # relational shapes
    "q1_pricing_summary",
    "q3_unshipped_orders",
    "q5_region_revenue",
    "order_priority_counts",
    "price_percentiles_by_flag",
    "purchase_moving_sum",
    "asof_last_purchase_before_error",
    "error_context_counts",
    # training-data surface
    "dedup_exact_docs",
    "doc_token_stats",
    "doc_quality_scores",
    # r14 swap: the marker-word lang-ID entry retired (evidence rides
    # lang_id_agreement); the n-gram heuristic proper is the headline
    # language-ID representative from r14 on.
    "lang_id_ngram_predictions",
    # r16 swap: the bucket dump left the catalog; the suffix-pass
    # terminal removal is the dedup family's new headline entry
    "exactsubstr_deduped_docs",
    "neardup_candidate_pairs",
    "knn_bruteforce_top5",
    "lsh_neardup_embeddings",
]

# r4: the dedup/CC family the last two rounds' perf targets live on is
# promoted into the headline (best-of-N) set so its round-over-round
# numbers stop being best-of-1 cold-start noise (r3 verdict item #3).
HEADLINE = HEADLINE_R3 + [
    "simhash_fingerprints",
    "simhash_neardup_pairs",
    "neardup_jaccard_verified",
    "neardup_duplicate_clusters",
    "embedding_dup_clusters",
    # r16 swap: the inline IVF demo left the catalog; the persisted
    # IVF-binary serve path is the family's headline representative
    "ivfbin_rerank_top5",
]


def measure_ingest_throughput(
    spark, n_records: int = 10_000, pairs_per_record: int = 5
) -> dict:
    """End-to-end Structured-Streaming ingest throughput through the
    full five-sink fan-out (archive + rejects + real-time store +
    snapshot upsert + change feed), availableNow over a generated
    envelope corpus. Returns {msgs, sec, msgs_per_sec} - the number
    ROUND2.md quoted but never emitted reproducibly (r3 item #7).

    Each record carries ``pairs_per_record`` (status, production
    count) message pairs for distinct machines - the reference's
    envelope shape, where one wire record batches a gateway's tag
    messages (and the shape ROUND2's ~10k msg/s claim was measured
    on: 10 messages/record). Machines cycle so the snapshot upsert
    touches many keys. Wall clock covers stream start -> termination,
    the span a capacity plan cares about."""
    import base64
    import shutil
    import tempfile

    from machine_downtime_monitor_on_aws_spark.config import (
        IngestConfig,
        MachineConfig,
        MessageFormat,
    )
    from machine_downtime_monitor_on_aws_spark.streaming.ingest import (
        IngestSinks,
        read_envelope_stream,
        run_ingest_stream,
    )

    fmt = MessageFormat(
        id="DEFAULT",
        alias_delimiter="/",
        messages_key="messages",
        alias_key="name",
        quality_key="quality",
        timestamp_key="timestamp",
        value_key="value",
        timestamp_format="yyyy-MM-dd HH:mm:ss.SSSSSSXXX",
    )
    n_machines = 50
    machines = tuple(
        MachineConfig(
            id=f"site/a/p/m{i}",
            status_tag="status",
            production_count_tag="pc",
            status_up_values="u",
            status_down_values="d",
            status_idle_values="i",
        )
        for i in range(n_machines)
    )
    cfg = IngestConfig(formats=(fmt,), machines=machines)

    root = tempfile.mkdtemp(prefix="bench_ingest_")
    dirs = {
        k: os.path.join(root, k)
        for k in ("src", "realtime", "archive", "snapshot", "rejects", "feed", "ckpt")
    }
    os.makedirs(dirs["src"])
    try:
        statuses = ("u", "d", "i")
        lines_per_file = 2000
        f = None
        for r in range(n_records):
            if r % lines_per_file == 0:
                if f:
                    f.close()
                f = open(
                    os.path.join(dirs["src"], f"part{r // lines_per_file}.jsonl"), "w"
                )
            ts = f"2021-03-05 18:{(r // 60) % 60:02d}:{r % 60:02d}.000000+00:00"
            msgs = []
            for j in range(pairs_per_record):
                m = f"site/a/p/m{(r * pairs_per_record + j) % n_machines}"
                msgs.append(
                    {
                        "name": f"{m}/status",
                        "quality": "GOOD",
                        "timestamp": ts,
                        "value": statuses[(r + j) % 3],
                    }
                )
                msgs.append(
                    {
                        "name": f"{m}/pc",
                        "quality": "GOOD",
                        "timestamp": ts,
                        "value": r,
                    }
                )
            payload = base64.b64encode(json.dumps({"messages": msgs}).encode()).decode()
            f.write(
                json.dumps(
                    {
                        "record_id": f"r{r}",
                        "partition_key": f"site/a/p/m{r % n_machines}",
                        "arrival_ts": float(r),
                        "data": payload,
                    }
                )
                + "\n"
            )
        if f:
            f.close()

        sinks = IngestSinks(
            realtime_path=dirs["realtime"],
            archive_path=dirs["archive"],
            snapshot_path=dirs["snapshot"],
            rejects_path=dirs["rejects"],
            change_feed_path=dirs["feed"],
            change_feed=None,  # production mode: no driver-side collect
        )
        # one availableNow pass, large maxFilesPerTrigger so batch count
        # reflects micro-batching (5 files), not per-file batches
        src = read_envelope_stream(spark, dirs["src"], max_files_per_trigger=5)
        n_msgs = n_records * 2 * pairs_per_record
        t0 = time.perf_counter()
        q = run_ingest_stream(spark, src, lambda: cfg, sinks, dirs["ckpt"])
        q.awaitTermination()
        sec = time.perf_counter() - t0
        return {
            "msgs": n_msgs,
            "sec": round(sec, 3),
            "msgs_per_sec": round(n_msgs / sec, 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def measure_incremental_dedup(spark, sf_dir: str) -> dict:
    """Steady-state dedup cost: a 10% batch deduped against a
    persisted band index (incremental_candidate_pairs) vs re-running
    the full-corpus pair enumeration - the O(batch) vs O(corpus)
    claim, measured. Index build is untimed setup (it amortizes over
    every future batch); both measured paths end in the same
    count-the-pairs action.

    READING THE LABELS LEG: at bench scale labels_incremental_sec
    EXCEEDS labels_full_cc_sec by design, not regression - the sf0.1
    pair graph (~256 edges) keeps full CC on the driver union-find
    shortcut while update_components pays fixed multi-job overhead.
    The asymptotics flip once history crosses the 200k-edge driver
    threshold: measured in BENCH_CC_CROSSOVER.json
    (bench_cc_crossover.py; 3.7-7.8x incremental wins at 200k-3.2M
    edges), decomposed in SCALE.md r14."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        DEFAULT_NUM_BANDS,
        candidate_pairs_exact,
        connected_components,
        incremental_candidate_pairs,
        minhash_band_arrays,
        update_components,
        write_minhash_index,
    )
    from machine_downtime_monitor_on_aws_spark.tables import load_table
    from pyspark.sql import functions as F

    par = spark.sparkContext.defaultParallelism
    d = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % 10 == 7
    n_docs = d.count()
    n_batch = d.filter(is_batch).count()
    table = "bench_mh_index"
    try:
        # best-of-2 on BOTH paths: a single cold run charges plan
        # codegen to whichever path runs first and can invert the
        # comparison at local scale, where hashing 10x fewer docs is
        # only a fraction of a second. docs_hashed_* carries the
        # structural claim in noise-free units.
        full_sec, n_full = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            n_full = candidate_pairs_exact(
                minhash_band_arrays(d, "doc_id", "text", parallelism=par),
                DEFAULT_NUM_BANDS,
            ).count()
            full_sec = min(full_sec, time.perf_counter() - t0)

        write_minhash_index(
            minhash_band_arrays(d.filter(~is_batch), "doc_id", "text", parallelism=par),
            table,
            num_perms=8,
            num_bands=DEFAULT_NUM_BANDS,
            shingle_n=5,
        )
        inc_sec, n_inc = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            n_inc = incremental_candidate_pairs(
                spark,
                minhash_band_arrays(
                    d.filter(is_batch), "doc_id", "text", parallelism=par
                ),
                table,
                DEFAULT_NUM_BANDS,
            ).count()
            inc_sec = min(inc_sec, time.perf_counter() - t0)
        # labels leg: fold the batch's pairs into historical labels
        # (update_components) vs re-running CC over ALL pairs - the
        # O(batch + touched components) vs O(all pairs ever) claim
        hist_pairs = candidate_pairs_exact(
            minhash_band_arrays(d.filter(~is_batch), "doc_id", "text", parallelism=par),
            DEFAULT_NUM_BANDS,
        ).localCheckpoint(eager=True)
        labels = connected_components(hist_pairs).localCheckpoint(eager=True)
        batch_pairs = incremental_candidate_pairs(
            spark,
            minhash_band_arrays(d.filter(is_batch), "doc_id", "text", parallelism=par),
            table,
            DEFAULT_NUM_BANDS,
        ).localCheckpoint(eager=True)
        lab_full_sec = lab_inc_sec = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            connected_components(hist_pairs.unionByName(batch_pairs)).count()
            lab_full_sec = min(lab_full_sec, time.perf_counter() - t0)
            t0 = time.perf_counter()
            update_components(labels, batch_pairs).count()
            lab_inc_sec = min(lab_inc_sec, time.perf_counter() - t0)
        return {
            "full_rerun_sec": round(full_sec, 3),
            "incremental_sec": round(inc_sec, 3),
            "docs_hashed_full": n_docs,
            "docs_hashed_incremental": n_batch,
            "full_pairs": n_full,
            "batch_touching_pairs": n_inc,
            "labels_full_cc_sec": round(lab_full_sec, 3),
            "labels_incremental_sec": round(lab_inc_sec, 3),
        }
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        from machine_downtime_monitor_on_aws_spark.session import (
            unpersist_all_rdds,
        )

        unpersist_all_rdds(spark)  # the three localCheckpoints above


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Run-state self-documentation (r10 verdict: two driver artifacts
    # in a row carried a uniform ~1.2x box-state multiplier on
    # code-untouched queries, and attributing it needed a manual
    # quiet-box A/B). Recording the 1/5/15-min load averages at start
    # and end makes every artifact of record carry its own evidence:
    # a hot box shows loadavg >> the bench's own footprint, a quiet
    # run shows ~0 at start.
    loadavg_start = [round(v, 2) for v in os.getloadavg()]
    from machine_downtime_monitor_on_aws_spark.plans import catalog
    from machine_downtime_monitor_on_aws_spark.session import (
        get_spark,
        unpersist_all_rdds,
    )

    spark = get_spark("bench")

    # warmup: touch each table once so JVM/codegen startup isn't billed
    # to the first query
    from machine_downtime_monitor_on_aws_spark.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()

    qs = catalog.queries()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    query_runs: dict[str, int] = {}
    total = 0.0
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    def time_query(name: str, n_runs: int) -> float:
        fn = qs[name]
        obs: list[float] = []
        n = 0
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            obs.append(time.perf_counter() - t0)
            # drop per-query persisted relations (LSH buckets) so
            # cached state never bleeds into the next measurement.
            # clearCache only covers SQL-cached relations; the
            # localCheckpoint barriers (simhash/CC/jaccard) persist
            # RDDs that it does NOT release, and 76 queries x N runs
            # of leaked blocks measurably degrade later queries
            # (simhash_neardup_pairs: 2.7s inside a full bench run vs
            # 1.3s standalone until this sweep).
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)
        query_runs[name] = n_runs
        # median alongside best (r4 verdict #7): on this box a ~1.6x
        # noise swing makes single-sample regressions unattributable;
        # round-over-round claims should read the median, capacity
        # planning the best.
        med = sorted(obs)[len(obs) // 2] if len(obs) % 2 else sum(
            sorted(obs)[len(obs) // 2 - 1 : len(obs) // 2 + 1]
        ) / 2
        medians[name] = round(med, 3)
        samples[name] = [round(o, 3) for o in obs]
        best = min(obs)
        print(
            f"# {name}: {n} rows best {best:.2f}s median {med:.2f}s "
            f"(of {n_runs})",
            file=sys.stderr,
        )
        return best

    # Untimed warmup pass over the headline set before ANY timing:
    # recording medians (r4 verdict #7) exposed that the first 1-2
    # executions of each heavy family run 3-5x slow (progressive JIT
    # of shared runtime methods - shuffle/parquet/hash - across the
    # process, e.g. neardup_candidate_pairs samples 7.5/5.8/1.55s
    # cold vs ~1.5s warm), so without warmup the median measures JIT
    # ramp, not the query. One pass warms the shared machinery;
    # medians then report steady state and best-of-N stays the
    # capacity number.
    non_headline = sorted(set(qs) - set(HEADLINE))
    if os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0":
        for name in HEADLINE + non_headline:
            qs[name](spark, sf_dir).count()
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)

    for name in HEADLINE:
        best = time_query(name, runs)
        timings[name] = round(best, 3)
        total += best

    # every non-headline catalog query with its own median (r5 verdict
    # item #8: best-of-1 numbers outside the headline set made
    # dedup/QA-family regressions unattributable) - warmup above
    # covers these too, so the medians report steady state
    # 3, not 2: the value stored below is best-of-N (min), already
    # immune to one-sided slow blips - the 3rd sample instead hardens
    # the separately recorded MEDIANS (the round-over-round comparison
    # artifact). Long-session GC pauses land one-sided multi-second
    # blips on shuffle-heavy queries (allpairs sampled [3.5, 12.2]
    # in-bench vs a tight 2.1-3.2s x8 standalone), and a 2-sample
    # median averages the blip in instead of rejecting it. Median-of-3
    # is robust to a single outlier; all samples stay in the artifact.
    nh_runs = int(os.environ.get("SPARK_GRAFT_BENCH_NH_RUNS", "3"))
    for name in non_headline:
        timings[name] = round(time_query(name, nh_runs), 3)

    # Every catalog query has now run, so every CURRENT-generation
    # store path is registered live; reclaim the rest (r11 verdict
    # #4: a version-token bump orphans the whole previous generation
    # in /tmp, plus crashed .build-* staging and publish trash).
    # Other-SF stores get swept too and rebuild on next first touch -
    # build-if-absent makes that safe.
    from machine_downtime_monitor_on_aws_spark import fsio

    swept = fsio.sweep_stale_stores(spark)
    if swept:
        print(f"# swept {len(swept)} stale store dirs", file=sys.stderr)

    # Peak over a convergence-bounded series. Two r13 cold-session
    # series showed the ingest chain JIT-warms through run ~8, not ~3
    # (7.2k/19.4k/23.8k/28.5k/.../34.0k/33.6k/35.7k msg/s), so the old
    # FIXED 2-warmup/best-of-2 recorded a number whose position on the
    # warmup slope depended on how hot the preceding all-catalog pass
    # left the JVM - the r11->r12 41.1k->35.1k driver wobble on
    # code-untouched ingest. A late-session MEDIAN is no better: the
    # aged JVM also declines after peaking (an r13 in-bench series
    # peaked 34.3k at run 3 then sagged to 24-27k), so a median lands
    # wherever the sag does. The recorded number is therefore the PEAK
    # over the whole series - every sequence passes through it, making
    # it the reproducible capacity number - with the full series and
    # the tail median kept in the artifact for drift attribution.
    runs_hist: list[dict] = []
    no_improve = 0
    for _ in range(8):
        runs_hist.append(measure_ingest_throughput(spark))
        vals = [r["msgs_per_sec"] for r in runs_hist]
        # Cumulative climb detection (r13 ADVICE #2): a steady sub-5%
        # PER-RUN late-warmup climb (the documented runs-5-8 regime)
        # must not read as two non-improvers, so a run "improves"
        # when the best of the last TWO runs beats everything before
        # them by >=5% - consecutive small gains compound into one
        # improvement instead of ending the series on the slope.
        improved = len(vals) < 3 or max(vals[-2:]) >= max(vals[:-2]) * 1.05
        # two consecutive non-improvers after a 4-run minimum: a
        # single noise dip mid-climb (r13 series dipped at run 4 of a
        # 14-run climb) must not end the climb detection
        no_improve = 0 if improved else no_improve + 1
        if len(runs_hist) >= 4 and no_improve >= 2:
            break
    runs_hist.extend(measure_ingest_throughput(spark) for _ in range(2))
    series = [r["msgs_per_sec"] for r in runs_hist]
    ingest = dict(max(runs_hist, key=lambda r: r["msgs_per_sec"]))
    tail = sorted(series[-3:])
    ingest["msgs_per_sec_tail_median"] = round(tail[len(tail) // 2], 1)
    ingest["series"] = [round(v, 1) for v in series]
    print(f"# ingest: {ingest}", file=sys.stderr)
    inc_dedup = measure_incremental_dedup(spark, sf_dir)
    print(f"# incremental dedup: {inc_dedup}", file=sys.stderr)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    full = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "query_medians": medians,
        "query_samples": samples,
        "headline_median_total": round(sum(medians[n] for n in HEADLINE), 3),
        "query_runs": query_runs,
        "headline_r3_total": round(sum(timings[n] for n in HEADLINE_R3), 3),
        "total_all_queries": round(sum(timings.values()), 3),
        "n_queries": len(timings),
        "ingest_msgs_per_sec": ingest["msgs_per_sec"],
        "ingest_bench": ingest,
        "incremental_dedup": inc_dedup,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "loadavg_start": loadavg_start,
        "loadavg_end": [round(v, 2) for v in os.getloadavg()],
    }
    # Full record (all catalog queries) -> file: round-over-round
    # comparisons read this. The PRINTED line is capped: the driver
    # records only the last ~2 KB of stdout, and r2's 2.6 KB
    # all-queries line lost its head to the window -> parsed: null.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json")
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1)
    line = json.dumps(full, separators=(",", ":"))
    if len(line) > 1900:
        compact = dict(full)
        compact["queries"] = {k: timings[k] for k in HEADLINE if k in timings}
        # per-query medians/samples live in bench_out.json; the
        # printed line keeps only the median headline total (the
        # driver's stdout window is ~2 KB)
        compact.pop("query_runs", None)
        compact.pop("query_samples", None)
        compact.pop("query_medians", None)
        compact.pop("ingest_bench", None)
        compact["bench_runs"] = runs
        compact["queries_file"] = "bench_out.json"
        line = json.dumps(compact, separators=(",", ":"))
    sys.stderr.flush()
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with headline timings.

Headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1):
  - index_build      : read → tokenize → sort/ordinals → encode → shuffle →
                       segment write (full inverted-index build); reports
                       turns/sec
  - bm25_engine      : batch BM25 top-10 over the built index via the actor
                       pool; reports per-query p50 latency
  - bm25_topk_simple : the SQL-checkable distributed batch-BM25 pipeline
  - term_df_cf       : full-vocabulary df/cf aggregate

`--scaling` runs the index build twice in FRESH subprocesses at two CPU
counts (default N=4 → 4N=16; override GRAFT_SCALE_FROM/TO) on the same input
and reports both throughputs + scaling efficiency (sandbox evidence for the
N→4N cluster criterion; 4→16 keeps both runs off the machine's memory-
bandwidth ceiling, which a real multi-node 4x cluster would not share). Uses a
larger corpus ($GRAFT_SCALING_TURNS, default 32M turns) so per-stage fixed
latencies amortize — the same reason a real 100TB run amortizes them.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench(num_cpus: int, sf_dir: str) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pyarrow.parquet as pq

    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.pipelines import simple as S
    from anserini_ray.search import Searcher
    from anserini_ray.sources import transcripts_from_documents

    doc_file = os.path.join(sf_dir, "documents.parquet")
    # The transcript corpus (BASELINE.json input_hint) is synthesized
    # deterministically at a scale proportional to the sf tier: 100 turns per
    # `documents` row (sf0.1 → 500K turns), cached across runs.
    n_turns = 100 * pq.read_metadata(doc_file).num_rows
    corpus_dir = f"/tmp/anserini_ray_corpus_{n_turns}"
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        from anserini_ray.sources import write_synthetic_corpus

        write_synthetic_corpus(corpus_dir, n_turns, seed=42)
    corpus_files = sorted(
        os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)
    )

    import ray.data

    # Warm the cluster before timing: spawn workers + import the library in
    # them (session startup is not pipeline throughput).
    warm = ray.data.read_parquet(corpus_files[0], columns=["conv_id", "turn_idx", "text"]).limit(2000)
    from anserini_ray.index.build import TokenizeDocs as _TD

    warm.map_batches(_TD(None), batch_format="pyarrow").materialize()

    timings: dict[str, float] = {}
    index_dir = f"/tmp/anserini_ray_bench_{num_cpus}"
    shutil.rmtree(index_dir, ignore_errors=True)

    # best-of-2 builds: single-run numbers on this shared sandbox vary with
    # invisible host load (same policy as --scaling)
    best = None
    for _ in range(2):
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.perf_counter()
        build_index(
            index_dir=index_dir,
            config=IndexConfig(seg_shift=16, assume_sorted=True),
            input_paths=corpus_files,
        )
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    timings["index_build"] = best

    searcher = Searcher(index_dir, num_actors=min(8, num_cpus))
    queries = S.SIMPLE_QUERIES
    # warm
    searcher.batch_search(queries[:2], k=10)
    lat = []
    t0 = time.perf_counter()
    for qid, text in queries:
        tq = time.perf_counter()
        searcher.search(text, k=1000)
        lat.append(time.perf_counter() - tq)
    timings["bm25_engine"] = time.perf_counter() - t0
    lat.sort()
    p50_ms = 1000 * lat[len(lat) // 2]

    def _consume(result):
        # pipelines may return a Dataset (consume it) or a final pa.Table
        if hasattr(result, "materialize"):
            result.materialize()

    t0 = time.perf_counter()
    _consume(S.bm25_topk_simple(sf_dir))
    timings["bm25_topk_simple"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    _consume(S.term_df_cf(sf_dir))
    timings["term_df_cf"] = time.perf_counter() - t0

    result = {
        "metric": "index_build+bm25_query wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "turns": n_turns,
        "build_turns_per_sec": round(n_turns / timings["index_build"], 1),
        "query_p50_ms": round(p50_ms, 2),
    }
    ray.shutdown()
    return result


SCALING_TURNS = int(os.environ.get("GRAFT_SCALING_TURNS", "8000000"))


def run_scaling_build(num_cpus: int, n_turns: int) -> dict:
    """One index build over the scaling corpus (fresh session), warm workers
    first; prints turns/sec."""
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray.data

    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.index.build import TokenizeDocs
    from anserini_ray.sources import write_synthetic_corpus

    corpus_dir = f"/tmp/anserini_ray_corpus_{n_turns}"
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        write_synthetic_corpus(corpus_dir, n_turns, seed=42, rows_per_file=250_000)
    corpus_files = sorted(
        os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)
    )
    # warm worker processes (session startup is not pipeline throughput)
    ray.data.read_parquet(
        corpus_files[0], columns=["conv_id", "turn_idx", "text"]
    ).limit(2000).map_batches(TokenizeDocs(None), batch_format="pyarrow").materialize()

    # best-of-2 trials: page-cache/worker warmup variance otherwise
    # dominates the low-cpu run
    best = None
    for trial in range(2):
        index_dir = f"/tmp/anserini_ray_scale_{num_cpus}"
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.perf_counter()
        m = build_index(
            index_dir=index_dir,
            config=IndexConfig(seg_shift=17, assume_sorted=True),
            input_paths=corpus_files,
            total_input=n_turns,
        )
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, m.counters["stage_secs"])
    dt, stage_secs = best
    out = {
        "num_cpus": num_cpus,
        "turns": n_turns,
        "build_sec": round(dt, 2),
        "build_turns_per_sec": round(n_turns / dt, 1),
        "stage_secs": stage_secs,
    }
    ray.shutdown()
    return out


ZIPF_TURNS = int(os.environ.get("GRAFT_ZIPF_TURNS", "1000000"))
ZIPF_VOCAB = int(os.environ.get("GRAFT_ZIPF_VOCAB", "500000"))
# Docs per segment = 2**shift. 17 (131K docs) matches the default build;
# raise to e.g. 24 for a single-16M-doc-segment MaxScore measurement.
ZIPF_SEG_SHIFT = int(os.environ.get("GRAFT_ZIPF_SEG_SHIFT", "17"))


def run_zipf_bench(num_cpus: int) -> dict:
    """Zipfian-vocabulary retrieval bench: the 34-term default corpus gives
    block-max pruning nothing to prune, so MaxScore wins (and pruned ==
    exhaustive correctness) are measured here on a 500K-term rank^-1 vocab.
    Reports batch-query throughput with pruning off/on and verifies the two
    paths return IDENTICAL (docid, score) rankings for every query."""
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.search import LocalSearcher
    from anserini_ray.sources.transcripts import write_zipf_corpus

    corpus_dir = f"/tmp/anserini_ray_zipf_{ZIPF_TURNS}_{ZIPF_VOCAB}"
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        write_zipf_corpus(corpus_dir, ZIPF_TURNS, vocab_size=ZIPF_VOCAB,
                          rows_per_file=125_000)
    corpus_files = sorted(
        os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)
    )
    index_dir = f"/tmp/anserini_ray_zipf_idx_{ZIPF_TURNS}_{ZIPF_VOCAB}_s{ZIPF_SEG_SHIFT}"
    t0 = time.perf_counter()
    if not os.path.isdir(os.path.join(index_dir, "manifests")):
        shutil.rmtree(index_dir, ignore_errors=True)
        build_index(
            index_dir=index_dir,
            config=IndexConfig(seg_shift=ZIPF_SEG_SHIFT, assume_sorted=True),
            input_paths=corpus_files,
            total_input=ZIPF_TURNS,
        )
    build_sec = time.perf_counter() - t0

    # query mix over the rank spectrum: head (top-100), torso (1K-10K),
    # tail (~100K) — each query pairs ranks so MaxScore has low-impact
    # clauses to skip. Terms are 't%07d' by Zipf rank (0-based).
    import numpy as np

    rng = np.random.default_rng(7)
    queries = []
    for i in range(60):
        head = int(rng.integers(0, 100))
        torso = int(rng.integers(1_000, 10_000))
        tail = int(rng.integers(100_000, ZIPF_VOCAB))
        if i % 3 == 0:
            terms = [head, torso]
        elif i % 3 == 1:
            terms = [head, torso, tail]
        else:
            terms = [torso, tail]
        queries.append(" ".join(f"t{r:07d}" for r in terms))

    mismatch = 0
    qstats = {"build_sec": round(build_sec, 2)}
    # ONE reader load shared by every (k, prune) config: prune is a plain
    # attribute, and re-loading per config multiplies reader-load cost by 6
    # (at 16M docs/segment that dwarfed the queries themselves)
    t0 = time.perf_counter()
    s = LocalSearcher(index_dir)
    qstats["reader_load_sec"] = round(time.perf_counter() - t0, 2)
    for k in (10, 100, 1000):
        results = {}
        timings = {}
        for label, prune in (("exhaustive", False), ("pruned", True)):
            s.prune = prune
            # fair A/B: each mode starts from an empty decode cache + the
            # same single-query warm (otherwise the second mode free-rides
            # on the first mode's decoded postings)
            for r in s.readers:
                r.clear_caches()
            s.search(queries[0], k=k)  # warm (mmap + postings cache)
            t0 = time.perf_counter()
            out = [s.search(q, k=k) for q in queries]
            timings[label] = time.perf_counter() - t0
            results[label] = out
        for (d_a, s_a), (d_b, s_b) in zip(
            results["exhaustive"], results["pruned"]
        ):
            if d_a != d_b or list(map(float, s_a)) != list(map(float, s_b)):
                mismatch += 1
        qstats[f"exhaustive_qps_k{k}"] = round(
            len(queries) / timings["exhaustive"], 2
        )
        qstats[f"pruned_qps_k{k}"] = round(len(queries) / timings["pruned"], 2)
        qstats[f"pruning_speedup_k{k}"] = round(
            timings["exhaustive"] / timings["pruned"], 2
        )
    out = {
        "metric": "zipf-vocab batch query throughput (pruned q/s, k=10)",
        "value": qstats["pruned_qps_k10"],
        "unit": "q/s",
        "queries": qstats,
        "sf": corpus_dir,
        "num_cpus": num_cpus,
        "turns": ZIPF_TURNS,
        "vocab": ZIPF_VOCAB,
        "pruned_vs_exhaustive_mismatches": mismatch,
    }
    ray.shutdown()
    if mismatch:
        raise AssertionError(
            f"pruned != exhaustive on {mismatch} query runs"
        )
    return out


def _zipf_queries(n_total: int = 600) -> list[tuple[str, str]]:
    """The Zipf bench's head/torso/tail mix, replicated with distinct qids
    to a stable-timing batch size."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = []
    for i in range(60):
        head = int(rng.integers(0, 100))
        torso = int(rng.integers(1_000, 10_000))
        tail = int(rng.integers(100_000, ZIPF_VOCAB))
        terms = ([head, torso], [head, torso, tail], [torso, tail])[i % 3]
        base.append(" ".join(f"t{r:07d}" for r in terms))
    return [(f"q{j:05d}", base[j % 60]) for j in range(n_total)]


def _ensure_zipf_index() -> str:
    """Build (once) and return the Zipf corpus index under /tmp. Requires
    an initialised Ray session."""
    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.sources.transcripts import write_zipf_corpus

    corpus_dir = f"/tmp/anserini_ray_zipf_{ZIPF_TURNS}_{ZIPF_VOCAB}"
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        write_zipf_corpus(corpus_dir, ZIPF_TURNS, vocab_size=ZIPF_VOCAB,
                          rows_per_file=125_000)
    index_dir = (
        f"/tmp/anserini_ray_zipf_idx_{ZIPF_TURNS}_{ZIPF_VOCAB}"
        f"_s{ZIPF_SEG_SHIFT}"
    )
    if not os.path.isdir(os.path.join(index_dir, "manifests")):
        shutil.rmtree(index_dir, ignore_errors=True)
        build_index(
            index_dir=index_dir,
            config=IndexConfig(seg_shift=ZIPF_SEG_SHIFT, assume_sorted=True),
            input_paths=sorted(
                os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)
            ),
            total_input=ZIPF_TURNS,
        )
    return index_dir


def run_query_ladder(widths=(4, 8, 16), trials: int = 3) -> dict:
    """Query-scaling ladder in ONE Ray session: 16 warmed actors, widths
    measured back-to-back and interleaved across trials so every leg sees
    the same host window (the old subprocess-per-width protocol put legs
    minutes apart on a host with documented ~4x swings — legs read
    mutually inconsistent efficiencies, e.g. 0.69 for 4→8 next to a
    superlinear 2.14x for 8→16). Session CPU budget is fixed at NUM_CPUS;
    only the pool width varies, idle actors cost nothing. Every actor
    runs the identical 60-query Zipf mix x reps (equal-cost shards by
    construction). Reference analog: SimpleSearcher.batchSearch's thread
    pool (SimpleSearcher.java:213-284)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, ignore_reinit_error=True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    index_dir = _ensure_zipf_index()

    @ray.remote(num_cpus=1)
    class _QueryWorker:
        def __init__(self, index_dir: str, k: int):
            from anserini_ray.search.searcher import LocalSearcher

            self.s = LocalSearcher(index_dir)
            self.k = k

        def run(self, texts: list) -> int:
            n = 0
            for t in texts:
                d, _ = self.s.search(t, self.k)
                n += len(d)
            return n

    k = 100
    base = [t for _, t in _zipf_queries(60)]
    shard = base * 4
    nmax = max(widths)
    actors = [_QueryWorker.remote(index_dir, k) for _ in range(nmax)]
    ray.get([a.run.remote(shard) for a in actors])  # warm: load + caches
    best = {n: None for n in widths}
    for _ in range(trials):
        for n in widths:
            t0 = time.perf_counter()
            totals = ray.get([a.run.remote(shard) for a in actors[:n]])
            dt = time.perf_counter() - t0
            assert sum(totals) > 0
            qps = (len(shard) * n) / dt
            if best[n] is None or qps > best[n]:
                best[n] = qps
    ray.shutdown()
    lo, hi = min(widths), max(widths)
    return {
        "metric": f"query scaling efficiency {lo}→{hi} actors (batch BM25)",
        "value": round((best[hi] / best[lo]) / (hi / lo), 3),
        "unit": "efficiency",
        "queries": {f"qps_{n}actors": round(best[n], 2) for n in widths},
        "queries_per_actor": len(shard),
        "trials": trials,
        "num_cpus": NUM_CPUS,
    }


def run_query_scale(n_actors: int) -> dict:
    """Steady-state batch BM25 throughput at a given query-sharded actor-pool
    width over the Zipf index (reference analog: SimpleSearcher.batchSearch's
    long-lived thread pool, SimpleSearcher.java:213-284). The pool is
    long-lived Ray actors warmed BEFORE timing — a fresh map_batches pool
    would re-pay per-actor index load inside the timed window at every width
    and every trial, measuring startup instead of query scaling. Session CPU
    budget is fixed at 32; only the pool width varies."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, ignore_reinit_error=True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    index_dir = _ensure_zipf_index()

    @ray.remote(num_cpus=1)
    class _QueryWorker:
        def __init__(self, index_dir: str, k: int):
            from anserini_ray.search.searcher import LocalSearcher

            self.s = LocalSearcher(index_dir)
            self.k = k

        def run(self, texts: list) -> int:
            n = 0
            for t in texts:
                d, _ = self.s.search(t, self.k)
                n += len(d)
            return n

    # Every actor runs the IDENTICAL 60-query head/torso/tail mix x reps:
    # shard cost is equal by construction, so the wall clock measures pure
    # scaling. (The old texts[i::n] striding gave each of 16 actors a
    # different 15-of-60 query subset — Zipf query costs are heavy-tailed,
    # so the max shard ran ~1.9x the min and capped apparent efficiency
    # at ~0.7-0.85 regardless of engine behavior.)
    k = 100
    base = [t for _, t in _zipf_queries(60)]
    reps = 4
    shard = base * reps
    n_total = len(shard) * n_actors
    actors = [_QueryWorker.remote(index_dir, k) for _ in range(n_actors)]
    # warm: index load + mmap page-cache touch, per actor, OUTSIDE timing
    ray.get([a.run.remote(base[:6]) for a in actors])
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        totals = ray.get([a.run.remote(shard) for a in actors])
        dt = time.perf_counter() - t0
        assert sum(totals) > 0
        best = dt if best is None else min(best, dt)
    out = {
        "metric": "zipf batch BM25 qps",
        "value": round(n_total / best, 2),
        "unit": "q/s",
        "n_actors": n_actors,
        "k": k,
        "queries_total": n_total,
        "num_cpus": NUM_CPUS,
        "query_qps": round(n_total / best, 2),
    }
    ray.shutdown()
    return out


def run_all_queries(num_cpus: int, sf_dir: str) -> dict:
    """Per-registry-entry wall time: every queries() entry consumed once
    (Datasets materialized, tables/frames returned as-is) at `sf_dir`.
    Purpose: a recorded cost for the ~50 non-headline entries, so a perf
    regression in any of them shows up in BENCH/BASELINE history instead of
    being invisible until a user hits it (VERDICT r4 #7)."""
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    per: dict[str, float] = {}
    failed: dict[str, str] = {}
    t_all = time.perf_counter()
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            res = qs[name](sf_dir)
            if hasattr(res, "materialize"):
                res.materialize()
            per[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep timing the rest
            failed[name] = f"{type(exc).__name__}: {exc}"[:200]
    out = {
        "metric": "per-registry-entry wall time",
        "value": round(time.perf_counter() - t_all, 3),
        "unit": "sec",
        "queries": per,
        "failed": failed,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_entries": len(qs),
    }
    ray.shutdown()
    return out


def main():
    if "--all-queries" in sys.argv:
        sf = os.environ.get("GRAFT_ALLQ_SF_DIR", "/root/testdata/sf0.01")
        print(json.dumps(run_all_queries(NUM_CPUS, sf)))
        return
    if "--zipf" in sys.argv:
        print(json.dumps(run_zipf_bench(NUM_CPUS)))
        return
    if "--query-ladder" in sys.argv:
        print(json.dumps(run_query_ladder()))
        return
    if "--single-query-scale" in sys.argv:
        n = int(sys.argv[sys.argv.index("--single-query-scale") + 1])
        print(json.dumps(run_query_scale(n)))
        return
    if "--scaling" in sys.argv:
        lo = int(os.environ.get("GRAFT_SCALE_FROM", "4"))
        hi = int(os.environ.get("GRAFT_SCALE_TO", "16"))
        results = []
        for n in (lo, hi):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single-scale", str(n)],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            if not lines:
                raise RuntimeError(f"scaling run failed: {out.stderr[-2000:]}")
            results.append(json.loads(lines[-1]))
        t8, t32 = (r["build_turns_per_sec"] for r in results)
        eff = (t32 / t8) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": f"scaling efficiency {lo}→{hi} cpus (index build)",
                    "value": round(eff, 3),
                    "unit": "efficiency",
                    "queries": {
                        f"build_turns_per_sec_{lo}cpu": t8,
                        f"build_turns_per_sec_{hi}cpu": t32,
                    },
                    "sf": SF_DIR,
                    "num_cpus": 32,
                    "scaling_turns": SCALING_TURNS,
                    "runs": results,
                }
            )
        )
        return
    if "--single-scale" in sys.argv:
        n = int(sys.argv[sys.argv.index("--single-scale") + 1])
        print(json.dumps(run_scaling_build(n, SCALING_TURNS)))
        return
    if "--single" in sys.argv:
        n = int(sys.argv[sys.argv.index("--single") + 1])
        print(json.dumps(run_bench(n, SF_DIR)))
        return
    print(json.dumps(run_bench(NUM_CPUS, SF_DIR)))


if __name__ == "__main__":
    main()

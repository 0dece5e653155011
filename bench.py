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

`--scaling` runs the build+query job twice in FRESH subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both throughputs +
scaling efficiency (sandbox evidence for the N→4N cluster criterion).
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

    timings: dict[str, float] = {}
    index_dir = f"/tmp/anserini_ray_bench_{num_cpus}"
    shutil.rmtree(index_dir, ignore_errors=True)

    t0 = time.perf_counter()
    build_index(
        ray.data.read_parquet(
            corpus_dir, columns=["conv_id", "turn_idx", "text"]
        ),
        index_dir,
        IndexConfig(seg_shift=16),
        input_files=corpus_files,
    )
    timings["index_build"] = time.perf_counter() - t0

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

    t0 = time.perf_counter()
    S.bm25_topk_simple(sf_dir).materialize()
    timings["bm25_topk_simple"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    S.term_df_cf(sf_dir).materialize()
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


def main():
    if "--scaling" in sys.argv:
        results = []
        for n in (8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single", str(n)],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            results.append(json.loads(line))
        t8, t32 = (r["build_turns_per_sec"] for r in results)
        eff = (t32 / t8) / (32 / 8)
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency 8→32 cpus (index build)",
                    "value": round(eff, 3),
                    "unit": "efficiency",
                    "queries": {
                        "build_turns_per_sec_8cpu": t8,
                        "build_turns_per_sec_32cpu": t32,
                    },
                    "sf": SF_DIR,
                    "num_cpus": 32,
                    "runs": results,
                }
            )
        )
        return
    if "--single" in sys.argv:
        n = int(sys.argv[sys.argv.index("--single") + 1])
        print(json.dumps(run_bench(n, SF_DIR)))
        return
    print(json.dumps(run_bench(NUM_CPUS, SF_DIR)))


if __name__ == "__main__":
    main()

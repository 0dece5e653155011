"""Measure posting-run fragmentation cost: reader load + query throughput
vs units-per-segment, and the effect of compaction (optimize_index).

Grounds the IndexConfig.auto_compact_unit_runs default: each unit write that
touches a segment adds ~1 run per (common) term, so units/segment is the
zero-cost proxy for runs-per-posting-list. We build the SAME Zipf corpus at
three unit granularities (file size == unit size below the 65536 target),
then compact the most fragmented index and re-measure.

Run: python scripts/bench_fragmentation.py [num_cpus]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TURNS = int(os.environ.get("FRAG_TURNS", "524288"))
VOCAB = int(os.environ.get("FRAG_VOCAB", "200000"))
SEG_SHIFT = 17  # 131072 docs/segment -> 4 segments


def query_mix(vocab: int, n: int = 60) -> list[str]:
    import numpy as np

    rng = np.random.default_rng(7)
    out = []
    for i in range(n):
        head = int(rng.integers(0, 100))
        torso = int(rng.integers(1_000, 10_000))
        tail = int(rng.integers(100_000, vocab))
        terms = ([head, torso], [head, torso, tail], [torso, tail])[i % 3]
        out.append(" ".join(f"t{r:07d}" for r in terms))
    return out


def measure(index_dir: str, queries: list[str], k: int = 100) -> dict:
    from anserini_ray.search import LocalSearcher

    t0 = time.perf_counter()
    s = LocalSearcher(index_dir)
    load_sec = time.perf_counter() - t0
    s.search(queries[0], k=k)  # warm mmap
    t0 = time.perf_counter()
    out = [s.search(q, k=k) for q in queries]
    q_sec = time.perf_counter() - t0
    return {
        "load_sec": round(load_sec, 3),
        "qps": round(len(queries) / q_sec, 2),
        "checksum": sum(len(d) for d, _ in out),
    }


def main():
    import ray

    num_cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.index.optimize import optimize_index
    from anserini_ray.sources.transcripts import write_zipf_corpus

    queries = query_mix(VOCAB)
    results = {}
    ref_checksum = None
    for rows_per_file, label in ((65536, "u2"), (16384, "u8"), (4096, "u32")):
        corpus = f"/tmp/frag_corpus_{TURNS}_{rows_per_file}"
        if not os.path.isdir(corpus) or not os.listdir(corpus):
            write_zipf_corpus(corpus, TURNS, vocab_size=VOCAB,
                              rows_per_file=rows_per_file)
        files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus))
        idx = f"/tmp/frag_idx_{TURNS}_{rows_per_file}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.perf_counter()
        build_index(
            index_dir=idx,
            config=IndexConfig(seg_shift=SEG_SHIFT, assume_sorted=True,
                               auto_compact_unit_runs=None),
            input_paths=files,
            total_input=TURNS,
        )
        build_sec = time.perf_counter() - t0
        m = measure(idx, queries)
        m["build_sec"] = round(build_sec, 2)
        m["units_per_segment"] = (1 << SEG_SHIFT) // min(rows_per_file, 65536)
        results[label] = m
        if ref_checksum is None:
            ref_checksum = m["checksum"]
        assert m["checksum"] == ref_checksum, "result drift across granularity"
        if label == "u32":
            t0 = time.perf_counter()
            optimize_index(idx)
            opt_sec = time.perf_counter() - t0
            mo = measure(idx, queries)
            assert mo["checksum"] == ref_checksum, "compaction changed results"
            mo["optimize_sec"] = round(opt_sec, 2)
            results["u32_compacted"] = mo
    print(json.dumps({"turns": TURNS, "vocab": VOCAB, "num_cpus": num_cpus,
                      "k": 100, "results": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()

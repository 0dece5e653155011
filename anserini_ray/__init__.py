"""anserini_ray — a Ray-Data-native inverted-index build + BM25 top-k query engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the Anserini reference (lodewijkvankeizerswaard/anserini) expressed as Ray
Data streaming pipelines over zero-copy Arrow batches:

- ``anserini_ray.analysis``  — Lucene-semantics English analyzer (tokenize →
  possessive strip → lowercase → stop filter → Porter stem), golden-tested
  against the reference fixtures.
- ``anserini_ray.index``     — distributed inverted-index build: map_batches
  tokenize → deterministic doc-ordinal assignment (verified sorted fast
  path) → in-batch explode + delta-gap varint encode of bounded
  (segment, term) runs (hot-term skew structurally bounded, no postings
  shuffle) → partitioned segment files with per-block max-score metadata +
  lineage manifests (checkpoint-resume) + optional positions/forward-index
  artifacts; optimize.py force-merge compaction.
- ``anserini_ray.search``    — BM25 (k1=0.9, b=0.4) top-k retrieval with
  Lucene float32 parity, block-max pruning, deterministic docid tie-break and
  score ties-adjust; actor-pool segment searchers + TREC run output.
- ``anserini_ray.stages``    — training-data-pipeline operators: exact /
  MinHash-LSH / SimHash / n-gram-Jaccard dedup, language-ID, quality scoring,
  token counting, fingerprinting, ANN cosine top-k.
- ``anserini_ray.sources``   — transcript corpus synthesis + topic readers.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — sessions are
owned by the caller (driver, bench.py, CLI, test fixture).
"""

__version__ = "0.1.0"

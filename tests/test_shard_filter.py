"""Sha1 shard filter parity (reference IndexCollection.java:185-191):
Guava sha1 asInt (little-endian first 4 bytes, signed) Java-mod shard_count,
including the reference's negative-hash quirk (those docs match NO shard)."""

import hashlib
import os
import struct

import pytest

from anserini_ray.index import IndexConfig, build_index
from anserini_ray.index.shard import _java_mod, sha1_shard_int, shard_mask, shard_of
from anserini_ray.search.searcher import LocalSearcher
from anserini_ray.sources import write_synthetic_corpus


def test_sha1_int_semantics():
    # independent recomputation of the Guava asInt contract
    for docid in ["conv-000000:0", "doc1", "x:y", "äöü:3"]:
        d = hashlib.sha1(docid.encode()).digest()
        expect = struct.unpack("<i", d[:4])[0]
        assert sha1_shard_int(docid) == expect
    assert _java_mod(-7, 3) == -1  # Java % keeps the dividend's sign
    assert _java_mod(7, 3) == 1


def test_shard_mask_partitions_with_negative_hole():
    ids = [f"conv-{i:06d}:{j}" for i in range(200) for j in range(4)]
    count = 3
    masks = [shard_mask(ids, count, cur) for cur in range(count)]
    covered = 0
    for i, d in enumerate(ids):
        hits = sum(int(m[i]) for m in masks)
        r = shard_of(d, count)
        if r >= 0:  # non-negative hash, or a negative exact multiple (r=0)
            assert hits == 1  # exactly one shard
            assert masks[r][i]
        else:
            assert hits == 0  # the reference quirk: negative remainder
            #                   matches no shard in [0, count)
        covered += hits
    # both populations must actually occur on 800 ids
    assert 0 < covered < len(ids)


@pytest.fixture(scope="module")
def shard_corpus(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("shard_corpus"))
    write_synthetic_corpus(d, 6000, seed=31, rows_per_file=6000)
    return sorted(os.path.join(d, f) for f in os.listdir(d))


def test_sharded_builds_partition_the_corpus(shard_corpus, tmp_path):
    count = 3
    full = build_index(
        index_dir=str(tmp_path / "full"),
        config=IndexConfig(seg_shift=12, assume_sorted=True),
        input_paths=shard_corpus,
    )
    all_ids = set()
    manifests = []
    for cur in range(count):
        cfg = IndexConfig(
            seg_shift=12, assume_sorted=True,
            shard_count=count, shard_current=cur,
        )
        m = build_index(
            index_dir=str(tmp_path / f"shard{cur}"),
            config=cfg,
            input_paths=shard_corpus,
        )
        manifests.append(m)
        s = LocalSearcher(str(tmp_path / f"shard{cur}"))
        ids = set()
        for r in s.readers:
            ids.update(r.doc_id_strings(r.all_local_ords()))
        assert not (ids & all_ids), "shards must be disjoint"
        # every doc in this shard hashes to this shard
        assert all(shard_of(d, count) == cur for d in ids)
        all_ids |= ids
        assert m.counters["skipped"] > 0

    sfull = LocalSearcher(str(tmp_path / "full"))
    full_ids = set()
    for r in sfull.readers:
        full_ids.update(r.doc_id_strings(r.all_local_ords()))
    # union = all docs with non-negative Java remainder (mirrored quirk:
    # a negative remainder matches no shard)
    expect = {d for d in full_ids if shard_of(d, count) >= 0}
    assert all_ids == expect
    # skip accounting: a row with non-negative hash passes exactly one of
    # the `count` builds (skipped in count-1); a negative-hash row is
    # skipped in all of them. The shard filter runs BEFORE the empty-text
    # filter, so this holds over every input row.
    import pyarrow.parquet as pq

    t = pq.read_table(shard_corpus[0], columns=["conv_id", "turn_idx"])
    n_nonneg = sum(
        1
        for c, ti in zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist())
        if shard_of(f"{c}:{ti}", count) >= 0
    )
    skipped_sum = sum(m.counters["skipped"] for m in manifests)
    assert skipped_sum == 6000 * count - n_nonneg

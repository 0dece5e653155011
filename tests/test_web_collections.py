"""Trecweb / CleanTrec / ClueWeb09 / ClueWeb12 parsers vs the reference's
collection unit-test expectations (T/collection/*CollectionTest)."""

SAMPLES = "/root/reference/src/test/resources/sample_docs"


def test_trecweb_matches_reference():
    from anserini_ray.sources.web_collections import parse_trecweb_file

    with open(f"{SAMPLES}/trecweb/collection1/segment1.txt") as f:
        docs = parse_trecweb_file(f)
    # WEB-0002 is malformed (no <DOCNO> start) and must be skipped
    assert [d for d, _, _ in docs] == ["WEB-0001", "WEB-0003"]
    expected_raw = "<html>Wh at ever here will be parsed\n<br> asdf <div>\n</html>"
    for _, contents, raw in docs:
        assert raw == expected_raw
        assert contents == "Wh at ever here will be parsed asdf"


def test_clean_trec_matches_reference():
    from anserini_ray.sources.web_collections import parse_clean_trec_file

    with open(f"{SAMPLES}/clean_trec/collection1/segment1.txt") as f:
        docs = {d: (c, r) for d, c, r in parse_clean_trec_file(f)}
    assert docs["doc1"][1] == (
        "<TEXT>\nhere is a bit of text, and the <p>tags should not be "
        "removed.</p>\n</TEXT>"
    )
    assert docs["doc2"][1] == "<TEXT>\nhere is some text.\n</TEXT>"
    # CleanTrec: contents == raw (no tag stripping)
    for d, (c, r) in docs.items():
        assert c == r


def test_clueweb09_matches_reference():
    from anserini_ray.sources.web_collections import parse_clueweb_file

    docs = parse_clueweb_file(
        f"{SAMPLES}/cw09/collection1/segment1.warc.gz", version="WARC/0.18"
    )
    assert [d for d, _, _ in docs] == ["clueweb09-az0000-00-00000"]
    _, contents, raw = docs[0]
    assert raw == "\n<html>\nwhatever here will be included\n</html>"
    assert contents == "whatever here will be included"


def test_clueweb12_matches_reference():
    from anserini_ray.sources.web_collections import parse_clueweb_file

    docs = parse_clueweb_file(
        f"{SAMPLES}/cw12/collection1/segment1.warc.gz", version="WARC/1.0"
    )
    assert [d for d, _, _ in docs] == ["clueweb09-az0000-00-00000"]
    _, contents, raw = docs[0]
    # cw12 cuts at the first '<' after the HTTP headers (no leading newline)
    assert raw == "<html>\nwhatever here will be included\n</html>"
    assert contents == "whatever here will be included"


def test_trecweb_end_to_end(ray_session, tmp_path_factory):
    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.search import LocalSearcher
    from anserini_ray.sources.web_collections import read_trecweb_collection

    tmp = tmp_path_factory.mktemp("tw")
    ds = read_trecweb_collection(f"{SAMPLES}/trecweb/collection1")
    idx = str(tmp / "idx")
    m = build_index(ds, idx, IndexConfig(seg_shift=4), input_files=[])
    assert m.doc_count == 2
    s = LocalSearcher(idx)
    d, _ = s.search("asdf", k=5)
    assert set(d) == {"WEB-0001:0", "WEB-0003:0"}

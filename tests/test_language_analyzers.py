"""Language analyzer chains (reference -language flag,
IndexCollection.java:739-773). No Lucene goldens exist in the reference
repo; these token goldens are derived from the public algorithms (see
anserini_ray/analysis/lang.py fidelity notes)."""

import pytest

from anserini_ray.analysis import make_analyzer


def test_cjk_bigrams():
    a = make_analyzer({"language": "zh"})
    # 4-char han run -> 3 overlapping bigrams
    assert a.analyze("中华人民") == ["中华", "华人", "人民"]
    # isolated ideograph -> unigram; latin lowercased; stopword dropped
    assert a.analyze("the 中 Ray data") == ["中", "ray", "data"]
    # mixed han + latin keeps order
    assert a.analyze("我爱 Ray") == ["我爱", "ray"]
    toks, pos = a.analyze_with_positions("中华人民")
    assert toks == ["中华", "华人", "人民"] and pos == [0, 1, 2]


def test_german_chain():
    a = make_analyzer({"language": "de"})
    # light stem: -en/-er/-e plural/inflection endings
    assert a.analyze("Häuser") == ["haus"]          # umlaut fold + -er
    assert a.analyze("Bücher Buch") == ["buch", "buch"]
    assert a.analyze("laufen") == ["lauf"]
    # ß normalization
    assert a.analyze("Straße") == ["strass"]
    # stopwords
    assert a.analyze("der die das Hund") == ["hund"]


def test_spanish_chain():
    a = make_analyzer({"language": "es"})
    assert a.analyze("perros perro perra") == ["perr", "perr", "perr"]
    assert a.analyze("gato") == ["gato"]            # len<5: unstemmed (Lucene)
    assert a.analyze("luces") == ["luz"]            # ces -> z
    assert a.analyze("la casa de los perros") == ["casa", "perr"]
    assert a.analyze("canción") == ["cancion"]      # accent fold


def test_french_chain():
    a = make_analyzer({"language": "fr"})
    # elision strips the article
    assert a.analyze("l'avion") == ["avion"]
    assert a.analyze("d'accord qu'il") == ["acord"]  # il stopped; cc collapsed by norm()
    # plural x/s + aux -> al
    assert a.analyze("chevaux cheval") == ["cheval", "cheval"]
    assert a.analyze("les maisons la maison") == ["maison", "maison"]


def test_language_index_end_to_end(ray_session, tmp_path):
    import pyarrow as pa

    import ray.data
    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.search import LocalSearcher

    rows = pa.table(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
            "text": ["中华人民共和国 成立", "人民 的 力量", "完全不同的 内容"],
        }
    )
    idx = str(tmp_path / "zh_idx")
    build_index(
        ray.data.from_arrow(rows),
        idx,
        IndexConfig(seg_shift=4, analyzer={"language": "zh"}),
        input_files=[],
    )
    s = LocalSearcher(idx, analyzer_config={"language": "zh"})
    docids, scores = s.search("人民", k=10)
    assert set(docids) == {"c1:0", "c1:1"}  # bigram 人民 present in both
    docids2, _ = s.search("中华", k=10)
    assert docids2 == ["c1:0"]


def test_unsupported_language_raises():
    with pytest.raises(ValueError):
        make_analyzer({"language": "xx"})


def test_arabic_chain():
    a = make_analyzer({"language": "ar"})
    # definite-article strip + teh-marbuta suffix + hamza/alef fold
    assert a.analyze("الكتاب") == ["كتاب"]
    assert a.analyze("والمكتبة") == ["مكتب"]
    assert a.analyze("أحمد") == ["احمد"]
    # stopwords and harakat removal
    assert a.analyze("في البيت") == ["بيت"]
    assert a.analyze("كِتَاب") == ["كتاب"]  # diacritics stripped


def test_hindi_chain():
    a = make_analyzer({"language": "hi"})
    assert a.analyze("लड़के") == ["लडक"]      # nukta + matra suffix
    assert a.analyze("किताबें") == ["किताब"]  # plural strip
    assert a.analyze("घर में") == ["घर"]      # stopword dropped


def test_arabic_index_end_to_end(ray_session, tmp_path):
    import pyarrow as pa

    import ray.data
    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.search import LocalSearcher

    rows = pa.table(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": pa.array([0, 0], type=pa.int32()),
            "text": ["الكتاب في المكتبة", "البيت الكبير"],
        }
    )
    idx = str(tmp_path / "ar_idx")
    build_index(
        ray.data.from_arrow(rows),
        idx,
        IndexConfig(seg_shift=4, analyzer={"language": "ar"}),
        input_files=[],
    )
    s = LocalSearcher(idx, analyzer_config={"language": "ar"})
    docids, _ = s.search("كتاب", k=10)  # unprefixed query form matches
    assert docids == ["c1:0"]


def test_bengali_chain():
    a = make_analyzer({"language": "bn"})
    assert a.analyze("বইগুলো") == ["বই"]       # classifier plural
    assert a.analyze("ছেলেদের") == ["ছেলে"]    # genitive plural
    assert a.analyze("এই বই") == ["বই"]        # stopword dropped


def test_french_light_stemmer_full_rule_set():
    from anserini_ray.analysis.lang import french_light_stem as fr

    cases = {
        "chevaux": "cheval",        # -aux -> -al rewrite
        "peaux": "peau",            # plain plural x (eaux keeps eau)
        "établissement": "etabli",  # -issement -> -ir, then norm trims
        "finissant": "fini",        # -issant -> -ir
        "rapidement": "rapid",      # -ement
        "fabricatrice": "fabriqu",  # -catrice -> -quer
        "communicateur": "comuniqu",  # -cateur -> -quer (+ mm collapse)
        "administratrice": "administr",  # -atrice -> -er
        "chanteuse": "chant",       # -teuse -> -ter
        "sportive": "sportif",      # -ive -> -if
        "troisième": "trois",       # -ième
        "gentillesse": "gentil",    # -esse (+ ll collapse)
        "normalisation": "normal",  # -isation
        "opération": "opér",        # -ation (norm folds only at len>4)
    }
    for w, want in cases.items():
        assert fr(w) == want, (w, fr(w), want)


def test_german_normalization_digraph_machine():
    from anserini_ray.analysis.lang import german_normalize as gn

    assert gn("haeuser") == "hauser"   # ae -> a
    assert gn("schoen") == "schon"     # oe -> o
    assert gn("fuer") == "fur"         # ue after consonant -> u
    assert gn("quelle") == "quelle"    # ue after q KEEPS the e
    assert gn("frauen") == "frauen"    # ue after vowel KEEPS the e
    assert gn("grösse") == "grosse"    # umlaut fold (after stop filter)
    assert gn("weiß") == "weiss"       # ß -> ss

from .transcripts import (
    TRANSCRIPT_SCHEMA,
    TRANSCRIPTS_SQL,
    generate_transcripts,
    transcripts_from_documents,
    write_synthetic_corpus,
)

from .acl_anthology import read_acl_anthology
from .bibtex_collection import read_bibtex_collection
from .core_collection import read_core_collection
from .json_collection import read_json_collection
from .topics import (
    read_microblog_topics,
    read_trec_topics,
    read_tsv_string_topics,
    read_tsv_topics,
)
from .car_collection import parse_car_paragraphs, read_car_collection
from .covid_collections import covid_facets, parse_covid_metadata, read_covid_collection
from .html_collection import parse_html_archive, read_html_collection
from .transform import identity_transform, jsoup_string_transform
from .qrels import Qrels, parse_qrels_lines, read_qrels
from .trec_collection import read_trec_collection
from .web_collections import (
    read_clean_trec_collection,
    read_clueweb_collection,
    read_trecweb_collection,
)
from .tweet_collection import read_tweet_collection
from .nyt_collection import read_nyt_collection
from .wapo_collection import read_wapo_collection
from .wikipedia_collection import read_wikipedia_collection

__all__ = [
    "TRANSCRIPT_SCHEMA", "TRANSCRIPTS_SQL", "generate_transcripts",
    "transcripts_from_documents", "write_synthetic_corpus",
    "read_json_collection", "read_trec_collection", "read_bibtex_collection",
    "read_core_collection", "read_acl_anthology", "read_tweet_collection",
    "read_tsv_topics", "read_tsv_string_topics", "read_trec_topics",
    "read_microblog_topics",
    "Qrels", "parse_qrels_lines", "read_qrels",
    "read_html_collection", "parse_html_archive",
    "read_car_collection", "parse_car_paragraphs",
    "read_covid_collection", "parse_covid_metadata", "covid_facets",
    "read_trecweb_collection", "read_clean_trec_collection",
    "read_clueweb_collection", "read_wapo_collection", "read_nyt_collection",
    "read_wikipedia_collection",
]

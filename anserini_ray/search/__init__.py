from .bm25 import BM25Params, DEFAULT_B, DEFAULT_K1, idf
from .searcher import LocalSearcher, Searcher, SearcherStage, DEFAULT_K
from .similarities import CollectionStats, make_similarity
from .ties import adjust_score_ties, format_trec_run

__all__ = [
    "BM25Params", "DEFAULT_B", "DEFAULT_K1", "idf",
    "LocalSearcher", "Searcher", "SearcherStage", "DEFAULT_K",
    "adjust_score_ties", "format_trec_run",
    "CollectionStats", "make_similarity",
]

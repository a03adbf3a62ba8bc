from .indexer import OracleIndex
from .scorers import score_bm25, score_tfidf, score_bm25_adpt

__all__ = ["OracleIndex", "score_bm25", "score_tfidf", "score_bm25_adpt"]

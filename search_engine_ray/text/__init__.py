from .porter import PorterStemmer, stem_word
from .stopwords import STOPWORDS
from .tokenizer import (
    DELIM_REGEX,
    normalize_text_oracle,
    normalize_query_word,
    split_query_line,
)

__all__ = [
    "PorterStemmer",
    "stem_word",
    "STOPWORDS",
    "DELIM_REGEX",
    "normalize_text_oracle",
    "normalize_query_word",
    "split_query_line",
]

from .pages import generate_pages_table, write_pages_parquet, PAGES_SCHEMA
from .extract import extract_text_oracle, extract_text_batch, html_from_text
from .topics import parse_topics, write_trec_topics, generate_topics

__all__ = [
    "generate_pages_table",
    "write_pages_parquet",
    "PAGES_SCHEMA",
    "extract_text_oracle",
    "extract_text_batch",
    "html_from_text",
    "parse_topics",
    "write_trec_topics",
    "generate_topics",
]

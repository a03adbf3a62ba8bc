from .trec import parse_trec_bytes, read_trec, trec_to_parquet
from .warc import parse_warc_bytes, read_warc, warc_to_parquet, write_warc

__all__ = [
    "parse_trec_bytes",
    "read_trec",
    "trec_to_parquet",
    "parse_warc_bytes",
    "read_warc",
    "warc_to_parquet",
    "write_warc",
]

from .trec import parse_trec_bytes, read_trec, trec_to_parquet

__all__ = ["parse_trec_bytes", "read_trec", "trec_to_parquet"]

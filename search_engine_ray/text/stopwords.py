"""The reference's 36-word stopword list.

Transcribed from /root/reference/src/Indexing/Indexer.cs:18-24 (duplicated at
src/Query/TopicParser.cs:14-20).  The reference gates the membership check on
token length <= 4 UTF-16 chars and compares the first four '\0'-padded chars
as one int64 (Indexer.cs:180,201-213, a CPU trick) — since every stopword is
<= 4 chars, the semantic contract is plain exact-string membership, which is
what the reference's own stopword benchmark asserts across six
implementations (benchmarks/stopwords/Program.cs:262-275).
"""

STOPWORDS: frozenset[str] = frozenset(
    {
        "a", "an", "and", "also", "all", "are", "as", "at", "be", "been",
        "by", "but", "for", "from", "have", "has", "had", "he", "in", "is",
        "it", "its", "more", "new", "not", "of", "on", "page", "part",
        "that", "the", "this", "to", "s", "was", "were", "will", "with",
        "1", "2", "3",
    }
)

# NOTE: the C# array literally lists 41 entries (SURVEY.md calls it the
# "36-word list", which miscounts); the authoritative set is the literal above.
STOPWORDS_TUPLE = tuple(sorted(STOPWORDS))

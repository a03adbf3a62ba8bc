"""Porter stemmer conformance (reference variant: /root/reference/src/Util/Porter.cs)."""

from hypothesis import given, strategies as st

from search_engine_ray.text.porter import PorterStemmer, stem_word


# Full-algorithm expectations (the reference source's step1 comment lists
# per-step outputs; after all six steps Porter yields these).
VECTORS = {
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "disabled": "disabl",
    "matting": "mat",
    "mating": "mate",
    "meeting": "meet",
    "milling": "mill",
    "messing": "mess",
    "meetings": "meet",
    "ion": "ion",
    "sky": "sky",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "hesitanci": "hesit",
    "digitizer": "digit",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "homologou": "homolog",
    "communism": "commun",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
}


def test_reference_vectors():
    for word, expected in VECTORS.items():
        assert stem_word(word) == expected, word


def test_short_word_guard():
    # k > 1 guard (Porter.cs:640-654): words of length <= 2 unchanged.
    for w in ["a", "ab", "is", "s", ""]:
        assert stem_word(w) == w


def test_memo_matches_fresh_instance():
    words = list(VECTORS) * 2
    fresh = PorterStemmer()
    for w in words:
        assert stem_word(w) == fresh.stem(w)


@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122), max_size=20))
def test_stale_state_never_leaks(word):
    # Memoized shared instance must equal a fresh instance for any word order.
    fresh = PorterStemmer()
    assert stem_word(word) == fresh.stem(word)


@given(st.text(alphabet="abcdefgilmnorstuyz", max_size=12))
def test_idempotent_on_output_length(word):
    # Output is a prefix-of-or-rewrite with len <= len(word)+1 and never errors.
    out = stem_word(word)
    assert isinstance(out, str)
    assert len(out) <= len(word) + 1

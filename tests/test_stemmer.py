"""Snowball english parity fixtures (SURVEY.md §7 risk 2: pin outputs).

The reference stems with rust-stemmers Algorithm::English
(``/root/reference/src/language/stemmers.rs:9-47``); both implement the
published Snowball "english" (Porter2) definition, so these vectors pin
the behavior this repo relies on — including every golden-corpus word.
"""

import pandas as pd

from perlin_spark.stemmer import stem, stem_series

GOLDEN_VOCAB = {
    # every analyzed text/title token of the golden corpus (FIXTURES.md §3)
    "birds": "bird",
    "flew": "flew",
    "over": "over",
    "mt": "mt",
    "everest": "everest",
    "accross": "accross",
    "the": "the",
    "ocean": "ocean",
    "unicorns": "unicorn",
    "on": "on",
    "deimos": "deimo",
    "from": "from",
    "phobos": "phobo",
    "to": "to",
    "pizza": "pizza",
}

ALGORITHM_VECTORS = {
    # step exercises of the published algorithm
    "caresses": "caress",
    "ponies": "poni",
    "ties": "tie",
    "cries": "cri",
    "feed": "feed",
    "agreed": "agre",
    "running": "run",
    "hopping": "hop",
    "hoping": "hope",
    "falling": "fall",
    "dying": "die",      # exception list
    "lying": "lie",
    "news": "news",      # invariant exception
    "sky": "sky",
    "relational": "relat",
    "national": "nation",
    "conditional": "condit",
    "sensational": "sensat",
    "utilities": "util",
    "happily": "happili",
    "a": "a",
    "be": "be",
}


def test_golden_vocab():
    for w, expect in GOLDEN_VOCAB.items():
        assert stem(w) == expect, w


def test_algorithm_vectors():
    for w, expect in ALGORITHM_VECTORS.items():
        assert stem(w) == expect, (w, stem(w))


def test_stem_series_matches_scalar():
    words = pd.Series(list(GOLDEN_VOCAB) * 3)
    assert (stem_series(words) == words.map(stem)).all()

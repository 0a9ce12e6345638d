"""Query-string mini-language — the Lucene classic QueryParser shape.

Grammar (token-per-whitespace, quotes group):

* ``term``            scored term in the default field (pipeline-analyzed)
* ``term^2.5``        boosted term (per-term score multiplier)
* ``+term``           Must filter (restricts, also scores if it matches)
* ``-term``           MustNot filter
* ``field:term``      Must filter in an explicit field (``term`` is an
                      INDEX term — not re-analyzed, the ``Must`` contract)
* ``-field:term``     MustNot in an explicit field
* ``"a b c"``         phrase requirement (adjacency-verified); ``-"a b"``
                      excludes the phrase's matches
* ``wild*`` / ``w?d`` wildcard term (vocabulary expansion, its own
                      Any-subgroup)
* ``term~`` ``term~2`` fuzzy term (SymSpell expansion, its own Any-subgroup)

Everything maps onto existing operators — the parser produces a plain
:class:`ParsedQuery`; execution lives in
:meth:`perlin_spark.engine.PerlinEngine.query`.  No new scorer code.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["ParsedQuery", "parse_query"]

_TOKEN_RE = re.compile(r'[+-]?"[^"]*"|\S+')
_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)$")
_FUZZY_RE = re.compile(r"~(\d*)$")


@dataclass
class ParsedQuery:
    terms: list = field(default_factory=list)        # raw scored tokens
    boosts: dict = field(default_factory=dict)       # raw token -> weight
    phrases: list = field(default_factory=list)      # required phrases
    not_phrases: list = field(default_factory=list)  # excluded phrases
    musts: list = field(default_factory=list)        # (field|None, raw term)
    must_nots: list = field(default_factory=list)    # (field|None, raw term)
    fuzzy: list = field(default_factory=list)        # (raw term, max_edits)
    wildcards: list = field(default_factory=list)    # raw patterns


def parse_query(q: str) -> ParsedQuery:
    """Parse the mini-language into a :class:`ParsedQuery`.  Unknown
    syntax never raises — a token that fits no special form is a plain
    scored term (the forgiving-parser convention)."""
    out = ParsedQuery()
    for raw in _TOKEN_RE.findall(q):
        neg = must = False
        if raw[:1] == "-":
            neg, raw = True, raw[1:]
        elif raw[:1] == "+":
            must, raw = True, raw[1:]
        if not raw:
            continue
        if raw[:1] == '"':
            phrase = raw.strip('"')
            if not phrase:
                continue
            (out.not_phrases if neg else out.phrases).append(phrase)
            continue
        fieldname = None
        if ":" in raw[1:]:
            fieldname, raw = raw.split(":", 1)
            if not raw:
                continue
        if neg:
            out.must_nots.append((fieldname, raw))
            continue
        if fieldname is not None or must:
            out.musts.append((fieldname, raw))
            continue
        m = _BOOST_RE.search(raw)
        if m and len(raw) > len(m.group(0)):
            out.boosts[raw[: m.start()]] = float(m.group(1))
            out.terms.append(raw[: m.start()])
            continue
        m = _FUZZY_RE.search(raw)
        if m and len(raw) > len(m.group(0)):
            out.fuzzy.append((raw[: m.start()], int(m.group(1) or "1")))
            continue
        if "*" in raw or "?" in raw:
            out.wildcards.append(raw)
            continue
        out.terms.append(raw)
    return out

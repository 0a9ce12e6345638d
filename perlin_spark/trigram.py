"""Trigram-pruned substring and regex search (the code-search primitive).

The classic design — Google Code Search / Zoekt, published in R. Cox,
"Regular Expression Matching with a Trigram Index"
(swtch.com/~rsc/regexp/regexp4.html): index every character 3-gram of the
raw content, turn a query into the set of trigrams any match MUST
contain, intersect their posting lists for a candidate set, and make the
answer exact by running the real substring/regex test on candidates only.

Here the trigram index is not new machinery at all: it is a normal
indexed FIELD (``FieldSpec(tokenizer="trigram")``) — the same map-side
partials, term-hash shuffle, delta+varbyte blobs, bucket pruning, shards,
and vocabulary as every other field, so every storage/merge/resume
guarantee (and every existing test) applies verbatim.  The candidate
intersection is the stock conjunctive match set; queries select only the
``TRIGRAM_MAX`` RAREST trigrams by df (driver-cached vocab lookup) —
dropping trigrams can only widen candidacy, never change the verified
answer, so high-df grams like ``' th'`` cost nothing.

At 100 TB: trigram postings scale with total bytes like term postings
scale with total tokens, the candidacy job is the same single-stage
bucket-pruned scan as BM25, and verification reads exactly the candidate
rows of a two-column projection of the corpus.

This module holds the pure-driver helpers; the engine entry points are
:meth:`perlin_spark.engine.PerlinEngine.search_substring` /
:meth:`~perlin_spark.engine.PerlinEngine.search_regex`.
"""

from __future__ import annotations

__all__ = ["trigrams", "regex_literals"]


def trigrams(s: str) -> list[str]:
    """All overlapping character 3-grams of ``s`` (deduplicated, sorted)."""
    return sorted({s[i : i + 3] for i in range(len(s) - 2)})


#: escaped alnum chars are character classes / anchors / backrefs
#: (\d \w \s \b \A \z \1 ...) — they break a literal run
def regex_literals(pattern: str) -> list[str]:
    """Mandatory contiguous literal runs of a regex, conservatively.

    A pared-down form of Cox's RegexpQuery analysis: every returned run is
    guaranteed to appear VERBATIM in any string the pattern matches, so
    dropping information is always safe and never wrong:

    * characters inside groups ``(...)`` or classes ``[...]`` are skipped
      entirely (never claimed mandatory);
    * ``X*`` / ``X?`` / ``X{m,n}`` drop ``X`` from its run; ``X+`` keeps
      ``X`` but breaks contiguity after it;
    * ``.``, anchors, and class escapes break runs;
    * a top-level ``|`` or an inline-flag / conditional group ``(?i...)``
      makes NOTHING mandatory — returns ``[]`` (callers fall back to a
      full verify scan, gated by ``allow_scan``).

    The pattern must be valid in both dialects it will run under (Spark
    ``rlike`` = java.util.regex; the DuckDB oracle = RE2); this extractor
    only consumes the shared syntax.
    """
    runs: list[str] = []
    cur: list[str] = []
    i, n = 0, len(pattern)

    def flush() -> None:
        if cur:
            runs.append("".join(cur))
            cur.clear()

    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt.isalnum():
                flush()  # class/anchor/backref atom
            else:
                cur.append(nxt)  # escaped literal (\. \\ \+ ...)
            i += 2
        elif c in "^$":
            flush()
            i += 1
        elif c == ".":
            flush()
            i += 1
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] == "^":
                j += 1
            if j < n and pattern[j] == "]":  # leading ] is literal
                j += 1
            while j < n and pattern[j] != "]":
                if pattern[j] == "\\":
                    j += 1
                j += 1
            flush()
            i = j + 1
        elif c == "(":
            if pattern[i + 1 : i + 2] == "?" and pattern[i + 2 : i + 3] not in (
                ":", "=", "!", "<", "P",
            ):
                # inline flags ((?i) ...) change matching semantics for
                # the WHOLE pattern — no literal can be trusted
                return []
            depth, j = 1, i + 1
            while j < n and depth:
                cj = pattern[j]
                if cj == "\\":
                    j += 1
                elif cj == "(":
                    depth += 1
                elif cj == ")":
                    depth -= 1
                elif cj == "[":  # a class may contain parens
                    j += 1
                    while j < n and pattern[j] != "]":
                        if pattern[j] == "\\":
                            j += 1
                        j += 1
                j += 1
            flush()
            i = j
        elif c == "|":
            return []  # top-level alternation: nothing is mandatory
        elif c in "*?+{":
            if c == "{":
                while i < n and pattern[i] != "}":
                    i += 1
                i += 1
            else:
                i += 1
            if c == "+":
                flush()  # atom mandatory, contiguity after it broken
            else:
                if cur:
                    cur.pop()  # optional atom leaves its run
                flush()
            while i < n and pattern[i] in "?+":  # lazy/possessive suffix
                i += 1
        else:
            cur.append(c)
            i += 1
    flush()
    return [r for r in runs if r]

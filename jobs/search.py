"""spark-submit entry point: BM25 search against a persisted index.

Usage::

    cd /root/repo && zip -r /tmp/perlin_spark.zip perlin_spark
    spark-submit --py-files /tmp/perlin_spark.zip jobs/search.py \
        --index /path/to/index_root --query "hash join" --k 10 \
        [--mode bm25|phrase|near|prefix|fuzzy|wildcard|mlt|substring|regex|suggest|qstring] \
        [--field content] [--combinator all|any] \
        [--must field:term ...] [--must-not field:term ...] \
        [--window 3] [--ordered] [--after SCORE:DOC_ID] [--allow-scan] \
        [--snippets] [--output /path/to/results_parquet]

``--mode`` selects the query operator: ``phrase`` (adjacency-verified),
``near`` (span/proximity: terms within ``--window`` tokens, any order
unless ``--ordered``), ``prefix``/``fuzzy``/``wildcard`` (vocabulary
term expansion; fuzzy takes ``--max-edits``, wildcard takes a ``*``/``?``
glob as the query), ``mlt`` (more-like-this; ``--query`` is the seed
doc_id), ``substring``/``regex`` (trigram-pruned raw-content grep; the
index must carry a ``tokenizer='trigram'`` field), ``suggest``
(did-you-mean: per-token top-k corrections, tab-separated
``token_pos token term df dist``), ``qstring`` (the Lucene-classic
query-string mini-language: ``+must -not field:term term^2 "a phrase"
wild* fuzzy~``).  ``--after`` pages a
bm25 search from the previous page's last served row.  ``--snippets``
adds (pos, snippet) highlighting columns (bm25 mode only).

Prints the top-k (doc_id, score) to stdout; ``--output`` additionally
writes the full ranked result as parquet (for pipeline consumption).
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--field", default=None, help="text field (default: first spec)")
    p.add_argument("--combinator", choices=["all", "any"], default="all")
    p.add_argument("--mode",
                   choices=["bm25", "phrase", "near", "prefix", "fuzzy",
                            "wildcard", "mlt", "substring", "regex",
                            "suggest", "qstring"],
                   default="bm25")
    p.add_argument("--after", default=None, metavar="SCORE:DOC_ID",
                   help="bm25 mode: deep-pagination cursor — the previous "
                        "page's last served (score, doc_id)")
    p.add_argument("--allow-scan", action="store_true",
                   help="regex mode: permit the full-corpus verify scan "
                        "when no mandatory literal >= 3 chars exists")
    p.add_argument("--max-edits", type=int, default=1)
    p.add_argument("--similarity", choices=["bm25", "tfidf", "lmdir"],
                   default="bm25",
                   help="ranking similarity (runtime handle attribute)")
    p.add_argument("--window", type=int, default=3,
                   help="near mode: max token span covering all terms")
    p.add_argument("--ordered", action="store_true",
                   help="near mode: terms must appear in query order")
    p.add_argument("--snippets", action="store_true")
    p.add_argument("--min-match", type=int, default=None,
                   help="bm25 any-mode: require >= m distinct matching terms")
    p.add_argument("--boost", action="append", default=[], metavar="TERM:W",
                   help="bm25 mode: per-term score boost (repeatable)")
    p.add_argument("--sort-by", default=None, metavar="COL",
                   help="order matches by this stored docs column instead "
                        "of relevance (with --ascending for asc)")
    p.add_argument("--ascending", action="store_true")
    p.add_argument("--synonym", action="append", default=[],
                   metavar="TERM:ALT1,ALT2",
                   help="bm25 mode: query-time synonym (repeatable); terms "
                        "are matched post-analysis")
    p.add_argument("--must", action="append", default=[], metavar="FIELD:TERM")
    p.add_argument("--must-not", action="append", default=[], metavar="FIELD:TERM")
    p.add_argument("--output", default=None)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession

    from perlin_spark import Must, MustNot, PerlinEngine, QueryPipeline, load_index

    spark = SparkSession.builder.appName("perlin-spark-search").getOrCreate()
    idx = load_index(spark, args.index)
    spec = next(
        (s for s in idx.specs if args.field is None or s.field == args.field), None
    )
    if spec is None:
        raise SystemExit(f"field {args.field!r} not in index ({[s.field for s in idx.specs]})")
    idx.similarity = args.similarity
    eng = PerlinEngine(idx, QueryPipeline(text_spec=spec, text_combinator=args.combinator))

    filters = []
    for raw in args.must:
        f, t = raw.split(":", 1)
        filters.append(Must(f, t))
    for raw in args.must_not:
        f, t = raw.split(":", 1)
        filters.append(MustNot(f, t))

    if args.mode == "phrase":
        result = eng.search_phrase(args.query, k=args.k)
    elif args.mode == "near":
        result = eng.search_near(
            args.query, args.window, k=args.k, ordered=args.ordered
        )
    elif args.mode == "prefix":
        result = eng.search_prefix(args.query, k=args.k, field=spec.field)
    elif args.mode == "fuzzy":
        result = eng.search_fuzzy(
            args.query, k=args.k, field=spec.field, max_edits=args.max_edits
        )
    elif args.mode == "wildcard":
        result = eng.search_wildcard(args.query, k=args.k, field=spec.field)
    elif args.mode == "mlt":
        result = eng.more_like_this(int(args.query), k=args.k)
    elif args.mode == "substring":
        result = eng.search_substring(args.query, k=args.k)
    elif args.mode == "regex":
        result = eng.search_regex(args.query, k=args.k, allow_scan=args.allow_scan)
    elif args.mode == "suggest":
        result = eng.suggest(args.query, k=args.k, max_edits=args.max_edits)
    elif args.mode == "qstring":
        result = eng.query(args.query, k=args.k)
    elif args.snippets:
        result = eng.snippets(args.query, k=args.k, filters=filters)
    else:
        after = None
        if args.after:
            s, d = args.after.rsplit(":", 1)
            after = (float(s), int(d))
        synonyms = None
        if args.synonym:
            synonyms = {}
            for raw in args.synonym:
                t, alts = raw.split(":", 1)
                synonyms[t] = tuple(a for a in alts.split(",") if a)
        if args.sort_by:
            result = eng.search_sorted(
                args.query, by=args.sort_by, k=args.k,
                ascending=args.ascending, filters=filters,
            )
        else:
            boosts = None
            if args.boost:
                boosts = {}
                for raw in args.boost:
                    t, w = raw.rsplit(":", 1)
                    boosts[t] = float(w)
            result = eng.search(args.query, k=args.k, filters=filters,
                                after=after, synonyms=synonyms,
                                min_match=args.min_match, boosts=boosts)
    if args.output:
        result.write.mode("overwrite").parquet(args.output)
    for r in result.collect():
        if args.mode in ("substring", "regex"):
            print(r["doc_id"])
            continue
        if args.mode == "suggest":
            print(f"{r['token_pos']}\t{r['token']}\t{r['term']}\t{r['df']}\t{r['dist']}")
            continue
        if args.sort_by:
            print(f"{r['doc_id']}\t{r[args.sort_by]}")
            continue
        extra = f"\t{r['pos']}\t{r['snippet']}" if args.snippets and args.mode == "bm25" else ""
        print(f"{r['doc_id']}\t{r['score']:.6f}{extra}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Generate a deterministic ~sf1.0-scale probe documents table for local
A/B measurement (the driver's sf1.0 data is not on disk between rounds;
BENCH_r05.json records n_docs 70000 = 50k documents + 20k code rows).

Shape: the 5,000 sf0.1 documents verbatim (keeps their near-dup
families) + 45,000 docs derived by sampling a source doc and replacing
each token with probability 0.35 from the corpus unigram distribution —
preserves the doc-length distribution and vocabulary, and yields a
non-degenerate near-dup candidate load for the LSH ops.  Seeded, so
before/after runs measure the same bytes.

Usage: python scripts/make_probe_corpus.py [out_dir]   (default
/tmp/perlin_probe_sf1).  Writes documents.parquet, and copies/scales
nothing else — only the ops that read `documents` use it.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/perlin_probe_sf1"
N_TOTAL = int(os.environ.get("PROBE_DOCS", "50000"))
P_REPLACE = 0.35
SEED = 20260822

src = pq.read_table("/root/testdata/sf0.1/documents.parquet")
texts = src.column("text").to_pylist()
langs = src.column("lang").to_pylist()
sources = src.column("source").to_pylist()
tok_lists = [t.split() for t in texts]

# corpus unigram distribution
vocab: dict[str, int] = {}
counts: list[int] = []
for toks in tok_lists:
    for t in toks:
        i = vocab.setdefault(t, len(counts))
        if i == len(counts):
            counts.append(0)
        counts[i] += 1
words = np.array(list(vocab.keys()), dtype=object)
probs = np.array(counts, dtype=np.float64)
probs /= probs.sum()

rng = np.random.default_rng(SEED)
n_src = len(tok_lists)
out_texts = list(texts)
out_langs = list(langs)
out_sources = list(sources)
for j in range(N_TOTAL - n_src):
    si = int(rng.integers(0, n_src))
    toks = tok_lists[si]
    mask = rng.random(len(toks)) < P_REPLACE
    repl = rng.choice(words, size=int(mask.sum()), p=probs)
    new = list(toks)
    k = 0
    for pos in np.flatnonzero(mask):
        new[pos] = repl[k]
        k += 1
    out_texts.append(" ".join(new))
    out_langs.append(langs[si])
    out_sources.append(sources[si])

tbl = pa.table(
    {
        "doc_id": pa.array(range(N_TOTAL), type=pa.int64()),
        "text": pa.array(out_texts, type=pa.string()),
        "lang": pa.array(out_langs, type=pa.string()),
        "source": pa.array(out_sources, type=pa.string()),
        "n_chars": pa.array([len(t) for t in out_texts], type=pa.int64()),
    }
)
os.makedirs(OUT, exist_ok=True)
pq.write_table(tbl, os.path.join(OUT, "documents.parquet"))
# events/embeddings at this scale: reuse sf0.1's files so bench_extra's
# non-doc ops still resolve paths (they are not the probe's target)
for t in ("events", "embeddings", "lineitem", "orders", "customer",
          "supplier", "part", "nation", "region"):
    p = f"/root/testdata/sf0.1/{t}.parquet"
    q = os.path.join(OUT, f"{t}.parquet")
    if os.path.exists(p) and not os.path.exists(q):
        os.link(p, q)
print(f"wrote {N_TOTAL} docs to {OUT}")

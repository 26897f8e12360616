#!/usr/bin/env python3
"""Generate REALISTIC-statistics document corpora for the 100x
heavy-tail scale lap (round-13 verdict stretch directive #8).

Why not scale the driver's documents table directly: that table is a
word salad over a 31-WORD vocabulary (measured: 31 types across all
SFs, max df 3923 of 5000 docs at sf0.1). Its token-frequency
distribution is maximally dense — every token is a stopword — so ANY
prefix/banding scheme's candidate buckets grow ~quadratically with
corpus size BY CONSTRUCTION of the data, not of the plan. Real
corpora are Zipfian with a Heaps-law rare tail, which is exactly the
premise (rarest-token prefixes, df-capped bands) the dedup operators
are designed around. A 100x point measured on the 31-word corpus
would adjudicate the generator, not the engine (the first attempt did:
one prefix-token bucket became a single 44-CPU-minute spilling task).

So this generator synthesizes corpora with realistic statistics at
ANY size n, and the scale experiment compares n vs 100n built by the
SAME process:
  - vocabulary: V(n) = ceil(140 * n^0.5) types (Heaps K=140, beta=0.5
    -> ~10k types at n=5k, ~100k at n=500k), word w_i drawn with
    Zipf-Mandelbrot weight 1/(i+2.7)^1.07;
  - doc lengths: resampled from the driver corpus's length histogram;
  - lang/source columns: resampled from the driver corpus;
  - exact-duplicate rate ~0.16% (the driver corpus's measured rate);
  - deterministic (seed 42 + n), chunked parquet writes.

All non-documents tables are symlinked from sf0.1 so Tables
.registerAll keeps working.

Usage: python3 tools/gen_textscale.py <n_docs> <outdir>
"""
import bisect
import itertools
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
N = int(sys.argv[1])
OUT = sys.argv[2]
SEED = 42
CHUNK = 20000


def zipf_sampler(v, rng):
    """Cumulative-weight inverse sampler for 1/(i+2.7)^1.07."""
    weights = [1.0 / (i + 2.7) ** 1.07 for i in range(v)]
    cum = list(itertools.accumulate(weights))
    total = cum[-1]

    def draw():
        return bisect.bisect_left(cum, rng.random() * total)
    return draw


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(SEED + N)

    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        dst = f"{OUT}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    lengths = [len(t.split(" ")) for t in docs["text"].to_pylist()]
    langs = docs["lang"].to_pylist()
    sources = docs["source"].to_pylist()
    n_src = docs.num_rows

    v = int(140 * N ** 0.5) + 1
    draw = zipf_sampler(v, rng)
    vocab = [f"w{i}" for i in range(v)]

    writer = pq.ParquetWriter(f"{OUT}/documents.parquet", docs.schema)
    fresh = []
    new_id, new_text, new_lang, new_src = [], [], [], []

    def flush():
        nonlocal new_id, new_text, new_lang, new_src
        if not new_id:
            return
        writer.write_table(pa.table({
            "doc_id": pa.array(new_id, docs.schema.field("doc_id").type),
            "text": pa.array(new_text, docs.schema.field("text").type),
            "lang": pa.array(new_lang, docs.schema.field("lang").type),
            "source": pa.array(new_src, docs.schema.field("source").type),
            "n_chars": pa.array([len(t) for t in new_text],
                                docs.schema.field("n_chars").type),
        }, schema=docs.schema))
        new_id, new_text, new_lang, new_src = [], [], [], []

    for i in range(N):
        if fresh and rng.random() < 0.0016:
            text = rng.choice(fresh)
        else:
            text = " ".join(vocab[draw()]
                            for _ in range(rng.choice(lengths)))
            if len(fresh) < 50000:
                fresh.append(text)
        j = rng.randrange(n_src)
        new_id.append(i)
        new_text.append(text)
        new_lang.append(langs[j])
        new_src.append(sources[j])
        if len(new_id) >= CHUNK:
            flush()
            if (i + 1) % 100000 == 0:
                print(f"  documents: {i + 1}/{N}...")
    flush()
    writer.close()
    rows = pq.read_metadata(f"{OUT}/documents.parquet").num_rows
    assert rows == N, rows
    print(f"textscale corpus: {rows} docs, vocab {v} -> {OUT}")


if __name__ == "__main__":
    main()

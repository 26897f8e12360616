#!/usr/bin/env python3
"""Generate sf10 (100x sf0.1) DOCUMENTS for the heavy-tail scale lap
(round-13 verdict stretch directive #8): the 10 most expensive bench
queries are dominated by the dedup/corpus/dsir family over `documents`,
whose banded-candidate designs claim sub-quadratic growth — this gives
them a measured 100x point instead of the inferential 10x->100x step.

Methodology extends tools/gen_sf1.py's documents path (round-12
ADVICE-corrected): the original sf0.1 docs are kept and 99x fresh docs
are SAMPLED (seed 42) with the original's ~0.16% exact-duplicate
rate — replication would multiply dedup candidate pairs quadratically,
a data-semantics artifact rather than a plan property.

Unlike gen_sf1 (uniform draws from the FIXED original vocabulary),
words are drawn from the EMPIRICAL unigram distribution, and novel
word types are minted at the Heaps-law rate (p_new = 0.5 * V/T for
V ~ K*T^0.5, tracked continuously). A fixed uniform vocabulary at
100x inflates EVERY token's document frequency ~100x, which destroys
the prefix-filter premise of AllPairs/PPJoin ("rarest tokens are
rare") and blows the candidate join up quadratically — a property of
the broken synthetic corpus, not of real 100 TB text, whose df
distribution stays Zipfian with a growing rare tail (measured: the
uniform-vocab first cut pinned one prefix-token bucket into a single
44-CPU-minute spilling join+distinct task; PLANS.md round-14).

Every other table is symlinked from sf0.1 unchanged (the heavy-tail
queries read only documents; symlinks keep Tables.registerAll working
for the bench harness).

Docs are written in CHUNKS through pyarrow.ParquetWriter so the 100x
table never sits in Python memory at once.

Usage: python3 tools/gen_sf10.py [outdir=/tmp/graft_sf10]
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10"
REPLICAS = 100
SEED = 42
CHUNK = 20000


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(SEED)

    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        dst = f"{OUT}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
        print(f"  {name}: symlinked from sf0.1")

    docs = pq.read_table(f"{SRC}/documents.parquet")
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    sources = docs["source"].to_pylist()
    # empirical unigram bag: drawing from it preserves the corpus's
    # Zipfian token-frequency distribution (uniform vocab draws do not)
    bag = [w for t in texts for w in t.split(" ") if w]
    lengths = [len(t.split(" ")) for t in texts]
    n_orig = docs.num_rows
    target = n_orig * (REPLICAS - 1)
    # Heaps-law novelty: V ~ K*T^0.5 => dV/dT = 0.5*V/T, tracked
    # continuously from the original corpus's type/token counts
    types_seen = len(set(bag))
    tokens_emitted = len(bag)
    mint_seq = 0

    def draw_word():
        nonlocal types_seen, tokens_emitted, mint_seq
        tokens_emitted += 1
        if rng.random() < 0.5 * types_seen / tokens_emitted:
            types_seen += 1
            mint_seq += 1
            return f"zq{mint_seq}"
        return rng.choice(bag)

    writer = pq.ParquetWriter(f"{OUT}/documents.parquet", docs.schema)
    writer.write_table(docs)
    # bounded pool of re-usable fresh docs keeps the dup-rate sampling
    # O(1) memory-ish while preserving the ~0.16% exact-dup rate
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

    for i in range(target):
        if fresh and rng.random() < 0.0016:
            text = rng.choice(fresh)
        else:
            n = rng.choice(lengths)
            text = " ".join(draw_word() for _ in range(n))
            if len(fresh) < 50000:
                fresh.append(text)
        j = rng.randrange(n_orig)
        new_id.append(n_orig + i)
        new_text.append(text)
        new_lang.append(langs[j])
        new_src.append(sources[j])
        if len(new_id) >= CHUNK:
            flush()
            if (i + 1) % 100000 == 0:
                print(f"  documents: {n_orig + i + 1} rows...")
    flush()
    writer.close()
    out_rows = pq.read_metadata(f"{OUT}/documents.parquet").num_rows
    assert out_rows == n_orig * REPLICAS, out_rows
    print(f"  documents: {out_rows} rows")
    print(f"sf10 written to {OUT}")


if __name__ == "__main__":
    main()

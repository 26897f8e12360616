#!/usr/bin/env python3
"""Generate sf1 (10x sf0.1) test data for the scale-regression lap
(round-12 directive #3). /root/testdata is read-only and the driver
only ships sf{0.001,0.01,0.1}, so sf1 is synthesized FROM sf0.1:

- region/nation: fixed dims, copied as-is (TPC-H semantics).
- customer/supplier/part/orders/lineitem/events: replicated 10x with
  consistent key offsets (custkey/suppkey/partkey/orderkey/event_id/
  user_id shifted by replica * (max+1)), preserving referential
  integrity and growing key cardinalities linearly while value-domain
  group cardinalities stay constant — the same shape real TPC-H
  scaling has.
- documents: the original 5000 kept, 45000 FRESH docs sampled from the
  same vocabulary / length / lang / source distributions (seed 42),
  with the original's ~0.16% exact-duplicate rate — replication would
  have multiplied dedup candidate pairs quadratically, a data-semantics
  artifact rather than a plan property.
- embeddings: original 2000 kept + fresh unit-norm 64-dim vectors to
  8000 total (continuing the 4x step sf0.01 -> sf0.1).

All tables are written with pyarrow preserving the source parquet
physical schemas (events.ts stays TIMESTAMP(NANOS) — Tables.events
depends on it).

Usage: python3 tools/gen_sf1.py [outdir=/tmp/graft_sf1]
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
REPLICAS = 10
SEED = 42


def read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"  {name}: {table.num_rows} rows")


def offset_replicate(table, key_bases, replicas=REPLICAS):
    """Concat `replicas` copies, shifting each key col by k * base.

    `key_bases` maps column -> the key DOMAIN's base (max PK + 1 from
    the dimension that owns the domain) — one base per domain, shared
    by the PK and every FK referencing it. Shifting each column by its
    own max would silently misalign joins whenever an FK's max falls
    below the PK's max (e.g. standard TPC-H leaves 1/3 of customers
    order-less), so referential integrity is asserted here: every
    column's max must sit below its domain base."""
    for c, base in key_bases.items():
        mx = pc.max(table[c]).as_py()
        assert mx < base, f"{c}: max {mx} >= domain base {base}"
    parts = []
    for k in range(replicas):
        t = table
        for c, base in key_bases.items():
            shifted = pc.add(t[c], k * base)
            t = t.set_column(t.schema.get_field_index(c), t.field(c),
                             shifted.cast(t.field(c).type))
        parts.append(t)
    return pa.concat_tables(parts)


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(SEED)

    for name in ("region", "nation"):
        write(name, read(name))

    customer, supplier, part = read("customer"), read("supplier"), read("part")
    orders, lineitem, events = read("orders"), read("lineitem"), read("events")
    # one base per key DOMAIN, computed from the dimension that owns it
    # and reused for every FK column in that domain (round-12 ADVICE:
    # per-column maxima only align when FK max == PK max by luck)
    cust_base = pc.max(customer["c_custkey"]).as_py() + 1
    supp_base = pc.max(supplier["s_suppkey"]).as_py() + 1
    part_base = pc.max(part["p_partkey"]).as_py() + 1
    order_base = pc.max(orders["o_orderkey"]).as_py() + 1
    event_base = pc.max(events["event_id"]).as_py() + 1
    user_base = pc.max(events["user_id"]).as_py() + 1

    write("customer", offset_replicate(customer, {"c_custkey": cust_base}))
    write("supplier", offset_replicate(supplier, {"s_suppkey": supp_base}))
    write("part", offset_replicate(part, {"p_partkey": part_base}))
    write("orders", offset_replicate(
        orders, {"o_orderkey": order_base, "o_custkey": cust_base}))
    write("lineitem", offset_replicate(
        lineitem, {"l_orderkey": order_base, "l_partkey": part_base,
                   "l_suppkey": supp_base}))
    write("events", offset_replicate(
        events, {"event_id": event_base, "user_id": user_base}))

    # ---- documents: fresh sampled docs, not replicas -----------------
    docs = read("documents")
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    sources = docs["source"].to_pylist()
    vocab = sorted({w for t in texts for w in t.split(" ") if w})
    lengths = [len(t.split(" ")) for t in texts]
    n_orig = docs.num_rows
    new_id, new_text, new_lang, new_src = [], [], [], []
    fresh = []
    target = n_orig * (REPLICAS - 1)
    for i in range(target):
        if fresh and rng.random() < 0.0016:  # original exact-dup rate
            text = rng.choice(fresh)
        else:
            n = rng.choice(lengths)
            text = " ".join(rng.choice(vocab) for _ in range(n))
            fresh.append(text)
        j = rng.randrange(n_orig)
        new_id.append(n_orig + i)
        new_text.append(text)
        new_lang.append(langs[j])
        new_src.append(sources[j])
    extra = pa.table({
        "doc_id": pa.array(new_id, docs.schema.field("doc_id").type),
        "text": pa.array(new_text, docs.schema.field("text").type),
        "lang": pa.array(new_lang, docs.schema.field("lang").type),
        "source": pa.array(new_src, docs.schema.field("source").type),
        "n_chars": pa.array([len(t) for t in new_text],
                            docs.schema.field("n_chars").type),
    }, schema=docs.schema)
    write("documents", pa.concat_tables([docs, extra]))

    # ---- embeddings: fresh unit-norm vectors to 4x ------------------
    emb = read("embeddings")
    dim = len(emb["embedding"][0].as_py())
    n_emb = emb.num_rows
    target = n_emb * 3
    vecs, ids, labels = [], [], []
    for i in range(target):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = sum(x * x for x in v) ** 0.5 or 1.0
        vecs.append([x / norm for x in v])
        ids.append(n_emb + i)
        labels.append(rng.randrange(10))
    extra = pa.table({
        "vec_id": pa.array(ids, emb.schema.field("vec_id").type),
        "embedding": pa.array(vecs, emb.schema.field("embedding").type),
        "label": pa.array(labels, emb.schema.field("label").type),
    }, schema=emb.schema)
    write("embeddings", pa.concat_tables([emb, extra]))
    print(f"sf1 written to {OUT}")


if __name__ == "__main__":
    main()

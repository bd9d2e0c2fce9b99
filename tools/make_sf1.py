#!/usr/bin/env python3
"""Build a local sf1 soak dataset (10x sf0.1) by FK-consistent replication.

The driver ships sf{0.001,0.01,0.1} only; the 100 TB bar wants evidence
that the engine's scale-dependent constants (ndv band, decimal->double
hash routes, ANN training caps, dedup bucket caps) survive a 10x step.
This replicates sf0.1 ten times with key offsets that preserve every
foreign-key relationship, so the DuckDB oracle recomputes truth on the
same data and all catalog entries stay checkable:

  - dims region/nation are fixed-size (TPC-H semantics): copied once
  - customer/supplier/part/orders/lineitem/events replicate with key
    strides equal to each table's key cardinality; fact FKs move with
    their dimension copy (events.user_id rides the CUSTOMER stride)
  - documents replicate with doc_id offsets and IDENTICAL text: every
    doc gains 9 exact cross-copy duplicates, which is the realistic
    web-scale stress for the dedup family (dup rate grows with corpus)
  - embeddings perturb component 0 by +i*1e-3 per copy so cosine top-k
    stays tie-free for the recall-gated ANN entries

Schemas are preserved exactly via pyarrow (events.ts must stay
timestamp[ns] for the nanosAsLong load path).

--distinct mode (round-10): the copy-corpus above proves the
duplicate-COLLAPSE paths but holds the distinct-text pool fixed, so
signature aggregation / banding / verify stages never see distinct-volume
growth and sub-linear soak exponents partly reflect the construction
(VERDICT_r09 "What's missing" #2). With --distinct, documents and
embeddings are SYNTHESIZED with sf-proportional DISTINCT content instead
of replicated:
  - documents: seeded template+vocab sampling matching the shipped
    corpus's marginals (word frequencies, doc lengths, lang mix,
    src0-19 sources), vocabulary growing ~ Heaps' law (sqrt(nDocs)
    novel tokens at ~15% mass), and realistic duplicate FAMILIES whose
    CLUSTER COUNT grows with sf: ~38% of docs sit in clusters of 2-5
    (half exact copies, half near-dups with 1-2 mutated tokens), the
    rest singletons.
  - embeddings: seeded uniform unit vectors (the shipped corpus is
    measured structureless: within-label cosine ~= cross-label ~= 0)
    with 8% planted near-dup rows (1e-3-perturbed copies of an earlier
    vector) so the cosine-dedup entries keep non-trivial positives.
Relational tables still replicate FK-consistently — distinct growth is
the text/vector axis; TPC-H facts scale fine by replication.

Usage: python3 tools/make_sf1.py [src_dir dst_dir copies] [--distinct]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SRC = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.1"
DST = _pos[1] if len(_pos) > 1 else "/tmp/sf1"
COPIES = int(_pos[2]) if len(_pos) > 2 else 10

# key-column strides per table = source key cardinality
STRIDES = {
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 15000},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}
FIXED = ["region", "nation"]

# pyarrow's default row group is 1Mi rows, so a synthesized 500k-row table
# lands in ONE row group — parquet splits only at row-group boundaries, so
# every scan serializes onto one core no matter how many byte-range splits
# Spark plans (the r10 sf10d soak spent most of its wall-clock in
# single-task scan tails). Real corpora are many files / many row groups;
# ~50k rows per group gives the planner honest split parallelism.
ROW_GROUP = 50000


def replicate(name: str) -> None:
    src = pq.read_table(f"{SRC}/{name}.parquet")
    schema = pa.schema([src.schema.field(i) for i in range(len(src.schema))])
    strides = STRIDES[name]
    parts = []
    for i in range(COPIES):
        cols = []
        for field in schema:
            col = src.column(field.name)
            if field.name in strides and i > 0:
                col = pc.add(col, pa.scalar(i * strides[field.name], type=field.type))
            elif name == "embeddings" and field.name == "embedding" and i > 0:
                flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).copy()
                offsets = col.combine_chunks().offsets
                starts = offsets.to_numpy(zero_copy_only=False)[:-1]
                flat[starts] += i * 1e-3  # nudge component 0 per copy
                col = pa.ListArray.from_arrays(offsets, pa.array(flat, type=pa.float32()))
            cols.append(col)
        parts.append(pa.table(cols, schema=schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{name}.parquet", row_group_size=ROW_GROUP)
    print(f"{name}: {src.num_rows} -> {out.num_rows}")


def synth_documents() -> None:
    """sf-proportional DISTINCT documents: seeded sampling that matches the
    shipped corpus's marginals, plus duplicate families whose count grows
    with the corpus (cluster structure documented in the module header)."""
    src = pq.read_table(f"{SRC}/documents.parquet")
    texts = src.column("text").to_pylist()
    langs = src.column("lang").to_pylist()
    rng = np.random.default_rng(20260814)
    # empirical marginals from the source corpus
    from collections import Counter
    wfreq = Counter(w for t in texts for w in t.split())
    base_vocab = list(wfreq)
    base_p = np.array([wfreq[w] for w in base_vocab], dtype=float)
    base_p /= base_p.sum()
    lens = np.array([len(t.split()) for t in texts])
    lfreq = Counter(langs)
    lang_vals = list(lfreq)
    lang_p = np.array([lfreq[l] for l in lang_vals], dtype=float)
    lang_p /= lang_p.sum()

    n_docs = src.num_rows * COPIES
    # Heaps-law vocabulary growth: novel tokens carry ~15% of word mass,
    # so token-frequency entries (vocab top-k) see real distinct growth
    n_novel = max(16, int(2 * np.sqrt(n_docs)))
    novel_vocab = [f"tok{i:05d}" for i in range(n_novel)]
    novel_p = rng.dirichlet(np.full(n_novel, 0.4))

    def draw_words(n):
        core = rng.choice(len(base_vocab), size=n, p=base_p)
        nov = rng.choice(n_novel, size=n, p=novel_p)
        use_nov = rng.random(n) < 0.15
        return [novel_vocab[nov[i]] if use_nov[i] else base_vocab[core[i]]
                for i in range(n)]

    docs = []  # (text, lang)
    while len(docs) < n_docs:
        length = int(rng.choice(lens))
        root = draw_words(length)
        lang = lang_vals[rng.choice(len(lang_vals), p=lang_p)]
        r = rng.random()
        if r < 0.62:
            members = [root]
        else:
            size = int(rng.choice([2, 3, 4, 5], p=[0.5, 0.3, 0.12, 0.08]))
            members = [root]
            for _ in range(size - 1):
                if rng.random() < 0.5:
                    members.append(list(root))  # exact duplicate
                else:  # near-dup: mutate 1-2 token positions
                    m = list(root)
                    for pos in rng.choice(length, size=min(length, int(rng.integers(1, 3))),
                                          replace=False):
                        m[pos] = draw_words(1)[0]
                    members.append(m)
        docs.extend((" ".join(m), lang) for m in members)
    docs = docs[:n_docs]
    order = rng.permutation(n_docs)
    out_text = [docs[i][0] for i in order]
    out_lang = [docs[i][1] for i in order]
    out = pa.table({
        "doc_id": pa.array(range(n_docs), type=pa.int64()),
        "text": pa.array(out_text, type=pa.string()),
        "lang": pa.array(out_lang, type=pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)], type=pa.string()),
        "n_chars": pa.array([len(t) for t in out_text], type=pa.int64()),
    })
    pq.write_table(out, f"{DST}/documents.parquet", row_group_size=ROW_GROUP)
    n_distinct = len(set(out_text))
    print(f"documents: synthesized {n_docs} ({n_distinct} distinct texts)")


def synth_embeddings() -> None:
    """sf-proportional DISTINCT unit vectors (shipped geometry: no cluster
    structure) + 8% planted near-dup rows for the cosine-dedup entries."""
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    dim = len(src.column("embedding")[0])
    n = src.num_rows * COPIES
    rng = np.random.default_rng(48620)
    v = rng.standard_normal((n, dim)).astype(np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # plant near-dups: each of the last 8% copies a random earlier vector
    # with a 1e-3 component-0 nudge (distinct row, cosine ~ 1 - 5e-7)
    n_dup = n // 12
    targets = rng.integers(0, n - n_dup, size=n_dup)
    v[n - n_dup:] = v[targets]
    v[n - n_dup:, 0] += 1e-3
    v[n - n_dup:] /= np.linalg.norm(v[n - n_dup:], axis=1, keepdims=True)
    order = rng.permutation(n)
    v = v[order].astype(np.float32)
    flat = pa.array(v.ravel(), type=pa.float32())
    offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    out = pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.ListArray.from_arrays(offsets, flat),
        "label": pa.array(rng.integers(0, 10, size=n), type=pa.int32()),
    })
    pq.write_table(out, f"{DST}/embeddings.parquet", row_group_size=ROW_GROUP)
    print(f"embeddings: synthesized {n} distinct ({n_dup} near-dup planted)")


def main() -> None:
    import os

    distinct = "--distinct" in sys.argv
    os.makedirs(DST, exist_ok=True)
    for name in FIXED:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{DST}/{name}.parquet")
        print(f"{name}: {t.num_rows} (fixed dim, copied once)")
    for name in STRIDES:
        if distinct and name == "documents":
            synth_documents()
        elif distinct and name == "embeddings":
            synth_embeddings()
        else:
            replicate(name)


if __name__ == "__main__":
    main()

"""Deterministic synthetic corpus generator for scale-growth testing.

The heavy pipeline operators (MinHash-LSH, exact Jaccard, winnowing,
IVF ANN, label propagation, packing) are measured at one scale by the
driver bench; nothing there pins their GROWTH RATE — a candidate-pair
explosion under skewed buckets or a convergence stall would be invisible
until production. This module builds corpora whose TRUE answer scales
linearly by construction, so any super-linear growth in an operator's
candidate counts or wall time on them is engine pathology, not data
pathology (the measurement posture of the reference's
mem-test/tests/dhat_large_table_log.rs: bound the shape, not the
constant).

Construction: documents/embeddings come in GROUPS of 1-3 near-duplicates
drawn from a group-private vocabulary (tokens ``g{gid}w{j}``), so

* true near-dup pairs = within-group pairs  -> linear in n,
* every n-gram/fingerprint posting list is group-local -> max df is a
  constant (group size), never corpus-sized,
* cross-group candidate pairs are impossible at the data level — any
  observed cross-group candidate is a bucketing bug.

Schemas match /root/testdata's ``documents`` / ``embeddings`` tables, so
every operator runs unmodified. Generated on demand (never checked in);
fully determined by (n, seed).
"""

from __future__ import annotations

import random

#: group size distribution: weights for 1 / 2 / 3 near-duplicate members
_GROUP_WEIGHTS = (6, 3, 2)
_LANGS = ("en", "de", "fr")
_SOURCES = ("web", "book", "code")
EMBEDDING_DIMS = 64


def _group_sizes(n: int, rng: random.Random) -> list[int]:
    sizes: list[int] = []
    total = 0
    while total < n:
        s = rng.choices((1, 2, 3), weights=_GROUP_WEIGHTS)[0]
        s = min(s, n - total)
        sizes.append(s)
        total += s
    return sizes


def synth_documents(n: int, seed: int = 11) -> dict[str, list]:
    """Column dict for a documents table of exactly ``n`` rows.

    Group members share a 45-70 token base text; each non-base member
    replaces exactly ONE interior token (3-shingle Jaccard vs the base
    ~ (L-5)/(L+1) >= 0.85 at L >= 45, comfortably over the 0.8 pair
    threshold), so within-group pairs are near-dups under every text
    operator (MinHash, exact Jaccard, SimHash, winnowing) at once.
    """
    rng = random.Random(seed)
    doc_id: list[int] = []
    text: list[str] = []
    lang: list[str] = []
    source: list[str] = []
    next_id = 0
    for gid, size in enumerate(_group_sizes(n, rng)):
        length = rng.randrange(45, 71)
        vocab = [f"g{gid}w{j}" for j in range(30)]
        base = [rng.choice(vocab) for _ in range(length)]
        g_lang = rng.choice(_LANGS)
        g_source = rng.choice(_SOURCES)
        for m in range(size):
            words = list(base)
            if m > 0:  # mutate one interior token per extra member
                pos = rng.randrange(2, length - 2)
                words[pos] = f"g{gid}x{m}"
            doc_id.append(next_id)
            text.append(" ".join(words))
            lang.append(g_lang)
            source.append(g_source)
            next_id += 1
    return {
        "doc_id": doc_id,
        "text": text,
        "lang": lang,
        "source": source,
        "n_chars": [len(t) for t in text],
    }


def synth_embeddings(n: int, seed: int = 11, dims: int = EMBEDDING_DIMS) -> dict[str, list]:
    """Column dict for an embeddings table of exactly ``n`` rows.

    Group members share a base vector plus per-member noise small enough
    to keep within-group cosine >= 0.99 — the near-dup signal every ANN
    arm must find, still linear in n.
    """
    rng = random.Random(seed * 31 + 7)
    vec_id: list[int] = []
    embedding: list[list[float]] = []
    label: list[int] = []
    next_id = 0
    for gid, size in enumerate(_group_sizes(n, rng)):
        base = [rng.uniform(-1.0, 1.0) for _ in range(dims)]
        for m in range(size):
            noise = 0.0 if m == 0 else 0.01
            vec = [x + rng.uniform(-noise, noise) for x in base]
            vec_id.append(next_id)
            embedding.append([float(x) for x in vec])
            label.append(gid % 10)
            next_id += 1
    return {"vec_id": vec_id, "embedding": embedding, "label": label}


def write_scale_fixture(
    out_dir: str, n_docs: int, n_vecs: int, seed: int = 11
) -> None:
    """Write ``documents.parquet`` + ``embeddings.parquet`` under
    ``out_dir`` with the exact testdata schemas (int64 ids, list<float>
    embeddings, int32 labels)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    d = synth_documents(n_docs, seed=seed)
    docs = pa.table(
        {
            "doc_id": pa.array(d["doc_id"], pa.int64()),
            "text": pa.array(d["text"], pa.string()),
            "lang": pa.array(d["lang"], pa.string()),
            "source": pa.array(d["source"], pa.string()),
            "n_chars": pa.array(d["n_chars"], pa.int64()),
        }
    )
    pq.write_table(docs, f"{out_dir}/documents.parquet")
    e = synth_embeddings(n_vecs, seed=seed)
    emb = pa.table(
        {
            "vec_id": pa.array(e["vec_id"], pa.int64()),
            "embedding": pa.array(e["embedding"], pa.list_(pa.float32())),
            "label": pa.array(e["label"], pa.int32()),
        }
    )
    pq.write_table(emb, f"{out_dir}/embeddings.parquet")

"""Beyond-parity pipeline operators for large-scale training-data prep.

These are the LLM-data-pipeline operators the reference's users run *around*
the table format: deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard), embedding similarity search (brute-force and bucketed ANN),
text analysis (language ID, quality scoring, token stats, fingerprinting),
and multimodal binary-column plumbing.

Everything is expressed as DataFrame transformations over built-in
``pyspark.sql.functions`` (JVM-side, whole-stage codegen) except the
multimodal feature extraction, which is an Arrow-batched ``mapInPandas``
(the realistic shape for image/audio decode). No row-at-a-time Python UDFs.

Scale posture (100 TB): candidate generation is always bucketed —
MinHash banding for documents, inverted-index joins for exact Jaccard,
centroid/block bucketing for embeddings. Nothing does an unbucketed
all-pairs crossJoin.
"""

from delta_kernel_rs_spark.operators.cluster import (
    connected_components,
    neardup_clusters,
)
from delta_kernel_rs_spark.operators.dedup import (
    decontaminate_against,
    duplicated_token_spans,
    exact_duplicate_groups,
    jaccard_pairs_exact,
    minhash_band_signatures,
    neardup_pairs_minhash,
    simhash,
    simhash64,
    simhash_neardup_pairs,
    with_word_shingles,
)
from delta_kernel_rs_spark.operators.packing import pack_documents
from delta_kernel_rs_spark.operators.multimodal import (
    binary_meta,
    decode_image,
    with_binary_payload,
)
from delta_kernel_rs_spark.operators.sampling import (
    cap_per_group,
    deterministic_sample,
)
from delta_kernel_rs_spark.operators.similarity import (
    cosine_expr,
    cosine_topk,
    embedding_neardup_blocked,
    ivf_topk,
    kmeans_clusters,
    ivf_topk_quantized,
    quantize_int8,
    random_hyperplane_buckets,
    semantic_dedup,
)
from delta_kernel_rs_spark.operators.sketch import kmv_distinct_estimate
from delta_kernel_rs_spark.operators.text import (
    chunk_documents,
    fingerprint_expr,
    lang_scores,
    pii_columns,
    quality_columns,
    repetition_signals,
    tfidf_top_terms,
    token_stat_columns,
    unigram_surprisal,
)

__all__ = [
    "binary_meta",
    "cap_per_group",
    "chunk_documents",
    "connected_components",
    "decontaminate_against",
    "deterministic_sample",
    "duplicated_token_spans",
    "ivf_topk_quantized",
    "kmeans_clusters",
    "kmv_distinct_estimate",
    "neardup_clusters",
    "pack_documents",
    "pii_columns",
    "quantize_int8",
    "repetition_signals",
    "simhash64",
    "simhash_neardup_pairs",
    "tfidf_top_terms",
    "cosine_expr",
    "cosine_topk",
    "decode_image",
    "embedding_neardup_blocked",
    "exact_duplicate_groups",
    "fingerprint_expr",
    "ivf_topk",
    "jaccard_pairs_exact",
    "lang_scores",
    "minhash_band_signatures",
    "neardup_pairs_minhash",
    "quality_columns",
    "random_hyperplane_buckets",
    "semantic_dedup",
    "simhash",
    "unigram_surprisal",
    "with_binary_payload",
    "with_word_shingles",
]

from etl_rs_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    lww_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)

__all__ = [
    "lww_dedup",
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "simhash",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
]

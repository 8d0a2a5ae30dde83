from geofeaturegeneration_spark.operators.sessionize import (
    sessionize_state_change,
    sessionize_state_change_salted,
    sessionize_gap,
    stay_move,
)
from geofeaturegeneration_spark.operators.asof import asof_join
from geofeaturegeneration_spark.operators.windows import lag_lead_features, rolling_features
from geofeaturegeneration_spark.operators.pivot import pivot_counts, interaction_matrix
from geofeaturegeneration_spark.operators.vocab import build_vocab, encode_with_vocab
from geofeaturegeneration_spark.operators.sequence import (
    ordered_tokens,
    pad_to_multiple,
    chunk_sequences,
    reassemble_chunks,
)
from geofeaturegeneration_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_band_signatures,
    minhash_band_signatures_rowwise,
    with_band_sigs,
    lsh_pairs_from_band_sigs,
    connected_components,
    dedup_clusters,
    minhash_lsh_pairs,
    minhash_lsh_pairs_cross,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from geofeaturegeneration_spark.operators.similarity import (
    cosine_topk,
    ann_lsh_topk,
    ann_lsh_multi_topk,
    ann_ivf_topk,
    embedding_neardup_pairs,
    embedding_neardup_multi_pairs,
    farthest_point_centroids,
    train_ivf_centroids,
    hyperplane_tables,
    lsh_bucket,
)
from geofeaturegeneration_spark.operators.curation import (
    decontaminate,
    source_quota,
    source_sample,
    rare_token_stats,
)
from geofeaturegeneration_spark.operators.multimodal import (
    attach_payload,
    extract_meta,
    sample_frames,
    embed_payload,
)
from geofeaturegeneration_spark.operators.matrix import series_to_matrix
from geofeaturegeneration_spark.operators.split import hash_split, negative_samples

__all__ = [
    "sessionize_state_change",
    "sessionize_state_change_salted",
    "sessionize_gap",
    "stay_move",
    "asof_join",
    "lag_lead_features",
    "rolling_features",
    "pivot_counts",
    "interaction_matrix",
    "build_vocab",
    "encode_with_vocab",
    "ordered_tokens",
    "pad_to_multiple",
    "chunk_sequences",
    "reassemble_chunks",
    "exact_dedup",
    "minhash_signatures",
    "minhash_band_signatures",
    "minhash_band_signatures_rowwise",
    "with_band_sigs",
    "lsh_pairs_from_band_sigs",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_cross",
    "connected_components",
    "dedup_clusters",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_pairs",
    "cosine_topk",
    "ann_lsh_topk",
    "ann_lsh_multi_topk",
    "ann_ivf_topk",
    "embedding_neardup_pairs",
    "embedding_neardup_multi_pairs",
    "farthest_point_centroids",
    "train_ivf_centroids",
    "hyperplane_tables",
    "lsh_bucket",
    "decontaminate",
    "source_quota",
    "source_sample",
    "rare_token_stats",
    "attach_payload",
    "extract_meta",
    "sample_frames",
    "embed_payload",
    "series_to_matrix",
    "hash_split",
    "negative_samples",
]

from .analytics import (
    dq_order_paid_more_than_price,
    paid_with_amex_rating_gt_50,
    top_restaurants_last_30_days,
)
from .asof import asof_join
from .components import assign_components, connected_components
from .clustering import (
    kmeans_assign,
    kmeans_fit,
    quantize_embedding,
    semantic_cluster_stats,
    semantic_near_dups,
)
from .interval import interval_join
from .dedup import (
    char_ngrams,
    cosine,
    minhash_bucket_stats,
    embedding_bucket_stats,
    embedding_near_dups,
    embedding_near_dups_brute,
    simhash_bucket_stats,
    exact_dedup,
    exact_dedup_apply,
    dedup_ingest,
    jaccard_against_corpus,
    minhash_lsh_candidates,
    blocked_jaccard_near_dups,
    minhash_near_dups,
    minhash_signature,
    ngram_jaccard,
    simhash64,
    simhash_candidates,
    word_shingles,
)
from .ingest import ingest_raw_to_flat, land_raw, overwrite_from_files
from .multimodal import (
    extract_image_features,
    parse_image_dims,
    sample_video_frames,
    synthesize_media,
)
from .retrieval import bm25_topk, doc_term_freqs, rrf_fuse, tfidf_top_terms
from .similarity import (
    assign_ivf_cells,
    build_ivf_index,
    cosine_topk_brute,
    cosine_topk_ivf,
    cosine_topk_ivf_indexed,
    cosine_topk_kmeans_ivf,
    topk_per_key,
)

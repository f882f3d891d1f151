from .ann import (
    brute_force_topk, compact_ivfpq_index, cosine_near_dups,
    hyperplane_signatures, ivf_assign,
    ivf_cell_stats, ivf_topk, ivf_topk_from_index, ivfpq_encode,
    ivfpq_topk_from_index, ivfpq_topk_joined,
    lsh_candidate_pairs,
    lsh_topk, read_ivf_index, read_ivfpq_index, train_ivf_centroids,
    train_ivf_centroids_distributed, train_pq_codebooks, write_ivf_index,
    write_ivfpq_index,
)
from .code import (
    code_quality_features, fork_candidates, prepare_code_corpus,
    redact_secrets, repo_minhash_signatures, scan_licenses,
)
from .decontam import contamination_flags
from .graph import connected_components
from .dedup import (
    dup_span_stats, exact_dedup, distinct_by_content, jaccard_verify,
    paragraph_dedup,
    keep_best_per_cluster,
    lsh_bucket_stats, minhash_dedup, minhash_lsh_candidates,
    minhash_signatures, ngram_jaccard_pairs, remove_dup_spans,
    semantic_dedup, simhash,
    simhash128, simhash_candidates,
)
from .multimodal import (
    decode_avi, decode_bmp, decode_wav, encode_avi, encode_bmp, encode_wav,
    extract_features, frame_sample, make_fake_media,
)
from .text import (
    repetition_stats,
    bpe_token_count, c4_quality, char_count, doc_fingerprint,
    gopher_quality, lang_id, punct_count, quality_features, redact_pii,
    shingles, stopword_count, token_count, tokens, with_text_analysis,
)

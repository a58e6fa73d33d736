"""ballet_ray.corpus — the training-data-pipeline surface in one namespace.

The operators a 100 TB pretraining-corpus pipeline composes, all Ray-Data
streaming stages over the canonical table
``(doc_id, tokens: list<int32>, n_tok, source)`` (plus text/embedding
side tables). Import from here when building corpus jobs:

    from ballet_ray import corpus
    ds = corpus.chunk_sequences(ds, max_len=2048, stride=1536)
    ds = corpus.pack_sequences(ds, max_len=4096)

Grouped by stage of a typical pipeline:

- ingest/split:   HashSplit, stratified_sample, hash_rate_filter
- quality:        QualityScore, WordRepetition, NgramRepetition,
                  GopherSignals, LangId, unigram_logprob_scores,
                  tfidf_top_terms, RegexTokenCount, TokenStats,
                  DistributedLogReg (model-based filter)
- filter presets: c4_clean (Raffel 2020), gopher_quality_filter
                  (Rae 2021 Table A1), fineweb_quality_filter
                  (Penedo 2024) — the published rule sets, layerable
                  in that order exactly as FineWeb layers them
- scrub:          RegexRedactor (PII_PATTERNS), HtmlToText (HTML_ENTITIES),
                  TextNormalizer (NFC + case + whitespace)
- dedup:          exact_dedup, minhash_lsh_pairs, token_minhash_lsh_pairs,
                  simhash_pairs, ngram_jaccard_pairs, dedup_by_minhash,
                  assign_clusters, embedding_near_dup_pairs, semantic_dedup
- similarity:     knn_brute, lsh_knn, ivf_fit_centroids, ivf_knn
- embeddings:     pca_fit_embeddings, pca_transform_embeddings,
                  correlation_matrix
- shape:          chunk_sequences, pack_sequences, hash_tokenize
- sketch/count:   approx_distinct, approx_distinct_per_group,
                  approx_quantiles, grouped_rank
"""

from ballet_ray.stages.classifier import (
    DistributedLogReg,
    calibrate_threshold,
    fit_text_logreg,
    quality_filter_by_model,
    score_text_logreg,
)
from ballet_ray.stages.core import HashSplit, TokenCount, TokenStats
from ballet_ray.stages.decomposition import (
    PCA,
    correlation_matrix,
    pca_fit_embeddings,
    pca_transform_embeddings,
)
from ballet_ray.stages.dedup import (
    assign_clusters,
    cluster_losers,
    dedup_by_minhash,
    dedup_by_token_minhash,
    duplicate_passages,
    duplication_scores,
    exact_dedup,
    find_contaminated,
    find_contaminated_tokens,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    remove_duplicate_lines,
    remove_duplicate_spans,
    simhash_pairs,
    token_duplicate_passages,
    token_minhash_lsh_pairs,
)
from ballet_ray.stages.bpe import BpeEncoder, BpeTokenizer, apply_bpe, train_bpe
from ballet_ray.stages.bytebpe import (ByteBpeTokenizer, apply_byte_bpe,
                                       train_byte_bpe)
from ballet_ray.stages.unigram import (UnigramEncoder, UnigramTokenizer,
                                       apply_unigram, train_unigram)
from ballet_ray.stages.wordpiece import (WordPieceTokenizer, apply_wordpiece,
                                         train_wordpiece)
from ballet_ray.stages.decomposition import grouped_pca_fit, grouped_pca_transform
from ballet_ray.stages.dsir import dsir_log_weights, dsir_resample
from ballet_ray.stages.report import corpus_report, tokenizer_report
from ballet_ray.stages.sampling import (
    budget_sample,
    cap_per_group,
    filter_groups,
    temperature_rates,
    temperature_sample,
    unimax_rates,
    unimax_sample,
    weighted_sample,
    global_shuffle_index,
    hash_rate_filter,
    stratified_sample,
)
from ballet_ray.stages.sequences import (chunk_sequences, fim_transform,
                                          pack_sequences, span_corruption,
                                          apply_vocab_prune, fit_vocab_prune,
                                          prefix_lm_split)
from ballet_ray.stages.similarity import (
    assign_topic_clusters,
    cluster_embeddings,
    diversity_sample,
    embedding_near_dup_pairs,
    ivf_fit_centroids,
    ivf_knn,
    ivf_pq_knn,
    knn_brute,
    lsh_knn,
    pq_encode,
    pq_fit,
    pq_knn,
    semantic_decontaminate,
    semantic_dedup,
)
from ballet_ray.stages.streaming_dedup import (
    make_bloom_index,
    streaming_exact_dedup,
    streaming_embedding_dedup,
    streaming_minhash_dedup,
)
from ballet_ray.stages.dedup import hamming_pairs
from ballet_ray.stages.image_hash import (
    ImageHasher,
    dhash64,
    image_hashes,
    image_near_dup_pairs,
    phash64,
    streaming_image_dedup,
)
from ballet_ray.stages.sketches import (
    CountMinSketch,
    approx_distinct,
    approx_distinct_per_group,
    approx_distinct_hll,
    approx_distinct_per_group_hll,
    approx_quantiles,
    approx_top_k,
    count_min,
)
from ballet_ray.stages.knlm import kn_logprob_scores
from ballet_ray.stages.text import (
    HTML_ENTITIES,
    PII_PATTERNS,
    Fingerprint,
    GopherSignals,
    HtmlToText,
    TextNormalizer,
    bigram_logprob_scores,
    bm25_top_terms,
    c4_clean,
    canonicalize_url,
    corpus_divergence,
    domain_match_mask,
    filter_by_domain,
    fineweb_quality_filter,
    gopher_quality_filter,
    LangId,
    NgramRepetition,
    PiiSignals,
    PiiSpans,
    QualityScore,
    RegexRedactor,
    apply_spans,
    RegexTokenCount,
    WordRepetition,
    extract_domain,
    hash_tokenize,
    tfidf_top_terms,
    unigram_logprob_scores,
    winnow_fingerprints,
    winnow_similarity_pairs,
)
from ballet_ray.stages.windows import grouped_rank

__all__ = [
    "assign_clusters",
    "cap_per_group",
    "c4_clean",
    "canonicalize_url",
    "cluster_embeddings",
    "extract_domain",
    "GopherSignals",
    "gopher_quality_filter",
    "fineweb_quality_filter",
    "domain_match_mask",
    "filter_by_domain",
    "filter_groups",
    "calibrate_threshold",
    "streaming_embedding_dedup",
    "duplication_scores",
    "streaming_minhash_dedup",
    "ImageHasher",
    "dhash64",
    "phash64",
    "hamming_pairs",
    "image_hashes",
    "image_near_dup_pairs",
    "streaming_image_dedup",
    "temperature_rates",
    "temperature_sample",
    "unimax_rates",
    "unimax_sample",
    "fit_text_logreg",
    "quality_filter_by_model",
    "score_text_logreg",
    "remove_duplicate_lines",
    "weighted_sample",
    "approx_distinct_hll",
    "approx_distinct_per_group_hll",
    "winnow_similarity_pairs",
    "PCA",
    "HTML_ENTITIES",
    "HtmlToText",
    "TextNormalizer",
    "PII_PATTERNS",
    "DistributedLogReg",
    "Fingerprint",
    "HashSplit",
    "LangId",
    "NgramRepetition",
    "QualityScore",
    "PiiSignals",
    "PiiSpans",
    "RegexRedactor",
    "apply_spans",
    "RegexTokenCount",
    "CountMinSketch",
    "TokenCount",
    "TokenStats",
    "WordRepetition",
    "approx_distinct",
    "approx_distinct_per_group",
    "approx_quantiles",
    "approx_top_k",
    "BpeEncoder",
    "UnigramEncoder",
    "UnigramTokenizer",
    "BpeTokenizer",
    "ByteBpeTokenizer",
    "WordPieceTokenizer",
    "apply_bpe",
    "apply_byte_bpe",
    "apply_unigram",
    "apply_wordpiece",
    "assign_topic_clusters",
    "bigram_logprob_scores",
    "kn_logprob_scores",
    "bm25_top_terms",
    "budget_sample",
    "chunk_sequences",
    "fim_transform",
    "span_corruption",
    "prefix_lm_split",
    "fit_vocab_prune",
    "apply_vocab_prune",
    "corpus_divergence",
    "corpus_report",
    "tokenizer_report",
    "correlation_matrix",
    "count_min",
    "cluster_losers",
    "dedup_by_minhash",
    "dedup_by_token_minhash",
    "diversity_sample",
    "dsir_log_weights",
    "dsir_resample",
    "duplicate_passages",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "find_contaminated",
    "find_contaminated_tokens",
    "global_shuffle_index",
    "grouped_pca_fit",
    "grouped_pca_transform",
    "grouped_rank",
    "hash_rate_filter",
    "hash_tokenize",
    "ivf_fit_centroids",
    "ivf_knn",
    "ivf_pq_knn",
    "knn_brute",
    "lsh_knn",
    "make_bloom_index",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "pack_sequences",
    "pca_fit_embeddings",
    "pq_encode",
    "pq_fit",
    "pq_knn",
    "pca_transform_embeddings",
    "remove_duplicate_spans",
    "semantic_decontaminate",
    "semantic_dedup",
    "simhash_pairs",
    "stratified_sample",
    "streaming_exact_dedup",
    "token_duplicate_passages",
    "token_minhash_lsh_pairs",
    "train_bpe",
    "train_byte_bpe",
    "train_unigram",
    "train_wordpiece",
    "unigram_logprob_scores",
    "winnow_fingerprints",
]

"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.  Everything is either a
Catalyst expression (preferred — whole-stage codegen) or a vectorized
pandas/Arrow UDF; never per-row Python in the hot path."""

from sketchlib.text.analysis import (
    LANG_MARKERS,
    freq_spectrum,
    language_id,
    langid_oracle_case_sql,
    with_quality,
    with_token_stats,
)
from sketchlib.text.bpe import bpe_decode_column, bpe_encode, train_bpe
from sketchlib.text.logprob import unigram_counts, unigram_logprob
from sketchlib.text.novelty import ngram_novelty
from sketchlib.text.fingerprint import document_fingerprints
from sketchlib.text.normalize import normalize_text, split_passages
from sketchlib.text.pii import (
    PII_PATTERNS,
    PII_REPLACEMENTS,
    redact_pii,
    with_pii_flags,
)

__all__ = [
    "with_token_stats",
    "with_quality",
    "language_id",
    "langid_oracle_case_sql",
    "LANG_MARKERS",
    "document_fingerprints",
    "freq_spectrum",
    "with_pii_flags",
    "redact_pii",
    "PII_PATTERNS",
    "PII_REPLACEMENTS",
    "normalize_text",
    "split_passages",
    "train_bpe",
    "bpe_encode",
    "bpe_decode_column",
    "unigram_counts",
    "unigram_logprob",
    "ngram_novelty",
]

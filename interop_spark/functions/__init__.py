"""Column-function library — every reusable Column-level operator exposed
by the engine (text analysis, hashing/dedup primitives, vector math,
ADT-code enrichment). All pure expressions; none require a Python worker.
"""

from interop_spark.fhir.adt import get_action  # noqa: F401
from interop_spark.operators.dedup import (  # noqa: F401
    jaccard,
    lsh_band_keys,
    minhash_signature,
    simhash,
    simhash_bands,
    word_shingles,
)
from interop_spark.operators.pq import l2sq, subvector  # noqa: F401
from interop_spark.operators.similarity import (  # noqa: F401
    as_double,
    cosine_sim,
    dot,
    l2_norm,
    lsh_bucket,
    sq8_decode,
    sq8_encode,
)
from interop_spark.operators.text import (  # noqa: F401
    avg_token_len,
    fingerprint,
    lang_id,
    lang_id_of_tokens,
    punct_ratio,
    quality_score,
    repetition_signals,
    stopword_count,
    stopword_ratio,
    token_count,
    token_entropy,
    tokens,
    word_ngrams,
)

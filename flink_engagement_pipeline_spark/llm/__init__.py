"""Large-scale training-data pipeline operators (SURVEY.md §7 Phase 3).

Beyond the reference's own surface: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard), similarity search (brute-force cosine,
LSH-bucketed ANN), text analysis (language-ID, quality scoring, token
counting, fingerprinting) and multimodal binary-column plumbing — all
expressed as JVM-side Column expressions or Arrow-batched pandas
transforms; no row-at-a-time Python anywhere.
"""

from . import dedup, multimodal, similarity, text  # noqa: F401

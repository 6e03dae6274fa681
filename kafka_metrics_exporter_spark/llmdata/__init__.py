"""Large-scale training-data pipeline operators (SURVEY §7 PR 6).

Beyond the reference's own surface: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine), similarity search (brute
cosine top-k, IVF, random-hyperplane LSH), text analysis (language id,
quality scoring, token counting, fingerprinting), multimodal column
plumbing, and corpus assembly (deterministic splits, stratified domain
mixing, context-window packing, benchmark decontamination; cluster-level
dedup via connected components lives in ``dedup``) — each designed for 100 TB inputs: partition-parallel,
broadcast-or-bucket joins, no driver-side loops, Python only at Arrow
batch boundaries.
"""

from kafka_metrics_exporter_spark.llmdata import (  # noqa: F401
    dedup,
    multimodal,
    pipeline,
    similarity,
    text,
)

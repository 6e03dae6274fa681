"""Large-scale training-data pipeline operators (SURVEY §7 PR 6).

Beyond the reference's own surface: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine), similarity search (brute
cosine top-k, IVF, random-hyperplane LSH), text analysis (language id,
quality scoring, token counting, fingerprinting) and multimodal column
plumbing — each designed for 100 TB inputs: partition-parallel,
broadcast-or-bucket joins, no driver-side loops, Python only at Arrow
batch boundaries.
"""

from kafka_metrics_exporter_spark.llmdata import dedup, multimodal, similarity, text  # noqa: F401

"""Reusable operator library.

Operators Spark lacks natively, each built as a composition of DataFrame ops
(shuffle-conscious) rather than a driver-side loop or row-at-a-time UDF:

    asof        as-of (point-in-time) join via union + last-value window
    topk        top-k per group via row_number window
    dedup       exact / fingerprint / MinHash-LSH / SimHash / n-gram Jaccard
    similarity  brute-force cosine top-k + sign-LSH bucketed ANN
    text        tokenization, quality scoring, language-ID heuristic, fingerprints
    multimodal  binary payload columns + Arrow-batched feature extraction plumbing
"""

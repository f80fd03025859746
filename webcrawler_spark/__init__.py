"""webcrawler_spark — a from-scratch PySpark-native rebuild of the
capabilities of RedSky7/WebCrawler (reference at /root/reference, studied
for behavior only; no code copied).

Layout:
    session     SparkSession factory tuned for local[N] testing, cluster-ready
    tables      loaders for the driver-provided testdata star schema
    functions/  Catalyst-expression + pandas-UDF building blocks
                (urls, text, hashing, images, robots)
    sources/    deterministic synthetic fixtures (webgraph/seeds/robots/images)
                + the reference-semantics crawl simulator (oracle)
    storage/    snapshot store: parquet + manifest (Iceberg-style API boundary)
    crawl/      frontier state tables, the BSP crawl round, the round driver
    extract/    regex/XPath-style field extraction, link/image mining
    index/      inverted-index build + search
    dedup/      exact / minhash-LSH / simhash / ngram-jaccard / embedding dedup
    similarity/ brute-force + LSH-bucketed ANN over embeddings
    multimodal/ binary-column decode/feature plumbing (numpy codecs)
    streaming/  Structured Streaming windowed aggregation + sessionization
"""

__version__ = "0.1.0"

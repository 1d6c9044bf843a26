"""PySpark-native analytics engine with the capabilities of
wzlzju/data-transformation-2022 (profiling, transformation-path search,
chart assembly + statistical scoring), re-architected Spark-first and
extended with large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal column plumbing).

Layout:
    session     — SparkSession factory tuned for local[N] and cluster use
    sources     — readers (parquet/csv/json) with stable row-id discipline
    operators   — relational Step algebra, aggregations, dedup, similarity
    functions   — scalar/statistical column functions (dates, text, vectors)
    profiler    — semantic-type & key inference + column clustering
    ml          — core transforms (PCA/KMeans/LDA distributed; sampled t-SNE/...)
    plans       — tpath model, cost model, Pareto-pruned enumerator
    scoring     — 2-D histograms, CDM, scagnostics, significance tests
    viz         — chart-type registry + chart assembly
    engine      — end-to-end recommendation pipeline (profile→search→score→rank)
    streaming   — Structured Streaming ingest/aggregation paths
"""

__version__ = "0.1.0"

"""hive_population_ml_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference repo
``spineda1208/hive-population-ml`` (see SURVEY.md).

The reference is a single-node pandas/PyTorch pipeline; this package
re-expresses its entire operator surface (SURVEY.md §2) as lazy Spark
DataFrame plans that Catalyst/Tungsten can optimize, plus the
large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing).

Layout:
    session    — SparkSession builder + runtime tuning knobs
    io         — sources (parquet tables, edge adapters) and sinks
    operators  — relational operators (interval join, stats bundles,
                 splits, dedup, similarity, text, multimodal)
    functions  — scalar function layer (SURVEY §2.7)
    ml         — MLlib pipeline parity (SURVEY §2.8)
    streaming  — Structured Streaming slice (SURVEY §2.9)
    queries    — named query registry wired to __spark_entry__
"""

__version__ = "0.1.0"

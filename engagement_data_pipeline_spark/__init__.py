"""PySpark-native analytics engine with the query and data-processing
capabilities of AfricasVoices/Engagement-Data-Pipeline.

Everything here is a fresh, Spark-first design: the reference
(single-threaded Python over Firestore) defines *what* to compute —
the message/label/code-scheme data model, dedup/filter/impute/pivot
operators, and the analysis aggregation suite — while this package
expresses it as declarative DataFrame plans that Catalyst can optimize
(predicate pushdown, broadcast joins, whole-stage codegen) and that
scale to 100 TB via partitioning, broadcast dimensions and merge-based
incremental ingest.

Layout:
    session          SparkSession builder with scale-appropriate defaults
    tables           testdata / warehouse table loading helpers
    operators/       generic relational operators (dedup, filters, joins,
                     folds, top-k, incremental merge)
    labels/          message & label data model: schemas, code schemes,
                     imputation (M1-M9), WS correction (M10-M11),
                     column views (G1/G2)
    analysis/        automated analysis aggregations (A1-A9, R1-R2)
    sources/         ingest normalisation to the Message schema (S4-S12)
    sinks/           exports and idempotent upsert (K1-K9)
    training/        large-scale training-data ops: dedup (exact, MinHash
                     LSH, SimHash, n-gram Jaccard), similarity search,
                     text quality, multimodal plumbing
    streaming/       Structured Streaming wrappers (watermarks, foreachBatch)
    queries/         runnable demo queries over the synthetic testdata,
                     each paired with a DuckDB oracle (the driver gate)
"""

__version__ = "0.1.0"

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

Layout (see STATUS.md for the operator-by-operator coverage map):
    session          SparkSession builder with scale-appropriate defaults
    tables           testdata / warehouse table loading helpers
    operators/       generic relational operators (dedup, filters, folds,
                     top-k, incremental fetch + watermarks)
    labels/          message & label data model: schemas, code schemes,
                     imputation (M1-M9), WS correction (M10-M11),
                     column views (G1/G2), auto-coding (M12-M13)
    functions/       scalar/string/datetime cleaners (X1-X10)
    analysis/        automated analysis aggregations (A1-A9) and
                     regression (R1-R4)
    sources/         ingest normalisation to the Message schema (S4-S12)
    sinks/           exports (K2-K4), sync-back views (K6/K7/K9)
    training/        large-scale training-data ops: dedup (exact, MinHash
                     LSH, SimHash), similarity search, text analysis,
                     multimodal plumbing
    streaming/       Structured Streaming ingest (foreachBatch merge)
    queries/         runnable queries over the driver testdata, each
                     paired with a DuckDB oracle (the correctness gate)
"""

__version__ = "0.1.0"

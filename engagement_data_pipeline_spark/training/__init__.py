"""Large-scale training-data pipeline operators.

These extend the engagement-pipeline operator set with the operations
a 100 TB LLM-training-data pipeline needs: deduplication (exact,
MinHash-LSH, SimHash), similarity search over embeddings, text
analysis (token counting, quality scoring, language ID,
fingerprinting), and multimodal column plumbing.

Design rules shared by every module here:

* No all-pairs joins, ever. Near-dup candidates come from banded LSH
  bucket joins (shuffle on band key); similarity search buckets by
  hyperplane LSH. Cost is O(n·k) + bucket-local work, not O(n²).
* No Python in the row path: shingling, hashing, signatures and
  verification are built-in higher-order array functions (JVM,
  whole-stage codegen). Pandas UDFs appear only where genuinely
  needed (multimodal decode stubs).
* Cross-engine determinism: hashes are md5-hex based (identical bytes
  in Spark and DuckDB), so every operator has an exact value-hash
  oracle instead of a rows-only check.
"""

"""jitsu_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of Jitsu/EventNative (reference studied at
/root/reference, Go) as an idiomatic Spark pipeline:

    change log (ordered i/u/d envelopes keyed by doc_id)
      -> readStream / batch replay
      -> transform surface (flatten, mapping rules, enrichment, routing)
      -> schema probe + LCA type widening (Jitsu's dynamic schema engine)
      -> salted LWW reduce (last-writer-wins per key, skew-aware)
      -> MERGE into a bucketed parquet lake table (atomic snapshot commits,
         exactly-once via batch-id commit manifests)

No code is ported from the reference; every stage is a columnar DataFrame
transform. See SURVEY.md for the operator-by-operator mapping.
"""

__version__ = "0.1.0"

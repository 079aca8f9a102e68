"""alligator_spark — a from-scratch PySpark-native record-linkage engine.

Re-implements the entity-linking semantics of enRichMyData/alligator
(reference at /root/reference, studied for behavior only) as an idiomatic
Spark batch pipeline:

    normalize -> block -> pair-generate -> score -> cluster

over an interleaved text+media document table
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``.

Key design decisions (vs the reference's multiprocessing+Mongo substrate):

* All dataflow is expressed with the DataFrame API so Catalyst handles
  projection/predicate pushdown, join strategy and partial aggregation.
* String feature battery (reference ``alligator/utils.py:56-190``) runs in
  Arrow-vectorized pandas UDFs — never per-row Python UDFs.
* Candidate generation (reference: HTTP retrieval against LamAPI,
  ``alligator/fetchers.py:90-166``) becomes a salted self-join within
  blocking keys (token-sort + MinHash bands).
* Transitive clustering uses the large-star/small-star connected-components
  algorithm driven from the driver as alternating hash-join passes.
* Each stage checkpoints to a Parquet (Iceberg-layout) table with
  per-partition lineage rows; a killed run resumes from the last committed
  stage (the reference's status state machine, ``alligator/manager/data.py:216``).
"""

__version__ = "0.1.0"

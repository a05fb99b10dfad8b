"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode/resize/
feature-extraction run as Arrow-batched ``mapInPandas`` stages.  Real codec
work needs libraries absent from this environment, so the decode kernel is
stubbed (deterministic fake by default, ``NotImplementedError`` in strict
mode) — the Spark-side contract (schemas, batching, partitioning, UDF
signatures) is real and tested."""

"""spark_hadoop_automation_in_cloud_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine with the query and data-processing
capabilities of the reference repo ``leonidee/spark-hadoop-automation-in-cloud``
(a batch ETL/datamart pipeline over a geo-tagged event lake), re-expressed
Spark-first:

- ``session``    — SparkSession lifecycle with scale-ready defaults (AQE,
                   adaptive skew join, Arrow) mirroring the reference's
                   ``src/spark/runner.py:47-105`` responsibilities.
- ``args``       — validated job-argument model (reference
                   ``src/keeper/keeper.py:61-120``).
- ``io``         — partitioned parquet sources/sinks with built-in partition
                   pruning (replaces the reference's driver-side boto3 path
                   enumeration, ``src/helper/helper.py:169-231``).
- ``functions``  — scalar/column function library (haversine geo math,
                   portable hashing, text metrics, vector math).
- ``operators``  — reusable dataflow operators (top-k per group, 1-NN join,
                   pair generation, change detection, rollups, dedup,
                   similarity search, text analysis).
- ``plans``      — datamart compositions equivalent to the reference's three
                   datamart jobs (``src/spark/collector.py``).
- ``sources``    — event-log schema + raw→staging flattening (reference
                   ``src/spark/mover.py``).
- ``streaming``  — Structured Streaming variants of the batch rollups.
- ``multimodal`` — binary-column (image/audio) plumbing over mapInPandas.

Everything is DataFrame/Catalyst: no RDD round-trips, built-in expressions
before UDFs, Pandas UDFs (Arrow) where Python is unavoidable.
"""

__version__ = "0.1.0"

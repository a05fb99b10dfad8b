"""Column-function library (built-in expressions only — no Python UDFs).

Submodules:
- ``geo``     — haversine distance (correct + reference-quirk variants),
                deterministic synthetic coordinates for the test tables.
- ``hashing`` — portable 60-bit md5-derived hash, minhash permutations.
- ``text``    — token counts, quality metrics, language-marker scores.
- ``vectors`` — dot product / norms / cosine over array<float> columns.
- ``timeutils`` — encoding-safe epoch math (``epoch_us`` works on both
                  ``TIMESTAMP`` and ``TIMESTAMP_NTZ`` inputs).
"""

from spark_hadoop_automation_in_cloud_spark.functions import (  # noqa: F401
    geo,
    hashing,
    text,
    timeutils,
    vectors,
)
from spark_hadoop_automation_in_cloud_spark.functions.timeutils import (  # noqa: F401
    epoch_us,
    ntz_to_utc_timestamp,
)

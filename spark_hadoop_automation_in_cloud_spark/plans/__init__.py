"""Datamart plan compositions — the engine's equivalents of the reference's
three datamart jobs (``src/spark/collector.py``):

- ``demographics``     — per-user actual city / home city / travel history
                         (Q1, ``collector.py:378-560``)
- ``activity_rollup``  — per-zone week/month event-count rollup
                         (Q2, ``collector.py:562-894``)
- ``recommendations``  — same-channel, never-in-contact, nearby user pairs
                         (Q3, ``collector.py:896-1150``)

Each plan is a pure function over input DataFrames so it runs on any source
(testdata, a real event lake, a stream snapshot).
"""

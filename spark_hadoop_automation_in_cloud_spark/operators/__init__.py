"""Reusable dataflow operators, each a small function DataFrame → DataFrame.

Parity operators (SURVEY §2): ``topk``, ``nearest``, ``pairs``, ``changes``,
``rollup``.  Extension operators for training-data pipelines (SURVEY §7.3
step 9): ``dedup``, ``similarity``, ``textops``, ``packing``,
``clustering``, ``components``, ``asof``, ``pandas_aggs``, ``skew``,
``checks``.  Scale primitives: ``ranks`` (distributed exact global
row numbers / ntiles / cumsums), ``sketches`` (mergeable HLL cardinality
rollups + mergeable log-bucket quantile sketches).
"""

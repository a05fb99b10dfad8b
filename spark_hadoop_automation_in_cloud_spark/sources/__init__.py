"""Event-lake sources: raw schema, raw→staging flattening (the reference's
``src/spark/mover.py``), and the staging-table reader used by datamarts."""

"""Library operators — reference-specific semantics re-expressed Spark-first.

Each operator is a plain function DataFrame -> DataFrame built from
declarative primitives so Catalyst keeps optimizing across the boundary
(no opaque RDD/UDF walls unless semantics demand it).
"""

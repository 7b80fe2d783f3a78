"""Spark column expressions (native, JVM-side) and pandas UDF families."""

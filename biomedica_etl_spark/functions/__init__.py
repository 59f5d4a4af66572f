"""Scalar function library (native pyspark.sql.functions compositions)."""

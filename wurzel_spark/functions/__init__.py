"""Scalar function library (SURVEY §2.8): string/markdown/text Column
builders, all JVM-side (`pyspark.sql.functions`) so they stay inside
whole-stage codegen — UDFs only where a real parser is required.
"""

"""Relational query library declared over the driver's TPC-H-ish tables.

Every query here has a DuckDB-oracle twin in ``__spark_entry__.oracle_sql``;
column aliases must match exactly (driver hashes values with columns sorted
by name).
"""

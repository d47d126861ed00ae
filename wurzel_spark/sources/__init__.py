"""Sources (SURVEY §2.1): leaf stages producing DataFrames from external
data — markdown folders (local/SFTP-staged), URL scrapes, document
conversions. All follow the same shape: ``fn(spark, ...) -> DataFrame``
conforming to a contract in ``wurzel_spark.contracts``.
"""

"""Per-document extraction kernels (pure Python, run inside mapInPandas).

These are the only imperative, per-document pieces of the engine; everything
driver-facing is pyspark.sql DataFrames. Kernels receive raw bytes from the
``html: binary`` column of the pages table and emit flat page rows.
"""

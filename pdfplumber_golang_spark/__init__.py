"""pdfplumber_golang_spark — PySpark-native document-content extraction.

A from-scratch reimplementation of pyhub-apps/pdfplumber-golang's
capabilities (PDF parse → char objects → layout analysis → text/tables,
plus an HTML boilerplate-strip path) expressed as pyspark.sql DataFrames +
vectorized Arrow/pandas kernels. See SURVEY.md for the blueprint.

Must be a regular package (not PEP-420 namespace): executors import it from
a zip shipped via addPyFile/--py-files, and zipimport requires __init__.py.
"""

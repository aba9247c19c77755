#!/usr/bin/env python
"""End-to-end training-data curation over the documents/embeddings tables.

Demonstrates the composed pipeline a web-scale corpus build runs:

  exact dedup -> language ID -> quality gate -> per-language stats
  (one declarative plan: corpus_curation)
plus the two near-duplicate passes:
  MinHash-LSH over text shingles, banded-hyperplane LSH over embeddings
  (bucket equi-joins, never an all-pairs product).

Usage:  python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pdfplumber_golang_spark.functions import ann, dedup, text_analysis
    from pdfplumber_golang_spark.session import get_spark

    spark = get_spark(app="curation-example", cores=8)

    print("== corpus curation (dedup -> langid -> quality -> stats) ==")
    text_analysis.corpus_curation(spark, sf_dir).show(truncate=False)

    print("== MinHash-LSH near-dup candidates (text) ==")
    pairs = dedup.minhash_lsh_candidates(spark, sf_dir)
    print(f"candidate pairs: {pairs.count()}")

    print("== banded-LSH near-dups (embeddings), cosine-verified ==")
    dups = ann.dedup_embedding_lsh(spark, sf_dir)
    dups.orderBy(dups.cosine.desc()).show(5)

    spark.stop()


if __name__ == "__main__":
    main()

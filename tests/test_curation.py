"""Semantic checks for the Gopher/C4/domain curation operators (the exact
cross-engine check is their oracle rows; these pin the rule behavior)."""

from pdfplumber_golang_spark.functions import curation

SF_DIR = "/root/testdata/sf0.001"


def test_gopher_rules_discriminate(spark):
    out = curation.gopher_quality(spark, SF_DIR).toPandas()
    assert len(out) == 500
    # the word-count floor actually rejects short docs, keeps long ones
    assert (~out[out.n_words < curation.GOPHER_MIN_WORDS].keep).all()
    kept = out[out.keep]
    assert len(kept) > 0
    assert (kept.n_words >= curation.GOPHER_MIN_WORDS).all()
    assert (kept.n_stopwords >= curation.GOPHER_MIN_STOPWORDS).all()
    assert (kept.top_bigram_frac <= curation.GOPHER_MAX_TOP_BIGRAM).all()
    # metrics sane: single-spaced corpus means mean_word_len > 1
    assert (out.mean_word_len > 1).all()


def test_c4_line_dedup_global_first_occurrence(spark):
    out = curation.c4_line_dedup(spark, SF_DIR).toPandas()
    assert (out.n_lines >= curation.C4_MIN_DOC_LINES).all()
    # global dedup: no surviving line text appears twice across the corpus
    lines = [ln for t in out.text for ln in t.split("\n")]
    assert len(lines) == len(set(lines))
    assert all(
        len(ln.split(" ")) >= curation.C4_MIN_LINE_WORDS for ln in lines
    )


def test_domain_cap_bounds(spark):
    out = curation.domain_cap(spark, SF_DIR).toPandas()
    kept = out[out.kept]
    per_host = kept.groupby("host").size()
    assert (per_host <= curation.DOMAIN_CAP).all()
    # hosts over the cap really lose docs
    over = out[out.n_host_docs > curation.DOMAIN_CAP]
    if len(over):
        assert (~over[over.host_rank > curation.DOMAIN_CAP].kept).all()
    assert out.host.str.startswith("host").all()


def test_gopher_short_docs_score_zero_not_crash(spark, tmp_path):
    """ADVICE r3: a 0/1-word doc must yield no bigrams (DuckDB's
    generate_series(1, 0) is empty) instead of element_at(w, 0) throwing
    on Spark's descending sequence(1, 0)."""
    import pandas as pd

    p = str(tmp_path / "documents.parquet")
    pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["solo", "two words", "the a and of to in is x y z"],
         "lang": ["en"] * 3}
    ).to_parquet(p)
    out = curation.gopher_quality(spark, str(tmp_path)).toPandas().set_index("doc_id")
    assert out.loc[0, "top_bigram_frac"] == 0.0
    assert not out.loc[0, "keep"]
    assert out.loc[1, "top_bigram_frac"] == 1.0
    assert len(out) == 3

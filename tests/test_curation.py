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

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


def test_pii_escaped_patterns_ignore_digit_runs(spark, tmp_path):
    """ADVICE r4: patterns interpolated into F.expr SQL literals lose
    their backslashes ('\\.' -> '.' = any char), so '1 2 3 4' counted as
    an IPv4 and 'x@y z' as an email.  The column-based regexp_count API
    must keep the escapes: digit runs and spaced '@' shapes count zero,
    while real PII still counts."""
    import pandas as pd

    p = str(tmp_path / "documents.parquet")
    pd.DataFrame(
        {
            # doc_id 3 -> the %4==3 branch: injection appends only the
            # decoy tail, so these decoys are the whole signal
            "doc_id": [3, 7],
            "text": [
                "released 1 2 3 4 and 5 6 7 8 versions x@y z",
                "real a.b@example.com and 10.1.2.3 plus 1 2 3 4",
            ],
            "lang": ["en", "en"],
        }
    ).to_parquet(p)
    out = curation.pii_scrub(spark, str(tmp_path)).toPandas().set_index("doc_id")
    # decoys only: nothing matches properly-escaped patterns
    assert out.loc[3, "n_emails"] == 0
    assert out.loc[3, "n_phones"] == 0
    assert out.loc[3, "n_ips"] == 0
    # real PII still found (plus decoys contributing zero)
    assert out.loc[7, "n_emails"] == 1
    assert out.loc[7, "n_ips"] == 1


def test_shard_super_factor_caps_bnlj_relation():
    """VERDICT r4 #1: the super factor must cap the non-equi-join input
    at SHARD_MAX_SUPERS rows no matter the corpus size."""
    import math

    assert curation.shard_super_factor(1) == 1
    assert curation.shard_super_factor(curation.SHARD_MAX_SUPERS) == 1
    assert curation.shard_super_factor(curation.SHARD_MAX_SUPERS + 1) == 2
    for b in (10**6, 10**9, 10**12):
        s = curation.shard_super_factor(b)
        assert math.ceil(b / s) <= curation.SHARD_MAX_SUPERS


def test_shard_packing_two_level_matches_naive(spark, tmp_path):
    """The two-level prefix sum must equal the naive global cumsum on a
    corpus whose doc_id range forces sup > 1 (multiple fine buckets per
    superbucket, multiple docs per bucket, sparse empty buckets)."""
    import pandas as pd

    rows = []
    for i in range(125):
        base = i * 1_000_000
        for off in (0, 1100, 1101, 2200, 3300):
            k = (base + off) % 13 + 1
            rows.append((base + off, " ".join(["w"] * k)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf.to_parquet(str(tmp_path / "documents.parquet"))
    # the derivation really is two-level for this id range
    assert curation.shard_super_factor(
        rows[-1][0] // curation.SHARD_BUCKET_DOCS + 1
    ) > 1
    out = (
        curation.shard_packing(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = pdf.sort_values("doc_id").reset_index(drop=True)
    exp["n_tokens"] = exp.text.str.split(" ").str.len()
    cum = exp.n_tokens.cumsum()
    want = ((cum - exp.n_tokens) // curation.SHARD_TOKENS).astype(int)
    assert list(out.doc_id) == list(exp.doc_id)
    assert list(out.n_tokens) == list(exp.n_tokens)
    assert list(out.shard_id) == list(want)

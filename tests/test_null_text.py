"""NULL-text robustness: crawl errors and decode failures land as NULL
text at pipeline scale. Text/dedup queries must not throw, and —
critically — exact dedup must NOT cluster all null-text documents into
one duplicate group (md5(NULL) = NULL would share a single window
partition and mass-cans unrelated rows)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from molgraphdb_spark.registry import all_queries

QUERIES = all_queries()

TEXT_FAMILY = [
    "doc_token_stats",
    "doc_quality_scores",
    "doc_language_id",
    "doc_fingerprint",
    "doc_content_filter",
    "doc_tfidf_top_terms",
    "doc_unigram_logprob",
    "dedup_exact",
    "dedup_rate_by_source",
    "dedup_minhash_signatures",
    "doc_dup_span_stats",
    "doc_dup_span_removal",
    "doc_repetition_suite",
    "doc_bigram_logprob",
    "vocab_bpe_merge_pairs",
    "vocab_bpe_merge_table",
    "vocab_bpe_compression",
    "source_token_divergence",
    "source_lang_entropy",
    "source_token_budget",
    "neardup_prefix_pairs",
    "doc_lang_confusion",
    "doc_ngram_novelty",
    "vocab_zipf_slope",
    "doc_collocation_pmi",  # r9: NULL text must not reach the bigram zip
    "doc_dsir_selection",   # r9b: NULL text must not reach the feature zip
    "doc_perplexity_buckets",  # r9b: NULL text must not reach the model
    "doc_chunk_spans",      # r9b: NULL text must not reach the slicer
    "doc_cdc_chunks",       # r9b: NULL text must not reach the boundary scan
    "source_chunk_dup_rate",  # r9b: NULL text joins must stay aligned
    "lang_token_fertility",   # r9b: NULL text must not reach the regex
    "pipeline_curation_funnel",  # r9b: NULL text stops at the ingest gate
]

#: Multimodal family — payload = encode(text), so a NULL text reaches the
#: mapInPandas UDFs as a NULL payload (the r5-verdict latent crash:
#: bytes(None) raised TypeError in _byte_features/_phash_rows/_resize_rows;
#: all three now skip payload-less rows, matching the oracles' NOT NULL
#: filters).
MM_FAMILY = [
    "mm_metadata_summary",
    "mm_decoded_features",
    "mm_decoded_phash",
    "mm_feature_extract",
    "mm_frame_sample",
    "mm_chunk_windows",
    "mm_phash_neardup",
    "mm_resize_grid",
]


@pytest.fixture(scope="module")
def nulled_sf_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("null_text_sf")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.withColumn(
        "text", F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("text"))
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem events embeddings".split()
    ):
        os.symlink(os.path.join(sf_dir, f"{t}.parquet"), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", TEXT_FAMILY)
def test_text_family_survives_null_text(name, spark, nulled_sf_dir):
    QUERIES[name](spark, nulled_sf_dir).collect()  # must not throw


@pytest.mark.parametrize("name", MM_FAMILY)
def test_mm_family_survives_null_text(name, spark, nulled_sf_dir):
    QUERIES[name](spark, nulled_sf_dir).collect()  # must not throw


def test_mm_feature_extract_skips_null_payloads(spark, nulled_sf_dir):
    rows = QUERIES["mm_feature_extract"](spark, nulled_sf_dir).collect()
    assert rows, "non-null payloads must still be featurized"
    assert all(r.doc_id % 7 != 0 for r in rows)  # planted-null docs skipped


def test_mm_resize_skips_empty_payloads(spark, sf_dir, tmp_path_factory):
    # zero-length text → zero-byte payload: the resample has nothing to
    # index into (the ADVICE ZeroDivisionError site) — row is skipped
    d = tmp_path_factory.mktemp("empty_text_sf")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.withColumn(
        "text", F.when(F.col("doc_id") % 6 == 0, F.lit("")).otherwise(F.col("text"))
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem events embeddings".split()
    ):
        os.symlink(os.path.join(sf_dir, f"{t}.parquet"), str(d / f"{t}.parquet"))
    rows = QUERIES["mm_resize_grid"](spark, str(d)).collect()
    assert rows
    assert all(r.doc_id % 6 != 0 for r in rows)


def test_exact_dedup_never_groups_null_text(spark, nulled_sf_dir):
    out = QUERIES["dedup_exact"](spark, nulled_sf_dir)
    nulls = out.filter(F.col("content_hash").isNull())
    assert nulls.count() > 0  # the fixture planted them
    rows = nulls.collect()
    assert all(r.is_dup_group == 0 for r in rows)
    assert all(r.canonical_id == r.doc_id for r in rows)


def test_no_backslash_s_tokenizer_in_package():
    # Regression guard for the r13 whitespace migration (r12 verdict
    # item 2): every tokenizer split / whitespace collapse in the
    # package now uses the EXPLICIT ASCII class [ \t\n\r\f], which is
    # byte-identical across Java regex, RE2 and Python on ANY corpus.
    # A reintroduced \s (in any of its three source encodings: r"\s",
    # SQL '\\s', F.expr '\\\\s') would silently re-open the
    # Java-vs-RE2 \x0B / Unicode-whitespace divergence — fail loudly.
    import ast
    import io
    import pathlib
    import tokenize

    pkg = pathlib.Path(__file__).resolve().parent.parent / "molgraphdb_spark"
    offenders = []
    for p in sorted(pkg.rglob("*.py")):
        src = p.read_text()
        # Live regex material can only reach an engine through a STRING
        # token: tokenize the source (comments are separate COMMENT
        # tokens, so trailing-comment mentions can never mask code —
        # the ADVICE r13 evasion), then exempt exactly the docstring
        # string tokens (prose mentions of the retired rule), located
        # via ast as the first statement of a module/class/function.
        doc_lines: set[int] = set()
        for node in ast.walk(ast.parse(src)):
            body = getattr(node, "body", None)
            if (
                isinstance(
                    node,
                    (ast.Module, ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef),
                )
                and body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                doc_lines.update(
                    range(body[0].value.lineno, body[0].value.end_lineno + 1)
                )
        str_types = {tokenize.STRING}
        if hasattr(tokenize, "FSTRING_MIDDLE"):  # 3.12 f-string tokens
            str_types.add(tokenize.FSTRING_MIDDLE)
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type not in str_types or "\\s" not in tok.string:
                continue
            if tok.start[0] in doc_lines:
                continue
            offenders.append(
                f"{p.relative_to(pkg)}:{tok.start[0]}: {tok.string[:100]}"
            )
    assert not offenders, (
        "\\s crept back into package regex source; use the explicit "
        "[ \\t\\n\\r\\f] class instead (r13 migration):\n"
        + "\n".join(offenders)
    )


def test_corpus_has_no_python_divergent_whitespace(spark, sf_dir):
    # NARROWED r13 sentinel (was: the repo-wide '\s+' engine-divergence
    # canary; the engine queries migrated to the explicit
    # [ \t\n\r\f] class and no longer depend on the corpus at all —
    # see test_no_backslash_s_tokenizer_in_package). What still
    # assumes an ASCII-whitespace corpus is the TEST third-impl layer:
    # the independent recomputes in test_thirdimpl.py tokenize with
    # Python str.strip()/str.split(), which treat \x0B and Unicode
    # whitespace (NBSP, EM SPACE, …) as separators where the engines'
    # explicit class does not. This sentinel fails the day a driver
    # corpus ships a divergent code point, naming the fix.
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    divergent = "[\\x0B\\x1C-\\x1F\\x85\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]"
    n = (
        docs.filter(F.col("text").isNotNull())
        .filter(F.col("text").rlike(divergent))
        .count()
    )
    assert n == 0, (
        f"{n} documents contain \\x0B/Unicode whitespace — the engine "
        "queries are unaffected (explicit [ \\t\\n\\r\\f] class) but the "
        "Python third-impl recomputes in test_thirdimpl.py tokenize with "
        "str.strip()/str.split(); switch those to "
        "re.split(r'[ \\t\\n\\r\\f]+', text.strip(' \\t\\n\\r\\f')) before "
        "trusting them on this corpus"
    )

"""Stage-1 extraction + stage-2 identity over the synthetic corpus:
byte-identical parity with the shared library (BASELINE.md per-row
invariant), JVM classifier vs pure classifier agreement, sha256 dedup
semantics (`_sbom.py:75-122`)."""

from pyspark.sql import functions as F

from surfactant_spark.functions.hashing import canon_uuid, sha256_hex
from surfactant_spark.functions.textlib import classify_doctype, extract_text
from surfactant_spark.operators.extract import classify_pages, extract_pages, mentions_table
from surfactant_spark.operators.identity import dedup_nodes, url_to_canon


def test_extract_byte_identical_per_url(spark_pages, corpus):
    pages_pdf, _ = corpus
    got = (
        extract_pages(spark_pages)
        .select("url", "text_extracted", "content_sha256")
        .toPandas()
        .set_index("url")
    )
    for url, html in zip(pages_pdf.url, pages_pdf.html):
        assert got.loc[url, "text_extracted"] == extract_text(bytes(html))
        assert got.loc[url, "content_sha256"] == sha256_hex(bytes(html))


def test_jvm_classifier_matches_pure_fn(spark, spark_pages, corpus):
    pages_pdf, _ = corpus
    got = {r.url: r.doctype for r in classify_pages(spark_pages).collect()}
    for url, html in zip(pages_pdf.url, pages_pdf.html):
        assert got[url] == classify_doctype(bytes(html))
    # non-html magic bytes through the JVM chain
    extra = spark.createDataFrame(
        [("u1", b"\x7fELF\x02"), ("u2", b"MZ\x90"), ("u3", b'{"k":1}')], ["url", "html"]
    )
    got2 = {r.url: r.doctype for r in classify_pages(extra).collect()}
    assert got2 == {"u1": "elf", "u2": "pe", "u3": "json"}


def test_dedup_nodes_collapses_identical_content(spark, spark_pages, corpus):
    pages_pdf, _ = corpus
    extracted = extract_pages(spark_pages)
    nodes = dedup_nodes(extracted).toPandas()
    n_distinct = pages_pdf.html.map(bytes).map(sha256_hex).nunique()
    assert len(nodes) == n_distinct
    assert nodes.canon_uuid.is_unique
    # aliases union all sighting urls; n_sources counts them
    by_sha = pages_pdf.assign(sha=pages_pdf.html.map(bytes).map(sha256_hex)).groupby("sha")
    want_alias = by_sha["url"].apply(lambda s: sorted(s)).to_dict()
    for row in nodes.itertuples():
        assert list(row.aliases) == want_alias[row.sha256]
        assert row.n_sources == len(want_alias[row.sha256])
        assert row.canon_uuid == canon_uuid(row.sha256)
    # first_seen is min warc_ts of the group (first-sighting-wins)
    want_first = by_sha["warc_ts"].min().to_dict()
    for row in nodes.itertuples():
        assert row.first_seen == want_first[row.sha256].to_pydatetime().replace(tzinfo=None)


def test_jvm_uuid5_matches_python(spark):
    """canon_uuid_col/entity_uuid_col (pure-codegen uuid5) must be
    bit-identical to Python uuid.uuid5 (functions/hashing.py)."""
    import hashlib

    from pyspark.sql import functions as F

    from surfactant_spark.functions.hashing import canon_uuid, entity_uuid
    from surfactant_spark.operators.identity import canon_uuid_col, entity_uuid_col

    shas = [hashlib.sha256(str(i).encode()).hexdigest() for i in range(50)]
    df = spark.createDataFrame([(s,) for s in shas], "sha string")
    got = {
        r.sha: (r.cu, r.eu)
        for r in df.select(
            "sha",
            canon_uuid_col(F.col("sha")).alias("cu"),
            entity_uuid_col(F.col("sha")).alias("eu"),
        ).collect()
    }
    for s in shas:
        assert got[s] == (canon_uuid(s), entity_uuid(s))


def test_mentions_table_shape(spark_pages):
    m = mentions_table(extract_pages(spark_pages))
    assert m.columns == ["url", "pred", "alias", "span", "conf"]
    preds = {r.pred for r in m.select("pred").distinct().collect()}
    assert preds <= {"Uses", "Contains"} and "Uses" in preds


def test_url_to_canon_is_total(spark_pages, corpus):
    pages_pdf, _ = corpus
    m = url_to_canon(extract_pages(spark_pages))
    assert m.count() == len(pages_pdf)
    assert m.select("url").distinct().count() == len(pages_pdf)

"""Pure extraction-library semantics (stage 1 scalar surface).

The analogue of the reference's file-type classification tests
(`/root/reference/tests/file_types/test_file_magic.py:15-57`) and its
extractor unit tests, over our shared pure-function library."""

from surfactant_spark.functions.hashing import (
    canon_uuid,
    minhash_bands,
    minhash_signature,
    portable_hash64,
    rolling_fingerprint,
    simhash64,
)
from surfactant_spark.functions.textlib import (
    classify_doctype,
    detect_lang,
    detect_mentions,
    extract_text,
    extract_title,
    quality_score,
    token_count,
)


def test_classify_doctype_magic_bytes():
    # declaration-order firstresult, like `filetypeid/id_magic.py:51-214`
    assert classify_doctype(b"\x7fELF\x02\x01\x01") == "elf"
    assert classify_doctype(b"MZ\x90\x00") == "pe"
    assert classify_doctype(b"%PDF-1.7") == "pdf"
    assert classify_doctype(b"<?xml version='1.0'?>") == "xml"
    assert classify_doctype(b"\x1f\x8b\x08") == "gzip"
    assert classify_doctype(b"PK\x03\x04") == "zip"
    assert classify_doctype(b"<!DOCTYPE html><html>") == "html"
    assert classify_doctype(b"  <!doctype HTML>") == "html"
    assert classify_doctype(b'{"a": 1}') == "json"
    assert classify_doctype(b"plain words") == "text"
    assert classify_doctype(None) == "unknown"


def test_extract_text_strips_boilerplate():
    html = (
        b"<html><head><title>T</title><style>b{}</style>"
        b"<script>var x=1;</script></head>"
        b"<body><!-- c --><p>Hello&nbsp;&amp;\n  world</p></body></html>"
    )
    assert extract_text(html) == "T Hello & world"
    assert extract_text(b"") == ""
    assert extract_text(None) == ""


def test_extract_title():
    assert extract_title(b"<title> My  Lib </title>") == "My Lib"
    assert extract_title(b"<p>no title</p>") == ""


def test_detect_mentions_offsets():
    html = b'<a href="lib://zlib">z</a> <a href="bundle://https://x/y.html">b</a>'
    ms = detect_mentions(html)
    assert ms[0][:2] == ("Uses", "zlib")
    assert ms[1][:2] == ("Contains", "https://x/y.html")
    s = html.decode("utf-8")
    for pred, alias, start, end in ms:
        assert s[start:end] == alias


def test_detect_lang():
    assert detect_lang("the cat sat on the mat and it was good for the dog") == "en"
    assert detect_lang("der hund und die katze ist ein tier von den wald") == "de"
    assert detect_lang("") == "und"
    assert detect_lang("一二三四五六七八九十" * 10) == "zh"


def test_token_and_quality():
    assert token_count("ab cd, 12!") == 5  # ab, cd, ",", 12, "!"
    assert quality_score("") == 0.0
    q = quality_score("the quick brown fox jumps over the lazy dog " * 12)
    assert 0.0 < q <= 1.0


def test_hashing_deterministic():
    assert canon_uuid("aa") == canon_uuid("aa")
    assert canon_uuid("aa") != canon_uuid("ab")
    assert 0 <= portable_hash64("x") < (1 << 60)
    sig = minhash_signature("a b c d e f g", k=8)
    assert len(sig) == 8 and sig == minhash_signature("a b c d e f g", k=8)
    assert len(minhash_bands(sig, bands=4)) == 4
    # near-identical docs have close simhashes, disjoint ones do not
    a = simhash64("the quick brown fox jumps".split())
    b = simhash64("the quick brown fox jumped".split())
    c = simhash64("completely different words entirely".split())
    ham_ab = bin(a ^ b).count("1")
    ham_ac = bin(a ^ c).count("1")
    assert ham_ab < ham_ac
    assert rolling_fingerprint("abcdef" * 10) == rolling_fingerprint("abcdef" * 10)


def test_minhash_empty_doc_tri_engine_parity(spark, ddb):
    """ADVICE round-1: empty/whitespace-only text must produce the SAME
    signature in the Python twin, the Spark path and the DuckDB oracle
    (all three treat the empty token list as one empty-string shingle)."""
    from pyspark.sql import functions as F

    from surfactant_spark.functions.hashing import minhash_signature, shingles
    from surfactant_spark.operators.dedup import (
        base_hash_array,
        minhash_sig_array,
        shingles_from_toks,
        tokenized,
    )

    assert shingles("") == [""] and shingles("   ") == [""]
    py_sig = minhash_signature("", k=8)

    docs = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    tok = tokenized(docs, "text", keep=("doc_id",))
    sh = tok.select("doc_id", shingles_from_toks(F.col("_toks")).alias("sh"))
    hv = sh.select("doc_id", base_hash_array(F.col("sh")).alias("hv"))
    spark_sigs = {
        r.doc_id: list(r.sig)
        for r in hv.select("doc_id", minhash_sig_array(F.col("hv"), 8).alias("sig")).collect()
    }
    assert spark_sigs[1] == py_sig and spark_sigs[2] == py_sig

    from surfactant_spark.functions.hashing import P31, mh_params

    mh = ", ".join(
        f"list_min([({a} * h + {b}) % {P31} for h in sh]) AS mh{i}"
        for i, (a, b) in enumerate(mh_params(8))
    )
    row = ddb.execute(
        "WITH t(text) AS (VALUES ('')), "
        "sh AS (SELECT [('0x' || substr(md5(s), 1, 15))::bigint % 2147483647 "
        "  for s in [array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ')]] AS sh FROM t) "
        f"SELECT {mh} FROM sh"
    ).fetchone()
    assert list(row) == py_sig

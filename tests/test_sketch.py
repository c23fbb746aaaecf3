"""Count-min sketch: fixed-size output, CMS overestimate guarantee,
shard-merge semigroup, and exactness on the test vocabulary.
"""

from pyspark.sql import functions as F

from surfactant_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_estimate,
    cms_merge,
    cms_sketch,
)
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(SF_DIR + "/documents.parquet").select("doc_id", "text")


def test_sketch_shape_and_mass(spark):
    docs = _docs(spark)
    sk = cms_sketch(docs).collect()
    assert len(sk) <= CMS_DEPTH * CMS_WIDTH
    assert {r.row_id for r in sk} == set(range(CMS_DEPTH))
    # every row of the sketch holds the full occurrence mass
    n_occ = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z][a-z0-9_.\-]{3,}"), 0)
        ).alias("t")
    ).count()
    per_row = {}
    for r in sk:
        per_row[r.row_id] = per_row.get(r.row_id, 0) + r.cnt
    assert set(per_row.values()) == {n_occ}


def test_estimates_never_undercount_and_mostly_exact(spark):
    docs = _docs(spark)
    exact = {
        r.t: r.c
        for r in docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(r"[a-z][a-z0-9_.\-]{3,}"), 0
                )
            ).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    sketch = cms_sketch(docs)
    probes = spark.createDataFrame([(t,) for t in exact], "tok string")
    est = {r.tok: r.est for r in cms_estimate(sketch, probes).collect()}
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)
    # width 64 over the tiny corpus vocabulary: most estimates exact
    n_exact = sum(1 for t in exact if est[t] == exact[t])
    assert n_exact >= len(exact) * 0.5


def test_shard_merge_equals_whole_corpus_sketch(spark):
    docs = _docs(spark)
    a = cms_sketch(docs.where(F.col("doc_id") % 2 == 0))
    b = cms_sketch(docs.where(F.col("doc_id") % 2 == 1))
    merged = {(r.row_id, r.bucket): r.cnt for r in cms_merge(a, b).collect()}
    whole = {(r.row_id, r.bucket): r.cnt for r in cms_sketch(docs).collect()}
    assert merged == whole


def test_unseen_token_estimate_is_collision_mass_only(spark):
    sketch = cms_sketch(_docs(spark))
    probes = spark.createDataFrame(
        [("zzzz-never-in-corpus-qqqq",)], "tok string"
    )
    (row,) = cms_estimate(sketch, probes).collect()
    assert row.est >= 0  # 0 unless all three cells collide


from hypothesis import given, settings, strategies as st

_words = st.lists(
    st.sampled_from(["alpha", "beta-x", "gamma.z", "delta", "epsi_lon"]),
    min_size=0, max_size=30,
)


@settings(max_examples=6, deadline=None)
@given(st.lists(_words, min_size=1, max_size=10))
def test_cms_never_undercounts_random_corpora(spark, texts):
    import collections
    import re

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sketch = cms_sketch(docs)
    exact = collections.Counter()
    for t in texts:
        for tok in re.findall(r"[a-z][a-z0-9_.\-]{3,}", " ".join(t).lower()):
            exact[tok] += 1
    if not exact:
        assert sketch.count() == 0
        return
    probes = spark.createDataFrame([(t,) for t in exact], "tok string")
    est = {r.tok: r.est for r in cms_estimate(sketch, probes).collect()}
    assert all(est[t] >= c for t, c in exact.items())

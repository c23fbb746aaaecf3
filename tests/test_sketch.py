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


# ---------------------------------------------------------------------------
# HyperLogLog register sketch
# ---------------------------------------------------------------------------
def test_hll_register_shape_and_bounds(spark):
    from surfactant_spark.operators.sketch import HLL_P, HLL_Q, hll_registers

    df = spark.range(20000).select(F.col("id").cast("string").alias("v"))
    regs = hll_registers(df, "v").collect()
    assert len(regs) <= (1 << HLL_P)
    assert all(0 <= r.bucket < (1 << HLL_P) for r in regs)
    assert all(1 <= r.rho <= HLL_Q + 1 for r in regs)


def test_hll_duplicates_are_absorbed(spark):
    """HLL needs no pre-distinct: the sketch of a multiset equals the
    sketch of its support (equal values hash identically; max absorbs),
    which is exactly why it beats COUNT(DISTINCT) at scale."""
    from surfactant_spark.operators.sketch import hll_registers

    base = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    tripled = base.unionByName(base).unionByName(base)
    assert {tuple(r) for r in hll_registers(base, "v").collect()} == {
        tuple(r) for r in hll_registers(tripled, "v").collect()
    }


def test_hll_merge_is_idempotent_semigroup(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) row-for-row, even
    with OVERLAPPING shards (max is idempotent — CMS's sum is not)."""
    from surfactant_spark.operators.sketch import hll_merge, hll_registers

    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("v"))
    whole = hll_registers(a.unionByName(b), "v")
    merged = hll_merge(hll_registers(a, "v"), hll_registers(b, "v"))
    assert {tuple(r) for r in whole.collect()} == {
        tuple(r) for r in merged.collect()
    }


def test_hll_estimate_accuracy_and_corrections(spark):
    """Relative error within 3x the standard error (1.04/sqrt(m)) at
    cardinalities spanning the linear-counting and raw regimes; the
    small-range correction path actually fires for small n."""
    from surfactant_spark.operators.sketch import (
        HLL_P,
        hll_corrected,
        hll_estimate,
        hll_registers,
    )

    m = 1 << HLL_P
    tol = 3 * 1.04 / (m ** 0.5)
    for n in (100, 2000, 30000):
        df = spark.range(n * 2).select((F.col("id") % n).cast("string").alias("v"))
        rows = hll_estimate(hll_registers(df, "v")).collect()
        out = hll_corrected(rows)[0]
        assert abs(out["est"] - n) / n < tol, (n, out)
        if n == 100:
            assert out["est"] != out["raw_est"]  # linear counting fired


def test_hll_grouped_and_driver_safe_columns(spark):
    """Grouped registers key per group; estimate emits only scalar
    integer columns plus ONE double built from two correctly-rounded
    IEEE ops on exact integers (the oracle-exactness contract)."""
    from surfactant_spark.operators.sketch import hll_estimate, hll_registers

    df = spark.range(4000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    regs = hll_registers(df, "v", group_cols=("g",))
    est = hll_estimate(regs, group_cols=("g",))
    rows = {r.g: r for r in est.collect()}
    assert set(rows) == {"0", "1"}
    for r in rows.values():
        assert r.n_regs + r.v_zero == 512
        assert r.denom_scaled > 0


# ---------------------------------------------------------------------------
# CMS-pruned exact heavy hitters
# ---------------------------------------------------------------------------
def _wide_vocab_docs(spark):
    """900 distinct rare tokens (1 occurrence each) + 2 heavy tokens —
    wide enough that CMS cells collide and the prune has real work."""
    rare = [(i, f"rare{i:04d}x token-filler") for i in range(900)]
    heavy = [(1000 + i, "heavyone heavytwo heavyone") for i in range(300)]
    return spark.createDataFrame(rare + heavy, "doc_id long, text string")


def test_heavy_hitters_equal_plain_exact(spark):
    """The prune is lossless (CMS never undercounts), so the sketch-
    pruned output must EQUAL the plain exact GROUP BY ... HAVING —
    the property that lets the oracle skip the sketch entirely."""
    from surfactant_spark.operators.sketch import heavy_hitters

    docs = _wide_vocab_docs(spark)
    got = {(r.tok, r.cnt, r.n_occurrences) for r in heavy_hitters(docs).collect()}
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z][a-z0-9_.\-]{3,}"), 0)
        ).alias("tok")
    )
    n = toks.count()
    want = {
        (r.tok, r.cnt, n)
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * 24 >= n)
        .collect()
    }
    assert got == want and len(got) >= 2  # both heavy tokens + filler found


def test_heavy_hitters_prune_cuts_candidate_occurrences(spark):
    """The scale claim: the exact pass must shuffle far fewer
    occurrences than the corpus holds. Re-run the candidate filter the
    operator applies and check it drops the rare-token mass."""
    from surfactant_spark.operators.sketch import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_estimate,
        cms_sketch,
    )

    docs = _wide_vocab_docs(spark)
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z][a-z0-9_.\-]{3,}"), 0)
        ).alias("tok")
    )
    n = toks.count()
    sketch = cms_sketch(docs)
    est = cms_estimate(sketch, toks.distinct())
    survivors = est.where(F.col("est") * 24 >= n)
    # 902 distinct tokens; only the heavy two plus collision victims may
    # survive the prune (collisions bounded by eps*N per cell)
    assert survivors.count() < 100


def test_heavy_hitters_empty_corpus(spark):
    from surfactant_spark.operators.sketch import heavy_hitters

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert heavy_hitters(empty).count() == 0


_hh_text = st.lists(
    st.sampled_from([f"tok{i:02d}" for i in range(6)]), min_size=0, max_size=12
).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(st.lists(_hh_text, min_size=1, max_size=8))
def test_heavy_hitters_match_python_counter(spark, texts):
    """Random corpora vs an independent Counter reference: the sketch-
    pruned exact output must equal the plain phi-frequency definition
    on every input, including all-empty documents (N = 0)."""
    import re
    from collections import Counter

    from surfactant_spark.operators.sketch import HH_DEN, HH_NUM, heavy_hitters

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.tok, r.cnt, r.n_occurrences) for r in heavy_hitters(docs).collect()
    }
    toks = [
        t for s in texts for t in re.findall(r"[a-z][a-z0-9_.\-]{3,}", s.lower())
    ]
    n = len(toks)
    want = {
        (t, k, n) for t, k in Counter(toks).items() if k * HH_DEN >= n * HH_NUM
    }
    assert got == want


# ---------------------------------------------------------------------------
# Bloom filter: no false negatives, shard-merge identity, forced FPs
# ---------------------------------------------------------------------------
def _vals(spark, items):
    return spark.createDataFrame([(v,) for v in items], "url string")


def test_bloom_no_false_negatives_and_words_bounded(spark):
    from surfactant_spark.operators.sketch import bloom_build, bloom_probe

    seen = [f"https://s{i}.example.org/p/{i}" for i in range(80)]
    unseen = [f"https://u{i}.example.net/q/{i}" for i in range(40)]
    bloom = bloom_build(_vals(spark, seen))
    words = bloom.collect()
    assert len(words) <= 32  # never wider than the filter itself
    assert all(0 <= r.word_idx < 32 for r in words)
    got = {
        r.url: r.bloom_hit
        for r in bloom_probe(bloom, _vals(spark, seen + unseen)).collect()
    }
    assert all(got[v] == 1 for v in seen)  # membership is never missed


def test_bloom_shard_merge_equals_whole_set(spark):
    from surfactant_spark.operators.sketch import bloom_build, bloom_merge

    a = [f"https://a{i}.example.org/" for i in range(30)]
    b = [f"https://b{i}.example.org/" for i in range(30)]
    merged = {
        (r.word_idx, r.word_bits)
        for r in bloom_merge(
            bloom_build(_vals(spark, a)), bloom_build(_vals(spark, b))
        ).collect()
    }
    whole = {
        (r.word_idx, r.word_bits)
        for r in bloom_build(_vals(spark, a + b)).collect()
    }
    assert merged == whole


def test_bloom_tiny_filter_forces_false_positives(spark):
    """With m crushed to one 32-bit word and a saturating insert set,
    unseen values MUST collide — the false-positive side of the
    contract is real and the probe still never reports a miss for a
    member."""
    from surfactant_spark.operators.sketch import bloom_build, bloom_probe

    seen = [f"https://x{i}.example.org/" for i in range(64)]
    unseen = [f"https://y{i}.example.net/" for i in range(20)]
    bloom = bloom_build(_vals(spark, seen), m_words=1)
    got = {
        r.url: r.bloom_hit
        for r in bloom_probe(
            bloom, _vals(spark, seen + unseen), m_words=1
        ).collect()
    }
    assert all(got[v] == 1 for v in seen)
    assert sum(got[v] for v in unseen) > 0  # saturation -> collisions


def _py_bloom(values, m_words=32, k=3):
    """Pure-python third implementation of the portable-hash Bloom."""
    import hashlib

    def h(prefix, v):
        return int(hashlib.md5((prefix + v).encode()).hexdigest()[:15], 16)

    m_bits = m_words * 32
    words = {}
    for v in values:
        h1, h2 = h("bf1:", v), h("bf2:", v)
        for i in range(k):
            pos = (h1 + i * h2) % m_bits
            words[pos // 32] = words.get(pos // 32, 0) | (1 << (pos % 32))
    return words


def _py_bloom_probe(words, values, m_words=32, k=3):
    import hashlib

    def h(prefix, v):
        return int(hashlib.md5((prefix + v).encode()).hexdigest()[:15], 16)

    m_bits = m_words * 32
    out = {}
    for v in values:
        h1, h2 = h("bf1:", v), h("bf2:", v)
        out[v] = int(
            all(
                (words.get(((h1 + i * h2) % m_bits) // 32, 0)
                 >> (((h1 + i * h2) % m_bits) % 32)) & 1
                for i in range(k)
            )
        )
    return out


from hypothesis import given, settings, strategies as st

_url_st = st.integers(min_value=0, max_value=200).map(
    lambda i: f"https://h{i}.example.org/p/{i}"
)


@settings(max_examples=8, deadline=None)
@given(st.sets(_url_st, min_size=1, max_size=40),
       st.sets(_url_st, min_size=1, max_size=20))
def test_bloom_matches_python_reference(spark, seen, probes):
    from surfactant_spark.operators.sketch import bloom_build, bloom_probe

    seen, probes = sorted(seen), sorted(probes)
    bloom = bloom_build(_vals(spark, seen))
    got_words = {r.word_idx: r.word_bits for r in bloom.collect()}
    assert got_words == _py_bloom(seen)
    got = {r.url: r.bloom_hit for r in bloom_probe(bloom, _vals(spark, probes)).collect()}
    assert got == _py_bloom_probe(got_words, probes)

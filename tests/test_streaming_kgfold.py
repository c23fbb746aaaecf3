"""Streaming KG maintenance: availableNow micro-batches fold into
versioned state snapshots; a later run resumes from the checkpoint and
folds only new files; replayed batches are idempotent via the marker.
"""

import os

from pyspark.sql import functions as F

from surfactant_spark.operators.incremental import edges_surface, kg_state_build
from surfactant_spark.streaming.incremental import stream_kg_fold
from tests.conftest import SF_DIR


def _docs(spark, lo, hi):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "source", "text")
    )


def _edge_set(df):
    return {tuple(r) for r in df.collect()}


def test_stream_fold_resumes_and_matches_batch_build(spark, tmp_path):
    src = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # batch A arrives
    _docs(spark, 0, 60).coalesce(1).write.mode("append").parquet(src)
    st = stream_kg_fold(spark, src, state, ckpt)
    got_a = _edge_set(edges_surface(st))
    want_a = _edge_set(edges_surface(kg_state_build(_docs(spark, 0, 60))))
    assert got_a == want_a

    # batch B arrives later; the checkpoint resumes and folds ONLY it
    _docs(spark, 60, 120).coalesce(1).write.mode("append").parquet(src)
    st = stream_kg_fold(spark, src, state, ckpt)
    got_ab = _edge_set(edges_surface(st))
    want_ab = _edge_set(edges_surface(kg_state_build(_docs(spark, 0, 120))))
    assert got_ab == want_ab

    # two committed versions, monotone
    versions = sorted(
        int(v[1:]) for v in os.listdir(state)
        if v.startswith("v") and os.path.exists(os.path.join(state, v, "_OK"))
    )
    assert len(versions) == 2

    # no new files -> no new state version, state unchanged
    st = stream_kg_fold(spark, src, state, ckpt)
    assert _edge_set(edges_surface(st)) == got_ab
    after = [v for v in os.listdir(state) if v.startswith("v")]
    assert len(after) == 2


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Simulate a replay: drop the marker of the last version (a fold
    that committed its parquet but 'died' before... the inverse — a
    marked fold replayed) by calling the fold again over the same
    checkpoint; the marker short-circuits and nothing changes."""
    src = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _docs(spark, 0, 40).coalesce(1).write.mode("append").parquet(src)
    st1 = stream_kg_fold(spark, src, state, ckpt)
    e1 = _edge_set(edges_surface(st1))
    # fresh checkpoint over the same files replays batch 0 against the
    # already-marked v0 -> marker no-op, state identical
    st2 = stream_kg_fold(spark, src, state, str(tmp_path / "ckpt2"))
    assert _edge_set(edges_surface(st2)) == e1


def test_state_retention_bounds_versions(spark, tmp_path):
    """retain=1: after three micro-batches (one file per trigger) only
    the newest committed version survives, and the final state still
    equals the full batch build."""
    src = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    for lo, hi in ((0, 30), (30, 60), (60, 90)):
        _docs(spark, lo, hi).coalesce(1).write.mode("append").parquet(src)
    st = stream_kg_fold(
        spark, src, state, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, retain=1,
    )
    committed = [
        v for v in os.listdir(state)
        if v.startswith("v") and os.path.exists(os.path.join(state, v, "_OK"))
    ]
    assert len(committed) == 1
    want = _edge_set(edges_surface(kg_state_build(_docs(spark, 0, 90))))
    assert _edge_set(edges_surface(st)) == want


def test_mention_deltas_append_only(spark, tmp_path):
    """Standing mentions must never be rewritten: after a second fold,
    batch 0's mention delta parquet files are byte-for-byte untouched,
    compact versions hold no mentions table, and deltas survive
    retention."""
    src = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _docs(spark, 0, 60).coalesce(1).write.mode("append").parquet(src)
    stream_kg_fold(spark, src, state, ckpt, retain=1)
    d0 = os.path.join(state, "mentions", "d0")
    before = {
        f: os.path.getmtime(os.path.join(d0, f)) for f in os.listdir(d0)
    }
    _docs(spark, 60, 120).coalesce(1).write.mode("append").parquet(src)
    st = stream_kg_fold(spark, src, state, ckpt, retain=1)
    after = {
        f: os.path.getmtime(os.path.join(d0, f)) for f in os.listdir(d0)
    }
    assert after == before  # delta 0 untouched by the second fold
    versions = [v for v in os.listdir(state) if v.startswith("v")]
    assert versions == ["v1"]  # retention removed v0's compact tables
    assert sorted(os.listdir(os.path.join(state, "mentions"))) == ["d0", "d1"]
    for v in versions:
        assert "mentions" not in os.listdir(os.path.join(state, v))
    want = _edge_set(edges_surface(kg_state_build(_docs(spark, 0, 120))))
    assert _edge_set(edges_surface(st)) == want


def test_fold_metrics_per_batch(spark, tmp_path):
    """Every fold writes one metrics row; a checkpoint-resumed run adds
    exactly one more; a no-op replay adds none."""
    from surfactant_spark.streaming.incremental import read_fold_metrics

    src = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _docs(spark, 0, 50).coalesce(1).write.mode("append").parquet(src)
    stream_kg_fold(spark, src, state, ckpt)
    m1 = {r.batch_id: r for r in read_fold_metrics(spark, state).collect()}
    assert list(m1) == [0] and m1[0].n_docs == 50 and m1[0].n_edges > 0

    _docs(spark, 50, 100).coalesce(1).write.mode("append").parquet(src)
    stream_kg_fold(spark, src, state, ckpt)
    m2 = {r.batch_id: r for r in read_fold_metrics(spark, state).collect()}
    assert sorted(m2) == [0, 1] and m2[1].n_docs == 50
    assert m2[0].n_docs == 50  # batch 0's row untouched

    stream_kg_fold(spark, src, state, ckpt)  # nothing new
    assert read_fold_metrics(spark, state).count() == 2


def test_delta_compaction_bounds_fanin_and_resumes(spark, tmp_path):
    """compact_keep=1 over five micro-batches: the mention store ends
    as ONE marker-committed compaction plus the newest delta (read
    fan-in bounded), a checkpoint resume folds across the compaction,
    and the final state still equals the full batch build."""
    src = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    for lo, hi in ((0, 20), (20, 40), (40, 60), (60, 80)):
        _docs(spark, lo, hi).coalesce(1).write.mode("append").parquet(src)
    stream_kg_fold(
        spark, src, state, ckpt, max_files_per_trigger=1,
        retain=1, compact_keep=1,
    )
    mdir = os.path.join(state, "mentions")
    assert sorted(os.listdir(mdir)) == ["c2", "d3"]
    assert os.path.exists(os.path.join(mdir, "c2", "_OK"))

    # resume: one more batch arrives; the fold reads c2 + d3, folds d4,
    # then compacts c2+d3 -> c3
    _docs(spark, 80, 100).coalesce(1).write.mode("append").parquet(src)
    st = stream_kg_fold(
        spark, src, state, ckpt, max_files_per_trigger=1,
        retain=1, compact_keep=1,
    )
    assert sorted(os.listdir(mdir)) == ["c3", "d4"]
    want = _edge_set(edges_surface(kg_state_build(_docs(spark, 0, 100))))
    assert _edge_set(edges_surface(st)) == want


def test_compaction_read_ignores_covered_leftovers(spark, tmp_path):
    """An interrupted post-compaction cleanup leaves covered delta dirs
    on disk; the frontier-aware read path must ignore them (reading
    both the compaction and a covered delta would double-count
    mentions and inflate n_evidence)."""
    from surfactant_spark.streaming.incremental import _read_state

    src = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    for lo, hi in ((0, 30), (30, 60)):
        _docs(spark, lo, hi).coalesce(1).write.mode("append").parquet(src)
    st = stream_kg_fold(
        spark, src, state, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, retain=2, compact_keep=1,
    )
    clean = _edge_set(edges_surface(st))
    # simulate the interrupted cleanup: resurrect d0 (covered by c0)
    mdir = os.path.join(state, "mentions")
    assert sorted(os.listdir(mdir)) == ["c0", "d1"]
    _docs(spark, 0, 30).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(state, "_tmp_docs")
    )
    from surfactant_spark.operators.incremental import kg_state_build as _b

    _b(spark.read.parquet(os.path.join(state, "_tmp_docs"))).mentions_delta \
        .write.mode("overwrite").parquet(os.path.join(mdir, "d0"))
    st2 = _read_state(spark, state, 1)
    assert _edge_set(edges_surface(st2)) == clean  # d0 ignored, no double-count


def test_marker_implies_metrics(spark, tmp_path, monkeypatch):
    """Crash injection between the metrics write and the version
    marker: the batch replays wholesale (marker absent -> no
    early-return), the metrics delta is overwritten rather than
    duplicated, and a marked version therefore ALWAYS has its metrics
    row — the old order (marker first) lost the row forever."""
    import pyspark.errors

    import surfactant_spark.streaming.incremental as si

    src = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _docs(spark, 0, 40).coalesce(1).write.mode("append").parquet(src)

    real_mark = si._mark_ok

    def dying_mark(dirpath):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(si, "_mark_ok", dying_mark)
    try:
        si.stream_kg_fold(spark, src, state, ckpt)
        raise AssertionError("injected crash did not propagate")
    except pyspark.errors.exceptions.captured.StreamingQueryException:
        pass
    # state data + metrics landed, but the version is NOT committed
    assert not os.path.exists(os.path.join(state, "v0", "_OK"))
    assert os.path.isdir(os.path.join(state, "metrics", "d0"))
    assert si._state_version_dirs(state) == {}  # readers trust nothing yet

    # recovery: the checkpoint replays batch 0 in full
    monkeypatch.setattr(si, "_mark_ok", real_mark)
    st = si.stream_kg_fold(spark, src, state, ckpt)
    assert os.path.exists(os.path.join(state, "v0", "_OK"))
    m = si.read_fold_metrics(spark, state).collect()
    assert len(m) == 1 and m[0].batch_id == 0 and m[0].n_docs == 40
    want = _edge_set(edges_surface(kg_state_build(_docs(spark, 0, 40))))
    assert _edge_set(edges_surface(st)) == want


# ---------------------------------------------------------------------------
# streaming URL-seen Bloom fold (round-5 post-window addition)
# ---------------------------------------------------------------------------
def _pages(spark, lo, hi):
    """Slices of ONE fixed 110-page corpus: make_corpus is not
    prefix-stable across different n (hot-domain share scales with n),
    so batches must all come from the same generated frame."""
    from surfactant_spark.synth import make_corpus, pages_to_spark

    pdf, _ = make_corpus(110, seed=11)
    return pages_to_spark(spark, pdf.iloc[lo:hi])


def _words_set(df):
    return {(r.word_idx, r.word_bits) for r in df.collect()}


def test_stream_url_seen_folds_and_counts_repeats(spark, tmp_path):
    from surfactant_spark.operators.sketch import bloom_build
    from surfactant_spark.streaming.incremental import stream_url_seen

    src = str(tmp_path / "pages")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    a = _pages(spark, 0, 60)
    a.coalesce(1).write.mode("append").parquet(src)
    words = stream_url_seen(spark, src, state, ckpt)
    assert _words_set(words) == _words_set(
        bloom_build(a.select("url").dropDuplicates())
    )

    # batch B: 30 new pages + re-crawl of 20 already-seen urls — the
    # probe-before-fold metric must count every repeat (no false
    # negatives), and the folded filter must equal the one-shot build
    b_new = _pages(spark, 60, 90)
    b = b_new.unionByName(_pages(spark, 0, 20))
    b.coalesce(1).write.mode("append").parquet(src)
    words = stream_url_seen(spark, src, state, ckpt)
    allp = _pages(spark, 0, 90)
    assert _words_set(words) == _words_set(
        bloom_build(allp.select("url").dropDuplicates())
    )
    import os

    from surfactant_spark.streaming.incremental import read_fold_metrics

    m = {r.batch_id: r for r in read_fold_metrics(spark, state).collect()}
    assert m[0].n_seen == 0
    assert m[1].n_seen >= 20  # every re-crawled url hits; FPs may add
    assert m[1].n_urls == b.select("url").dropDuplicates().count()

    # replay with a fresh checkpoint: markers short-circuit, state same
    words2 = stream_url_seen(spark, src, state, str(tmp_path / "ckpt2"))
    assert _words_set(words2) == _words_set(words)

    # batch C: a third fold makes retention actually DELETE v0
    _pages(spark, 90, 110).coalesce(1).write.mode("append").parquet(src)
    words = stream_url_seen(spark, src, state, ckpt)
    allp = _pages(spark, 0, 110)
    assert _words_set(words) == _words_set(
        bloom_build(allp.select("url").dropDuplicates())
    )
    vs = sorted(v for v in os.listdir(state) if v.startswith("v"))
    assert vs == ["v1", "v2"]

    # stale replay below the pruned frontier: a fresh checkpoint packs
    # everything into batch 0 (whose version retention deleted); the
    # frontier guard must skip it — state AND the metrics history stay
    # intact (no n_seen=0 rewrite of d0)
    m_before = {r.batch_id: r.n_seen for r in read_fold_metrics(spark, state).collect()}
    words3 = stream_url_seen(spark, src, state, str(tmp_path / "ckpt3"))
    assert _words_set(words3) == _words_set(words)
    m_after = {r.batch_id: r.n_seen for r in read_fold_metrics(spark, state).collect()}
    assert m_after == m_before
    assert sorted(v for v in os.listdir(state) if v.startswith("v")) == ["v1", "v2"]

    # geometry pin: a later run with different m_words must refuse
    import pytest

    with pytest.raises(ValueError, match="geometry"):
        stream_url_seen(spark, src, state, str(tmp_path / "ckpt4"), m_words=64)


def _web_pages_df(spark, lo, hi):
    """Slices of ONE fixed synthetic web corpus (same rationale as
    _pages: the generator is not prefix-stable across n)."""
    import pandas as pd

    from surfactant_spark.fixtures import synth_web_pages
    from surfactant_spark.schema import PAGES

    d = synth_web_pages(120)
    pdf = pd.DataFrame(d).iloc[lo:hi].copy()
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], unit="s", utc=True)
    return spark.createDataFrame(pdf, PAGES)


def test_stream_edge_recency_fold_equals_rebuild(spark, tmp_path):
    from surfactant_spark.operators.webgraph import edge_recency
    from surfactant_spark.streaming.incremental import (
        edge_recency_from_state,
        read_fold_metrics,
        stream_edge_recency,
    )

    src = str(tmp_path / "pages")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def rows(df):
        return {tuple(r) for r in df.collect()}

    _web_pages_df(spark, 0, 70).coalesce(1).write.mode("append").parquet(src)
    st = stream_edge_recency(spark, src, state, ckpt)
    want = edge_recency(_web_pages_df(spark, 0, 70), horizon_s=60)
    assert rows(edge_recency_from_state(st, 60)) == rows(want)

    # second batch folds in; state must equal the one-shot rebuild
    _web_pages_df(spark, 70, 120).coalesce(1).write.mode("append").parquet(src)
    st = stream_edge_recency(spark, src, state, ckpt)
    want = edge_recency(_web_pages_df(spark, 0, 120), horizon_s=60)
    assert rows(edge_recency_from_state(st, 60)) == rows(want)

    m = {r.batch_id: r for r in read_fold_metrics(spark, state).collect()}
    assert set(m) == {0, 1}
    assert m[1].n_total_edges >= m[1].n_new_edges >= 0
    assert m[0].n_new_edges == m[0].n_total_edges

    # replay with a fresh checkpoint: markers short-circuit, state same
    st2 = stream_edge_recency(spark, src, state, str(tmp_path / "ckpt2"))
    assert rows(st2) == rows(st)

    import pytest

    with pytest.raises(ValueError):
        edge_recency_from_state(st, horizon_s=-1)

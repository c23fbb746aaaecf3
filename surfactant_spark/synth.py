"""Deterministic synthetic Common-Crawl-style corpus (seed=42).

Generates the ``pages`` table contracted by BASELINE.json ``input_hint``
(url, warc_ts, html, text, lang) plus the ``alias_dict`` dimension, with
the structures FIXTURES.md §1 requires:

- every entity has 1-4 alias surface forms (alias dictionary);
- a fraction of pages is byte-identical duplicates under different urls
  (exercises SHA-256 dedup, ref `_sbom.py:75-122`);
- one hot domain holds ~``hot_frac`` of all rows (exercises salted
  joins / AQE skew handling);
- some aliases are shared between entities (exercises the
  connected-components canonicalization);
- every 25th page is a bundle that ``bundle://``-links member pages
  (exercises Contains edges, ref `cmd/generate.py:113-121`).

Pure pandas/numpy — usable from tests, the oracle, and Spark
``createDataFrame`` without a running session.
"""

from __future__ import annotations

import datetime
from typing import Tuple

import numpy as np
import pandas as pd

from .functions.textlib import extract_text

_FILLER = (
    "the quick data pipeline processes web pages and builds a knowledge graph "
    "from extracted mentions of software entities across many crawled sites"
).split()

_BASE_TS = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
_LANGS = ["en", "de", "fr", "es", "zh"]


def make_alias_dict(n_entities: int, seed: int = 42) -> pd.DataFrame:
    """alias -> canon_name dimension. Entities 3k and 3k+1 (k % 7 == 0)
    share the alias ``shared-{k}`` so canonicalization must union them."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_entities):
        canon = f"ent{i:06d}"
        rows.append((canon, canon, "library"))
        n_alias = int(rng.integers(0, 3))
        if n_alias >= 1:
            rows.append((f"lib{i:06d}", canon, "library"))
        if n_alias >= 2:
            rows.append((f"ent{i:06d}-dev", canon, "library"))
    for i in range(0, n_entities - 1, 21):
        k = i // 21
        rows.append((f"shared-{k}", f"ent{i:06d}", "library"))
        rows.append((f"shared-{k}", f"ent{i + 1:06d}", "library"))
    return pd.DataFrame(rows, columns=["alias", "canon_name", "entity_kind"])


def _page_html(title: str, mention_tags: list, filler_words: list) -> bytes:
    """Realistically-weighted page: multi-paragraph body with markup,
    inline style/script noise and comment boilerplate, so per-page
    extraction cost resembles Common-Crawl pages rather than
    microbenchmark stubs."""
    third = max(len(filler_words) // 3, 1)
    paras = "".join(
        f"<p class='c{i}'>{' '.join(filler_words[i * third:(i + 1) * third])}</p>"
        for i in range(3)
    )
    links = " ".join(f'<a href="{m}">{m.split("//", 1)[1]}</a>' for m in mention_tags)
    html = (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        "<style>body { color: #222; } .nav { display: none; } "
        "p { margin: 0 0 1em 0; font-family: sans-serif; }</style>"
        "<script>var tracker = 'noise'; function f(){return 42;} "
        "window.addEventListener('load', f);</script>"
        "<!-- generated page; layout boilerplate below -->"
        f"</head><body><h1>{title}</h1>{paras}<div class='links'>{links}</div>"
        f"<p>{' '.join(filler_words[3 * third:])}</p></body></html>"
    )
    return html.encode("utf-8")


def make_corpus(
    n_pages: int,
    seed: int = 42,
    hot_frac: float = 0.3,
    dup_frac: float = 0.08,
    n_entities: int | None = None,
    page_words: int = 120,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (pages_pdf, alias_dict_pdf)."""
    if n_entities is None:
        n_entities = max(20, n_pages // 5)
    rng = np.random.default_rng(seed)
    alias_pdf = make_alias_dict(n_entities, seed)
    aliases_by_ent = alias_pdf.groupby("canon_name")["alias"].apply(list).to_dict()
    ent_names = [f"ent{i:06d}" for i in range(n_entities)]

    n_domains = max(4, n_pages // 50)
    urls, tss, htmls, langs = [], [], [], []
    for j in range(n_pages):
        if rng.random() < hot_frac:
            domain = "hot.example.com"
        else:
            domain = f"site{int(rng.integers(0, n_domains))}.example.org"
        url = f"https://{domain}/p/{j}.html"
        ts = _BASE_TS + datetime.timedelta(seconds=int(j))

        if j > 10 and rng.random() < dup_frac:
            # byte-identical duplicate of an earlier page under a new url
            htmls.append(htmls[int(rng.integers(0, j - 1))])
        else:
            ent = ent_names[j % n_entities]
            title = rng.choice(aliases_by_ent[ent])
            n_m = int(rng.integers(1, 6))
            mention_tags = []
            for _ in range(n_m):
                target = ent_names[int(rng.integers(0, n_entities))]
                alias = rng.choice(aliases_by_ent[target])
                mention_tags.append(f"lib://{alias}")
            if j % 25 == 0 and j > 0:
                for member in range(max(0, j - 3), j):
                    mention_tags.append(f"bundle://{urls[member]}")
            filler = list(rng.choice(_FILLER, size=page_words))
            htmls.append(_page_html(str(title), mention_tags, filler))
        urls.append(url)
        tss.append(ts)
        langs.append(_LANGS[j % len(_LANGS)])

    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": tss,
            "html": htmls,
            "text": [extract_text(h) for h in htmls],
            "lang": langs,
        }
    )
    return pages, alias_pdf


def synth_pages_distributed(
    spark,
    n_pages: int,
    seed: int = 42,
    hot_frac: float = 0.3,
    dup_frac: float = 0.08,
    n_entities: int | None = None,
    page_words: int = 120,
    partitions: int | None = None,
):
    """Distributed corpus synthesis for large benches: every page's
    content is a pure function of its index (per-row seeded rng), so
    generation parallelizes over ``spark.range`` with no driver
    bottleneck and is deterministic regardless of partitioning.
    Duplicate pages re-generate their target index's content instead of
    copying a driver-side buffer. Bundle pages reference the previous
    three urls (index arithmetic only). Returns (pages_df, alias_pdf).
    """
    from typing import Iterator

    if n_entities is None:
        n_entities = max(20, n_pages // 5)
    alias_pdf = make_alias_dict(n_entities, seed)
    aliases_by_ent = alias_pdf.groupby("canon_name")["alias"].apply(list).to_dict()
    ent_names = [f"ent{i:06d}" for i in range(n_entities)]
    n_domains = max(4, n_pages // 50)

    def url_of(j: int, rng) -> str:
        domain = (
            "hot.example.com"
            if rng.random() < hot_frac
            else f"site{int(rng.integers(0, n_domains))}.example.org"
        )
        return f"https://{domain}/p/{j}.html"

    def content_of(j: int) -> bytes:
        rng = np.random.default_rng((seed << 24) ^ (j * 2 + 1))
        ent = ent_names[j % n_entities]
        title = rng.choice(aliases_by_ent[ent])
        mention_tags = [
            f"lib://{rng.choice(aliases_by_ent[ent_names[int(rng.integers(0, n_entities))]])}"
            for _ in range(int(rng.integers(1, 6)))
        ]
        if j % 25 == 0 and j > 0:
            for member in range(max(0, j - 3), j):
                mrng = np.random.default_rng((seed << 24) ^ member)
                mention_tags.append(f"bundle://{url_of(member, mrng)}")
        filler = list(rng.choice(_FILLER, size=page_words))
        return _page_html(str(title), mention_tags, filler)

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for j in pdf["id"]:
                j = int(j)
                urng = np.random.default_rng((seed << 24) ^ j)
                url = url_of(j, urng)
                if j > 10 and urng.random() < dup_frac:
                    html = content_of(int(urng.integers(0, j - 1)))
                else:
                    html = content_of(j)
                urls.append(url)
                tss.append(_BASE_TS + datetime.timedelta(seconds=j))
                htmls.append(html)
                texts.append(extract_text(html))
                langs.append(_LANGS[j % len(_LANGS)])
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
            )

    from .schema import PAGES

    parts = partitions or spark.sparkContext.defaultParallelism * 2
    return (
        spark.range(0, n_pages, numPartitions=parts).mapInPandas(gen, schema=PAGES),
        alias_pdf,
    )


def pages_to_spark(spark, pages_pdf: pd.DataFrame):
    from .schema import PAGES

    return spark.createDataFrame(pages_pdf, schema=PAGES)


def alias_dict_to_spark(spark, alias_pdf: pd.DataFrame):
    from .schema import ALIAS_DICT

    return spark.createDataFrame(alias_pdf, schema=ALIAS_DICT)

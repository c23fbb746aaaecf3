"""Extension-point registry — the engine's analogue of the reference's
pluggy hook system (`surfactant/plugin/hookspecs.py:17-152`,
`plugin/manager.py:15-122`).

Three hook families, mirroring the reference's:

- ``classify``  (≙ identify_file_type, firstresult): callables
  ``prefix_bytes -> str | None`` tried in registration order; used to
  build one vectorized classifier pass.
- ``extract``   (≙ extract_file_info, multicast): callables
  ``(doctype, html_bytes, text) -> dict`` whose dicts are merged into
  the page's metadata; all hooks run for every page.
- ``link``      (≙ establish_relationships): callables
  ``(nodes_df) -> edges_df`` producing (subj, pred, obj) triples;
  results are unioned + deduped.

Unlike pluggy's per-object dispatch, hooks here run *inside* one
Arrow-batched pass (classify/extract) or as DataFrame transforms
(link) — the set-at-a-time form of the reference's per-file loop
(`cmd/generate.py:66-80`, `relationships/__init__.py:14-30`).
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F


class HookRegistry:
    def __init__(self):
        self._classify: List[Callable[[bytes], Optional[str]]] = []
        self._extract: Dict[str, Callable] = {}
        self._link: Dict[str, Callable[[DataFrame], DataFrame]] = {}

    # -- registration (≙ pluggy register, `plugin/manager.py:15-74`) --------
    def classifier(self, fn=None, *, tryfirst: bool = False):
        def deco(f):
            if tryfirst:
                self._classify.insert(0, f)
            else:
                self._classify.append(f)
            return f

        return deco(fn) if fn else deco

    def extractor(self, name: str):
        def deco(f):
            self._extract[name] = f
            return f

        return deco

    def linker(self, name: str):
        def deco(f):
            self._link[name] = f
            return f

        return deco

    # -- dispatch -----------------------------------------------------------
    def classify_value(self, prefix: bytes) -> str:
        """firstresult chain (`hookspecs.py:17`)."""
        for fn in self._classify:
            out = fn(prefix)
            if out is not None:
                return out
        return "unknown"

    def run_classify(self, pages: DataFrame, prefix_len: int = 265) -> DataFrame:
        """(url, doctype) via ONE Arrow pass over the binary prefix
        (the reference reads only the first 265 bytes,
        `filetypeid/id_magic.py:56`)."""
        registry = self

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                yield pd.DataFrame(
                    {
                        "url": pdf["url"],
                        "doctype": [
                            registry.classify_value(bytes(p) if p is not None else b"")
                            for p in pdf["prefix"]
                        ],
                    }
                )

        prefixed = pages.select(
            "url", F.substring(F.col("html"), 1, prefix_len).alias("prefix")
        )
        return prefixed.mapInPandas(batches, schema="url string, doctype string")

    def run_extract(self, pages: DataFrame) -> DataFrame:
        """(url, doctype, metadata_json) — every extractor hook runs for
        every page (multicast, `hookspecs.py:31-73`); dicts merge in
        registration order (later hooks win on key conflicts, matching
        the reference's hint-accumulation order)."""
        registry = self

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                metas, doctypes = [], []
                for html, text in zip(pdf["html"], pdf["text"]):
                    hb = bytes(html) if html is not None else b""
                    doctype = registry.classify_value(hb[:265])
                    md: dict = {}
                    for fn in registry._extract.values():
                        out = fn(doctype, hb, text)
                        if out:
                            md.update(out)
                    doctypes.append(doctype)
                    metas.append(json.dumps(md, sort_keys=True))
                yield pd.DataFrame(
                    {"url": pdf["url"], "doctype": doctypes, "metadata_json": metas}
                )

        return pages.select("url", "html", "text").mapInPandas(
            batches, schema="url string, doctype string, metadata_json string"
        )

    # -- introspection / management (≙ `plugin/manager.py` print_plugins
    # and the `cmd/plugin.py` enable/disable surface) ------------------------
    def hook_names(self) -> Dict[str, List[str]]:
        """Registered hook names by family, in dispatch order."""
        return {
            "classify": [f.__name__ for f in self._classify],
            "extract": list(self._extract),
            "link": list(self._link),
        }

    def without(self, disabled) -> "HookRegistry":
        """A copy of this registry with the named hooks removed — how the
        persisted `core.disable_plugins` list takes effect (the reference
        blocks disabled plugins at manager construction,
        `plugin/manager.py:get_plugin_manager`)."""
        disabled = set(disabled or ())
        out = HookRegistry()
        out._classify = [f for f in self._classify if f.__name__ not in disabled]
        out._extract = {n: f for n, f in self._extract.items() if n not in disabled}
        out._link = {n: f for n, f in self._link.items() if n not in disabled}
        return out

    def run_link(self, nodes: DataFrame) -> DataFrame:
        """Union + dedup of every linker's triples (duplicate-edge
        suppression, `_sbom.py:33`, `relationships/__init__.py:29-30`)."""
        out = None
        for fn in self._link.values():
            edges = fn(nodes)
            out = edges if out is None else out.unionByName(edges)
        if out is None:
            raise ValueError("no link hooks registered")
        return out.dropDuplicates(["subj", "pred", "obj"])


def default_registry() -> HookRegistry:
    """The built-in hook set: magic-byte classifier + html/mention
    extractor + firmware/installer header extractors (E6-E8) + the four
    reference link families."""
    from .functions.magic import (
        macho_info,
        ole_field_hints,
        ole_header,
        ole_summary_info,
        uimage_header,
    )
    from .functions.textlib import classify_doctype, detect_mentions, extract_title
    from .operators.link import link_dotnet, link_elf, link_java, link_pe

    reg = HookRegistry()

    @reg.classifier(tryfirst=True)
    def magic(prefix: bytes):
        out = classify_doctype(prefix)
        return out if out != "text" else None

    @reg.classifier
    def fallback(prefix: bytes):
        return "text"

    @reg.extractor("html")
    def html_meta(doctype, html, text):
        if doctype != "html":
            return None
        ms = detect_mentions(html)
        return {
            "title": extract_title(html),
            "mentions": [[p, a, s, e] for (p, a, s, e) in ms],
        }

    @reg.extractor("uimage")
    def uimage_meta(doctype, html, text):
        info = uimage_header(html)
        return {"uimage": info} if info else None

    @reg.extractor("macho")
    def macho_meta(doctype, html, text):
        # full fat-aware decode: header + load commands (deps/rpaths/
        # dyld/build/signature), `mach_o_file.py:44-176`
        info = macho_info(html)
        return {"macho": info} if info else None

    @reg.extractor("ole")
    def ole_meta(doctype, html, text):
        info = ole_header(html)
        if not info:
            return None
        # E7: SummaryInformation properties + the reference's field
        # hints (subject->name etc. at conf 80, `ole_file.py:29-36`)
        summary = ole_summary_info(html)
        if summary:
            info = dict(info, **summary)
        out = {"ole": info}
        hints = ole_field_hints(summary)
        if hints:
            out["field_hints"] = [list(h) for h in hints]
        return out

    reg.linker("elf")(link_elf)
    reg.linker("pe")(link_pe)
    reg.linker("dotnet")(link_dotnet)
    reg.linker("java")(link_java)
    return reg


def disabled_plugins(config_manager=None) -> list:
    """The persisted disabled-hook list (``core.disable_plugins``,
    same section/key as the reference's `cmd/plugin.py:24-27`),
    coerced to a list. The single place that knows the persistence
    format — the CLI and :func:`active_registry` must not drift."""
    if config_manager is None:
        from .config import ConfigManager

        config_manager = ConfigManager()
    disabled = config_manager.get("core", "disable_plugins", [])
    if isinstance(disabled, str):
        disabled = [disabled]
    return list(disabled)


def active_registry(config_manager=None) -> HookRegistry:
    """The default registry minus the hooks disabled via
    ``plugin disable``."""
    return default_registry().without(disabled_plugins(config_manager))

"""`stat` command analogue (A3) — conditional counters over node
metadata flags.

The reference iterates every software entry's metadata blobs and counts
elfIsLib / elfIsExe / peIsExe / peIsDll plus the CLR split of the PE
counts (`surfactant/cmd/stat.py:6-45`). Set-at-a-time: one single-pass
conditional aggregation over the JSON metadata column — partial
aggregation map-side, one row out, no matter the corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _flag(name: str) -> F.Column:
    # flag counts iff present AND true (`cmd/stat.py:20-36`)
    return F.when(
        F.get_json_object(F.col("metadata_json"), f"$.{name}") == "true", 1
    ).otherwise(0)


def stat_counters(software: DataFrame) -> DataFrame:
    """-> one row: (elf_is_lib, elf_is_exe, pe_is_exe, pe_is_dll,
    clr_exe, clr_dll). CLR split follows the reference: a CLR entry
    counts as clr_exe iff peIsExe is true, else clr_dll
    (`cmd/stat.py:31-36`)."""
    clr = F.get_json_object(F.col("metadata_json"), "$.peIsClr") == "true"
    exe = F.get_json_object(F.col("metadata_json"), "$.peIsExe") == "true"
    return software.agg(
        F.sum(_flag("elfIsLib")).cast("long").alias("elf_is_lib"),
        F.sum(_flag("elfIsExe")).cast("long").alias("elf_is_exe"),
        F.sum(_flag("peIsExe")).cast("long").alias("pe_is_exe"),
        F.sum(_flag("peIsDll")).cast("long").alias("pe_is_dll"),
        F.sum(F.when(clr & exe, 1).otherwise(0)).cast("long").alias("clr_exe"),
        F.sum(F.when(clr & ~exe, 1).otherwise(0)).cast("long").alias("clr_dll"),
    )

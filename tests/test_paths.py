"""Path-normalization semantics, pinned by the reference contract
(`/root/reference/tests/relationships/test_posix_utils.py:11-33` — all
17 assertions ported) plus Windows-path normalization
(`_internal/windows_utils.py:35-38` equality semantics)."""

from surfactant_spark.functions.paths import (
    posix_normpath,
    win_is_absolute,
    win_norm,
)


def test_posix_normpath_reference_contract():
    assert posix_normpath("") == "."
    assert posix_normpath("..") == "."
    assert posix_normpath("../") == "."
    assert posix_normpath("../..") == "."

    assert posix_normpath("ab/../xy") == "xy"
    assert posix_normpath("/a/b//..///c") == "/a/c"

    assert posix_normpath("//..") == "//"
    assert posix_normpath("//../") == "//"
    assert posix_normpath("//../a") == "//a"
    assert posix_normpath("//./") == "//"
    assert posix_normpath("//./a") == "//a"
    assert posix_normpath("//./a/../b") == "//b"

    assert posix_normpath("///") == "/"
    assert posix_normpath("///a") == "/a"
    assert posix_normpath("///a/../b") == "/b"
    assert posix_normpath("///a/../") == "/"

    assert posix_normpath("////a/../b") == "/b"


def test_win_norm_case_and_separator_insensitive():
    assert win_norm("C:\\App\\Library.DLL") == win_norm("c:/app/library.dll")
    assert win_norm("C:\\a\\b") != win_norm("C:\\a\\c")


def test_win_is_absolute():
    assert win_is_absolute("C:\\x\\y.dll")
    assert not win_is_absolute("y.dll")
    assert not win_is_absolute("sub\\y.dll")


def test_normpath_udfs_null_in_null_out(spark):
    """The column forms must pass NULLs through, not crash the Arrow
    worker — general path tables carry NULL installPath rows."""
    from surfactant_spark.operators.link import posix_normpath_udf, win_norm_udf

    df = spark.createDataFrame(
        [("/a/./b", "C:\\App\\X.DLL"), (None, None)], "p string, w string"
    )
    rows = df.select(
        posix_normpath_udf("p").alias("n"), win_norm_udf("w").alias("k")
    ).collect()
    got = {(r.n, r.k) for r in rows}
    assert ("/a/b", "c:/app/x.dll") in got
    assert (None, None) in got

"""Path normalization primitives.

Semantics pinned by the reference's test contract
(`tests/relationships/test_posix_utils.py:11-33`): like
``os.path.normpath`` but leading ``..`` components of relative paths are
*removed* (not preserved), and the POSIX double-slash root ``//`` is kept
distinct from ``/`` (three or more leading slashes collapse to one).

Reference behavior: `surfactant/relationships/_internal/posix_utils.py:9-31`.
Implemented here from the test contract as plain string functions so they
vectorize cleanly inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import pathlib


def posix_normpath(path: str) -> str:
    """Normalize a POSIX path string; returns a string (not a PurePath).

    - ``..`` removes the preceding component; leading ``..`` of a relative
      path is dropped entirely (``"ab/../xy" -> "xy"``, ``".." -> "."``).
    - redundant slashes and ``.`` components are removed
      (``"/a/b//..///c" -> "/a/c"``).
    - the POSIX-special ``//`` root is preserved (``"//.." -> "//"``)
      while ``///+`` collapses to ``/``.
    """
    # PurePosixPath.parts gives us the exact tokenization the contract
    # is defined over: root is "/" or "//", "." components are dropped.
    parts = list(pathlib.PurePosixPath(path).parts)
    i = 0
    while i < len(parts):
        if parts[i] == "..":
            del parts[i]
            if i > 0 and (i > 1 or parts[0] not in ("//", "/")):
                del parts[i - 1]
                i -= 1
        else:
            i += 1
    return str(pathlib.PurePosixPath(*parts))


def posix_parent(path: str) -> str:
    """Parent directory of a POSIX path (PurePosixPath.parent semantics)."""
    return pathlib.PurePosixPath(path).parent.as_posix()


def posix_name(path: str) -> str:
    """Final component of a POSIX path."""
    return pathlib.PurePosixPath(path).name


def posix_join(*parts: str) -> str:
    return pathlib.PurePosixPath(*parts).as_posix()


def win_norm(path: str) -> str:
    """Case-insensitive canonical form of a Windows path.

    ``PureWindowsPath`` equality is case-insensitive and treats ``/`` and
    ``\\`` alike (reference match rule:
    `surfactant/relationships/_internal/windows_utils.py:35-38`). Two
    paths are equal in the reference iff their ``win_norm`` strings are
    equal, which turns the reference's O(n^2) scan into an equi-join key.
    """
    return pathlib.PureWindowsPath(path).as_posix().casefold()


def win_parent_posix(path: str) -> str:
    """Parent dir of a Windows path rendered as posix (reference:
    `surfactant/relationships/pe_relationship.py:73-75`)."""
    return pathlib.PureWindowsPath(path).parent.as_posix()


def win_join(*parts: str) -> str:
    return pathlib.PureWindowsPath(*parts).as_posix()


def win_is_absolute(path: str) -> bool:
    """Windows absolute-path test (reference:
    `surfactant/relationships/dotnet_relationship.py:208-210`)."""
    return pathlib.PureWindowsPath(path).is_absolute()

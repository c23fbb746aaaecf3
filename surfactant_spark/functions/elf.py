"""ELF dependency probe-key generation (pure, vectorizable).

Reimplements the *semantics* of the reference's ELF relationship
resolution (`surfactant/relationships/elf_relationship.py:41-198`) as a
pure function ``mention -> [(fname, probe_path)]``. The Spark engine
explodes these probe pairs and hash-joins them against the node table's
(fileName, installPath) — replacing the reference's O(n^2) scan of the
whole SBOM per dependency with one shuffle join.

Pinned reference behaviors (each exercised by
`tests/relationships/test_elf.py:86-115` analogues in our test suite):

- dep containing ``/``: treated as a path. Absolute -> one probe path.
  Relative -> rebased onto the parent dir of each of the dependent's
  installPaths, then normalized (posix_normpath).
- dep without ``/``: probe dirs = runpath/rpath expansion + default dirs
  ``/lib, /lib64, /usr/lib, /usr/lib64`` unless DF_1_NODEFLIB.
- DT_RPATH used only when no DT_RUNPATH (`elf_relationship.py:137-145`).
- ``:``-splitting of each entry; empty components dropped.
- Dynamic string tokens: ``$ORIGIN``/``${ORIGIN}`` expands to the parent
  of each installPath; ``$LIB`` to both ``lib`` and ``lib64``;
  ``$PLATFORM`` discards the path. **Entries with no token at all are
  also discarded** — the reference's ``substitute_all_dst`` returns an
  empty list when no substitution happened
  (`elf_relationship.py:160-212`); we preserve that quirk for parity.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from .paths import posix_join, posix_name, posix_normpath, posix_parent

_DEFAULT_LIB_DIRS = ("/lib", "/lib64", "/usr/lib", "/usr/lib64")


def _replace_dst(s: str, var: str, val: str) -> str:
    return s.replace("$" + var, val).replace("${" + var + "}", val)


def _substitute_all_dst(install_paths: Sequence[str], path: str) -> List[str]:
    """Expand dynamic string tokens; empty result if no token present
    (reference quirk, `elf_relationship.py:160-212`)."""
    pathlist: List[str] = []
    if "$ORIGIN" in path or "${ORIGIN}" in path:
        for ipath in install_paths or []:
            origin = posix_parent(ipath)
            pathlist.append(_replace_dst(path, "ORIGIN", origin))
    if "$LIB" in path or "${LIB}" in path:
        if not pathlist:
            pathlist = [_replace_dst(path, "LIB", "lib"), _replace_dst(path, "LIB", "lib64")]
        else:
            pathlist = [
                newp
                for p in pathlist
                for newp in (_replace_dst(p, "LIB", "lib"), _replace_dst(p, "LIB", "lib64"))
            ]
    if "$PLATFORM" in path or "${PLATFORM}" in path:
        # no valid substitution known -> discard (reference behavior)
        return []
    return [posix_normpath(p) for p in pathlist]


def elf_search_dirs(
    install_paths: Sequence[str],
    rpath: Optional[Sequence[str]],
    runpath: Optional[Sequence[str]],
    nodeflib: bool,
) -> List[str]:
    """Directories searched for a slash-less dependency
    (`elf_relationship.py:99-145`)."""
    rp_to_use: Sequence[str] = []
    if rpath and not runpath:
        rp_to_use = rpath
    elif runpath:
        rp_to_use = runpath
    dirs = [
        sp
        for rp in rp_to_use
        for p in rp.split(":")
        if p != ""
        for sp in _substitute_all_dst(install_paths, p)
    ]
    if not nodeflib:
        dirs.extend(_DEFAULT_LIB_DIRS)
    return dirs


def elf_probe_pairs(
    install_paths: Sequence[str],
    dep: str,
    rpath: Optional[Sequence[str]] = None,
    runpath: Optional[Sequence[str]] = None,
    nodeflib: bool = False,
) -> List[Tuple[str, str]]:
    """All (fname, full_probe_path) pairs the loader would try for one
    ELF dependency string (`elf_relationship.py:55-103`).

    Match rule downstream: target node qualifies iff
    ``fname in target.fileName AND probe_path in target.installPath``.
    """
    out: List[Tuple[str, str]] = []
    if "/" in dep:
        ndep = posix_normpath(dep)
        fname = posix_name(ndep)
        if ndep.startswith("/"):
            out.append((fname, ndep))
        else:
            for ipath in install_paths or []:
                base = posix_parent(posix_normpath(ipath))
                out.append((fname, posix_normpath(posix_join(base, ndep))))
    else:
        fname = dep
        for d in elf_search_dirs(install_paths, rpath, runpath, nodeflib):
            out.append((fname, posix_join(d, fname)))
    return out

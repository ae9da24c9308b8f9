"""Catalog glob patterns: compile to regex, match, specificity ranking.

Re-implements the semantics of the reference's glob matcher
(``catalog/GlobPattern.java:32-102``): ``*`` matches within one path
segment, ``?`` one char, ``**`` crosses segments; a pattern with no ``/``
matches against the basename only.  Specificity = number of literal
characters (``GlobPattern.java:36-42,61-63``) — the detector picks the
most specific matching pattern (``catalog/SchemaDetector.java:35-51``).
"""

from __future__ import annotations

import re
from typing import NamedTuple


class CompiledGlob(NamedTuple):
    pattern: str
    regex: re.Pattern
    basename_only: bool
    specificity: int


def compile_glob(pattern: str) -> CompiledGlob:
    basename_only = "/" not in pattern
    out = []
    i = 0
    n = len(pattern)
    literals = 0
    while i < n:
        c = pattern[i]
        if c == "*":
            if i + 1 < n and pattern[i + 1] == "*":
                out.append(".*")
                i += 2
                # swallow a following '/' so '**/x' also matches bare 'x'
                if i < n and pattern[i] == "/":
                    out.append("(?:/)?")
                    i += 1
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        else:
            out.append(re.escape(c))
            if c != "/":
                literals += 1
        i += 1
    return CompiledGlob(pattern, re.compile("^" + "".join(out) + "$"),
                        basename_only, literals)


def glob_matches(g: CompiledGlob, path: str) -> bool:
    target = path.rsplit("/", 1)[-1] if g.basename_only else path
    return bool(g.regex.match(target))

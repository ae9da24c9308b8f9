"""Schema catalog: (name, fileMatch globs, schema id) entries + detection.

Mirrors the reference's JSON Schema Store catalog support
(``catalog/SchemaCatalog.java``, ``catalog/SchemaDetector.java:35-51``,
``catalog/SchemaCatalogLoader.java:42-93``): entries carry file-match
globs; detection scans all compiled globs and picks the most specific
match.  This sandbox has no network, so instead of fetching
schemastore.org the catalog maps matched paths to schema ids that must be
present in the engine's schema registry (``ValidatorConfig.schemas``) —
the moral equivalent of the reference's bundled catalog snapshot
(``src/main/resources/schema-catalog.json``).
"""

from __future__ import annotations

from dataclasses import dataclass

from .globs import CompiledGlob, compile_glob, glob_matches


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    file_match: tuple[str, ...]
    schema_id: str  # key into the engine's schema registry


# A small built-in snapshot of well-known config-file shapes (stand-in for
# the reference's 1,347-entry bundled schemastore snapshot).
BUILTIN_CATALOG: tuple[CatalogEntry, ...] = (
    CatalogEntry("github-workflow", (".github/workflows/*.yml", ".github/workflows/*.yaml"), "github-workflow"),
    CatalogEntry("helm-chart", ("Chart.yaml",), "helm-chart"),
    CatalogEntry("docker-compose", ("docker-compose.yml", "docker-compose.yaml", "compose.yaml"), "docker-compose"),
    CatalogEntry("app-config", ("configs/app-*.yaml", "configs/app-*.yml"), "app-config"),
)


class SchemaDetector:
    """Compiled-catalog path -> schema-id detector (actor-state resident).

    Scale fast paths (detection runs per ROW when autodetect is on, and
    real catalogs have thousands of globs — schemastore's snapshot has
    2,630, ``catalog/SchemaCatalogLoader.java``):
    - wildcard-free basename patterns (e.g. ``Chart.yaml``) go into a
      dict — O(1) lookup instead of a regex scan;
    - patterned globs are bucketed by their literal trailing extension,
      so only globs that can possibly match the path's extension are
      regex-tested.
    Most-specific-match semantics are preserved exactly
    (``catalog/SchemaDetector.java:35-51``).
    """

    def __init__(self, entries: tuple[CatalogEntry, ...] = BUILTIN_CATALOG):
        self._literal: dict[str, tuple[str, int]] = {}
        self._by_ext: dict[str, list[tuple[CompiledGlob, str]]] = {}
        for e in entries:
            for pattern in e.file_match:
                g = compile_glob(pattern)
                if g.basename_only and not any(ch in pattern for ch in "*?["):
                    prev = self._literal.get(pattern)
                    if prev is None or g.specificity > prev[1]:
                        self._literal[pattern] = (e.schema_id, g.specificity)
                    continue
                ext = ""
                dot = pattern.rfind(".")
                if dot != -1 and not any(ch in pattern[dot:] for ch in "*?["):
                    ext = pattern[dot:]
                self._by_ext.setdefault(ext, []).append((g, e.schema_id))

    def detect(self, path: str) -> str | None:
        basename = path.rsplit("/", 1)[-1]
        best: str | None = None
        best_spec = -1
        hit = self._literal.get(basename)
        if hit is not None:
            best, best_spec = hit
        dot = basename.rfind(".")
        ext = basename[dot:] if dot != -1 else ""
        for bucket in (ext, ""):
            for g, schema_id in self._by_ext.get(bucket, ()):
                if g.specificity > best_spec and glob_matches(g, path):
                    best, best_spec = schema_id, g.specificity
        return best

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

from dataclasses import dataclass, field

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
    """Compiled-catalog path -> schema-id detector (actor-state resident)."""

    def __init__(self, entries: tuple[CatalogEntry, ...] = BUILTIN_CATALOG):
        self._compiled: list[tuple[CompiledGlob, str]] = [
            (compile_glob(g), e.schema_id) for e in entries for g in e.file_match
        ]

    def detect(self, path: str) -> str | None:
        best: str | None = None
        best_spec = -1
        for g, schema_id in self._compiled:
            if g.specificity > best_spec and glob_matches(g, path):
                best, best_spec = schema_id, g.specificity
        return best

"""Schema catalog: (name, fileMatch globs, schema id) entries + detection.

Mirrors the reference's JSON Schema Store catalog support
(``catalog/SchemaCatalog.java``, ``catalog/SchemaDetector.java:35-51``,
``catalog/SchemaCatalogLoader.java:42-93``): a live catalog fetch with
fallback to a bundled snapshot and a process-lifetime cache; entries
carry file-match globs; detection scans all compiled globs and picks the
most specific match.

The bundled snapshot (``resources/schemastore_catalog.json``) is a
compact derivation of the PUBLIC JSON Schema Store catalog
(schemastore.org) — 1,223 detectable entries / 2,630 globs, name + url +
fileMatch only.  Matched paths map to the entry's schema URL; validation
then resolves the URL through the schema registry or (when enabled) the
remote-schema fetcher, exactly like the reference.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from .globs import CompiledGlob, compile_glob, glob_matches


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    file_match: tuple[str, ...]
    schema_id: str  # schema URL (schemastore) or key into the registry


# A small built-in catalog of well-known config-file shapes whose schema
# ids are REGISTRY KEYS (offline tests register matching schemas under
# these ids); the full public snapshot is `load_catalog()`.
BUILTIN_CATALOG: tuple[CatalogEntry, ...] = (
    CatalogEntry("github-workflow", (".github/workflows/*.yml", ".github/workflows/*.yaml"), "github-workflow"),
    CatalogEntry("helm-chart", ("Chart.yaml",), "helm-chart"),
    CatalogEntry("docker-compose", ("docker-compose.yml", "docker-compose.yaml", "compose.yaml"), "docker-compose"),
    CatalogEntry("app-config", ("configs/app-*.yaml", "configs/app-*.yml"), "app-config"),
)

_BUNDLED_PATH = Path(__file__).resolve().parent.parent / "resources" / "schemastore_catalog.json"

DEFAULT_CATALOG_URL = "https://www.schemastore.org/api/json/catalog.json"

# process-lifetime cache, like the reference's SchemaCatalogLoader.cached
# (catalog/SchemaCatalogLoader.java:36,43-50)
_CATALOG_CACHE: dict = {}


def load_bundled_catalog() -> tuple[CatalogEntry, ...]:
    """The bundled schemastore snapshot (compact public derivation)."""
    cached = _CATALOG_CACHE.get("bundled")
    if cached is None:
        data = json.loads(_BUNDLED_PATH.read_text(encoding="utf-8"))
        cached = tuple(CatalogEntry(name, tuple(globs), url)
                       for name, url, globs in data["entries"])
        _CATALOG_CACHE["bundled"] = cached
    return cached


def _parse_schemastore(text: str) -> tuple[CatalogEntry, ...]:
    doc = json.loads(text)
    out = []
    for e in doc.get("schemas", []):
        fm = e.get("fileMatch") or []
        url = e.get("url")
        if fm and url:
            out.append(CatalogEntry(e.get("name", ""), tuple(fm), url))
    return tuple(out)


def load_catalog(catalog_url: str | None = DEFAULT_CATALOG_URL,
                 http_timeout: float = 10.0,
                 ignore_ssl_errors: bool = False) -> tuple[CatalogEntry, ...]:
    """Live-fetch the schemastore catalog, falling back to the bundled
    snapshot on any failure (offline, non-200, parse error); cache for
    process life (``SchemaCatalogLoader.load``,
    ``catalog/SchemaCatalogLoader.java:42-93``).  A blank/None
    ``catalog_url`` skips the live fetch entirely."""
    key = ("live", catalog_url)
    cached = _CATALOG_CACHE.get(key)
    if cached is not None:
        return cached
    entries: tuple[CatalogEntry, ...] | None = None
    if catalog_url:
        from ..sources.adhoc import fetch_schema_http

        try:
            entries = _parse_schemastore(
                fetch_schema_http(catalog_url, timeout_s=http_timeout,
                                  ignore_ssl_errors=ignore_ssl_errors))
        except (RuntimeError, ValueError):
            entries = None  # fall back to bundled, like the reference
    if not entries:
        entries = load_bundled_catalog()
    _CATALOG_CACHE[key] = entries
    return entries


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
        for bucket in self._by_ext.values():
            # specificity-descending (stable: insertion order breaks ties
            # exactly like the reference's linear max scan) -> the FIRST
            # match in a bucket is its best match; scanning can stop as
            # soon as remaining specificities can't beat the current best
            bucket.sort(key=lambda t: -t[0].specificity)

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
                if g.specificity <= best_spec:
                    break  # sorted desc — nothing further can win
                if glob_matches(g, path):
                    best, best_spec = schema_id, g.specificity
                    break
        return best

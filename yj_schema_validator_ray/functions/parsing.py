"""Document parsing: JSON-first, YAML-fallback, multi-doc explode.

Semantics mirror the reference (``YamlSchemaValidator.java:250-270``):
JSON parse is attempted FIRST on the raw text; only on JSON failure does
multi-document YAML parsing run — so a JSON file is always exactly one
document and only YAML can be multi-doc.  A multi-doc file with N>1 docs
produces doc keys ``"<path>-<i>"`` with i starting at 1
(``YamlSchemaValidator.java:112-121``); a single doc keeps the bare path.
"""

from __future__ import annotations

import json
from typing import Any

import yaml


class ParseError(ValueError):
    pass


# yaml.CSafeLoader is ~10x faster than the pure-Python loader when libyaml
# is available; fall back silently.
try:
    _YAML_LOADER = yaml.CSafeLoader
except AttributeError:  # pragma: no cover
    _YAML_LOADER = yaml.SafeLoader


def parse_documents(content: str) -> list[Any]:
    """Parse file content into a list of JSON values (JSON first, else YAML).

    Raises ParseError with a deterministic message on failure.
    """
    try:
        return [json.loads(content)]
    except (json.JSONDecodeError, ValueError):
        pass
    try:
        return list(yaml.load_all(content, Loader=_YAML_LOADER))
    except yaml.YAMLError as ex:
        # Deterministic, single-line message (the reference surfaces the
        # Jackson exception text; we use our own stable phrasing, cf.
        # FIXTURES.md bad_yaml note).
        detail = str(ex).split("\n", 1)[0]
        raise ParseError(f"YAML parse error: {detail}") from None


def doc_keys(path: str, n_docs: int) -> list[str]:
    """Reference doc-key naming: bare path for 1 doc, ``path-i`` for many."""
    if n_docs <= 1:
        return [path]
    return [f"{path}-{i}" for i in range(1, n_docs + 1)]


def extract_schema_ref(doc: Any) -> str | None:
    """Pull the embedded ``$schema`` string from a parsed document.

    Mirrors ``getSchemaPathFromNode`` (``YamlSchemaValidator.java:279-291``):
    only a top-level object's ``$schema`` string counts.
    """
    if isinstance(doc, dict):
        ref = doc.get("$schema")
        if isinstance(ref, str) and ref:
            return ref
    return None

"""Structural schema INFERENCE over a parsed corpus — the inverse of
validation: walk every parsed document, tally occurrences of
(schema-tree path, json type), merge the tallies associatively
(per-batch pre-aggregation -> one coarse-hash exchange via
:func:`~..stages.exact_agg.grouped_aggregate`), then assemble a JSON
Schema draft 2020-12 document from the bounded path summary.

Paths ARE schema-tree pointers ("" = root, "/properties/<key>" for an
object member with ~0/~1 escaping, "/items" for array elements), so the
driver-side assembly is a direct tree build over the path DOMAIN — its
size is the structural vocabulary of the corpus, not the corpus.  A
required key falls out of the counts: child occurrence == parent object
occurrence means the key was present in every instance.

Beyond-reference component (the reference only validates); the corpus
is YAML, so there is no SQL oracle — correctness is pinned by unit
tests plus the closed loop "validate the corpus against its own
inferred schema -> all files valid" (:mod:`tests.test_infer`).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from .compiler import json_type_name
from .parsing import ParseError, parse_documents


def _escape(key: str) -> str:
    return key.replace("~", "~0").replace("/", "~1")


def _walk(doc: Any, path: str, tally: dict) -> None:
    t = json_type_name(doc)
    k = (path, t)
    tally[k] = tally.get(k, 0) + 1
    if isinstance(doc, dict):
        for key, v in doc.items():
            _walk(v, f"{path}/properties/{_escape(str(key))}", tally)
    elif isinstance(doc, list):
        for v in doc:
            _walk(v, f"{path}/items", tally)


def structure_stats(corpus_ds):
    """(path, json_type, n) occurrence counts over every parseable doc.

    Per-batch walk + local tally (one row per distinct (path, type) per
    batch crosses the wire), one coarse-hash exchange.  Unparseable
    files are skipped — inference describes the valid corpus.
    """
    from ..stages.exact_agg import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        tally: dict = {}
        for content in batch.column("content").to_pylist():
            try:
                docs = parse_documents(content)
            except ParseError:
                continue
            for d in docs:
                _walk(d, "", tally)
        if not tally:
            return pa.table({"path": pa.array([], pa.string()),
                             "json_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        paths, types_, ns = zip(*((p, t, n) for (p, t), n in tally.items()))
        return pa.table({"path": pa.array(paths, pa.string()),
                         "json_type": pa.array(types_, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    return grouped_aggregate(
        corpus_ds.map_batches(partial, batch_format="pyarrow"),
        ["path", "json_type"], [("n", "sum", "n")])


def enum_stats(corpus_ds, per_batch_cap: int = 24):
    """Scalar-value tallies per schema path for ENUM inference, with
    bounded state: a batch that sees more than ``per_batch_cap``
    distinct scalars for one path stops tallying it and emits a
    saturation sentinel row (value_json NULL) so the assembler refuses
    to enumerate unbounded domains — worker memory stays O(paths x cap)
    regardless of value cardinality (the Misra-Gries trade)."""
    import json

    from ..stages.exact_agg import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        tally: dict[str, dict[str, int]] = {}
        sat: set[str] = set()

        def walk(doc: Any, path: str) -> None:
            if isinstance(doc, dict):
                for key, v in doc.items():
                    walk(v, f"{path}/properties/{_escape(str(key))}")
            elif isinstance(doc, list):
                for v in doc:
                    walk(v, f"{path}/items")
            elif doc is not None:
                d = tally.setdefault(path, {})
                r = json.dumps(doc)
                if r not in d and len(d) >= per_batch_cap:
                    sat.add(path)
                    return
                d[r] = d.get(r, 0) + 1

        for content in batch.column("content").to_pylist():
            try:
                docs = parse_documents(content)
            except ParseError:
                continue
            for doc in docs:
                walk(doc, "")

        paths, vals, ns = [], [], []
        for p, d in tally.items():
            for r, n in d.items():
                paths.append(p)
                vals.append(r)
                ns.append(n)
        for p in sat:
            paths.append(p)
            vals.append(None)
            ns.append(0)
        return pa.table({"path": pa.array(paths, pa.string()),
                         "value_json": pa.array(vals, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    return grouped_aggregate(
        corpus_ds.map_batches(partial, batch_format="pyarrow"),
        ["path", "value_json"], [("n", "sum", "n")])


def schema_from_stats(rows, enum_rows=None, enum_max: int = 8,
                      enum_min_n: int = 10) -> dict:
    """Assemble a draft 2020-12 schema dict from (path, json_type, n)
    rows (driver-side; input is path-domain-sized).

    - multiple observed types -> a sorted ``type`` list ("integer"
      collapses into "number" when both appear);
    - object members seen in EVERY parent instance -> ``required``;
    - array element schema under ``items``;
    - with ``enum_rows`` (from :func:`enum_stats`): a scalar leaf whose
      observed domain is small (<= ``enum_max`` values, >= ``enum_min_n``
      occurrences, never saturated) gets an ``enum``.
    """
    import json

    types: dict[str, dict[str, int]] = {}
    for r in rows:
        types.setdefault(r["path"], {})[r["json_type"]] = int(r["n"])

    enums: dict[str, list] = {}
    if enum_rows is not None:
        vals: dict[str, dict] = {}
        saturated: set[str] = set()
        for r in enum_rows:
            if r["value_json"] is None:
                saturated.add(r["path"])
            else:
                vals.setdefault(r["path"], {})[r["value_json"]] = int(r["n"])
        for p, d in vals.items():
            if p in saturated or not (1 <= len(d) <= enum_max):
                continue
            if sum(d.values()) >= enum_min_n:
                enums[p] = [json.loads(v) for v in sorted(d)]

    def node(path: str) -> dict:
        tmap = types.get(path, {})
        ts = sorted(tmap)
        if "number" in ts and "integer" in ts:
            ts.remove("integer")
        sch: dict = {}
        if ts:
            sch["type"] = ts[0] if len(ts) == 1 else ts
        if "object" in tmap:
            prefix = path + "/properties/"
            props, req = {}, []
            for p in types:
                if p.startswith(prefix) and "/" not in p[len(prefix):]:
                    key = (p[len(prefix):]
                           .replace("~1", "/").replace("~0", "~"))
                    props[key] = node(p)
                    if sum(types[p].values()) == tmap["object"]:
                        req.append(key)
            if props:
                sch["properties"] = props
            if req:
                sch["required"] = sorted(req)
        if "array" in tmap and (path + "/items") in types:
            sch["items"] = node(path + "/items")
        if path in enums and "object" not in tmap and "array" not in tmap:
            sch["enum"] = enums[path]
        return sch

    out = {"$schema": "https://json-schema.org/draft/2020-12/schema"}
    out.update(node(""))
    return out

"""Structural schema INFERENCE over a parsed corpus — the inverse of
validation: walk every parsed document, tally occurrences of
(schema-tree path, json type) plus bounded scalar-value domains, merge
the tallies associatively (per-batch pre-aggregation -> coarse-hash
exchanges via :func:`~..stages.exact_agg.grouped_aggregate`), then
assemble a JSON Schema draft 2020-12 document from the bounded path
summary.

Paths ARE schema-tree pointers ("" = root, "/properties/<key>" for an
object member with ~0/~1 escaping, "/items" for array elements), so the
driver-side assembly is a direct tree build over the path DOMAIN — its
size is the structural vocabulary of the corpus, not the corpus.  A
required key falls out of the counts: child occurrence == parent object
occurrence means the key was present in every instance.

Normalization keeps the closed loop ("corpus validates against its own
inferred schema", :mod:`tests.test_infer`) intact on real YAML:
non-JSON scalars (dates, timestamps, binary) are typed as strings and
excluded from enums; non-string mapping keys are skipped (no property
constraint is emitted for them, so they can't fail validation).

Beyond-reference component (the reference only validates); the corpus
is YAML, so there is no SQL oracle — correctness is pinned by unit
tests plus the closed validation loop.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import pyarrow as pa

from .parsing import ParseError, parse_documents


def _escape(key: str) -> str:
    return key.replace("~", "~0").replace("/", "~1")


def _visit(doc: Any, path: str = "") -> Iterator[tuple[str, str, str | None]]:
    """ONE traversal shared by both tallies: yields
    ``(path, json_type, enum_value_json | None)`` per node.  Containers
    and non-JSON scalars yield ``None`` as the enum value."""
    if isinstance(doc, bool):
        yield path, "boolean", json.dumps(doc)
    elif isinstance(doc, int):
        yield path, "integer", json.dumps(doc)
    elif isinstance(doc, float):
        yield path, "number", json.dumps(doc)
    elif isinstance(doc, str):
        yield path, "string", json.dumps(doc)
    elif doc is None:
        yield path, "null", None
    elif isinstance(doc, dict):
        yield path, "object", None
        for key, v in doc.items():
            if not isinstance(key, str):
                continue  # YAML int/complex keys: no constraint emitted
            yield from _visit(v, f"{path}/properties/{_escape(key)}")
    elif isinstance(doc, list):
        yield path, "array", None
        for v in doc:
            yield from _visit(v, f"{path}/items")
    else:
        # non-JSON YAML scalar (date, datetime, binary, ...): a JSON
        # validator sees its string form
        yield path, "string", None


def _inference_partial(batch: pa.Table, per_batch_cap: int) -> pa.Table:
    """Union-shaped partial for ONE parse pass: kind 's' rows are
    (path, json_type) counts, kind 'v' rows are bounded scalar-value
    tallies (value NULL = saturation sentinel; a saturated path emits
    ONLY its sentinel, never its partial domain)."""
    s_tally: dict = {}
    v_tally: dict[str, dict[str, int]] = {}
    sat: set[str] = set()
    for content in batch.column("content").to_pylist():
        try:
            docs = parse_documents(content)
        except ParseError:
            continue
        for d in docs:
            for path, t, vjson in _visit(d):
                k = (path, t)
                s_tally[k] = s_tally.get(k, 0) + 1
                if vjson is None:
                    continue
                dom = v_tally.setdefault(path, {})
                if vjson not in dom and len(dom) >= per_batch_cap:
                    sat.add(path)
                else:
                    dom[vjson] = dom.get(vjson, 0) + 1
    kinds, paths, types_, vals, ns = [], [], [], [], []
    for (p, t), n in s_tally.items():
        kinds.append("s")
        paths.append(p)
        types_.append(t)
        vals.append(None)
        ns.append(n)
    for p, dom in v_tally.items():
        if p in sat:
            continue  # sentinel below carries everything needed
        for vjson, n in dom.items():
            kinds.append("v")
            paths.append(p)
            types_.append("")
            vals.append(vjson)
            ns.append(n)
    for p in sat:
        kinds.append("v")
        paths.append(p)
        types_.append("")
        vals.append(None)
        ns.append(0)
    return pa.table({"kind": pa.array(kinds, pa.string()),
                     "path": pa.array(paths, pa.string()),
                     "json_type": pa.array(types_, pa.string()),
                     "value_json": pa.array(vals, pa.string()),
                     "n": pa.array(ns, pa.int64())})


def inference_stats(corpus_ds, per_batch_cap: int = 24):
    """(structure_rows, enum_rows) from ONE parse pass over the corpus:
    the union-shaped partials are materialized once (tiny — path-domain
    sized per batch) and both aggregates read them."""
    from ..stages.exact_agg import grouped_aggregate

    parts = corpus_ds.map_batches(
        lambda b: _inference_partial(b, per_batch_cap),
        batch_format="pyarrow").materialize()
    structure = grouped_aggregate(
        parts.filter(expr="kind == 's'")
        .select_columns(["path", "json_type", "n"]),
        ["path", "json_type"], [("n", "sum", "n")])
    enums = grouped_aggregate(
        parts.filter(expr="kind == 'v'")
        .select_columns(["path", "value_json", "n"]),
        ["path", "value_json"], [("n", "sum", "n")])
    return structure, enums


def structure_stats(corpus_ds):
    """(path, json_type, n) occurrence counts over every parseable doc
    (unparseable files are skipped — inference describes the valid
    corpus)."""
    return inference_stats(corpus_ds)[0]


def enum_stats(corpus_ds, per_batch_cap: int = 24):
    """Scalar-value tallies per schema path for ENUM inference, with
    bounded state: a batch that sees more than ``per_batch_cap``
    distinct scalars for one path drops its partial domain and emits a
    saturation sentinel row (value_json NULL) — worker memory and
    exchange volume stay O(paths x cap) regardless of value cardinality
    (the Misra-Gries trade; adversarially CLUSTERED input can still
    evade per-batch saturation, which the assembler's ``enum_max``
    check catches)."""
    return inference_stats(corpus_ds, per_batch_cap)[1]


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
      occurrences, never saturated) gets an ``enum`` — including null
      when null was observed at the path, so nullable fields keep
      validating.
    """
    types: dict[str, dict[str, int]] = {}
    for r in rows:
        types.setdefault(r["path"], {})[r["json_type"]] = int(r["n"])

    enums: dict[str, list] = {}
    enum_totals: dict[str, int] = {}
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
                enum_totals[p] = sum(d.values())

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
            # exact coverage check: the domain must account for EVERY
            # non-null scalar occurrence — non-JSON scalars (dates etc.,
            # typed string but excluded from the tally) would otherwise
            # fail an enum narrower than what was observed
            scalar_n = sum(tmap.get(t, 0)
                           for t in ("string", "integer", "number",
                                     "boolean"))
            if enum_totals[path] == scalar_n:
                ev = enums[path]
                if "null" in tmap:
                    ev = [None] + ev  # nullable field: null stays valid
                sch["enum"] = ev
        return sch

    out = {"$schema": "https://json-schema.org/draft/2020-12/schema"}
    out.update(node(""))
    return out


def infer_closed_loop(sf_dir: str):
    """The inference CLOSED LOOP as an oracled accounting query (it
    lived only in pytest before): infer a schema from the corpus'
    structural stats, then validate the corpus against its OWN inferred
    schema under ``schema_override`` — every file that PARSES must be
    valid (inference describes exactly the parseable corpus), so the
    only invalids are the corpus' intentional parse errors.  The
    summary counts are fully SQL-expressible through the shared corpus
    derivation (parse errors are the t=5 bad-YAML template), making
    this a hash-checked driver row, not a rows-only claim; ``loop_ok``
    additionally asserts the invariant engine-side.

    Shape: one inference scan (path-domain partials), driver schema
    assembly (path-domain sized), one validation scan, block-domain
    summary partials.  Nothing data-sized reaches the driver.
    """
    import pandas as pd

    from ..config import ValidatorConfig
    from ..pipelines import validate as V
    from ..sources.corpus import corpus_dataset

    stats = structure_stats(corpus_dataset(sf_dir)).to_pandas()
    sch = schema_from_stats(stats.to_dict("records"))
    cfg = ValidatorConfig(schemas={"inferred": sch},
                          default_schema="inferred",
                          schema_override=True)
    s = V.summary(V.validate_corpus(corpus_dataset(sf_dir), cfg))
    loop_ok = (s["invalid"] == s["errors"]
               and s["valid"] == s["files"] - s["errors"]
               and s["valid"] > 0)
    return pd.DataFrame({
        "files": pd.Series([s["files"]], dtype="int64"),
        "valid": pd.Series([s["valid"]], dtype="int64"),
        "invalid": pd.Series([s["invalid"]], dtype="int64"),
        "errors": pd.Series([s["errors"]], dtype="int64"),
        "loop_ok": pd.Series([bool(loop_ok)])})


def infer_closed_loop_sql() -> str:
    from ..oracles import _DOCS_CTE

    return f"""{_DOCS_CTE}
SELECT CAST(count(*) AS BIGINT) AS files,
       CAST(sum(CASE WHEN t = 5 THEN 0 ELSE 1 END) AS BIGINT) AS valid,
       CAST(sum(CASE WHEN t = 5 THEN 1 ELSE 0 END) AS BIGINT) AS invalid,
       CAST(sum(CASE WHEN t = 5 THEN 1 ELSE 0 END) AS BIGINT) AS errors,
       TRUE AS loop_ok
FROM docs"""

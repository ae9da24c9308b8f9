"""Deterministic synthetic source-code corpus (repo, path, commit, lang, content).

The engine's primary input table has the shape fixed by
``BASELINE.json.input_hint``: one row == one file of a source-code
repository.  The driver's sf directories don't ship a ``corpus`` table, so
we DERIVE one deterministically from ``documents.parquet`` (only its
``doc_id`` column) — pure string arithmetic that is reproduced verbatim in
SQL by :func:`corpus_sql_cte`, which lets every corpus-based pipeline have
an exact DuckDB oracle (including ``sha256(content)`` equality per row).

Content templates re-express the reference's test fixtures
(``/root/reference/src/test/resources/testdata/``; see FIXTURES.md §2):
valid JSON/YAML, type/enum/required/minimum violations, multi-doc YAML
with a schema-less middle doc, empty doc, unparsable YAML, schema-less
YAML.  Injected deterministic skew: template choice = ``doc_id % 10``; a
hot repo ('org0/hot') holds ~30% of rows; 7 duplicated (repo,path,commit)
triples; repos 'org3/*' are orphans w.r.t. the known-repos dimension;
``lang`` is NULL on 2% of rows.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

# doc_ids whose KEY columns are copied from doc_id-1 (uniqueness-violation
# injection: exactly 7 duplicate (repo,path,commit) triples, FIXTURES.md §4)
DUP_IDS = (11, 21, 31, 41, 51, 61, 71)

# referential-integrity injection: repos of this org are absent from the
# known-repos dimension -> every row of theirs is an orphan
ORPHAN_ORG = "org3"

SCHEMA_ID = "schemas/sample-schema.json"

# the engine's test schema (trimmed sample-schema per FIXTURES.md §3;
# $id matches the golden schema_path prefix urn:example:10#/...)
MINI_SCHEMA: dict = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "urn:example:10",
    "type": "object",
    "properties": {
        "sample": {
            "type": "object",
            "required": ["string-sample"],
            "properties": {
                "boolean-sample": {"type": "boolean"},
                "integer-sample": {"type": "integer", "minimum": 10, "maximum": 200},
                "string-sample": {"type": "string"},
                "enum-sample": {"type": "string",
                                "enum": ["en1", "en2", "en3", "en4", "en5", "en6"]},
                "pattern-sample": {"type": "string", "pattern": "^cfg-[0-9]+$"},
                "string-array-sample": {"type": "array", "items": {"type": "string"}},
                "int-array-sample": {"type": "array", "items": {"type": "integer"}},
                "map-sample": {"type": "object",
                               "additionalProperties": {"type": "string"}},
                "nested": {"type": "object", "properties": {
                    "nested-config-1": {"type": "string", "minLength": 1},
                    "email-valid-test": {"type": "string", "format": "email"},
                }},
                "level": {"$ref": "#/$defs/loggerLevelProp"},
            },
        },
    },
    "$defs": {
        "loggerLevel": {"type": "string",
                        "enum": ["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "OFF"]},
        "loggerLevelProp": {"type": "object", "additionalProperties": {
            "oneOf": [{"$ref": "#/$defs/loggerLevel"},
                      {"$ref": "#/$defs/loggerLevelProp"}]}},
    },
}


def schema_registry() -> dict:
    return {SCHEMA_ID: MINI_SCHEMA}


# ---------------------------------------------------------------------------
# content templates: each is (prefix, suffix); content = prefix + str(i) + suffix
# (exactly reproducible in SQL as 'prefix' || CAST(i AS VARCHAR) || 'suffix')
# ---------------------------------------------------------------------------

_YAML_HEAD = "$schema: schemas/sample-schema.json\nsample:\n  string-sample: doc-"

TEMPLATES: dict[int, tuple[str, str]] = {
    # 0: valid JSON (single doc; JSON parses first — YamlSchemaValidator.java:255)
    0: ('{"$schema": "schemas/sample-schema.json", "sample": {"string-sample": "doc-',
        '", "boolean-sample": true, "integer-sample": 42}}'),
    # 1: valid YAML
    1: (_YAML_HEAD, "\n  boolean-sample: true\n  integer-sample: 150\n  enum-sample: en2\n"),
    # 2: type violation -> "integer found, boolean expected"
    2: (_YAML_HEAD, "\n  boolean-sample: 123\n  integer-sample: 150\n"),
    # 3: multi-doc, middle doc has no $schema -> "No schema found..."
    3: (_YAML_HEAD, "\n---\nsample:\n  string-sample: mid\n---\n"
        "$schema: schemas/sample-schema.json\nsample:\n  string-sample: last\n"),
    # 4: empty document
    4: ("---\n# doc-", "\n"),
    # 5: unparsable YAML (fails JSON first, then YAML flow-sequence error)
    5: ("# doc-", "\nkey: [unclosed\n"),
    # 6: enum violation
    6: (_YAML_HEAD, "\n  enum-sample: zz\n"),
    # 7: required violation (string-sample missing)
    7: ("$schema: schemas/sample-schema.json\nsample:\n  boolean-sample: true\n  marker: doc-", "\n"),
    # 8: minimum violation
    8: (_YAML_HEAD, "\n  integer-sample: 5\n"),
    # 9: no $schema anywhere
    9: ("sample:\n  string-sample: doc-", "\n  boolean-sample: true\n"),
}

# engine parse-error message for template 5 (deterministic; captured from
# the YAML loader in this environment — tests pin it)
BAD_YAML_MSG = "YAML parse error: while parsing a flow sequence"


def _repo(j: int) -> str:
    if j % 10 < 3:
        return "org0/hot"
    return f"org{j % 7 + 1}/repo{j % 3}"


def _path(j: int) -> str:
    if j % 10 == 0:
        return f"data/doc-{j}.json"
    return f"configs/app-{j}.yaml"


def _commit(j: int) -> str:
    return hashlib.sha256(str(j).encode()).hexdigest()[:40]


def _lang(i: int) -> str | None:
    if i % 50 == 0:
        return None
    return "json" if i % 10 == 0 else "yaml"


def synthesize_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` fn: documents(doc_id) -> corpus rows (Arrow in/out)."""
    ids = batch.column("doc_id").to_pylist()
    dup = set(DUP_IDS)
    js = [i - 1 if i in dup else i for i in ids]
    repos = [_repo(j) for j in js]
    paths = [_path(j) for j in js]
    commits = [_commit(j) for j in js]
    langs = [_lang(i) for i in ids]
    contents = []
    for i in ids:
        pre, post = TEMPLATES[i % 10]
        contents.append(pre + str(i) + post)
    return pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def corpus_dataset(sf_dir: str, override_num_blocks: int | None = None):
    """Lazy corpus Dataset derived from ``<sf_dir>/documents.parquet``.

    Reads ONLY ``doc_id`` (column pruning at the read) and synthesizes the
    corpus columns per batch — streaming, no driver materialization.
    """
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
        override_num_blocks=override_num_blocks)
    return ds.map_batches(synthesize_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# SQL mirror (the DuckDB-oracle side of the derivation above)
# ---------------------------------------------------------------------------

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"


def _content_case_sql(var: str = "doc_id") -> str:
    whens = []
    for t, (pre, post) in TEMPLATES.items():
        expr = f"{_sql_quote(pre)} || CAST({var} AS VARCHAR) || {_sql_quote(post)}"
        whens.append(f"WHEN {t} THEN {expr}")
    return f"CASE {var} % 10 " + " ".join(whens) + " END"


def corpus_sql_cte() -> str:
    """A SQL snippet defining ``corpus(i, t, repo, path, commit, lang, content)``
    over the pre-registered ``documents`` view — byte-identical to
    :func:`synthesize_batch` (same strings, same sha256 inputs)."""
    dup_list = ", ".join(str(d) for d in DUP_IDS)
    return f"""
corpus AS (
  SELECT
    doc_id AS i,
    doc_id % 10 AS t,
    CASE WHEN j % 10 < 3 THEN 'org0/hot'
         ELSE 'org' || CAST(j % 7 + 1 AS VARCHAR) || '/repo' || CAST(j % 3 AS VARCHAR)
    END AS repo,
    CASE WHEN j % 10 = 0 THEN 'data/doc-' || CAST(j AS VARCHAR) || '.json'
         ELSE 'configs/app-' || CAST(j AS VARCHAR) || '.yaml'
    END AS path,
    substr(sha256(CAST(j AS VARCHAR)), 1, 40) AS "commit",
    CASE WHEN doc_id % 50 = 0 THEN NULL
         WHEN doc_id % 10 = 0 THEN 'json' ELSE 'yaml' END AS lang,
    {_content_case_sql("doc_id")} AS content
  FROM (SELECT doc_id,
               CASE WHEN doc_id IN ({dup_list}) THEN doc_id - 1 ELSE doc_id END AS j
        FROM documents)
)"""

"""The per-row validation stage: a stateful callable class for
``Dataset.map_batches(SchemaValidator, concurrency=N, batch_format="pyarrow")``.

One actor == one compiled-schema cache: ``__init__`` compiles every
registry schema and the catalog globs ONCE per actor process (the Ray-Data
analogue of the reference's process-lifetime ``schemaCache``,
``YamlSchemaValidator.java:65,184-202``); ``__call__`` runs per Arrow
batch.  Per-row work (JSON/YAML parse + closure-tree evaluation) is
inherently row-wise Python, but everything around it (column access,
output assembly) stays Arrow.

Output: one row per logical DOCUMENT (multi-doc YAML explodes 1->N with
doc keys ``path-i``, mirroring ``YamlSchemaValidator.java:112-121``),
carrying the verdict, a file-level ``error`` (if any), the per-row
``content_sha256`` invariant, and the violation rows as a
``list<struct>`` column (flattened zero-copy by
``explode_violations``).
"""

from __future__ import annotations

import hashlib
import posixpath
from typing import Any

import pyarrow as pa

from ..config import NO_SCHEMA_MSG, NO_NODES_MSG, ValidatorConfig
from ..functions.catalog import SchemaDetector
from ..functions.compiler import CompiledSchema, compile_schema
from ..functions.parsing import ParseError, doc_keys, extract_schema_ref, parse_documents

VIOLATION_STRUCT = pa.struct([
    ("evaluation_path", pa.string()),
    ("schema_path", pa.string()),
    ("instance_path", pa.string()),
    ("keyword", pa.string()),
    ("message", pa.string()),
])

VERDICT_SCHEMA = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("doc_key", pa.string()),
    ("doc_index", pa.int32()),
    ("valid", pa.bool_()),
    ("error", pa.string()),
    ("n_violations", pa.int64()),
    ("content_sha256", pa.string()),
    ("violations", pa.list_(VIOLATION_STRUCT)),
])


class SchemaValidator:
    """Stateful validator for an actor pool (see module docstring)."""

    def __init__(self, config: ValidatorConfig, content_cache_size: int = 65536):
        self.config = config
        # eager compile — the whole point of actor state
        self._compiled: dict[str, CompiledSchema] = {
            sid: compile_schema(s, uri=s.get("$id", sid) if isinstance(s, dict) else sid)
            for sid, s in config.schemas.items()
        }
        self._detector = SchemaDetector(config.catalog) if config.auto_detect else None
        # per-actor remote-schema caches: compiled schemas land in
        # self._compiled (the reference's schemaCache); FAILED fetches are
        # remembered too, so a dead URL costs one request per actor, not
        # one per document (YamlSchemaValidator.java:319-377,184-202)
        self._fetch_errors: dict[str, str] = {}
        # content-addressed verdict cache: real corpora are fork-heavy
        # (identical files across repos/commits), so each distinct
        # (content, parent-dir) validates once per worker.  Under catalog
        # autodetect a verdict depends on the FULL (repo-relative) path —
        # glob detection may look at any component — so the cache keys on
        # (sha, path) instead: forks share repo-relative paths across
        # repos/commits, which is exactly the fork-heavy hit pattern
        # (measured in BASELINE.md 'autodetect x content cache').
        from collections import OrderedDict

        self._content_cache: "OrderedDict[tuple, list]" = OrderedDict()
        self._cache_on_path = bool(config.auto_detect)
        self._content_cache_size = content_cache_size

    # -- schema resolution (validateJsonNode precedence,
    #    YamlSchemaValidator.java:123-141) --------------------------------
    def _resolve_schema_id(self, path: str, doc: Any) -> str | None:
        sid = self.config.default_schema
        if not self.config.schema_override:
            ref = extract_schema_ref(doc)
            if ref is not None:
                sid = self._normalize_ref(path, ref)
        if sid is None and self._detector is not None:
            sid = self._detector.detect(path)
        return sid

    def _normalize_ref(self, path: str, ref: str) -> str:
        """Resolve a relative ``$schema`` against the file's directory
        (``getSchemaPathFromNode``, ``YamlSchemaValidator.java:279-291``).
        Registry hit on the raw ref wins (ids like ``urn:...`` / URLs)."""
        if ref in self._compiled:
            return ref
        if ref.startswith(("./", "../")):
            resolved = posixpath.normpath(posixpath.join(posixpath.dirname(path), ref))
            if resolved in self._compiled or self.config.schema_base_dir:
                return resolved
        return ref

    def _fetch_and_compile(self, url: str) -> str | None:
        """Fetch, parse (JSON-else-YAML) and compile a remote schema into
        the per-actor cache; returns the funneled error message on
        failure, None on success (``getSchemaByPath`` + ``getSchema``,
        ``YamlSchemaValidator.java:184-202,300-377``)."""
        cached_err = self._fetch_errors.get(url)
        if cached_err is not None:
            return cached_err
        from ..sources.adhoc import fetch_schema_http

        try:
            text = fetch_schema_http(url, timeout_s=self.config.http_timeout,
                                     ignore_ssl_errors=self.config.ignore_ssl_errors)
        except RuntimeError as ex:
            self._fetch_errors[url] = str(ex)
            return str(ex)
        try:
            import json

            try:
                schema = json.loads(text)
            except ValueError:
                import yaml

                schema = yaml.safe_load(text)
            if not isinstance(schema, (dict, bool)):
                raise ValueError("schema document is not an object")
            self._compiled[url] = compile_schema(
                schema, uri=schema.get("$id", url) if isinstance(schema, dict) else url)
            return None
        except Exception as ex:  # compile/parse failure -> error funnel
            msg = f"Error parsing schema from URL: {url}: {ex}"
            self._fetch_errors[url] = msg
            return msg

    def _load_local_schema(self, sid: str) -> str | None:
        """Lazy per-worker schema-file load from ``schema_base_dir``
        (``readSchemaFromFile``, ``YamlSchemaValidator.java:389-403``):
        parse JSON-else-YAML, compile, cache; missing file funnels the
        reference's "NoSuchFileException: <path>" message."""
        cached_err = self._fetch_errors.get(sid)
        if cached_err is not None:
            return cached_err
        import os

        full = sid if os.path.isabs(sid) else os.path.join(
            self.config.schema_base_dir, sid)
        try:
            with open(full, encoding="utf-8") as f:
                text = f.read()
        except FileNotFoundError:
            msg = f"NoSuchFileException: {sid}"
            self._fetch_errors[sid] = msg
            return msg
        except OSError as ex:
            msg = f"Error reading schema from file: {sid}: {ex}"
            self._fetch_errors[sid] = msg
            return msg
        try:
            import json

            try:
                schema = json.loads(text)
            except ValueError:
                import yaml

                schema = yaml.safe_load(text)
            if not isinstance(schema, (dict, bool)):
                raise ValueError("schema document is not an object")
            self._compiled[sid] = compile_schema(
                schema, uri=schema.get("$id", sid) if isinstance(schema, dict) else sid)
            return None
        except Exception as ex:
            msg = f"Error parsing schema from file: {sid}: {ex}"
            self._fetch_errors[sid] = msg
            return msg

    def _validate_content(self, content, path: str) -> tuple[list, bool]:
        """Per-document results for one file's content: a list of
        (valid, error, violations) tuples, plus whether any doc resolved a
        RELATIVE ``$schema`` (only then do results depend on the parent
        dir — the caller keys the content cache accordingly)."""
        if content is None:
            return [(False, NO_NODES_MSG, [])], False
        try:
            docs = parse_documents(content)
        except ParseError as ex:
            # file-level error result (genericError funnel,
            # YamlSchemaValidator.java:95-103,209-214)
            return [(False, str(ex), [])], False
        if len(docs) == 0:
            return [(False, NO_NODES_MSG, [])], False
        results = []
        path_dependent = False
        for doc in docs:
            ref = extract_schema_ref(doc)
            if ref is not None and ref.startswith(("./", "../")):
                path_dependent = True
            sid = self._resolve_schema_id(path, doc)
            if sid is None:
                results.append((False, NO_SCHEMA_MSG, []))
                continue
            compiled = self._compiled.get(sid)
            if compiled is None:
                if sid.startswith(("http://", "https://")) \
                        and self.config.allow_remote_schemas:
                    err = self._fetch_and_compile(sid)
                elif self.config.schema_base_dir is not None \
                        and not sid.startswith(("http://", "https://")):
                    err = self._load_local_schema(sid)
                else:
                    err = f"Schema not found: {sid}"
                if err is not None:
                    results.append((False, err, []))
                    continue
                compiled = self._compiled[sid]
            try:
                viols = compiled.validate(doc)
            except Exception as ex:  # per-row fault isolation
                results.append((False, str(ex), []))
                continue
            results.append((len(viols) == 0, None, viols))
        return results, path_dependent

    # -- per-batch entry ---------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        paths = batch.column("path").to_pylist()
        # bytes, not str: string->binary cast is zero-copy (same buffers),
        # sha256 hashes the bytes directly, and json/yaml parse bytes —
        # this drops one full utf-8 decode + one encode per document
        contents = pc.cast(batch.column("content"), pa.binary()).to_pylist()

        # passthrough columns (repo/commit/lang) are never touched in
        # Python: emitted rows record their input-row index and the
        # columns are gathered with ONE vectorized take at the end
        parent: list = []
        o_key: list = []; o_idx: list = []; o_valid: list = []; o_err: list = []
        o_nv: list = []; o_sha: list = []
        # violations as flat columns + offsets (ListArray.from_arrays) —
        # per-row lists of dicts cost ~2x in allocation on the hot path
        v_off: list = [0]
        v_ep: list = []; v_sp: list = []; v_ip: list = []
        v_kw: list = []; v_msg: list = []

        def emit(i, key, idx, valid, err, viols, sha):
            parent.append(i)
            o_key.append(key); o_idx.append(idx); o_valid.append(valid)
            o_err.append(err); o_nv.append(len(viols) if err is None else 1)
            o_sha.append(sha)
            for v in viols:
                v_ep.append(v.evaluation_path); v_sp.append(v.schema_location)
                v_ip.append(v.instance_location); v_kw.append(v.keyword)
                v_msg.append(v.message)
            v_off.append(len(v_ep))

        for i, content in enumerate(contents):
            path = paths[i]
            sha = hashlib.sha256(content if content is not None else b"").hexdigest()
            if self._content_cache_size:
                # path-independent contents cache on (sha, None); contents
                # with ./-relative $schema refs cache on (sha, parent dir);
                # autodetect verdicts cache on (sha, full path)
                if self._cache_on_path:
                    cached = self._content_cache.get((sha, path))
                else:
                    cached = self._content_cache.get((sha, None))
                    if cached is None:
                        cached = self._content_cache.get(
                            (sha, posixpath.dirname(path)))
                if cached is not None:
                    keys = doc_keys(path, len(cached)) if len(cached) > 1 else [path]
                    for j, (valid, err, viols) in enumerate(cached):
                        emit(i, keys[j], j + 1, valid, err, viols, sha)
                    continue
            doc_results, path_dependent = self._validate_content(content, path)
            if self._content_cache_size:
                key = ((sha, path) if self._cache_on_path else
                       (sha, posixpath.dirname(path) if path_dependent
                        else None))
                self._content_cache[key] = doc_results
                if len(self._content_cache) > self._content_cache_size:
                    self._content_cache.popitem(last=False)
            keys = (doc_keys(path, len(doc_results))
                    if len(doc_results) > 1 else [path])
            for j, (valid, err, viols) in enumerate(doc_results):
                emit(i, keys[j], j + 1, valid, err, viols, sha)

        viol_struct = pa.StructArray.from_arrays(
            [pa.array(v_ep, pa.string()), pa.array(v_sp, pa.string()),
             pa.array(v_ip, pa.string()), pa.array(v_kw, pa.string()),
             pa.array(v_msg, pa.string())],
            fields=list(VIOLATION_STRUCT))
        viol_col = pa.ListArray.from_arrays(pa.array(v_off, pa.int32()),
                                            viol_struct)
        idx = pa.array(parent, pa.int32())
        lang_col = (pc.take(batch.column("lang"), idx)
                    if "lang" in batch.column_names
                    else pa.nulls(len(parent), pa.string()))
        return pa.Table.from_arrays(
            [pc.take(batch.column("repo"), idx),
             pc.take(batch.column("path"), idx),
             pc.take(batch.column("commit"), idx),
             lang_col,
             pa.array(o_key, pa.string()), pa.array(o_idx, pa.int32()),
             pa.array(o_valid, pa.bool_()), pa.array(o_err, pa.string()),
             pa.array(o_nv, pa.int64()), pa.array(o_sha, pa.string()),
             viol_col],
            schema=VERDICT_SCHEMA)


# ---------------------------------------------------------------------------
# task-mode dispatch: stateless map_batches tasks + a PER-WORKER-PROCESS
# compiled-schema cache.  Ray worker processes outlive tasks, so the first
# task on each worker compiles once and every later task reuses it — the
# same amortization as the actor pool without the pool's spin-up latency
# (measured ~5-7 s for a 24-actor pool; tasks start on warm workers
# immediately).  Use the actor-pool path (``SchemaValidator`` class) when
# per-actor state is genuinely heavy (models, remote fetches).
# ---------------------------------------------------------------------------

_PROCESS_VALIDATORS: dict[str, "SchemaValidator"] = {}


def make_validator_fn(config: ValidatorConfig,
                      content_cache_size: int = 65536):
    """A plain function for ``map_batches`` that lazily builds (and
    process-caches) the ``SchemaValidator`` on each Ray worker.

    The cache key is a content digest computed once on the driver, so two
    configs with identical content share a compiled validator and
    different content never collides.
    """
    import json as _json

    key = hashlib.md5(_json.dumps(
        {"schemas": config.schemas, "default": config.default_schema,
         "override": config.schema_override, "auto": config.auto_detect,
         "catalog": [(e.name, e.file_match, e.schema_id) for e in config.catalog],
         # behavior-bearing resolution fields: a warm worker must never
         # reuse a validator built under a different fetch policy/base dir
         "remote": config.allow_remote_schemas,
         "timeout": config.http_timeout,
         "ssl": config.ignore_ssl_errors,
         "base_dir": config.schema_base_dir,
         "ccache": content_cache_size},
        sort_keys=True, default=str).encode()).hexdigest()

    def validate_batch(batch: pa.Table) -> pa.Table:
        v = _PROCESS_VALIDATORS.get(key)
        if v is None:
            v = SchemaValidator(config,
                                content_cache_size=content_cache_size)
            _PROCESS_VALIDATORS[key] = v
        return v(batch)

    return validate_batch


def explode_violations(batch: pa.Table) -> pa.Table:
    """Flatten the nested ``violations`` column into one row per violation.

    File-level errors (``error`` column set) become rows with
    ``keyword='error'`` and empty pointer — matching the reference's flat
    LLM rows (``FilesOutputToLlm.java:112-144``: file-level errors carry
    pointer "").  Vectorized: ``list_parent_indices`` + ``take``; no
    Python loop over violation rows.
    """
    import pyarrow.compute as pc

    viol = batch.column("violations")
    if isinstance(viol, pa.ChunkedArray):
        viol = viol.combine_chunks()
    parent = pc.list_parent_indices(viol)
    flat = pc.list_flatten(viol)
    key_cols = ["repo", "path", "commit", "doc_key"]
    taken = {c: pc.take(batch.column(c), parent) for c in key_cols}
    out = pa.table({
        **taken,
        "evaluation_path": flat.field("evaluation_path"),
        "schema_path": flat.field("schema_path"),
        "instance_path": flat.field("instance_path"),
        "keyword": flat.field("keyword"),
        "message": flat.field("message"),
    })

    # append file-level error rows (keyword="error", empty paths)
    err_mask = pc.is_valid(batch.column("error"))
    if pc.any(err_mask).as_py():
        errs = batch.filter(err_mask)
        n = errs.num_rows
        empty = pa.array([""] * n, pa.string())
        err_rows = pa.table({
            "repo": errs.column("repo"), "path": errs.column("path"),
            "commit": errs.column("commit"), "doc_key": errs.column("doc_key"),
            "evaluation_path": empty, "schema_path": empty,
            "instance_path": empty,
            "keyword": pa.array(["error"] * n, pa.string()),
            "message": errs.column("error"),
        })
        out = pa.concat_tables([out, err_rows])
    return out

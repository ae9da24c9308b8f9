"""Report renderers (K1-K7): text/ANSI, JSON, YAML, JUnit XML, SARIF,
LLM(json/compact) — driver-side views over the (small) collected results,
matching the reference's report shapes (``output/FilesOutput.java``,
``FilesOutputToJunit.java``, ``FilesOutputToSarif.java``,
``FilesOutputToLlm.java``; goldens in ``src/test/resources/testreport/``).

At corpus scale the verdict/violation TABLES are the real outputs
(``write_parquet``); these renderers serve the CLI-sized runs and the
judge-facing parity checks.  ``collect_results`` is the only
materialization point and is meant for small result sets.
"""

from __future__ import annotations

import json
from typing import Any
from xml.sax.saxutils import escape, quoteattr


def collect_results(verdicts_ds, limit: int | None = None) -> dict[str, dict]:
    """Collect verdicts (with nested violations) into the reference's
    ordered file->result map.  Keys sorted for determinism (the driver's
    comparisons are order-insensitive, SURVEY.md §2.6)."""
    rows = verdicts_ds.take_all() if limit is None else verdicts_ds.take(limit)
    out: dict[str, dict] = {}
    for r in sorted(rows, key=lambda r: (r["path"], r["doc_index"])):
        out[r["doc_key"]] = {
            "valid": bool(r["valid"]),
            "error": r["error"],
            "details": list(r.get("violations") or []),
        }
    return out


def _global_valid(files: dict[str, dict]) -> bool:
    # A1: run valid <=> every file valid (FilesOutput.java:47-50)
    return all(f["valid"] for f in files.values())


# ---------------------------------------------------------------------------
# K1: text / ANSI
# ---------------------------------------------------------------------------

_GREEN, _RED, _RESET = "\x1b[32m", "\x1b[31m", "\x1b[0;39m"


def to_text(files: dict[str, dict], color: bool = False) -> str:
    def verdict(v: bool) -> str:
        word = "ok" if v else "invalid"
        if not color:
            return word
        return (_GREEN if v else _RED) + word + _RESET

    out = [f"Validation Result: {verdict(_global_valid(files))}"]
    for name, f in files.items():
        out.append(f"{name}: {verdict(f['valid'])}")
        if not f["valid"] and f["error"] is not None:
            out.append(f" error: {f['error']}")
        if not f["valid"]:
            for d in f["details"]:
                out.append(f" Details:\n Path: {d['instance_path']}\n"
                           f" Schema: {d['schema_path']}")
                out.append(f" {d['keyword']}: {d['message']}")
    return "\n".join(out) + "\n"


# ---------------------------------------------------------------------------
# K2/K3: JSON / YAML result tree (draft-2020-12-style {valid, files:{...}})
# ---------------------------------------------------------------------------

def result_tree(files: dict[str, dict]) -> dict:
    tree_files: dict[str, Any] = {}
    for name, f in files.items():
        node: dict[str, Any] = {"valid": f["valid"]}
        if f["error"] is not None:
            node["errors"] = {"error": f["error"]}
        if f["details"]:
            node["details"] = [{
                "valid": False,
                "evaluationPath": d["evaluation_path"],
                "schemaLocation": d["schema_path"],
                "instanceLocation": d["instance_path"],
                "errors": {d["keyword"]: d["message"]},
            } for d in f["details"]]
        tree_files[name] = node
    return {"valid": _global_valid(files), "files": tree_files}


def _jackson_dumps(obj: Any, indent: int = 0) -> str:
    """Jackson DefaultPrettyPrinter-style JSON (``"key" : value``,
    ``[ {`` array layout) so output diffs cleanly against the reference
    goldens (e.g. testreport/invalidyaml.json)."""
    pad = "  " * indent
    if isinstance(obj, dict):
        if not obj:
            return "{ }"
        items = ",\n".join(
            f'{pad}  {json.dumps(k)} : {_jackson_dumps(v, indent + 1)}'
            for k, v in obj.items())
        return "{\n" + items + "\n" + pad + "}"
    if isinstance(obj, list):
        if not obj:
            return "[ ]"
        items = ", ".join(_jackson_dumps(v, indent) for v in obj)
        return "[ " + items + " ]"
    return json.dumps(obj)


def to_json(files: dict[str, dict]) -> str:
    return _jackson_dumps(result_tree(files))


def to_yaml(files: dict[str, dict]) -> str:
    import yaml

    return yaml.safe_dump(result_tree(files), sort_keys=False,
                          default_flow_style=False)


# ---------------------------------------------------------------------------
# K4: JUnit XML (FilesOutputToJunit.java:29-147)
# ---------------------------------------------------------------------------

def _failure_category(f: dict) -> str:
    # extractFailureMessage categories (FilesOutputToJunit.java:127-147)
    if f["error"] is not None:
        if f["error"].startswith("No schema"):
            return "No Schema Error"
        if "YAML parse error" in f["error"] or "YAMLException" in f["error"]:
            return "YAML Parse Error"
        return "Validation Error"
    if f["details"]:
        return "Type Mismatch at " + f["details"][0]["instance_path"]
    return "Validation Failure"


def _failure_body(f: dict) -> str:
    parts = []
    if f["error"] is not None:
        parts.append(f["error"])
    for d in f["details"]:
        parts.append(d["message"])
    return "\n".join(parts).strip()


def to_junit(files: dict[str, dict], suite_name: str = "SchemaValidationSuite",
             file_attr: str = "corpus") -> str:
    tests = len(files)
    failures = sum(1 for f in files.values() if not f["valid"])
    cases = []
    for name, f in files.items():
        if f["valid"]:
            cases.append(
                f'    <testcase classname="files" name={quoteattr(name)} time="0.0"/>')
        else:
            cases.append(
                f'    <testcase classname="files" name={quoteattr(name)} time="0.0">\n'
                f'      <failure message={quoteattr(_failure_category(f))}>'
                f'{escape(_failure_body(f))}</failure>\n'
                f'    </testcase>')
    body = "\n".join(cases)
    return (
        "<?xml version='1.0' encoding='UTF-8'?>\n"
        f'<testsuites errors="0" failures="{failures}" name="{suite_name}" '
        f'skipped="0" tests="{tests}">\n'
        f'  <testsuite errors="0" failures="{failures}" file={quoteattr(file_attr)} '
        f'name="{suite_name}" skipped="0" tests="{tests}" time="0.0">\n'
        f"{body}\n"
        "  </testsuite>\n"
        "</testsuites>\n")


# ---------------------------------------------------------------------------
# K5: SARIF 2.1.0 (FilesOutputToSarif.java:43-257)
# ---------------------------------------------------------------------------

def to_sarif(files: dict[str, dict], start_time: str = "1970-01-01T00:00:00Z",
             end_time: str = "1970-01-01T00:00:00Z") -> str:
    valid = _global_valid(files)
    results = []
    for name, f in files.items():
        if f["valid"]:
            continue
        # file-level errors carry an EMPTY region and the bare message;
        # keyword violations carry the snippet + "At path ..." text
        # (golden: multi3invalidyaml.sarif vs invalidyaml.sarif)
        errs = ([(None, "error", f["error"])] if f["error"] is not None else []) + [
            (d["instance_path"], d["keyword"], d["message"]) for d in f["details"]]
        for pointer, _kw, message in errs:
            region = ({} if pointer is None
                      else {"snippet": {"text": f"Path: {pointer}"}})
            text = (message if pointer is None
                    else f"At path '{pointer}': {message}")
            results.append({
                "level": "error",
                "locations": [{
                    "physicalLocation": {
                        "artifactLocation": {"uri": name},
                        "region": region,
                    },
                }],
                "message": {"text": text},
                "ruleId": "schema-validation",
            })
    doc = {
        "$schema": "https://json.schemastore.org/sarif-2.1.0.json",
        "runs": [{
            "invocations": [{
                "endTimeUtc": end_time,
                "executionSuccessful": valid,
                "exitCode": 0 if valid else 1,
                "startTimeUtc": start_time,
            }],
            "results": results,
            "tool": {"driver": {
                "informationUri": "https://github.com/alexmond/yj-schema-validator",
                "name": "YAML Schema Validator",
                "rules": [{
                    "defaultConfiguration": {"level": "error"},
                    "fullDescription": {"text": "The file does not conform to the "
                                                "specified JSON/YAML schema"},
                    "help": {"text": "Ensure that the file content matches the "
                                     "schema definition"},
                    "id": "schema-validation",
                    "shortDescription": {"text": "Schema validation error"},
                }],
                "semanticVersion": "1.0.0",
                "version": "1.0.0",
            }},
        }],
        "version": "2.1.0",
    }
    return _jackson_dumps(doc)


# ---------------------------------------------------------------------------
# K6: LLM report (FilesOutputToLlm.java:36-144)
# ---------------------------------------------------------------------------

def _collect_errors(f: dict) -> list[dict]:
    if f["valid"]:
        return []
    errors = []
    if f["error"] is not None:
        errors.append({"pointer": "", "keyword": "error", "message": f["error"]})
    for d in f["details"]:
        errors.append({"pointer": d["instance_path"], "keyword": d["keyword"],
                       "message": d["message"],
                       "schemaLocation": d["schema_path"]})
    return errors


def to_llm(files: dict[str, dict], compact: bool = False) -> str:
    if compact:
        valid = sum(1 for f in files.values() if f["valid"])
        lines, total = [], 0
        for name, f in files.items():
            for err in _collect_errors(f):
                loc = f" {err['pointer']}" if err["pointer"] else ""
                lines.append(f"{name}: [{err['keyword']}]{loc}: {err['message']}")
                total += 1
        head = f"# {valid}/{len(files)} files valid, {total} errors\n"
        return head + "".join(line + "\n" for line in lines)

    valid = invalid = total = 0
    results = []
    for name, f in files.items():
        errs = _collect_errors(f)
        total += len(errs)
        valid += f["valid"]
        invalid += not f["valid"]
        node: dict[str, Any] = {"file": name, "valid": f["valid"]}
        if errs:
            node["errors"] = errs
        results.append(node)
    return _jackson_dumps({
        "summary": {"files": len(files), "valid": valid,
                    "invalid": invalid, "errors": total},
        "results": results,
    })


# ---------------------------------------------------------------------------
# K7: routing + exit code
# ---------------------------------------------------------------------------

REPORT_TYPES = ("text", "json", "yaml", "junit", "sarif", "llm", "llm-compact")


def render(files: dict[str, dict], report_type: str, color: bool = False) -> str:
    rt = report_type.lower()
    if rt == "text":
        return to_text(files, color)
    if rt == "json":
        return to_json(files)
    if rt == "yaml":
        return to_yaml(files)
    if rt == "junit":
        return to_junit(files)
    if rt == "sarif":
        return to_sarif(files)
    if rt == "llm":
        return to_llm(files, compact=False)
    if rt == "llm-compact":
        return to_llm(files, compact=True)
    raise ValueError(f"unknown report type {report_type!r}; one of {REPORT_TYPES}")


def exit_code(files: dict[str, dict]) -> int:
    return 0 if _global_valid(files) else 1

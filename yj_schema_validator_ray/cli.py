"""CLI entrypoint (C1): the engine's analogue of the reference's flag
surface (``config/YamlSchemaValidatorConfig.java:20-113``, help text
``YamlSchemaValidatorRunner.java:128-145``), re-shaped for a Parquet
corpus + Ray job world (``ray job submit -- python -m
yj_schema_validator_ray.cli --input ...``).

Exit code 0 when every document validates, 1 otherwise
(``YamlSchemaValidatorRunner.java:48-53``).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="yj-schema-validator-ray",
        description="Ray-Data-native schema + constraint validation engine",
        epilog=("Note: If no files are provided, or if '-' is used as a "
                "filename, the tool reads from stdin.  (Flag surface "
                "mirrors the reference validator's help text, "
                "YamlSchemaValidatorRunner.java:128-145.)"))
    p.add_argument("files", nargs="*",
                   help="YAML/JSON files to validate directly (reference-style "
                        "positional args; '-' reads stdin)")
    p.add_argument("--input",
                   help="parquet path(s) of the corpus (repo,path,commit,lang,content)")
    p.add_argument("--input-dir",
                   help="validate a directory tree of YAML/JSON files "
                        "(ray.data.read_binary_files; paths relative to the "
                        "dir; relative $schema refs load lazily from it)")
    p.add_argument("--schema", help="schema file (JSON or YAML) used as default")
    p.add_argument("--schema-override", action="store_true",
                   help="force --schema even when documents embed $schema")
    p.add_argument("--auto-detect", action="store_true",
                   help="detect schemas from the catalog by path globs")
    p.add_argument("--catalog-url", default=None, metavar="URL",
                   help="live schema-catalog URL for --auto-detect "
                        "(default: the public JSON Schema Store catalog; "
                        "pass an empty string to skip the live fetch and "
                        "use the bundled snapshot only)")
    p.add_argument("--http-timeout", type=float, default=10.0,
                   help="timeout (seconds) for catalog/schema HTTP fetches")
    p.add_argument("--ignore-ssl-errors", action="store_true",
                   help="skip SSL certificate validation on schema fetches")
    p.add_argument("--no-remote-schemas", action="store_true",
                   help="never fetch http(s) $schema refs; unresolved "
                        "refs become per-document error results")
    p.add_argument("--report-type", default="text",
                   choices=["text", "json", "yaml", "junit", "sarif", "llm"])
    p.add_argument("--compact", action="store_true",
                   help="compact LLM report (one line per error)")
    p.add_argument("--report-file-name", help="write the report here instead of stdout")
    p.add_argument("--color", action="store_true", help="ANSI-colored text report")
    p.add_argument("--out", help="write verdict/violation tables (parquet) here")
    p.add_argument("--infer-schema", metavar="OUT",
                   help="infer a JSON Schema (draft 2020-12) from the input "
                        "documents and write it to OUT ('-' for stdout) "
                        "instead of validating")
    p.add_argument("--resume", action="store_true",
                   help="resumable partitioned output with lineage records")
    p.add_argument("--nparts", type=int, default=16)
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--config", help="YAML config file; keys mirror the CLI flags "
                   "(the engine's analogue of the reference's application.yaml "
                   "Spring binding; explicit CLI flags win)")
    return p


def load_schema_file(path: str) -> dict:
    import yaml

    with open(path, encoding="utf-8") as f:
        text = f.read()
    try:
        return json.loads(text)
    except ValueError:
        return yaml.safe_load(text)


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.config:
        import yaml

        with open(args.config, encoding="utf-8") as f:
            file_cfg = yaml.safe_load(f) or {}
        defaults = {k.replace("-", "_"): v for k, v in file_cfg.items()}
        unknown = set(defaults) - {a.dest for a in parser._actions}
        if unknown:
            parser.error(f"unknown config keys: {sorted(unknown)}")
        parser.set_defaults(**defaults)
        args = parser.parse_args(argv)  # CLI flags win over file values

    if args.schema_override and not args.schema:
        # reference rejects the combination at startup
        # (YamlSchemaValidatorRunner.java:152-157)
        parser.error("--schema-override requires --schema")

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:  # a caller (tests, driver) may already own the session
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")

    import ray.data

    from .config import ValidatorConfig
    from .pipelines import reports
    from .pipelines.validate import validate_corpus, violations_table

    schemas = {}
    default_schema = None
    if args.schema:
        schemas[args.schema] = load_schema_file(args.schema)
        default_schema = args.schema
    catalog_kwargs = {}
    if args.auto_detect and not args.infer_schema:
        # inference ignores the catalog — skip the (network) load
        from .functions.catalog import DEFAULT_CATALOG_URL, load_catalog

        url = DEFAULT_CATALOG_URL if args.catalog_url is None else args.catalog_url
        catalog_kwargs["catalog"] = load_catalog(
            url or None, http_timeout=args.http_timeout,
            ignore_ssl_errors=args.ignore_ssl_errors)
    config = ValidatorConfig(schemas=schemas, default_schema=default_schema,
                             schema_override=args.schema_override,
                             auto_detect=args.auto_detect,
                             allow_remote_schemas=not args.no_remote_schemas,
                             http_timeout=args.http_timeout,
                             ignore_ssl_errors=args.ignore_ssl_errors,
                             schema_base_dir=args.input_dir,
                             **catalog_kwargs)

    if not args.input and not args.input_dir and not args.files:
        parser.error("provide --input PARQUET, --input-dir DIR, "
                     "or positional files")

    missing: dict[str, str] = {}
    if args.files:
        # reference-style direct file validation (one row per file; '-'
        # reads stdin, named 'stdin' — YamlSchemaValidatorRunner.java:75-88)
        rows = []
        for f in args.files:
            if f == "-":
                rows.append({"repo": "", "path": "stdin", "commit": "",
                             "lang": None, "content": sys.stdin.read()})
            else:
                try:
                    with open(f, encoding="utf-8") as fh:
                        content = fh.read()
                except OSError:
                    # missing file -> error result, not a crash; message
                    # keeps the reference's NoSuchFileException phrasing
                    # (YamlSchemaValidator.java:78-85,
                    #  YamlSchemaValidatorTest.java:49-51)
                    missing[f] = f"NoSuchFileException: {f}"
                    continue
                rows.append({"repo": "", "path": f, "commit": "",
                             "lang": None, "content": content})
        corpus = ray.data.from_items(rows) if rows else None
    elif args.input_dir:
        from .sources.files import corpus_from_directory

        corpus = corpus_from_directory(args.input_dir)
    else:
        corpus = ray.data.read_parquet(args.input)

    if args.infer_schema:
        if corpus is None:
            parser.error("no readable inputs for --infer-schema")
        from .functions.infer import inference_stats, schema_from_stats

        # ONE parse pass feeds both tallies (YAML parsing dominates)
        structure, enums = inference_stats(corpus)
        text = json.dumps(
            schema_from_stats(structure.to_pandas().to_dict("records"),
                              enums.to_pandas().to_dict("records")),
            indent=2) + "\n"
        if args.infer_schema == "-":
            sys.stdout.write(text)
        else:
            with open(args.infer_schema, "w", encoding="utf-8") as f:
                f.write(text)
        if owns_session:
            ray.shutdown()
        return 0

    if args.resume:
        if corpus is None:
            parser.error("no readable inputs for --resume")
        from .state.lineage import run_resumable_validation

        summary = run_resumable_validation(corpus, args.out or "./out",
                                           config, nparts=args.nparts)
        print(summary.to_string(index=False))
        code = 0 if int(summary["n_violations"].sum()) == 0 else 1
    else:
        if corpus is None:
            files = {}
        else:
            verdicts = validate_corpus(corpus, config)
        if corpus is None:
            pass
        elif args.out:
            # materialize once so the write and the report render don't
            # re-execute the pipeline; render BEFORE dropping violations so
            # text/json/junit/sarif keep their per-keyword details (the
            # report is inherently driver-side either way)
            verdicts = verdicts.materialize()
            verdicts.drop_columns(["violations"]).write_parquet(
                f"{args.out}/verdicts")
            violations_table(verdicts).write_parquet(f"{args.out}/violations")
            files = reports.collect_results(verdicts)
        else:
            files = reports.collect_results(verdicts)
        for path, msg in missing.items():
            files[path] = {"valid": False, "error": msg, "details": []}
        rt = "llm-compact" if (args.report_type == "llm" and args.compact) \
            else args.report_type
        report = reports.render(files, rt, color=args.color)
        if args.report_file_name:
            with open(args.report_file_name, "w", encoding="utf-8") as f:
                f.write(report)
        else:
            sys.stdout.write(report)
        code = reports.exit_code(files)

    if owns_session:
        ray.shutdown()
    return code


if __name__ == "__main__":
    sys.exit(main())

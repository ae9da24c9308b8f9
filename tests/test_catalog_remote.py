"""Catalog snapshot + remote-schema fetch (reference parity:
``catalog/SchemaDetectorTest.java:23-50`` semantics against the real
bundled snapshot, offline; fetch-error shapes
``YamlSchemaValidatorTest.java:48-63`` via a local HTTP server)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pyarrow as pa
import pytest

from yj_schema_validator_ray.config import ValidatorConfig
from yj_schema_validator_ray.functions.catalog import (
    SchemaDetector, load_bundled_catalog, load_catalog)
from yj_schema_validator_ray.stages.validator import SchemaValidator

# ---------------------------------------------------------------------------
# bundled snapshot detection (offline; real catalog data)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def detector():
    return SchemaDetector(load_bundled_catalog())


def test_bundled_catalog_size():
    cat = load_bundled_catalog()
    assert len(cat) > 1000
    assert sum(len(e.file_match) for e in cat) > 2500


def test_detects_github_workflow_by_path(detector):
    url = detector.detect(".github/workflows/ci.yml")
    assert url is not None and "github-workflow" in url


def test_detects_docker_compose_by_name(detector):
    assert detector.detect("docker-compose.yml") is not None


def test_detects_helm_chart_by_basename(detector):
    url = detector.detect("charts/mychart/Chart.yaml")
    assert url is not None and "chart" in url.lower()


def test_returns_none_for_unknown_path(detector):
    assert detector.detect("some/random/file.txt") is None


def test_load_catalog_falls_back_offline():
    # dead local URL -> bundled snapshot, like SchemaCatalogLoader.load
    cat = load_catalog("http://127.0.0.1:9/catalog.json", http_timeout=0.5)
    assert len(cat) == len(load_bundled_catalog())


def test_load_catalog_none_skips_live_fetch():
    assert len(load_catalog(None)) == len(load_bundled_catalog())


# ---------------------------------------------------------------------------
# remote $schema resolution (local HTTP server; no external network)
# ---------------------------------------------------------------------------

SCHEMA_DOC = {
    "$id": "urn:test:remote",
    "type": "object",
    "properties": {"flag": {"type": "boolean"}},
    "required": ["flag"],
}


class _Handler(BaseHTTPRequestHandler):
    hits: dict = {}

    def do_GET(self):
        _Handler.hits[self.path] = _Handler.hits.get(self.path, 0) + 1
        if self.path == "/schema.json":
            body = json.dumps(SCHEMA_DOC).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(404)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def http_base():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _batch(contents):
    n = len(contents)
    return pa.table({
        "repo": pa.array([""] * n), "path": pa.array([f"f{i}.yaml" for i in range(n)]),
        "commit": pa.array([""] * n), "lang": pa.array([None] * n, pa.string()),
        "content": pa.array(contents),
    })


def test_remote_schema_fetch_validates(http_base):
    v = SchemaValidator(ValidatorConfig())
    url = f"{http_base}/schema.json"
    out = v(_batch([f"$schema: {url}\nflag: true\n",
                    f"$schema: {url}\nflag: 123\n",
                    f"$schema: {url}\n"])).to_pylist()
    assert [r["valid"] for r in out] == [True, False, False]
    assert out[1]["violations"][0]["keyword"] == "type"
    assert out[1]["violations"][0]["message"] == "integer found, boolean expected"
    assert any(r["keyword"] == "required" for r in out[2]["violations"])
    # compiled once per actor, not once per document
    assert _Handler.hits["/schema.json"] == 1


def test_remote_schema_404_error_result(http_base):
    v = SchemaValidator(ValidatorConfig())
    url = f"{http_base}/missing.json"
    out = v(_batch([f"$schema: {url}\nflag: true\n"])).to_pylist()
    assert out[0]["valid"] is False
    # reference message fragment (YamlSchemaValidatorTest.java:50,54)
    assert f"HTTP request failed with status code 404 for {url}" in out[0]["error"]


def test_remote_schema_connection_error_result():
    v = SchemaValidator(ValidatorConfig(http_timeout=0.5))
    url = "http://127.0.0.1:9/schema.json"
    docs = [f"$schema: {url}\nflag: true\n"] * 3
    out = v(_batch(docs)).to_pylist()
    assert all(r["valid"] is False for r in out)
    assert out[0]["error"].startswith(f"Error fetching schema from URL: {url}")


def test_remote_schemas_disabled():
    v = SchemaValidator(ValidatorConfig(allow_remote_schemas=False))
    url = "http://127.0.0.1:9/schema.json"
    out = v(_batch([f"$schema: {url}\nflag: true\n"])).to_pylist()
    assert out[0]["error"] == f"Schema not found: {url}"

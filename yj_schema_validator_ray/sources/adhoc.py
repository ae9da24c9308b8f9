"""Ad-hoc sources: stdin-style single-document runs and remote schemas.

S2 (stdin) parity: the reference pipes stdin through the same per-doc
path with source name "stdin" (``YamlSchemaValidatorRunner.java:75-88``,
``YamlSchemaValidator.java:95-110``).  Here an ad-hoc string becomes a
one-row Dataset via ``from_items`` and flows through the identical
validator stage.

S5 (HTTP schema fetch, ``YamlSchemaValidator.java:319-377``): this
sandbox has no network, so the fetch is gated — the function exists with
the reference's timeout semantics and raises a clear error offline;
failures funnel into the per-doc error result exactly like the
reference's fetch-error path.
"""

from __future__ import annotations


def adhoc_corpus(contents: list[str], source_name: str = "stdin"):
    """One logical 'file' per string, named ``stdin`` / ``stdin-2``...
    (reference stdin naming; multi-doc explode happens downstream)."""
    import ray.data

    rows = []
    for i, content in enumerate(contents):
        name = source_name if len(contents) == 1 else f"{source_name}-{i + 1}"
        rows.append({"repo": "", "path": name, "commit": "", "lang": None,
                     "content": content})
    return ray.data.from_items(rows)


def validate_strings(contents: list[str], config, **kwargs):
    """Validate ad-hoc document strings through the standard pipeline."""
    from ..pipelines.validate import validate_corpus

    return validate_corpus(adhoc_corpus(contents), config,
                           batch_size=max(1, len(contents)), **kwargs)


def fetch_schema_http(url: str, timeout_s: float = 10.0,
                      ignore_ssl_errors: bool = False) -> str:
    """GET a schema over HTTP(S) with a timeout (reference defaults:
    10 s timeout, optional SSL-ignore — ``YamlSchemaValidatorConfig.java:42``;
    fetch logic ``YamlSchemaValidator.java:319-377``).

    Raises RuntimeError with the reference's message shapes — the caller
    funnels it into a per-doc error result (``genericError``,
    ``YamlSchemaValidator.java:209-214``; asserted message fragments
    ``YamlSchemaValidatorTest.java:48-55``):
    - non-200 -> "HTTP request failed with status code <n> for <url>"
    - transport failure -> "Error fetching schema from URL: <url>: ..."
    """
    import urllib.error
    import urllib.request

    ctx = None
    if ignore_ssl_errors:
        import ssl

        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    try:
        with urllib.request.urlopen(url, timeout=timeout_s, context=ctx) as r:
            if getattr(r, "status", 200) != 200:
                raise RuntimeError("HTTP request failed with status code "
                                   f"{r.status} for {url}")
            return r.read().decode("utf-8")
    except urllib.error.HTTPError as ex:
        raise RuntimeError("HTTP request failed with status code "
                           f"{ex.code} for {url}") from ex
    except (urllib.error.URLError, OSError) as ex:
        reason = getattr(ex, "reason", ex)
        raise RuntimeError(
            f"Error fetching schema from URL: {url}: {reason}") from ex

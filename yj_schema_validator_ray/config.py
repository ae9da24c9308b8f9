"""Engine configuration (the analogue of the reference's
``config/YamlSchemaValidatorConfig.java:20-113`` flag surface, minus the
Spring binding)."""

from __future__ import annotations

from dataclasses import dataclass, field

from .functions.catalog import BUILTIN_CATALOG, CatalogEntry


@dataclass(frozen=True)
class ValidatorConfig:
    """Everything a validator actor needs to compile in ``__init__``.

    ``schemas`` is the schema registry: schema-id/path -> schema dict.  It
    plays the role of the reference's filesystem + HTTP fetch layer
    (``YamlSchemaValidator.java:319-403``) — in a 100 TB corpus run the
    registry is loaded once on the driver and shipped to each actor in its
    constructor args (broadcast small side), so compilation happens once
    per actor, mirroring the reference's process-lifetime ``schemaCache``
    (``YamlSchemaValidator.java:65,184-202``).
    """

    schemas: dict = field(default_factory=dict)
    default_schema: str | None = None     # --schema
    schema_override: bool = False         # --schema-override (wins over embedded $schema)
    auto_detect: bool = False             # catalog path detection (--auto-detect)
    catalog: tuple[CatalogEntry, ...] = BUILTIN_CATALOG
    # remote $schema resolution (YamlSchemaValidator.java:319-377): http(s)
    # refs not in the registry are fetched+compiled+cached per actor
    allow_remote_schemas: bool = True
    http_timeout: float = 10.0            # --http-timeout (seconds)
    ignore_ssl_errors: bool = False       # --ignore-ssl-errors
    # lazy local schema files (readSchemaFromFile,
    # YamlSchemaValidator.java:389-403): $schema paths not in the registry
    # are read from this directory per worker (requires shared storage on
    # a multi-node cluster; set by the CLI's --input-dir)
    schema_base_dir: str | None = None

    def __post_init__(self):
        if self.schema_override and self.default_schema is None:
            # reference: "schema-override requires --schema"
            # (YamlSchemaValidatorRunner.java:152-157)
            raise ValueError("schema_override requires default_schema")


NO_SCHEMA_MSG = "No schema found in YAML file or provided as parameter"
NO_NODES_MSG = "No Nodes found in YAML file"

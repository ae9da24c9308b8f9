"""JSON-Schema subset compiler: schema dict -> compiled check closures.

Brand-new implementation of the validation semantics exercised by the
reference engine (alexmond/yj-schema-validator, which delegates to
NetworkNT json-schema-validator: ``YamlSchemaValidator.java:138-140,193``).
We compile a schema ONCE into a tree of Python closures; per-document
evaluation is then pure closure calls with no dict lookups of keyword
handlers.  Compilation cost is amortized by holding compiled schemas in
validator-actor state (mirrors the reference's ``schemaCache``,
``YamlSchemaValidator.java:65,184-202``).

Violation rows carry the draft-2020-12 LIST-output fields observed in the
reference's golden file ``src/test/resources/testreport/invalidyaml.json:6-14``:
``evaluation_path`` (keyword path traversed, incl. ``$ref`` hops),
``schema_location`` (``<$id>#<pointer in resolved schema>``),
``instance_location`` (JSON Pointer into the document), ``keyword`` and a
NetworkNT-style ``message`` (e.g. ``"integer found, boolean expected"``).

Supported keywords (the reference corpus set per SURVEY.md §1.2 plus the
common structural ones): type, enum, const, pattern, format, minimum,
maximum, exclusiveMinimum, exclusiveMaximum, multipleOf, minLength,
maxLength, required, properties, patternProperties, additionalProperties,
minItems, maxItems, uniqueItems, prefixItems, items, allOf, anyOf, oneOf,
not, $ref/$defs (incl. recursive refs via lazy indirection), $anchor /
$dynamicAnchor plain-name fragments and $dynamicRef (single-resource
dynamic-scope approximation), same-document absolute-URI self refs.
"""

from __future__ import annotations

import ipaddress
import re
from datetime import date, datetime, time
from typing import Any, Callable, NamedTuple


class Violation(NamedTuple):
    evaluation_path: str
    schema_location: str
    instance_location: str
    keyword: str
    message: str


# ----------------------------------------------------------------------------
# JSON type model
# ----------------------------------------------------------------------------

def json_type_name(v: Any) -> str:
    """The 'found' type name used in type-mismatch messages."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, dict):
        return "object"
    if isinstance(v, list):
        return "array"
    return type(v).__name__


def _type_ok(v: Any, t: str) -> bool:
    if t == "null":
        return v is None
    if t == "boolean":
        return isinstance(v, bool)
    if t == "integer":
        # draft 2020-12: a float with zero fractional part IS an integer
        return (isinstance(v, int) and not isinstance(v, bool)) or (
            isinstance(v, float) and v.is_integer()
        )
    if t == "number":
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "string":
        return isinstance(v, str)
    if t == "object":
        return isinstance(v, dict)
    if t == "array":
        return isinstance(v, list)
    return False


def _is_num(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def json_equal(a: Any, b: Any) -> bool:
    """Draft 2020-12 instance equality: booleans are never equal to
    numbers, numbers compare mathematically (1 == 1.0), containers
    compare element-wise with the same rules (NetworkNT/BigDecimal
    semantics — shared by ``const`` and ``enum``)."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if _is_num(a) and _is_num(b):
        return a == b  # Python int/float == is exact mathematical compare
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(json_equal(v, b[k]) for k, v in a.items())
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(json_equal(x, y) for x, y in zip(a, b))
    if type(a) is not type(b):
        return False
    return a == b


def _fmt_num(n: Any) -> str:
    """Render a schema number the way the schema author wrote it."""
    if isinstance(n, float) and n.is_integer():
        return str(int(n))
    return str(n)


# ----------------------------------------------------------------------------
# format validators (format assertions are hard errors in the reference:
# formatAssertionsEnabled(true), YamlSchemaValidator.java:193)
# ----------------------------------------------------------------------------

_EMAIL_RE = re.compile(r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+$")
_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")
_UUID_RE = re.compile(r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")
_HOSTNAME_RE = re.compile(r"^(?=.{1,253}$)[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$")


def _check_date(s: str) -> bool:
    try:
        date.fromisoformat(s)
        return True
    except ValueError:
        return False


def _check_datetime(s: str) -> bool:
    try:
        datetime.fromisoformat(s.replace("Z", "+00:00").replace("z", "+00:00"))
        return True
    except ValueError:
        return False


def _check_time(s: str) -> bool:
    try:
        time.fromisoformat(s.replace("Z", "+00:00").replace("z", "+00:00"))
        return True
    except ValueError:
        return False


def _check_regex(s: str) -> bool:
    try:
        re.compile(s)
        return True
    except re.error:
        return False


def _check_ipv4(s: str) -> bool:
    try:
        ipaddress.IPv4Address(s)
        return True
    except ValueError:
        return False


def _check_ipv6(s: str) -> bool:
    try:
        ipaddress.IPv6Address(s)
        return True
    except ValueError:
        return False


_DURATION_RE = re.compile(
    r"^P(?!$)(\d+Y)?(\d+M)?(\d+W)?(\d+D)?(T(?=\d)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?$")
_URI_TEMPLATE_RE = re.compile(
    r"^(?:[^{}]|\{[+#./;?&=,!@|]?[A-Za-z0-9_%.]+(?::[1-9][0-9]{0,3}|\*)?"
    r"(?:,[A-Za-z0-9_%.]+(?::[1-9][0-9]{0,3}|\*)?)*\})*$")
_JSON_POINTER_RE = re.compile(r"^(?:/(?:[^~/]|~0|~1)*)*$")
_REL_JSON_POINTER_RE = re.compile(r"^(?:0|[1-9][0-9]*)(?:#|(?:/(?:[^~/]|~0|~1)*)*)$")


_FORMAT_CHECKS: dict[str, Callable[[str], bool]] = {
    "email": lambda s: bool(_EMAIL_RE.match(s)),
    "uri": lambda s: bool(_URI_RE.match(s)),
    "uri-reference": lambda s: True,
    "uuid": lambda s: bool(_UUID_RE.match(s)),
    "hostname": lambda s: bool(_HOSTNAME_RE.match(s)),
    "date": _check_date,
    "date-time": _check_datetime,
    "time": _check_time,
    "regex": _check_regex,
    "ipv4": _check_ipv4,
    "ipv6": _check_ipv6,
    "duration": lambda s: bool(_DURATION_RE.match(s)),
    "json-pointer": lambda s: bool(_JSON_POINTER_RE.match(s)),
    "relative-json-pointer": lambda s: bool(_REL_JSON_POINTER_RE.match(s)),
    # the remaining draft-2020-12 format vocabulary (NetworkNT asserts
    # these too): IRI family = URI checks with non-ASCII allowed;
    # uri-template per RFC 6570 (balanced {...} expressions)
    "iri": lambda s: bool(_URI_RE.match(s)),
    "iri-reference": lambda s: True,
    "idn-email": lambda s: s.count("@") == 1 and "@" not in (s[0], s[-1]),
    "idn-hostname": lambda s: 0 < len(s) <= 253 and " " not in s,
    "uri-template": lambda s: bool(_URI_TEMPLATE_RE.match(s)),
}


# ----------------------------------------------------------------------------
# message templates (NetworkNT-style phrasing; the one string the reference's
# goldens pin byte-for-byte is type's "integer found, boolean expected")
# ----------------------------------------------------------------------------

def _enum_render(vals: list) -> str:
    return "[" + ", ".join(str(v) for v in vals) + "]"


# ----------------------------------------------------------------------------
# compiler
# ----------------------------------------------------------------------------

class SchemaCompileError(ValueError):
    pass


# A compiled node: fn(value, instance_path, eval_path, out_list) -> bool(valid)
CheckFn = Callable[[Any, str, str, list], bool]


class CompiledSchema:
    """A compiled JSON Schema: call ``validate(value)`` per document."""

    def __init__(self, schema: dict, uri: str):
        self.uri = uri
        self.schema = schema
        base = schema.get("$id", uri) if isinstance(schema, dict) else uri
        self._base = base
        self._ref_cache: dict[str, CheckFn] = {}
        self._root = self._compile(schema, "", "")

    # -- public ---------------------------------------------------------------
    def validate(self, value: Any) -> list[Violation]:
        out: list = []
        self._root(value, "", "", out)
        return out

    # -- ref resolution -------------------------------------------------------
    def _anchor_index(self) -> dict:
        """Plain-name fragment targets: every ``$anchor`` /
        ``$dynamicAnchor`` in the document (built lazily, once)."""
        idx = getattr(self, "_anchors", None)
        if idx is None:
            idx = {}

            def walk(node):
                if isinstance(node, dict):
                    for kw in ("$anchor", "$dynamicAnchor"):
                        a = node.get(kw)
                        if isinstance(a, str):
                            idx.setdefault(a, node)
                    for v in node.values():
                        walk(v)
                elif isinstance(node, list):
                    for v in node:
                        walk(v)

            walk(self.schema)
            self._anchors = idx
        return idx

    def _resolve_pointer(self, pointer: str) -> Any:
        node: Any = self.schema
        if pointer in ("", "#"):
            return node
        frag = pointer.lstrip("#")
        if frag and not frag.startswith("/"):
            # plain-name fragment -> $anchor / $dynamicAnchor target
            try:
                return self._anchor_index()[frag]
            except KeyError:
                raise SchemaCompileError(
                    f"cannot resolve anchor {pointer!r}") from None
        parts = frag.lstrip("/").split("/")
        for p in parts:
            p = p.replace("~1", "/").replace("~0", "~")
            if isinstance(node, dict):
                node = node[p]
            elif isinstance(node, list):
                node = node[int(p)]
            else:
                raise SchemaCompileError(f"cannot resolve $ref pointer {pointer!r}")
        return node

    def _compiled_ref(self, ref: str) -> CheckFn:
        """Compile a ``#/...`` ref target once; lazy indirection breaks cycles."""
        if ref in self._ref_cache:
            return self._ref_cache[ref]
        slot: list[CheckFn | None] = [None]

        def indirect(v, ipath, epath, out, _slot=slot):
            fn = _slot[0]
            if fn is None:  # first call: compile now (cycle-safe; cache holds `indirect`)
                target = self._resolve_pointer(ref)
                fn = self._compile(target, ref.lstrip("#"), None)
                _slot[0] = fn
            return fn(v, ipath, epath, out)

        self._ref_cache[ref] = indirect
        return indirect

    # -- annotation collection (unevaluatedProperties / unevaluatedItems) -----
    def _node_valid(self, schema: Any, value: Any) -> bool:
        """Cheap validity test of a subschema (compiled + memoized)."""
        key = id(schema)
        fn = self._ref_cache.get(("valid", key))
        if fn is None:
            fn = self._compile(schema, "", None)
            self._ref_cache[("valid", key)] = fn
        return fn(value, "", "", [])

    def _evaluated_props(self, schema: Any, value: dict) -> set | None:
        """Property names evaluated at ``schema`` for ``value``, following
        the in-place applicators' annotation semantics (branches only
        contribute when they validate).  Returns None for 'all evaluated'
        (an applicable additionalProperties evaluates every remaining key).
        """
        if schema is True or schema is False or not isinstance(schema, dict):
            return set()
        if "additionalProperties" in schema:
            return None  # evaluates every key not covered elsewhere
        ev: set = set()
        props = schema.get("properties")
        if props:
            ev |= (set(props) & set(value))
        for pat in schema.get("patternProperties", ()):  # keys of the dict
            rx = re.compile(pat)
            ev |= {k for k in value if rx.search(k)}
        if "$ref" in schema:
            target = self._resolve_pointer(schema["$ref"])
            sub = self._evaluated_props(target, value)
            if sub is None:
                return None
            ev |= sub
        for sub in schema.get("allOf", ()):
            s = self._evaluated_props(sub, value)
            if s is None:
                return None
            ev |= s
        for branch_kw in ("anyOf", "oneOf"):
            for sub in schema.get(branch_kw, ()):
                if self._node_valid(sub, value):
                    s = self._evaluated_props(sub, value)
                    if s is None:
                        return None
                    ev |= s
        if "if" in schema:
            cond = self._node_valid(schema["if"], value)
            branches = ([schema["if"], schema.get("then")] if cond
                        else [schema.get("else")])
            for sub in branches:
                if sub is not None:
                    s = self._evaluated_props(sub, value)
                    if s is None:
                        return None
                    ev |= s
        for trigger, sub in schema.get("dependentSchemas", {}).items():
            if trigger in value:
                s = self._evaluated_props(sub, value)
                if s is None:
                    return None
                ev |= s
        return ev

    def _evaluated_items(self, schema: Any, value: list) -> tuple:
        """(prefix_len_evaluated, all_evaluated: bool, contains_idx: set)."""
        if schema is True or schema is False or not isinstance(schema, dict):
            return 0, False, set()
        if "items" in schema:  # applies to every element past prefixItems
            return 0, True, set()
        n_prefix = min(len(schema.get("prefixItems", ())), len(value))
        contains_idx: set = set()
        if "contains" in schema:
            sub = schema["contains"]
            contains_idx = {i for i, item in enumerate(value)
                            if self._node_valid(sub, item)}
        all_items = False
        for kw in ("allOf",):
            for sub in schema.get(kw, ()):
                p, a, c = self._evaluated_items(sub, value)
                n_prefix = max(n_prefix, p)
                all_items = all_items or a
                contains_idx |= c
        for kw in ("anyOf", "oneOf"):
            for sub in schema.get(kw, ()):
                if self._node_valid(sub, value):
                    p, a, c = self._evaluated_items(sub, value)
                    n_prefix = max(n_prefix, p)
                    all_items = all_items or a
                    contains_idx |= c
        if "$ref" in schema:
            p, a, c = self._evaluated_items(
                self._resolve_pointer(schema["$ref"]), value)
            n_prefix = max(n_prefix, p)
            all_items = all_items or a
            contains_idx |= c
        if "if" in schema:
            cond = self._node_valid(schema["if"], value)
            branches = ([schema["if"], schema.get("then")] if cond
                        else [schema.get("else")])
            for sub in branches:
                if sub is not None:
                    p, a, c = self._evaluated_items(sub, value)
                    n_prefix = max(n_prefix, p)
                    all_items = all_items or a
                    contains_idx |= c
        return n_prefix, all_items, contains_idx

    # -- node compiler --------------------------------------------------------
    def _compile(self, schema: Any, spath: str, _epath_unused: Any) -> CheckFn:
        """Compile one schema node at schema-pointer ``spath``.

        The returned closure takes the *dynamic* evaluation path (epath) at
        call time, since the same compiled node is reachable via different
        ``$ref`` hops.
        """
        if schema is True or schema == {}:
            return lambda v, ipath, epath, out: True
        if schema is False:
            loc = f"{self._base}#{spath}"

            def false_fn(v, ipath, epath, out, _loc=loc):
                out.append(Violation(epath, _loc, ipath, "false", "schema is false"))
                return False

            return false_fn
        if not isinstance(schema, dict):
            raise SchemaCompileError(f"invalid schema node at {spath!r}: {schema!r}")

        loc = f"{self._base}#{spath}"
        checks: list[CheckFn] = []

        # ---- $ref / $dynamicRef (evaluated alongside siblings per 2020-12;
        # $dynamicRef resolves like $ref against this document's anchors —
        # the single-resource approximation of dynamic scoping) ----
        for ref_kw in ("$ref", "$dynamicRef"):
            if ref_kw not in schema:
                continue
            ref = schema[ref_kw]
            if isinstance(ref, str) and self._base:
                # same-document absolute ref: urn:x#/defs -> #/defs — only
                # on an exact URI boundary ('urn:x' or 'urn:x#...'), never
                # a bare prefix (would mangle sibling URIs like 'urn:x2')
                if ref == self._base:
                    ref = "#"
                elif ref.startswith(self._base + "#"):
                    ref = ref[len(self._base):]
            if not isinstance(ref, str) or not ref.startswith("#"):
                raise SchemaCompileError(
                    f"only document-local {ref_kw}s supported, got {schema[ref_kw]!r}")
            target = self._compiled_ref(ref)

            def ref_fn(v, ipath, epath, out, _t=target, _kw=ref_kw):
                return _t(v, ipath, epath + "/" + _kw, out)

            checks.append(ref_fn)

        # ---- type ----
        if "type" in schema:
            texp = schema["type"]
            types = [texp] if isinstance(texp, str) else list(texp)
            expected = ", ".join(types)

            def type_fn(v, ipath, epath, out, _types=tuple(types), _exp=expected, _loc=loc):
                for t in _types:
                    if _type_ok(v, t):
                        return True
                out.append(Violation(epath, _loc, ipath, "type",
                                     f"{json_type_name(v)} found, {_exp} expected"))
                return False

            checks.append(type_fn)

        # ---- enum / const ----
        if "enum" in schema:
            vals = schema["enum"]
            rendered = _enum_render(vals)
            # fast path: strings (the overwhelmingly common enum type) hit
            # a frozenset; everything else goes through json_equal so
            # True never matches enum [1] and 1.0 matches enum [1]
            str_set = frozenset(x for x in vals if isinstance(x, str))

            def enum_fn(v, ipath, epath, out, _ss=str_set, _vals=vals, _r=rendered, _loc=loc):
                if isinstance(v, str):
                    if v in _ss:
                        return True
                elif any(json_equal(v, e) for e in _vals):
                    return True
                out.append(Violation(epath, _loc, ipath, "enum",
                                     f"does not have a value in the enumeration {_r}"))
                return False

            checks.append(enum_fn)

        if "const" in schema:
            cv = schema["const"]

            def const_fn(v, ipath, epath, out, _c=cv, _loc=loc):
                if json_equal(v, _c):
                    return True
                out.append(Violation(epath, _loc, ipath, "const",
                                     f"must be the constant value '{_c}'"))
                return False

            checks.append(const_fn)

        # ---- string keywords ----
        if "pattern" in schema:
            pat = schema["pattern"]
            rx = re.compile(pat)

            def pattern_fn(v, ipath, epath, out, _rx=rx, _p=pat, _loc=loc):
                if not isinstance(v, str) or _rx.search(v):
                    return True
                out.append(Violation(epath, _loc, ipath, "pattern",
                                     f"does not match the regex pattern {_p}"))
                return False

            checks.append(pattern_fn)

        if "format" in schema:
            fmt = schema["format"]
            checker = _FORMAT_CHECKS.get(fmt)
            if checker is not None:
                def format_fn(v, ipath, epath, out, _c=checker, _f=fmt, _loc=loc):
                    if not isinstance(v, str) or _c(v):
                        return True
                    out.append(Violation(epath, _loc, ipath, "format",
                                         f"does not match the {_f} pattern"))
                    return False

                checks.append(format_fn)

        if "minLength" in schema:
            n = schema["minLength"]

            def minlen_fn(v, ipath, epath, out, _n=n, _loc=loc):
                if not isinstance(v, str) or len(v) >= _n:
                    return True
                out.append(Violation(epath, _loc, ipath, "minLength",
                                     f"must be at least {_n} characters long"))
                return False

            checks.append(minlen_fn)

        if "maxLength" in schema:
            n = schema["maxLength"]

            def maxlen_fn(v, ipath, epath, out, _n=n, _loc=loc):
                if not isinstance(v, str) or len(v) <= _n:
                    return True
                out.append(Violation(epath, _loc, ipath, "maxLength",
                                     f"must be at most {_n} characters long"))
                return False

            checks.append(maxlen_fn)

        # ---- numeric keywords ----
        if "minimum" in schema:
            n = schema["minimum"]

            def min_fn(v, ipath, epath, out, _n=n, _loc=loc, _r=_fmt_num(n)):
                if not _is_num(v) or v >= _n:
                    return True
                out.append(Violation(epath, _loc, ipath, "minimum",
                                     f"must have a minimum value of {_r}"))
                return False

            checks.append(min_fn)

        if "maximum" in schema:
            n = schema["maximum"]

            def max_fn(v, ipath, epath, out, _n=n, _loc=loc, _r=_fmt_num(n)):
                if not _is_num(v) or v <= _n:
                    return True
                out.append(Violation(epath, _loc, ipath, "maximum",
                                     f"must have a maximum value of {_r}"))
                return False

            checks.append(max_fn)

        if "exclusiveMinimum" in schema:
            n = schema["exclusiveMinimum"]

            def exmin_fn(v, ipath, epath, out, _n=n, _loc=loc, _r=_fmt_num(n)):
                if not _is_num(v) or v > _n:
                    return True
                out.append(Violation(epath, _loc, ipath, "exclusiveMinimum",
                                     f"must have an exclusive minimum value of {_r}"))
                return False

            checks.append(exmin_fn)

        if "exclusiveMaximum" in schema:
            n = schema["exclusiveMaximum"]

            def exmax_fn(v, ipath, epath, out, _n=n, _loc=loc, _r=_fmt_num(n)):
                if not _is_num(v) or v < _n:
                    return True
                out.append(Violation(epath, _loc, ipath, "exclusiveMaximum",
                                     f"must have an exclusive maximum value of {_r}"))
                return False

            checks.append(exmax_fn)

        if "multipleOf" in schema:
            n = schema["multipleOf"]

            def mult_fn(v, ipath, epath, out, _n=n, _loc=loc, _r=_fmt_num(n)):
                if not _is_num(v):
                    return True
                # exact semantics (NetworkNT uses BigDecimal): int/int via
                # modulo, otherwise Decimal over the decimal literals — a
                # float-quotient tolerance accepts everything for tiny
                # divisors (multipleOf: 1e-10) and drifts for large values
                if isinstance(v, int) and isinstance(_n, int):
                    if v % _n == 0:
                        return True
                else:
                    from decimal import Decimal, InvalidOperation

                    try:
                        if Decimal(str(v)) % Decimal(str(_n)) == 0:
                            return True
                    except InvalidOperation:
                        pass  # e.g. inf — fall through to violation
                out.append(Violation(epath, _loc, ipath, "multipleOf",
                                     f"must be multiple of {_r}"))
                return False

            checks.append(mult_fn)

        # ---- object keywords ----
        if "required" in schema:
            req = list(schema["required"])

            def required_fn(v, ipath, epath, out, _req=req, _loc=loc):
                if not isinstance(v, dict):
                    return True
                ok = True
                for name in _req:
                    if name not in v:
                        out.append(Violation(epath, _loc, ipath, "required",
                                             f"required property '{name}' not found"))
                        ok = False
                return ok

            checks.append(required_fn)

        props_compiled: dict[str, CheckFn] = {}
        if "properties" in schema:
            for name, sub in schema["properties"].items():
                esc = name.replace("~", "~0").replace("/", "~1")
                props_compiled[name] = self._compile(sub, f"{spath}/properties/{esc}", None)

            def props_fn(v, ipath, epath, out, _p=props_compiled):
                if not isinstance(v, dict):
                    return True
                ok = True
                for name, fn in _p.items():
                    if name in v:
                        esc = name.replace("~", "~0").replace("/", "~1")
                        if not fn(v[name], f"{ipath}/{esc}",
                                  f"{epath}/properties/{esc}", out):
                            ok = False
                return ok

            checks.append(props_fn)

        pat_props: list[tuple[re.Pattern, CheckFn]] = []
        if "patternProperties" in schema:
            for pat, sub in schema["patternProperties"].items():
                esc = pat.replace("~", "~0").replace("/", "~1")
                pat_props.append((re.compile(pat),
                                  self._compile(sub, f"{spath}/patternProperties/{esc}", None)))

            def patprops_fn(v, ipath, epath, out, _pp=pat_props):
                if not isinstance(v, dict):
                    return True
                ok = True
                for key, val in v.items():
                    kesc = key.replace("~", "~0").replace("/", "~1")
                    for rx, fn in _pp:
                        if rx.search(key):
                            pesc = rx.pattern.replace("~", "~0").replace("/", "~1")
                            if not fn(val, f"{ipath}/{kesc}",
                                      f"{epath}/patternProperties/{pesc}", out):
                                ok = False
                return ok

            checks.append(patprops_fn)

        if "additionalProperties" in schema:
            ap = schema["additionalProperties"]
            declared = frozenset(schema.get("properties", {}).keys())
            pats = [re.compile(p) for p in schema.get("patternProperties", {})]
            if ap is False:
                def addprops_false_fn(v, ipath, epath, out, _d=declared, _pats=pats, _loc=loc):
                    if not isinstance(v, dict):
                        return True
                    ok = True
                    for key in v:
                        if key in _d or any(rx.search(key) for rx in _pats):
                            continue
                        out.append(Violation(
                            epath, _loc, ipath, "additionalProperties",
                            f"property '{key}' is not defined in the schema and the "
                            "schema does not allow additional properties"))
                        ok = False
                    return ok

                checks.append(addprops_false_fn)
            elif ap is not True:
                ap_fn = self._compile(ap, f"{spath}/additionalProperties", None)

                def addprops_fn(v, ipath, epath, out, _d=declared, _pats=pats, _fn=ap_fn):
                    if not isinstance(v, dict):
                        return True
                    ok = True
                    for key, val in v.items():
                        if key in _d or any(rx.search(key) for rx in _pats):
                            continue
                        kesc = key.replace("~", "~0").replace("/", "~1")
                        if not _fn(val, f"{ipath}/{kesc}",
                                   f"{epath}/additionalProperties", out):
                            ok = False
                    return ok

                checks.append(addprops_fn)

        if "minProperties" in schema:
            n = schema["minProperties"]

            def minprops_fn(v, ipath, epath, out, _n=n, _loc=loc):
                if not isinstance(v, dict) or len(v) >= _n:
                    return True
                out.append(Violation(epath, _loc, ipath, "minProperties",
                                     f"must have at least {_n} properties"))
                return False

            checks.append(minprops_fn)

        if "maxProperties" in schema:
            n = schema["maxProperties"]

            def maxprops_fn(v, ipath, epath, out, _n=n, _loc=loc):
                if not isinstance(v, dict) or len(v) <= _n:
                    return True
                out.append(Violation(epath, _loc, ipath, "maxProperties",
                                     f"must have at most {_n} properties"))
                return False

            checks.append(maxprops_fn)

        # ---- array keywords ----
        if "minItems" in schema:
            n = schema["minItems"]

            def minitems_fn(v, ipath, epath, out, _n=n, _loc=loc):
                if not isinstance(v, list) or len(v) >= _n:
                    return True
                out.append(Violation(epath, _loc, ipath, "minItems",
                                     f"must have at least {_n} items but found {len(v)}"))
                return False

            checks.append(minitems_fn)

        if "maxItems" in schema:
            n = schema["maxItems"]

            def maxitems_fn(v, ipath, epath, out, _n=n, _loc=loc):
                if not isinstance(v, list) or len(v) <= _n:
                    return True
                out.append(Violation(epath, _loc, ipath, "maxItems",
                                     f"must have at most {_n} items but found {len(v)}"))
                return False

            checks.append(maxitems_fn)

        if schema.get("uniqueItems") is True:
            def uniq_fn(v, ipath, epath, out, _loc=loc):
                if not isinstance(v, list):
                    return True
                seen = []
                for item in v:
                    if item in seen:
                        out.append(Violation(epath, _loc, ipath, "uniqueItems",
                                             "must have only unique items in the array"))
                        return False
                    seen.append(item)
                return True

            checks.append(uniq_fn)

        prefix_compiled: list[CheckFn] = []
        if "prefixItems" in schema:
            for i, sub in enumerate(schema["prefixItems"]):
                prefix_compiled.append(self._compile(sub, f"{spath}/prefixItems/{i}", None))

            def prefix_fn(v, ipath, epath, out, _p=prefix_compiled):
                if not isinstance(v, list):
                    return True
                ok = True
                for i, fn in enumerate(_p):
                    if i >= len(v):
                        break
                    if not fn(v[i], f"{ipath}/{i}", f"{epath}/prefixItems/{i}", out):
                        ok = False
                return ok

            checks.append(prefix_fn)

        if "items" in schema:
            nskip = len(schema.get("prefixItems", []))
            items_fn_c = self._compile(schema["items"], f"{spath}/items", None)

            def items_fn(v, ipath, epath, out, _fn=items_fn_c, _skip=nskip):
                if not isinstance(v, list):
                    return True
                ok = True
                for i in range(_skip, len(v)):
                    if not _fn(v[i], f"{ipath}/{i}", f"{epath}/items", out):
                        ok = False
                return ok

            checks.append(items_fn)

        if "contains" in schema and "minContains" not in schema \
                and "maxContains" not in schema:
            c_fn = self._compile(schema["contains"], f"{spath}/contains", None)

            def contains_fn(v, ipath, epath, out, _fn=c_fn, _loc=loc):
                if not isinstance(v, list):
                    return True
                for i, item in enumerate(v):
                    if _fn(item, f"{ipath}/{i}", f"{epath}/contains", []):
                        return True
                out.append(Violation(epath, _loc, ipath, "contains",
                                     "must contain at least one valid item"))
                return False

            checks.append(contains_fn)

        # ---- combinators ----
        if "allOf" in schema:
            subs = [self._compile(s, f"{spath}/allOf/{i}", None)
                    for i, s in enumerate(schema["allOf"])]

            def allof_fn(v, ipath, epath, out, _subs=subs):
                ok = True
                for i, fn in enumerate(_subs):
                    if not fn(v, ipath, f"{epath}/allOf/{i}", out):
                        ok = False
                return ok

            checks.append(allof_fn)

        if "anyOf" in schema:
            subs = [self._compile(s, f"{spath}/anyOf/{i}", None)
                    for i, s in enumerate(schema["anyOf"])]

            def anyof_fn(v, ipath, epath, out, _subs=subs, _loc=loc):
                for i, fn in enumerate(_subs):
                    if fn(v, ipath, f"{epath}/anyOf/{i}", []):
                        return True
                out.append(Violation(epath, _loc, ipath, "anyOf",
                                     "must be valid to at least one of the schemas"))
                return False

            checks.append(anyof_fn)

        if "oneOf" in schema:
            subs = [self._compile(s, f"{spath}/oneOf/{i}", None)
                    for i, s in enumerate(schema["oneOf"])]

            def oneof_fn(v, ipath, epath, out, _subs=subs, _loc=loc):
                n_ok = 0
                for i, fn in enumerate(_subs):
                    if fn(v, ipath, f"{epath}/oneOf/{i}", []):
                        n_ok += 1
                if n_ok == 1:
                    return True
                out.append(Violation(
                    epath, _loc, ipath, "oneOf",
                    f"must be valid to one and only one schema, but {n_ok} are valid"))
                return False

            checks.append(oneof_fn)

        if "if" in schema:
            if_fn = self._compile(schema["if"], f"{spath}/if", None)
            then_fn = (self._compile(schema["then"], f"{spath}/then", None)
                       if "then" in schema else None)
            else_fn = (self._compile(schema["else"], f"{spath}/else", None)
                       if "else" in schema else None)

            def if_then_else_fn(v, ipath, epath, out, _i=if_fn, _t=then_fn, _e=else_fn):
                if _i(v, ipath, f"{epath}/if", []):
                    if _t is not None:
                        return _t(v, ipath, f"{epath}/then", out)
                elif _e is not None:
                    return _e(v, ipath, f"{epath}/else", out)
                return True

            checks.append(if_then_else_fn)

        if "dependentRequired" in schema:
            deps = {k: list(v) for k, v in schema["dependentRequired"].items()}

            def deprequired_fn(v, ipath, epath, out, _deps=deps, _loc=loc):
                if not isinstance(v, dict):
                    return True
                ok = True
                for trigger, names in _deps.items():
                    if trigger not in v:
                        continue
                    for name in names:
                        if name not in v:
                            out.append(Violation(
                                epath, _loc, ipath, "dependentRequired",
                                f"has a dependency on '{name}' when "
                                f"'{trigger}' is present, but it is missing"))
                            ok = False
                return ok

            checks.append(deprequired_fn)

        if "dependentSchemas" in schema:
            dep_schemas = {
                k: self._compile(s, f"{spath}/dependentSchemas/"
                                 f"{k.replace('~', '~0').replace('/', '~1')}", None)
                for k, s in schema["dependentSchemas"].items()}

            def depschemas_fn(v, ipath, epath, out, _d=dep_schemas):
                if not isinstance(v, dict):
                    return True
                ok = True
                for trigger, fn in _d.items():
                    if trigger in v:
                        tesc = trigger.replace("~", "~0").replace("/", "~1")
                        if not fn(v, ipath, f"{epath}/dependentSchemas/{tesc}", out):
                            ok = False
                return ok

            checks.append(depschemas_fn)

        if "propertyNames" in schema:
            pn_fn = self._compile(schema["propertyNames"], f"{spath}/propertyNames", None)

            def propnames_fn(v, ipath, epath, out, _fn=pn_fn):
                if not isinstance(v, dict):
                    return True
                ok = True
                for key in v:
                    if not _fn(key, ipath, f"{epath}/propertyNames", out):
                        ok = False
                return ok

            checks.append(propnames_fn)

        if "minContains" in schema or "maxContains" in schema:
            if "contains" in schema:
                cc_fn = self._compile(schema["contains"], f"{spath}/contains", None)
                # contains defaults to 'at least 1' unless minContains overrides
                lo = schema.get("minContains", 1)
                hi = schema.get("maxContains")

                def contains_bounds_fn(v, ipath, epath, out, _fn=cc_fn,
                                       _lo=lo, _hi=hi, _loc=loc):
                    if not isinstance(v, list):
                        return True
                    n = sum(1 for i, item in enumerate(v)
                            if _fn(item, f"{ipath}/{i}", f"{epath}/contains", []))
                    ok = True
                    if _lo is not None and n < _lo:
                        out.append(Violation(
                            epath, _loc, ipath, "minContains",
                            f"must contain at least {_lo} valid items but found {n}"))
                        ok = False
                    if _hi is not None and n > _hi:
                        out.append(Violation(
                            epath, _loc, ipath, "maxContains",
                            f"must contain at most {_hi} valid items but found {n}"))
                        ok = False
                    return ok

                checks.append(contains_bounds_fn)

        if "unevaluatedProperties" in schema:
            up = schema["unevaluatedProperties"]
            up_fn = (None if isinstance(up, bool)
                     else self._compile(up, f"{spath}/unevaluatedProperties", None))
            this_schema = schema

            def uneval_props_fn(v, ipath, epath, out, _s=this_schema,
                                _up=up, _fn=up_fn, _loc=loc):
                if not isinstance(v, dict):
                    return True
                ev = self._evaluated_props(_s, v)
                if ev is None:
                    return True  # additionalProperties covered everything
                ok = True
                for key in v:
                    if key in ev:
                        continue
                    kesc = key.replace("~", "~0").replace("/", "~1")
                    if _up is False:
                        out.append(Violation(
                            epath, _loc, ipath, "unevaluatedProperties",
                            f"property '{key}' is not evaluated and the "
                            "schema does not allow unevaluated properties"))
                        ok = False
                    elif _fn is not None:
                        if not _fn(v[key], f"{ipath}/{kesc}",
                                   f"{epath}/unevaluatedProperties", out):
                            ok = False
                return ok

            checks.append(uneval_props_fn)

        if "unevaluatedItems" in schema:
            ui = schema["unevaluatedItems"]
            ui_fn = (None if isinstance(ui, bool)
                     else self._compile(ui, f"{spath}/unevaluatedItems", None))
            this_schema = schema

            def uneval_items_fn(v, ipath, epath, out, _s=this_schema,
                                _ui=ui, _fn=ui_fn, _loc=loc):
                if not isinstance(v, list):
                    return True
                n_prefix, all_items, contains_idx = self._evaluated_items(_s, v)
                if all_items:
                    return True
                ok = True
                for i in range(n_prefix, len(v)):
                    if i in contains_idx:
                        continue
                    if _ui is False:
                        out.append(Violation(
                            epath, _loc, ipath, "unevaluatedItems",
                            f"item at index {i} is not evaluated and the "
                            "schema does not allow unevaluated items"))
                        ok = False
                    elif _fn is not None:
                        if not _fn(v[i], f"{ipath}/{i}",
                                   f"{epath}/unevaluatedItems", out):
                            ok = False
                return ok

            checks.append(uneval_items_fn)

        if "not" in schema:
            n_fn = self._compile(schema["not"], f"{spath}/not", None)

            def not_fn(v, ipath, epath, out, _fn=n_fn, _loc=loc):
                if not _fn(v, ipath, f"{epath}/not", []):
                    return True
                out.append(Violation(epath, _loc, ipath, "not",
                                     "must not be valid to the schema"))
                return False

            checks.append(not_fn)

        if not checks:
            return lambda v, ipath, epath, out: True
        if len(checks) == 1:
            return checks[0]

        def all_checks(v, ipath, epath, out, _checks=tuple(checks)):
            ok = True
            for fn in _checks:
                if not fn(v, ipath, epath, out):
                    ok = False
            return ok

        return all_checks


def compile_schema(schema: dict, uri: str = "") -> CompiledSchema:
    return CompiledSchema(schema, uri)

"""ClickHouse/Arrow type-string → Spark DDL type mapping.

The reference lets users declare the return type of a remote function as a
string parsed by Arrow's ``DataType::from_str`` (reference src/udfs.rs:30-43),
e.g. ``'Float64'``, ``'Int64'``, ``'Utf8'``, ``'Boolean'``, ``'List(Utf8)'``.
We accept those Arrow names plus the ClickHouse spellings (``String``,
``Array(String)``, ``Nullable(T)``, ``DateTime``...) and produce Spark DDL
type strings understood by ``CAST(x AS <ddl>)`` and
``pyspark.sql.types._parse_datatype_string``.

ClickHouse arrays are non-nullable-element arrays (reference src/udfs.rs:66-73);
Spark's ``CAST`` produces ``containsNull=True`` arrays — a documented, benign
widening (we never *write* nulls into them).
"""

from __future__ import annotations

_SIMPLE = {
    # Arrow names (DataType::from_str) and ClickHouse names, lowercased.
    "int8": "TINYINT",
    "int16": "SMALLINT",
    "int32": "INT",
    "int64": "BIGINT",
    "uint8": "SMALLINT",
    "uint16": "INT",
    "uint32": "BIGINT",
    "uint64": "BIGINT",  # Spark has no unsigned 64-bit; BIGINT is the pragmatic map
    "float16": "FLOAT",
    "float32": "FLOAT",
    "float64": "DOUBLE",
    "utf8": "STRING",
    "largeutf8": "STRING",
    "utf8view": "STRING",
    "string": "STRING",
    "fixedstring": "STRING",
    "boolean": "BOOLEAN",
    "bool": "BOOLEAN",
    "date": "DATE",
    "date32": "DATE",
    "date64": "TIMESTAMP",
    "datetime": "TIMESTAMP",
    "datetime64": "TIMESTAMP",
    "timestamp": "TIMESTAMP",
    "binary": "BINARY",
    "largebinary": "BINARY",
    "uuid": "STRING",
    "ipv4": "STRING",
    "ipv6": "STRING",
    "json": "STRING",
    "null": "VOID",
}


class TypeParseError(ValueError):
    """Raised for an unrecognized ClickHouse/Arrow type string."""


def _split_top_level(s: str) -> list[str]:
    """Split a comma-separated list at paren depth 0."""
    parts, depth, cur = [], 0, []
    for c in s:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def ch_type_to_spark_ddl(type_str: str) -> str:
    """Map a declared ClickHouse/Arrow type string to a Spark DDL type.

    >>> ch_type_to_spark_ddl("Float64")
    'DOUBLE'
    >>> ch_type_to_spark_ddl("List(Utf8)")
    'ARRAY<STRING>'
    >>> ch_type_to_spark_ddl("Nullable(Int64)")
    'BIGINT'
    """
    s = type_str.strip()
    if not s:
        raise TypeParseError("empty type string")
    lpar = s.find("(")
    if lpar == -1:
        key = s.lower()
        if key in _SIMPLE:
            return _SIMPLE[key]
        raise TypeParseError(
            f"unrecognized type {type_str!r}; known: {sorted(_SIMPLE)}")
    head, inner = s[:lpar].strip().lower(), s[lpar + 1:s.rfind(")")]
    if head in ("list", "array", "largelist"):
        return f"ARRAY<{ch_type_to_spark_ddl(inner)}>"
    if head in ("nullable", "lowcardinality"):
        return ch_type_to_spark_ddl(inner)
    if head == "map":
        k, v = _split_top_level(inner)
        return f"MAP<{ch_type_to_spark_ddl(k)}, {ch_type_to_spark_ddl(v)}>"
    if head == "tuple":
        fields = _split_top_level(inner)
        cols = []
        for i, f in enumerate(fields, 1):
            # ClickHouse named-tuple elements: "name Type"
            bits = f.split(None, 1)
            if len(bits) == 2 and "(" not in bits[0]:
                cols.append(f"{bits[0]}: {ch_type_to_spark_ddl(bits[1])}")
            else:
                cols.append(f"_{i}: {ch_type_to_spark_ddl(f)}")
        return "STRUCT<" + ", ".join(cols) + ">"
    if head == "decimal":
        parts = _split_top_level(inner)
        if len(parts) == 2:
            return f"DECIMAL({parts[0]}, {parts[1]})"
        raise TypeParseError(f"decimal needs (precision, scale): {type_str!r}")
    if head in ("decimal32", "decimal64", "decimal128"):
        prec = {"decimal32": 9, "decimal64": 18, "decimal128": 38}[head]
        return f"DECIMAL({prec}, {inner.strip()})"
    if head in ("fixedstring", "datetime64", "datetime", "timestamp"):
        return "TIMESTAMP" if "date" in head or "time" in head else "STRING"
    if head == "enum8" or head == "enum16":
        return "STRING"
    raise TypeParseError(f"unrecognized parameterized type {type_str!r}")

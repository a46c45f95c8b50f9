"""JSON-Schema → StructType/DDL compiler (SURVEY §1.1 schema system).

The reference's schema system is *fixed, versioned, server-declared*:
each table's schema arrives as a JSON-Schema document from the API
(``get_table_schema``), carries a ``schemaVersion`` that increments on
evolution, and the client regenerates DDL on every version bump — it
never infers.  This module is the Spark-native compiler for those
documents: JSON-Schema → ``StructType`` (for ``spark.read.schema``)
and → a DDL column list (for ``CREATE TABLE`` / ``saveAsTable``).

Type mapping (SURVEY §1.1 "Types" row):

==============================  ==========================
JSON-Schema                     Spark
==============================  ==========================
``integer``                     ``LongType`` (int64 wire)
``number``                      ``DoubleType``
``boolean``                     ``BooleanType``
``string``                      ``StringType``
``string`` + format datetime    ``TimestampType`` (µs)
``string`` + format date        ``DateType``
``string`` + format uuid        ``StringType``
``enum`` (string values)        ``StringType``
``object`` / ``array``          ``StringType`` (serialized
                                JSON — CD2 jsonb payloads
                                stay strings; parse on
                                demand with ``from_json``)
==============================  ==========================

Nullability: columns listed in the document's ``required`` array (or
in the key block) compile to ``nullable=False``; everything else is
nullable — matching how the upstream DDL marks PK/NOT NULL columns.

Documents may be flat (one ``properties`` map) or key/value split the
way ``get_table_schema`` returns them (``properties.key`` +
``properties.value``, each an object schema); the split form compiles
to the flattened table shape with key columns first — the same column
order ``sources/envelope.py`` flattens to.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

_FORMAT_TYPES = {
    "date-time": T.TimestampType(),
    "datetime": T.TimestampType(),
    "date": T.DateType(),
}

_PRIMITIVE_TYPES = {
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
}


def _field_type(spec: dict[str, Any]) -> T.DataType:
    """Compile one property spec to a Spark type."""
    if "enum" in spec:
        return T.StringType()
    jt = spec.get("type")
    # JSON-Schema allows ["string", "null"]-style unions; nullability is
    # carried separately (required list), so strip the null member.
    if isinstance(jt, list):
        non_null = [t for t in jt if t != "null"]
        jt = non_null[0] if len(non_null) == 1 else None
    if jt == "string":
        return _FORMAT_TYPES.get(spec.get("format", ""), T.StringType())
    if jt in ("object", "array"):
        # CD2 jsonb-ish payloads: kept as serialized JSON strings at
        # rest; consumers parse on demand (SURVEY §2.7 F7).
        return T.StringType()
    if jt in _PRIMITIVE_TYPES:
        return _PRIMITIVE_TYPES[jt]
    raise ValueError(f"unsupported JSON-Schema type {spec.get('type')!r}")


def _object_fields(
    obj: dict[str, Any], force_required: bool = False
) -> list[T.StructField]:
    props: dict[str, Any] = obj.get("properties", {})
    required = set(obj.get("required", ()))
    return [
        T.StructField(
            name,
            _field_type(spec),
            nullable=not (force_required or name in required),
        )
        for name, spec in props.items()
    ]


def compile_json_schema(doc: dict[str, Any]) -> T.StructType:
    """Compile a server-declared table schema document to a StructType.

    ``doc`` is the ``get_table_schema``-shaped payload::

        {"tableName": "...", "schemaVersion": 3,
         "schema": {"type": "object",
                    "properties": {...}, "required": [...]}}

    or, key/value split::

        "schema": {"properties": {"key": {...}, "value": {...}}}

    The split form flattens to key columns (non-null) followed by
    value columns, mirroring the envelope flatten order.
    """
    schema = doc.get("schema", doc)
    props = schema.get("properties", {})

    def _is_object_schema(spec: Any) -> bool:
        return (
            isinstance(spec, dict)
            and spec.get("type", "object") == "object"
            and isinstance(spec.get("properties"), dict)
        )

    # Split form only when BOTH entries are object schemas carrying
    # their own properties maps — a legitimate flat table whose two
    # columns happen to be named 'key' and 'value' (the common kv-table
    # shape) must compile as flat, not be mis-flattened.
    if set(props) == {"key", "value"} and all(
        _is_object_schema(props[k]) for k in ("key", "value")
    ):
        return T.StructType(
            _object_fields(props["key"], force_required=True)
            + _object_fields(props["value"])
        )
    return T.StructType(_object_fields(schema))


def schema_version(doc: dict[str, Any]) -> int:
    """The document's schema version (0 when absent)."""
    return int(doc.get("schemaVersion", doc.get("version", 0)))


def ddl_for(doc: dict[str, Any]) -> str:
    """DDL column list regenerated from the document — what the
    upstream client rebuilds on every version bump."""
    struct = compile_json_schema(doc)
    parts = [
        f"{f.name} {f.dataType.simpleString().upper()}"
        + ("" if f.nullable else " NOT NULL")
        for f in struct.fields
    ]
    return ", ".join(parts)


def migrate(
    old_doc: dict[str, Any], new_doc: dict[str, Any]
) -> tuple[T.StructType, list[str]]:
    """Plan a version bump: returns the NEW StructType plus the list of
    added column names (columns the replica must backfill as NULL).

    Refuses narrowing changes the upstream never performs: dropping a
    column, changing a column's compiled type, or narrowing an existing
    column's nullability (nullable → NOT NULL) raises — history cannot
    be rewritten; additive evolution only (mergeSchema semantics,
    SURVEY §1.1). Added columns are forced NULLABLE in the returned
    StructType even when the new document marks them required: every
    historical part must surface NULL for them, so the migration read
    schema cannot claim NOT NULL.
    """
    if schema_version(new_doc) < schema_version(old_doc):
        raise ValueError(
            f"version regression: {schema_version(old_doc)} -> "
            f"{schema_version(new_doc)}"
        )
    old = {f.name: f for f in compile_json_schema(old_doc).fields}
    new_fields = []
    added = []
    for f in compile_json_schema(new_doc).fields:
        if f.name not in old:
            added.append(f.name)
            new_fields.append(T.StructField(f.name, f.dataType, nullable=True))
            continue
        if old[f.name].dataType != f.dataType:
            raise ValueError(
                f"type change on {f.name}: {old[f.name].dataType} -> "
                f"{f.dataType} (additive evolution only)"
            )
        if old[f.name].nullable and not f.nullable:
            raise ValueError(
                f"nullability narrowed on {f.name}: historical parts may "
                "hold NULLs, so nullable -> NOT NULL cannot migrate "
                "(additive evolution only)"
            )
        new_fields.append(f)
    new_struct = T.StructType(new_fields)
    dropped = set(old) - {f.name for f in new_struct.fields}
    if dropped:
        raise ValueError(f"columns dropped in v{schema_version(new_doc)}: {sorted(dropped)}")
    return new_struct, added

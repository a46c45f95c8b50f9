"""JSON-Schema → StructType compiler (SURVEY §1.1 schema system)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from canvas_data_2_aws_spark.sources.schema_compiler import (
    compile_json_schema,
    ddl_for,
    migrate,
    schema_version,
)

V1 = {
    "tableName": "courses",
    "schemaVersion": 3,
    "schema": {
        "type": "object",
        "properties": {
            "id": {"type": "integer"},
            "name": {"type": ["string", "null"]},
            "score": {"type": "number"},
            "active": {"type": "boolean"},
            "created_at": {"type": "string", "format": "date-time"},
            "start_date": {"type": "string", "format": "date"},
            "uuid": {"type": "string", "format": "uuid"},
            "state": {"enum": ["created", "deleted"]},
            "payload": {"type": "object"},
            "tags": {"type": "array"},
        },
        "required": ["id"],
    },
}


def test_type_mapping():
    st = compile_json_schema(V1)
    got = {f.name: f.dataType for f in st.fields}
    assert got == {
        "id": T.LongType(),
        "name": T.StringType(),
        "score": T.DoubleType(),
        "active": T.BooleanType(),
        "created_at": T.TimestampType(),
        "start_date": T.DateType(),
        "uuid": T.StringType(),
        "state": T.StringType(),
        "payload": T.StringType(),
        "tags": T.StringType(),
    }
    nullable = {f.name: f.nullable for f in st.fields}
    assert nullable["id"] is False
    assert nullable["name"] is True


def test_key_value_split_flattens_keys_first():
    doc = {
        "schemaVersion": 1,
        "schema": {
            "properties": {
                "key": {"properties": {"id": {"type": "integer"}}},
                "value": {
                    "properties": {"name": {"type": "string"}},
                },
            }
        },
    }
    st = compile_json_schema(doc)
    assert [f.name for f in st.fields] == ["id", "name"]
    assert st.fields[0].nullable is False


def test_ddl_regeneration():
    ddl = ddl_for(V1)
    assert ddl.startswith("id BIGINT NOT NULL, name STRING")
    assert "created_at TIMESTAMP" in ddl
    assert "start_date DATE" in ddl


def test_version_bump_adds_column():
    import copy

    v2 = copy.deepcopy(V1)
    v2["schemaVersion"] = 4
    v2["schema"]["properties"]["workflow_state"] = {"type": "string"}
    st, added = migrate(V1, v2)
    assert added == ["workflow_state"]
    assert schema_version(v2) == 4
    assert "workflow_state" in [f.name for f in st.fields]
    # regenerated DDL includes the new column
    assert "workflow_state STRING" in ddl_for(v2)


def test_migrate_refuses_narrowing():
    import copy

    dropped = copy.deepcopy(V1)
    dropped["schemaVersion"] = 4
    del dropped["schema"]["properties"]["name"]
    with pytest.raises(ValueError, match="dropped"):
        migrate(V1, dropped)

    retyped = copy.deepcopy(V1)
    retyped["schemaVersion"] = 4
    retyped["schema"]["properties"]["score"] = {"type": "string"}
    with pytest.raises(ValueError, match="type change"):
        migrate(V1, retyped)

    regressed = copy.deepcopy(V1)
    regressed["schemaVersion"] = 2
    with pytest.raises(ValueError, match="regression"):
        migrate(V1, regressed)


def test_flat_table_named_key_value_stays_flat():
    """A legitimate flat table whose only columns are literally 'key'
    and 'value' (the common kv-table shape) must NOT be mis-compiled
    into the get_table_schema split form — the split path engages only
    when both entries are object schemas with their own properties."""
    doc = {
        "schemaVersion": 1,
        "schema": {
            "properties": {
                "key": {"type": "string"},
                "value": {"type": "number"},
            },
            "required": ["key"],
        },
    }
    st = compile_json_schema(doc)
    assert [f.name for f in st.fields] == ["key", "value"]
    assert st.fields[0].dataType == T.StringType()
    assert st.fields[1].dataType == T.DoubleType()
    assert st.fields[0].nullable is False


def test_migrate_forces_added_required_column_nullable():
    """An added column that the new doc marks required still compiles
    nullable in the MIGRATION StructType: every historical part must
    surface NULL for it."""
    import copy

    v2 = copy.deepcopy(V1)
    v2["schemaVersion"] = 4
    v2["schema"]["properties"]["sync_origin"] = {"type": "string"}
    v2["schema"]["required"] = ["id", "sync_origin"]
    st, added = migrate(V1, v2)
    assert added == ["sync_origin"]
    by_name = {f.name: f for f in st.fields}
    assert by_name["sync_origin"].nullable is True
    # while the standalone compile of v2 honors the required flag
    fresh = {f.name: f for f in compile_json_schema(v2).fields}
    assert fresh["sync_origin"].nullable is False


def test_migrate_refuses_nullability_narrowing():
    """Newly marking an EXISTING column required (nullable -> NOT NULL)
    must raise: historical parts may hold NULLs."""
    import copy

    v2 = copy.deepcopy(V1)
    v2["schemaVersion"] = 4
    v2["schema"]["required"] = ["id", "name"]
    with pytest.raises(ValueError, match="nullability narrowed on name"):
        migrate(V1, v2)


def test_unsupported_type_raises():
    with pytest.raises(ValueError, match="unsupported"):
        compile_json_schema({"schema": {"properties": {"x": {"type": "weird"}}}})

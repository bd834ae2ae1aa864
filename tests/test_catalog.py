"""Catalog provider hierarchy tests.

Reference parity: `core/src/catalog/mod.rs` (CatalogProvider),
`schema.rs` (SchemaProvider), `register_catalog`, and the SQL surface of
`sqllogictest/test_files/information_schema_multiple_catalogs.slt`
(CREATE DATABASE / CREATE SCHEMA cat.schema / SET default_catalog).
"""
import numpy as np
import pytest

import datafusion_tpu as df
from datafusion_tpu.catalog import (CatalogProvider, MemoryCatalogProvider,
                                    MemorySchemaProvider, SchemaProvider)
from datafusion_tpu.common.errors import PlanError
from datafusion_tpu.datasource.memory import MemTable


@pytest.fixture
def ctx():
    c = df.SessionContext()
    c.config.options.set("datafusion.catalog.information_schema", True)
    return c


def _mem(n=3):
    return MemTable.from_arrays({"a": np.arange(n, dtype=np.int64)})


def test_register_custom_catalog(ctx):
    cat = MemoryCatalogProvider()
    sp = MemorySchemaProvider()
    sp.register_table("t", _mem())
    cat.register_schema("s", sp)
    assert ctx.register_catalog("my_cat", cat) is None
    out = ctx.sql("SELECT sum(a) s FROM my_cat.s.t").to_pydict()
    assert out == {"s": [3]}
    # re-registering returns the previous provider
    assert ctx.register_catalog("my_cat", MemoryCatalogProvider()) is cat
    assert ctx.catalog("datafusion") is not None


def test_third_party_provider_protocol(ctx):
    """Any object with schema_names()/schema() works — the trait-object
    extension point."""
    class OneTableSchema(SchemaProvider):
        def table_names(self):
            return ["only"]

        def table(self, name):
            return _mem(5) if name == "only" else None

    class OneSchemaCatalog(CatalogProvider):
        def schema_names(self):
            return ["ext"]

        def schema(self, name):
            return OneTableSchema() if name == "ext" else None

    ctx.register_catalog("plugin", OneSchemaCatalog())
    out = ctx.sql("SELECT count(*) c FROM plugin.ext.only").to_pydict()
    assert out == {"c": [5]}
    names = ctx.sql("SELECT table_name FROM information_schema.tables "
                    "WHERE table_catalog = 'plugin' AND "
                    "table_schema <> 'information_schema'").to_pydict()
    assert names["table_name"] == ["only"]


def test_external_schema_in_default_catalog(ctx):
    sp = MemorySchemaProvider()
    sp.register_table("ext_t", _mem(4))
    ctx.catalog("datafusion").register_schema("extschema", sp)
    out = ctx.sql("SELECT count(*) c FROM extschema.ext_t").to_pydict()
    assert out == {"c": [4]}


def test_create_database_and_qualified_schema(ctx):
    ctx.sql("CREATE DATABASE my_catalog")
    ctx.sql("CREATE SCHEMA my_catalog.my_schema")
    ctx.sql("SET datafusion.catalog.default_catalog = my_catalog")
    ctx.sql("SET datafusion.catalog.default_schema = my_schema")
    ctx.sql("CREATE TABLE t1 AS VALUES (1)")
    ctx.sql("CREATE TABLE t2 AS VALUES (2)")
    ctx.sql("CREATE DATABASE my_other_catalog")
    ctx.sql("CREATE SCHEMA my_other_catalog.my_other_schema")
    ctx.sql("SET datafusion.catalog.default_catalog = my_other_catalog")
    ctx.sql("SET datafusion.catalog.default_schema = my_other_schema")
    ctx.sql("CREATE TABLE t3 AS VALUES (3)")

    rows = ctx.sql(
        "SELECT table_catalog, table_schema, table_name "
        "FROM information_schema.tables WHERE table_schema <> "
        "'information_schema' ORDER BY 1, 2, 3").to_pydict()
    assert rows["table_catalog"] == ["my_catalog", "my_catalog",
                                     "my_other_catalog"]
    assert rows["table_schema"] == ["my_schema", "my_schema",
                                    "my_other_schema"]
    assert rows["table_name"] == ["t1", "t2", "t3"]

    # unqualified resolution follows the session defaults
    assert ctx.sql("SELECT * FROM t3").to_pydict() == {"column1": [3]}
    # fully qualified reaches across catalogs
    assert ctx.sql("SELECT * FROM my_catalog.my_schema.t1"
                   ).to_pydict() == {"column1": [1]}
    ctx.sql("DROP TABLE t3")
    ctx.sql("SET datafusion.catalog.default_catalog = my_catalog")
    ctx.sql("SET datafusion.catalog.default_schema = my_schema")
    ctx.sql("DROP TABLE t1")
    ctx.sql("DROP TABLE t2")
    left = ctx.sql("SELECT table_name FROM information_schema.tables "
                   "WHERE table_schema NOT IN ('information_schema')"
                   ).to_pydict()
    assert left["table_name"] == []


def test_create_database_errors(ctx):
    ctx.sql("CREATE DATABASE db1")
    ctx.sql("CREATE DATABASE IF NOT EXISTS db1")
    with pytest.raises(PlanError):
        ctx.sql("CREATE DATABASE db1")
    ctx.sql("DROP DATABASE db1")
    with pytest.raises(PlanError):
        ctx.sql("DROP DATABASE db1")
    with pytest.raises(PlanError):
        ctx.sql("DROP DATABASE datafusion")   # can't drop the default


def test_information_schema_meta_views(ctx):
    out = ctx.sql("SELECT table_schema, table_name FROM "
                  "information_schema.tables WHERE table_catalog = "
                  "'datafusion' ORDER BY table_name").to_pydict()
    assert out["table_schema"] == ["information_schema"] * 5
    assert out["table_name"] == ["columns", "df_settings", "schemata",
                                 "tables", "views"]


def test_information_schema_views_definition(ctx):
    ctx.register_arrays("base", {"a": np.arange(3, dtype=np.int64)})
    ctx.sql("CREATE VIEW v AS SELECT a FROM base WHERE a > 0")
    out = ctx.sql("SELECT table_name, definition FROM "
                  "information_schema.views").to_pydict()
    assert out["table_name"] == ["v"]
    assert "SELECT" in out["definition"][0]


def test_schemata_lists_all_catalogs(ctx):
    ctx.sql("CREATE DATABASE extra")
    ctx.sql("CREATE SCHEMA extra.s9")
    out = ctx.sql("SELECT catalog_name, schema_name FROM "
                  "information_schema.schemata "
                  "WHERE schema_name = 's9'").to_pydict()
    assert out["catalog_name"] == ["extra"]


def test_default_schema_resolution_and_drop(ctx):
    ctx.sql("CREATE SCHEMA app")
    ctx.sql("SET datafusion.catalog.default_schema = app")
    ctx.sql("CREATE TABLE cfg AS VALUES (7)")
    assert ctx.sql("SELECT * FROM cfg").to_pydict() == {"column1": [7]}
    assert ctx.sql("SELECT * FROM app.cfg").to_pydict() == {"column1": [7]}
    # SHOW TABLES is now a view over information_schema.tables, which
    # also lists the virtual meta views — filter to base tables
    rows = [(s, t) for s, t, ty in zip(*[ctx.sql("SHOW TABLES").to_pydict()[c]
            for c in ("table_schema", "table_name", "table_type")])
            if ty == "BASE TABLE"]
    assert rows == [("app", "cfg")]
    ctx.sql("DROP TABLE cfg")
    ctx.sql("SET datafusion.catalog.default_schema = public")
    with pytest.raises(PlanError):
        ctx.sql("SELECT * FROM app.cfg")

"""Excel⇄YAML config compiler (S9/K5) — pure-grammar tests, no
spreadsheet library needed."""

from __future__ import annotations

import pytest

from orion_etl_oracle_to_postgres_spark import configgen as cg
from orion_etl_oracle_to_postgres_spark.spec import load_job_spec


# --- lookup cell grammar ----------------------------------------------


@pytest.mark.parametrize(
    "cell,expected",
    [
        (
            "skip:dim_curr.code=id",
            {"table": "dim_curr", "key_column": "code", "value_column": "id", "on_missing": "skip"},
        ),
        (
            "null:dim_curr.code=id",
            {"table": "dim_curr", "key_column": "code", "value_column": "id"},
        ),
        ("dim.k", {"table": "dim", "key_column": "k"}),
        (
            "default:0:dim.k=dim.v",
            # on_missing keeps only the FIRST ':'-part (reference parts[0])
            {"table": "dim", "key_column": "k", "value_column": "v", "on_missing": "default"},
        ),
    ],
)
def test_parse_lookup_cell(cell, expected):
    assert cg.parse_lookup_cell(cell) == expected


def test_parse_lookup_cell_rejects_missing_dot():
    with pytest.raises(ValueError):
        cg.parse_lookup_cell("skip:noTableDot=v")


@pytest.mark.parametrize(
    "lookup",
    [
        {"table": "d", "key_column": "k"},
        {"table": "d", "key_column": "k", "value_column": "v"},
        {"table": "d", "key_column": "k", "value_column": "v", "on_missing": "skip"},
    ],
)
def test_lookup_cell_round_trip(lookup):
    assert cg.parse_lookup_cell(cg.format_lookup_cell(lookup)) == lookup


# --- validation cell grammar ------------------------------------------


def test_parse_validation_cell_all_types():
    rules = cg.parse_validation_cell(
        "regex:^[A-Z]+$,range:0-100,lookup:dim.k:skip"
    )
    assert rules == [
        {"type": "regex", "pattern": "^[A-Z]+$"},
        {"type": "range", "pattern": "0-100"},
        {
            "type": "lookup",
            "lookup": {"table": "dim", "key_column": "k", "on_missing": "skip"},
            "on_fail": "skip",
        },
    ]


def test_validation_cell_round_trip():
    cell = "regex:^x,range:1-9,lookup:d.k:error"
    assert cg.format_validation_cell(cg.parse_validation_cell(cell)) == cell


def test_parse_validation_cell_rejects_unknown_type():
    with pytest.raises(ValueError):
        cg.parse_validation_cell("frobnicate:stuff")


# --- sheet assembly ----------------------------------------------------

TABLES_ROWS = [
    {
        "source_table": "SRC.CUSTOMER",
        "source_schema": "SRC",
        "target_table": "analytics.customer_clean",
        "target_schema": None,
        "mappings": "customer_map",
        "where": "c_acctbal > 0",
        "transform_override": "true",
        "transform_plugins": "default_transform, my_plugin",
        "fetcher_plugin": None,
        "loader_plugin": None,
    },
    {"source_table": None, "target_table": "ignored"},  # skipped row
]

MAPPING_SHEETS = {
    "customer_map": [
        {
            "source": "C_NAME",
            "target": "name",
            "transform": "strip, upper",
            "lookup": "skip:nation.n_name=n_nationkey",
            "validation": "regex:^[A-Z]",
        },
        {"source": "C_ACCTBAL", "target": "balance", "transform": None},
    ]
}


def test_workbook_to_configs_assembly():
    main, tables = cg.workbook_to_configs(
        TABLES_ROWS, MAPPING_SHEETS, tables_folder="tbls"
    )
    assert main["global"]["tables_folder"] == "tbls"
    assert main["global"]["table_files"] == ["customer_clean.yaml"]
    cfg = tables["customer_clean.yaml"]
    # schema split off a qualified target name
    assert cfg["target_schema"] == "analytics"
    assert cfg["target_table"] == "customer_clean"
    assert cfg["transform_override"] is True
    assert cfg["transform_plugins"] == ["default_transform", "my_plugin"]
    m0 = cfg["mappings"][0]
    assert m0["transform"] == ["strip", "upper"]
    assert m0["lookup"]["on_missing"] == "skip"
    assert m0["validation"][0]["pattern"] == "^[A-Z]"


def test_workbook_missing_mapping_sheet_raises():
    rows = [dict(TABLES_ROWS[0], mappings="nope")]
    with pytest.raises(ValueError):
        cg.workbook_to_configs(rows, {})


def test_round_trip_through_sheets():
    main, tables = cg.workbook_to_configs(TABLES_ROWS, MAPPING_SHEETS)
    rows2, sheets2 = cg.specs_to_sheets(main, tables)
    main2, tables2 = cg.workbook_to_configs(rows2, sheets2)
    assert tables2 == tables


def test_written_configs_load_as_job_spec(tmp_path):
    """The emitted YAML must parse through the engine's own spec loader."""
    main, tables = cg.workbook_to_configs(TABLES_ROWS, MAPPING_SHEETS)
    # spec loader requires connectors for a runnable job; grammar output
    # is merged over a base global (reference preserves existing global)
    main["global"]["connectors"] = {"source_files": {"base_path": str(tmp_path)}}
    cg.write_configs(str(tmp_path), main, tables)
    job = load_job_spec(str(tmp_path / "config.yaml"))
    assert [t.target_table for t in job.tables] == ["customer_clean"]
    t = job.tables[0]
    assert t.mappings[0].transform == ["strip", "upper"]
    assert t.mappings[0].lookup.table == "nation"
    assert t.mappings[0].validation[0].type == "regex"


# --- real xlsx I/O (stdlib xlsx_lite fallback; upgrades to openpyxl
# transparently when installed) ----------------------------------------


def test_xlsx_file_round_trip(tmp_path):
    """configs → .xlsx on disk → configs: the FULL file round-trip
    executes (S9/K5), not just the in-memory sheet assembly."""
    main, tables = cg.workbook_to_configs(TABLES_ROWS, MAPPING_SHEETS)
    path = str(tmp_path / "main.xlsx")
    cg.configs_to_xlsx(path, main, tables)
    main2, tables2 = cg.xlsx_to_configs(path)
    assert tables2 == tables
    assert main2["global"]["table_files"] == main["global"]["table_files"]


def test_xlsx_to_yaml_to_job_spec(tmp_path):
    """xlsx on disk → YAML tree → engine spec loader end-to-end."""
    main, tables = cg.workbook_to_configs(TABLES_ROWS, MAPPING_SHEETS)
    path = str(tmp_path / "main.xlsx")
    cg.configs_to_xlsx(path, main, tables)

    main2, tables2 = cg.xlsx_to_configs(path)
    main2["global"]["connectors"] = {"source_files": {"base_path": str(tmp_path)}}
    cg.write_configs(str(tmp_path), main2, tables2)
    job = load_job_spec(str(tmp_path / "config.yaml"))
    t = job.tables[0]
    assert t.target_table == "customer_clean"
    assert t.mappings[0].lookup.on_missing == "skip"
    assert t.mappings[1].target == "balance"


def test_xlsx_lite_value_types(tmp_path):
    """The stdlib reader handles inline strings, shared strings,
    numbers, and booleans (so it can also read pandas-written files)."""
    from orion_etl_oracle_to_postgres_spark.xlsx_lite import read_xlsx, write_xlsx

    path = str(tmp_path / "t.xlsx")
    write_xlsx(
        path,
        {
            "s1": (
                ["a", "b", "c"],
                [{"a": "x,y", "b": 3, "c": True}, {"a": None, "b": 2.5, "c": False}],
            )
        },
    )
    rows = read_xlsx(path)["s1"]
    # everything written inline-string: values come back as strings
    assert rows[0]["a"] == "x,y" and rows[0]["b"] == "3"
    assert cg.cell_bool(rows[0]["c"]) is True
    assert rows[1]["a"] is None
    assert cg.cell_bool(rows[1]["c"]) is False


def test_xlsx_lite_sheet_name_with_quote(tmp_path):
    from orion_etl_oracle_to_postgres_spark.xlsx_lite import read_xlsx, write_xlsx

    path = str(tmp_path / "q.xlsx")
    write_xlsx(path, {'tbl"2024': (["a"], [{"a": "x"}])})
    assert read_xlsx(path)['tbl"2024'] == [{"a": "x"}]

"""S6/K7/F12/J4 — binaryFile scan, fix-imports rewrite, snapshot overwrite."""

import os

import pytest
from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.sources.files import (
    build_file_index,
    fix_imports,
    scan_files,
)
from etherscan_contract_crawler_spark.storage.icetable import SnapshotTable


@pytest.fixture(scope="module")
def sol_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("contracts")
    sub = d / "0xabc_Token"
    sub.mkdir()
    (sub / "01_03_Token.sol").write_text(
        'pragma solidity ^0.8.0;\nimport "../lib/SafeMath.sol";\ncontract Token {}\n'
    )
    (sub / "02_03_SafeMath.sol").write_text("library SafeMath {}\n")
    (sub / "03_03_Vendor.sol").write_text(
        'import "@openzeppelin/contracts/Missing.sol";\n//plain line\n'
    )
    return str(d)


def test_scan_files_binaryfile_source(spark, sol_dir):
    df = scan_files(spark, os.path.join(sol_dir, "*", "*.sol"))
    rows = {os.path.basename(r["path"]): r for r in df.collect()}
    assert set(rows) == {"01_03_Token.sol", "02_03_SafeMath.sol", "03_03_Vendor.sol"}
    assert "library SafeMath" in rows["02_03_SafeMath.sol"]["text"]
    assert rows["01_03_Token.sol"]["length"] > 0


def test_build_file_index_strips_seq_prefix(spark, sol_dir):
    files = scan_files(spark, os.path.join(sol_dir, "*", "*.sol"))
    idx = {r["basename"]: r["idx_path"] for r in build_file_index(files).collect()}
    assert "SafeMath.sol" in idx
    assert idx["SafeMath.sol"].endswith("02_03_SafeMath.sol")


def test_fix_imports_rewrites_resolved_and_fallback(spark, sol_dir):
    files = scan_files(spark, os.path.join(sol_dir, "*", "*.sol"))
    out = {os.path.basename(r["path"]): r for r in fix_imports(files).collect()}
    token = out["01_03_Token.sol"]
    assert token["changed"]
    # resolved against the sibling index -> relative path to the real file
    assert 'import "02_03_SafeMath.sol";' in token["new_text"]
    # non-import lines untouched, order preserved
    assert token["new_text"].splitlines()[0] == "pragma solidity ^0.8.0;"
    vendor = out["03_03_Vendor.sol"]
    assert 'import "node_modules/Missing.sol";' in vendor["new_text"]
    assert "//plain line" in vendor["new_text"]
    # a file with no imports is unchanged
    assert not out["02_03_SafeMath.sol"]["changed"]


def test_snapshot_overwrite_with_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.create("k long, v string")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    sid_before = t.current_snapshot_id()
    t.overwrite(spark.createDataFrame([(1, "a2")], "k long, v string"))
    assert [(r["k"], r["v"]) for r in t.read(spark).collect()] == [(1, "a2")]
    old = t.read(spark, version=sid_before)
    assert sorted((r["k"], r["v"]) for r in old.collect()) == [(1, "a"), (2, "b")]
    # append after overwrite only sees the overwritten base
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 3]

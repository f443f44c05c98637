"""Whisper archive round-trip (cmd/whisper_import parity)."""

from __future__ import annotations

from tgres_spark.sources.whisper import (
    parse_whisper_bytes,
    read_whisper,
    write_whisper_bytes,
)


def test_roundtrip_bytes():
    archives = [
        (60, [(1000, 1.5), (1060, 2.5), (0, 0.0)]),  # ts=0 → empty slot
        (3600, [(3600, 10.0)]),
    ]
    blob = write_whisper_bytes(archives)
    rows = parse_whisper_bytes("web.cpu", blob)
    assert ("web.cpu", 60, 1000, 1.5) in rows
    assert ("web.cpu", 60, 1060, 2.5) in rows
    assert ("web.cpu", 3600, 3600, 10.0) in rows
    assert len(rows) == 3  # empty slot skipped


def test_read_whisper_via_spark(spark, tmp_path):
    d = tmp_path / "wsp"
    d.mkdir()
    for host in ("h1", "h2"):
        blob = write_whisper_bytes([(60, [(1000, 1.0), (1060, 2.0)])])
        (d / f"{host}.wsp").write_bytes(blob)
    df = read_whisper(spark, str(d))
    rows = {(r["name"], r["t"]): r["value"] for r in df.collect()}
    assert rows[("h1", 1000)] == 1.0 and rows[("h2", 1060)] == 2.0
    assert df.columns == ["name", "archive_step", "t", "value"]


def test_read_whisper_nested_tree(spark, tmp_path):
    """a/cpu.wsp and b/cpu.wsp must NOT collide: names come from the
    path relative to the import root (process.go:328-329)."""
    root = tmp_path / "graphite"
    for sub in ("a", "b"):
        (root / sub).mkdir(parents=True)
        blob = write_whisper_bytes([(60, [(1000, 1.0)])])
        (root / sub / "cpu.wsp").write_bytes(blob)
    df = read_whisper(spark, str(root) + "/*/*.wsp")
    names = {r["name"] for r in df.collect()}
    assert names == {"a.cpu", "b.cpu"}


def test_series_name_helper():
    from tgres_spark.sources.whisper import _infer_root, _series_name

    assert _infer_root("/data/wsp/*/*.wsp") == "/data/wsp"
    assert _infer_root("/data/wsp/a/cpu.wsp") == "/data/wsp/a"
    assert _infer_root("/data/wsp") == "/data/wsp"
    assert _series_name("file:/data/wsp/a/b/cpu.wsp", "/data/wsp") == "a.b.cpu"
    assert _series_name("/data/other/cpu.wsp", "/data/wsp") == "cpu"


def test_truncated_file_raises():
    import pytest

    with pytest.raises(ValueError, match="truncated"):
        parse_whisper_bytes("x", b"\x00\x01")

"""Carbon pickle protocol (daemon/graphite_pickle.go parity)."""

from __future__ import annotations

import pickle
import struct

import pytest

from tgres_spark.sources.carbon_pickle import (
    dumps_datapoints,
    loads_datapoints,
    parse_pickle_frames,
    read_pickle_files,
    read_pickle_stream,
)

ROWS = [("web.a.hits", 100, 1.5), ("web.b.hits", 160, 2.0), ("c", 220, 3.25)]


def test_roundtrip_bytes():
    blob = dumps_datapoints(ROWS, frame_rows=2)  # → 2 frames
    assert loads_datapoints(blob) == ROWS


def test_int_values_and_tuple_batches():
    # carbon may send ints for value and tuples for the batch
    payload = pickle.dumps((("m", (100, 7)),), protocol=2)
    blob = struct.pack(">I", len(payload)) + payload
    assert loads_datapoints(blob) == [("m", 100, 7.0)]


def test_malformed_frames_raise():
    with pytest.raises(ValueError, match="truncated length"):
        loads_datapoints(b"\x00\x00")
    with pytest.raises(ValueError, match="truncated frame"):
        loads_datapoints(struct.pack(">I", 99) + b"abc")
    bad = pickle.dumps([("name-only",)], protocol=2)
    with pytest.raises(ValueError, match="wrong length"):
        loads_datapoints(struct.pack(">I", len(bad)) + bad)


def test_unpickler_refuses_globals():
    evil = b"cos\nsystem\n(S'true'\ntR."  # classic pickle RCE shape
    blob = struct.pack(">I", len(evil)) + evil
    with pytest.raises(pickle.UnpicklingError, match="forbidden"):
        loads_datapoints(blob)


def test_spark_roundtrip(spark):
    from tgres_spark.sources.carbon_pickle import encode_pickle_frames

    dps = spark.createDataFrame(ROWS, "name string, t long, value double")
    out = parse_pickle_frames(encode_pickle_frames(dps)).collect()
    assert sorted((r["name"], r["t"], r["value"]) for r in out) == sorted(ROWS)


def test_batch_and_stream_file_reads_agree(spark, tmp_path):
    spool = tmp_path / "spool"
    spool.mkdir()
    (spool / "a.pkl").write_bytes(dumps_datapoints(ROWS[:2]))
    (spool / "b.pkl").write_bytes(dumps_datapoints(ROWS[2:]))

    batch = read_pickle_files(spark, str(spool))
    got_batch = sorted((r["name"], r["t"], r["value"]) for r in batch.collect())
    assert got_batch == sorted(ROWS)

    out_dir = tmp_path / "out"
    q = (
        read_pickle_stream(spark, str(spool))
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_stream = sorted(
        (r["name"], r["t"], r["value"])
        for r in spark.read.parquet(str(out_dir)).collect()
    )
    assert got_stream == got_batch

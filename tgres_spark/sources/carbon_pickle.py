"""Carbon pickle protocol — graphite's second wire format.

Reference: daemon/graphite_pickle.go:142-198 — a connection carries a
stream of ``[u32 big-endian length][pickle payload]`` frames; each
payload unpickles to a list/tuple of ``(name, (timestamp, value))``
items; value may be an int or a float, timestamp is epoch seconds.
Carbon relays speak this by default, so an ingest tier must accept it.

Spark shape: frames are opaque ``binary`` rows — from a binaryFile
batch load, a socket-capture table, or a binaryFile *file stream* —
and decoding is an Arrow-batched mapInPandas. The very same function
object serves batch AND Structured Streaming, so their semantics match
by construction (the pattern streaming/ingest.py uses for the line
protocols).

Safety: payloads are untrusted network input. A restricted Unpickler
refuses ANY global/class lookup — carbon batches are pure
list/tuple/str/number structures — mirroring the reference's use of a
no-objects pickle reader (stalecucumber) rather than a full VM.
"""

from __future__ import annotations

import io
import pickle
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


class _SafeUnpickler(pickle.Unpickler):
    def find_class(self, module, name):  # pragma: no cover - guard
        raise pickle.UnpicklingError(
            f"global '{module}.{name}' is forbidden in carbon frames"
        )


def loads_datapoints(stream: bytes) -> list[tuple[str, int, float]]:
    """One length-prefixed frame stream → [(name, t, value)].

    Malformed input raises (truncated prefix/frame, non-sequence
    payload, wrong item shape) — the reference drops the connection on
    the same conditions (graphite_pickle.go:159-191)."""
    out: list[tuple[str, int, float]] = []
    view = memoryview(stream)
    off = 0
    while off < len(view):
        if off + 4 > len(view):
            raise ValueError("truncated length prefix")
        (n,) = struct.unpack(">I", view[off : off + 4])
        off += 4
        if off + n > len(view):
            raise ValueError(f"truncated frame: want {n}, have {len(view) - off}")
        items = _SafeUnpickler(io.BytesIO(bytes(view[off : off + n]))).load()
        off += n
        if not isinstance(items, (list, tuple)):
            raise ValueError(f"payload is {type(items).__name__}, not a sequence")
        for item in items:
            if not isinstance(item, (list, tuple)) or len(item) != 2:
                raise ValueError("item wrong length")
            name, dp = item
            if not isinstance(dp, (list, tuple)) or len(dp) != 2:
                raise ValueError("dp wrong length")
            t, v = dp
            out.append((str(name), int(t), float(v)))
    return out


def dumps_datapoints(
    rows: list[tuple[str, int, float]], frame_rows: int = 1000
) -> bytes:
    """Inverse of loads_datapoints (fixtures/export): datapoints →
    length-prefixed frame stream, ``frame_rows`` items per frame.
    Protocol 2, carbon's default."""
    chunks = []
    for i in range(0, len(rows), frame_rows):
        payload = pickle.dumps(
            [(n, (int(t), float(v))) for n, t, v in rows[i : i + frame_rows]],
            protocol=2,
        )
        chunks.append(struct.pack(">I", len(payload)) + payload)
    return b"".join(chunks)


def parse_pickle_frames(frames: DataFrame, col: str = "frame") -> DataFrame:
    """frames(col: binary) → (name, t, value). Arrow-batched; works
    identically on batch and streaming DataFrames."""

    def fn(batches):
        for pdf in batches:
            rows: list[tuple[str, int, float]] = []
            for blob in pdf[col]:
                rows.extend(loads_datapoints(bytes(blob)))
            out = pd.DataFrame(rows, columns=["name", "t", "value"])
            yield out.astype({"name": "str", "t": "int64", "value": "float64"})

    return frames.select(col).mapInPandas(
        fn, schema="name string, t long, value double"
    )


def encode_pickle_frames(dps: DataFrame, frame_rows: int = 1000) -> DataFrame:
    """(name, t, value) → frames(binary), one frame per ``frame_rows``
    slice of each Arrow batch — the distributed fixture generator (and
    an export path for feeding a real carbon relay)."""

    def fn(batches):
        for pdf in batches:
            for i in range(0, len(pdf), frame_rows):
                chunk = pdf.iloc[i : i + frame_rows]
                rows = list(
                    zip(chunk["name"], chunk["t"], chunk["value"], strict=True)
                )
                yield pd.DataFrame({"frame": [dumps_datapoints(rows, frame_rows)]})

    return dps.select("name", "t", "value").mapInPandas(fn, schema="frame binary")


def read_pickle_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Batch: .pkl spool files (one frame stream per file) → datapoints.
    One task per file; no driver involvement."""
    files = spark.read.format("binaryFile").load(path_glob)
    return parse_pickle_frames(
        files.select(files["content"].alias("frame"))
    )


def read_pickle_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming: file-drop of frame-stream spool files → datapoints,
    via the SAME parse function as batch (binaryFile is a supported
    structured-streaming file source)."""
    files = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is fixed but streaming sources require it
        # to be stated explicitly
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .load(path)
    )
    return parse_pickle_frames(
        files.select(files["content"].alias("frame"))
    )

"""Whisper (Graphite archive) importer.

Reference: cmd/whisper_import/main.go — migrates Graphite's on-disk
.wsp archives into tgres. The format is public and simple:

    header:   aggregationType u32, maxRetention u32, xff f32, archiveCount u32
    archive:  offset u32, secondsPerPoint u32, points u32   (per archive)
    points:   (timestamp u32, value f64) * points           (big-endian)

Spark shape: spark.read.format('binaryFile') over a .wsp glob →
mapInPandas parse (struct unpack per file, vectorized emit) → one
SeriesFrame per archive resolution. Scales to a whole Graphite
cluster's archive tree: one task per file, no driver involvement.
"""

from __future__ import annotations

import os
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

AGG_NAMES = {1: "average", 2: "sum", 3: "last", 4: "max", 5: "min"}


def parse_whisper_bytes(name: str, blob: bytes) -> list[tuple[str, int, int, float]]:
    """→ [(series_name, archive_step, t, value)] for non-empty points."""
    if len(blob) < 16:
        raise ValueError(f"{name}: truncated whisper header")
    _agg, _max_ret, _xff, n_arch = struct.unpack(">LLfL", blob[:16])
    archives = []
    for i in range(n_arch):
        off = 16 + i * 12
        offset, spp, points = struct.unpack(">LLL", blob[off : off + 12])
        archives.append((offset, spp, points))
    out = []
    for offset, spp, points in archives:
        for p in range(points):
            o = offset + p * 12
            ts, val = struct.unpack(">Ld", blob[o : o + 12])
            if ts != 0:  # empty slot
                out.append((name, spp, ts, val))
    return out


def write_whisper_bytes(
    archives: list[tuple[int, list[tuple[int, float]]]],
    agg: int = 1,
    xff: float = 0.5,
) -> bytes:
    """Inverse of parse (for tests + export): archives = [(seconds_per
    point, [(ts, value), ...])]."""
    n = len(archives)
    header_len = 16 + n * 12
    blobs, infos, off = [], [], header_len
    max_ret = 0
    for spp, pts in archives:
        infos.append((off, spp, len(pts)))
        max_ret = max(max_ret, spp * len(pts))
        b = b"".join(struct.pack(">Ld", ts, v) for ts, v in pts)
        blobs.append(b)
        off += len(b)
    head = struct.pack(">LLfL", agg, max_ret, xff, n)
    for info in infos:
        head += struct.pack(">LLL", *info)
    return head + b"".join(blobs)


def _infer_root(path_glob: str) -> str:
    """Import root = the literal directory prefix of the glob."""
    for i, ch in enumerate(path_glob):
        if ch in "*?[":
            return os.path.dirname(path_glob[:i])
    if path_glob.endswith(".wsp"):
        return os.path.dirname(path_glob)
    return path_glob


def _series_name(uri: str, root: str) -> str:
    """Graphite convention (cmd/whisper_import/process.go:328-329):
    the path *relative to the import root*, '.wsp' stripped, '/'→'.'
    — so <root>/a/b/c.wsp → a.b.c, and nested trees like a/cpu.wsp vs
    b/cpu.wsp keep distinct names (a.cpu, b.cpu)."""
    from urllib.parse import unquote, urlparse

    p = urlparse(uri).path if "://" in uri or uri.startswith("file:") else uri
    p = unquote(p)
    root = root.rstrip("/")
    rel = p[len(root):].lstrip("/") if root and p.startswith(root + "/") else os.path.basename(p)
    if rel.endswith(".wsp"):
        rel = rel[: -len(".wsp")]
    return rel.replace("/", ".")


def read_whisper(spark: SparkSession, path_glob: str, root: str | None = None) -> DataFrame:
    """.wsp files → SeriesFrame (name, t, value) + (archive_step).
    Series name = dotted path relative to ``root`` (default: the
    glob's literal directory prefix): <root>/a/b/c.wsp → a.b.c."""
    base = root if root is not None else _infer_root(path_glob)

    def fn(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                name = _series_name(r["path"], base)
                rows.extend(parse_whisper_bytes(name, bytes(r["content"])))
            yield pd.DataFrame(
                rows, columns=["name", "archive_step", "t", "value"]
            )

    files = spark.read.format("binaryFile").load(path_glob)
    return files.select("path", "content").mapInPandas(
        fn, schema="name string, archive_step long, t long, value double"
    )

"""Multimodal column plumbing (SURVEY §2.8): images/audio/video as
opaque binary columns + typed metadata, processed via mapInPandas.

The decode/resize/frame-sample kernels require image/audio libraries
that are not in this environment — the *decode step* is a clearly
marked deterministic fake (or NotImplementedError for real codecs),
but the Spark-side plumbing is real and tested: schema, Arrow batch
shape, partition-preserving mapInPandas, and the metadata contract.

At 100 TB this is the pattern for any media pipeline: binary payload
stays columnar (parquet BYTE_ARRAY), kernels run per Arrow batch, and
the partitioning key (e.g. content hash bucket) keeps decode work
even across executors.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import spread_small

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int"
)


def synthesize_media(docs: DataFrame, spread: bool = True) -> DataFrame:
    """Deterministic fake media: payload bytes derived from the text
    hash; metadata typed per kind. Stands in for reading a real
    (id, bytes, metadata) parquet/table."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.unhex(F.concat(F.md5("text"), F.md5(F.reverse("text"))))
    # spread_small: the single-file documents scan is ONE task locally,
    # which would serialize the payload hashing AND every downstream
    # mapInPandas featurize into one Python worker (no-op at scale).
    # Round-12 second pass, measured per consumer: the spread WINS for
    # mm_text_image_pairs (2.38 -> ~1.6 s, the multiprobe + rescore
    # composition) but LOSES for the dedup bridges whose downstream is
    # one cheap vectorized kernel + a chunk groupBy (mm_phash_dedup
    # 1.06 -> ~1.5 s, mm_audio_dedup 1.37 -> ~1.8 s, mm_video_keyframes
    # 1.65 -> ~1.9 s across four final-tree runs): the extra
    # stage + sort-before-repartition + 32 Python-worker launches cost
    # more than the single-task kernel. Those callers pass
    # spread=False; everything is a no-op at cluster scale either way.
    base = spread_small(docs) if spread else docs
    return base.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.when(kind == "image", (F.col("doc_id") % 512 + 32).cast("int")).alias("width"),
        F.when(kind == "image", (F.col("doc_id") % 256 + 32).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(kind == "video", (F.col("doc_id") % 300 + 1).cast("int")).alias("n_frames"),
    )


def decode_and_featurize(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, 'decode' each
    payload and emit a small typed feature row. The real-codec path is
    stubbed (no PIL/ffmpeg in this container).

    The stub's checksum is md5 over the payload's lowercase-hex STRING
    (not the raw bytes): ASCII-only input means the same value is
    computable engine-side in the DuckDB oracle (mm_decode_stub_sql) —
    DuckDB's md5 only accepts VARCHAR — so the whole Arrow round-trip
    (binary column → pandas bytes → features) is hash-checked, not
    just row-counted. mean_byte is an integer byte-sum / count, exact
    as a double in both engines (count is a power of two)."""

    def fn(batches):
        for pdf in batches:
            if use_real_codecs:
                raise NotImplementedError(
                    "real decode needs PIL/soundfile/ffmpeg; not in container"
                )
            feats = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                arr = np.frombuffer(payload, dtype=np.uint8)
                checksum = hashlib.md5(payload.hex().encode("ascii")).hexdigest()
                feats.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": len(payload),
                        "mean_byte": float(arr.mean()) if len(arr) else 0.0,
                        "checksum": checksum,
                    }
                )
            yield pd.DataFrame(feats)

    return media.mapInPandas(
        fn,
        schema=(
            "media_id long, kind string, n_bytes long, mean_byte double, "
            "checksum string"
        ),
    )


def mm_decode_stub_sql() -> str:
    """DuckDB twin of decode_and_featurize(synthesize_media(documents)).

    The synthesized payload is unhex(md5(text) || md5(reverse(text))),
    so its lowercase hex H is exactly that 64-char concatenation —
    bytes reconstruct as hex-digit pairs (strpos arithmetic), and the
    checksum is md5(H) by the stub's hex-string contract."""
    hv = "(strpos('0123456789abcdef', h[{p}]) - 1)"
    byte_sum = (
        "list_sum(list_transform(range(0, 32), i -> "
        + hv.format(p="2*i+1")
        + " * 16 + "
        + hv.format(p="2*i+2")
        + "))"
    )
    return (
        "WITH m AS (SELECT doc_id AS media_id, "
        "(['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind, "
        "md5(text) || md5(reverse(text)) AS h FROM documents) "
        "SELECT media_id, kind, CAST(32 AS BIGINT) AS n_bytes, "
        f"CAST({byte_sum} AS DOUBLE) / 32 AS mean_byte, "
        "md5(h) AS checksum FROM m"
    )


def frame_sample(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index — the explode happens JVM-side; only decode would be Python."""
    v = media.where(F.col("kind") == "video")
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return v.select(
        "media_id", F.explode(frames).alias("frame_idx")
    )


def resize_stub(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """Image-resize plumbing (mapInPandas, Arrow-batched): each image
    payload is 'resized' to fit ``max_dim`` preserving aspect ratio —
    the geometry is real integer arithmetic; the pixel work is the
    declared fake (no PIL in this container): the output 'bytes' are
    the md5 of the source payload hex plus the target geometry, so the
    whole batch path is value-checkable (mm_resize_stub_sql).

    Non-images pass through with NULL geometry, mirroring a mixed
    media table where only the image kernel applies."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                if r["kind"] == "image" and r["width"] and r["height"]:
                    w, h = int(r["width"]), int(r["height"])
                    m = max(w, h)
                    nw = (w * max_dim) // m
                    nh = (h * max_dim) // m
                    chk = hashlib.md5(
                        f"{payload.hex()}:{nw}x{nh}".encode("ascii")
                    ).hexdigest()
                else:
                    # 0 (not NULL): a NULL in an int column coerces
                    # the whole compare frame to float64 in pandas —
                    # 0 keeps the geometry columns integer end-to-end
                    nw = nh = 0
                    chk = None
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "new_width": nw,
                        "new_height": nh,
                        "checksum": chk,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        fn,
        schema=(
            "media_id long, kind string, new_width int, new_height int, "
            "checksum string"
        ),
    )


def mm_resize_stub_sql(max_dim: int = 64) -> str:
    """DuckDB twin of resize_stub(synthesize_media(documents)): the
    synthesized geometry and payload hex are recomputed from doc_id
    and text (see synthesize_media / mm_decode_stub_sql)."""
    kind = "(['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)]"
    w = "(doc_id % 512 + 32)"
    h = "(doc_id % 256 + 32)"
    m = f"GREATEST({w}, {h})"
    nw = f"CAST(({w} * {max_dim}) // {m} AS INT)"
    nh = f"CAST(({h} * {max_dim}) // {m} AS INT)"
    hexs = "md5(text) || md5(reverse(text))"
    chk = f"md5({hexs} || ':' || {nw} || 'x' || {nh})"
    return (
        f"SELECT doc_id AS media_id, {kind} AS kind, "
        f"CASE WHEN {kind} = 'image' THEN {nw} ELSE 0 END AS new_width, "
        f"CASE WHEN {kind} = 'image' THEN {nh} ELSE 0 END AS new_height, "
        f"CASE WHEN {kind} = 'image' THEN {chk} END AS checksum "
        "FROM documents"
    )


def audio_chunks(media: DataFrame, chunk_bytes: int = 8) -> DataFrame:
    """Fixed-size audio chunking done ENTIRELY JVM-side — the
    counterpoint to the mapInPandas kernels above: chunk boundaries
    come from metadata arithmetic, the payload is sliced with
    substring on the BINARY column (no Python, no Arrow round-trip,
    stays in whole-stage codegen), and each chunk's checksum is md5
    over its lowercase hex (the engine-portable binary-hash contract
    of mm_decode_stub). One output row per chunk; the trailing chunk
    may be short. Returns (media_id, chunk_idx, n_bytes,
    chunk_checksum).

    At 100 TB this is the shape for windowing any media payload
    (audio chunks, video GOPs, image tiles): the explode multiplies
    rows by payload/chunk_bytes BEFORE any Python kernel, so the
    expensive decode UDF downstream sees uniformly small units and
    partitions rebalance on (media_id, chunk_idx)."""
    a = media.where(F.col("kind") == "audio")
    n_chunks = F.ceil(F.length("payload") / F.lit(chunk_bytes)).cast("int")
    # empty payload → n_chunks 0, where sequence(0, -1) would emit the
    # DESCENDING [0, -1] (the _passages_of trap in contamination.py):
    # guard to an empty array so zero-byte media yields zero chunks,
    # matching the oracle's range(0, 0)
    idx = F.explode(
        F.when(
            n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
        ).otherwise(F.array().cast("array<int>"))
    ).alias("chunk_idx")
    b = a.select("media_id", "payload", idx)
    chunk = F.expr(f"substring(payload, chunk_idx * {chunk_bytes} + 1, {chunk_bytes})")
    return b.select(
        "media_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.length(chunk).cast("bigint").alias("n_bytes"),
        F.md5(F.lower(F.hex(chunk))).alias("chunk_checksum"),
    )


def mm_audio_chunks_sql(chunk_bytes: int = 8) -> str:
    """DuckDB twin of audio_chunks(synthesize_media(documents)): the
    synthesized payload's lowercase hex IS md5(text)||md5(reverse),
    so byte slice [i*cb, cb) = hex substring [i*2cb+1, 2cb)."""
    kind = "(['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)]"
    cb2 = 2 * chunk_bytes
    return (
        "WITH m AS (SELECT doc_id AS media_id, "
        "md5(text) || md5(reverse(text)) AS h FROM documents "
        f"WHERE {kind} = 'audio'), "
        "c AS (SELECT media_id, h, "
        f"UNNEST(range(0, CAST(CEIL(len(h) / {cb2}.0) AS BIGINT))) AS chunk_idx "
        "FROM m) "
        "SELECT media_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, "
        f"CAST(len(substr(h, CAST(chunk_idx * {cb2} + 1 AS INT), {cb2})) // 2 AS BIGINT) AS n_bytes, "
        f"md5(substr(h, CAST(chunk_idx * {cb2} + 1 AS INT), {cb2})) AS chunk_checksum "
        "FROM c"
    )


# --- perceptual fingerprint → dedup bridge ---------------------------------

_PHASH_NIBBLES = 64   # first 64 hex chars of the payload = 64 "pixels"
_PHASH_CHUNKS = 4     # 4 × 16-bit chunks feed the pigeonhole blocking
_TWIN_OFFSET = 1_000_000_000


def phash_from_hex(rel: DataFrame) -> DataFrame:
    """pHash-style 64-bit perceptual fingerprint over ANY
    (media_id, h) relation — h a 64-char lowercase-hex string whose
    nibbles play the 'pixels' — returned as the (doc_id, q0..q3)
    4×16-bit chunk relation dedup.chunk_hamming_pairs blocks on.
    Shared by mm_phash (images: h = payload hex) and
    mm_video_keyframes (videos: h = per-keyframe hash).

    Real pHash thresholds DCT coefficients of a downscaled grayscale
    image against their median; over the deterministic fake decode the
    'pixels' are the hex nibbles and the threshold is their mean — the
    average-hash construction (bit_i = pixel_i > mean), which shares
    pHash's defining property: a small local change flips few bits, so
    near-identical inputs land within a small hamming distance. The
    comparison stays exact integer algebra (nib*64 > Σnib — no
    division), so Spark and the DuckDB oracle derive identical bits.

    Shape note (the simhash() lesson relearned): both a 64-column
    unrolled form (~50 MiB codegen task binary) and an array-HOF form
    (ProjectCollapse re-inlines the nibble transform — and through it
    the md5-derived h — into every element_at of every chunk fold:
    157 s at sf0.1 for 1.8k images) are pathological. This version
    explodes nibble positions as ROWS and assembles chunks with two
    tiny-expression groupBys + one co-keyed join — aggregation
    barriers that the optimizer cannot inline through; same
    O(64·rows) arithmetic, milliseconds of codegen."""
    per = _PHASH_NIBBLES // _PHASH_CHUNKS
    nibs = rel.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(_PHASH_NIBBLES - 1))
        ).alias("i"),
        "h",
    ).select(
        "media_id",
        "i",
        F.conv(F.expr("substring(h, i + 1, 1)"), 16, 10)
        .cast("int")
        .alias("nib"),
    )
    tot = nibs.groupBy("media_id").agg(F.sum("nib").alias("s"))
    bits = nibs.join(tot, "media_id").select(
        "media_id",
        (F.col("i") / per).cast("int").alias("c"),
        F.when(
            F.col("nib") * _PHASH_NIBBLES > F.col("s"),
            F.expr(f"shiftleft(1, CAST({per - 1} - i % {per} AS INT))"),
        )
        .otherwise(0)
        .alias("wt"),
    )
    chunks = [
        F.sum(F.when(F.col("c") == j, F.col("wt")).otherwise(0))
        .cast("int")
        .alias(f"q{j}")
        for j in range(_PHASH_CHUNKS)
    ]
    return (
        bits.groupBy("media_id")
        .agg(*chunks)
        .select(
            F.col("media_id").alias("doc_id"),
            *[f"q{j}" for j in range(_PHASH_CHUNKS)],
        )
    )


def mm_phash(media: DataFrame) -> DataFrame:
    """Per-image pHash fingerprint: the payload's 64 hex nibbles are
    the 'pixels' (see phash_from_hex for the construction and the
    codegen shape note)."""
    return phash_from_hex(
        media.where(F.col("kind") == "image").select(
            "media_id", F.lower(F.hex(F.col("payload"))).alias("h")
        )
    )


def mm_phash_dedup(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-duplicate pairs — the multimodal column's dedup
    consumer, closing the loop text already has: synthesize → phash →
    the SAME 4-table pigeonhole blocking as dedup_simhash
    (dedup.chunk_hamming_pairs; exact for hamming ≤ 3, no all-pairs
    join anywhere).

    The fixture corpus's fake payloads are md5-derived (uniform bits),
    so genuine near-dups are vanishingly rare at test scale; every
    tenth image therefore gets a deterministic TWIN (same payload,
    media_id + 1e9) planted IN-QUERY — identical expression in the
    oracle, same trick as pipeline_c4_clean's rule-exercising lines —
    so the blocking provably carries pairs end-to-end. Returns
    (media_a, media_b, hamming)."""
    from .dedup import chunk_hamming_pairs

    media = synthesize_media(docs, spread=False)
    imgs = media.where(F.col("kind") == "image")
    twins = imgs.where(F.col("media_id") % 10 == 0).withColumn(
        "media_id", F.col("media_id") + _TWIN_OFFSET
    )
    sig = mm_phash(imgs.unionByName(twins))
    return chunk_hamming_pairs(sig, max_hamming).select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )


def _phash_sql_parts() -> tuple[str, str, str, str]:
    """Shared SQL fragments for the pHash-family oracles (images and
    video keyframes): nibble values via strpos over a 64-char hex
    column ``h``, identical integer threshold, and the 4-table UNION
    ALL pigeonhole join mirroring dedup_simhash_sql. Assumes CTEs
    ``withsum(media_id, h, s)`` → ``sig(doc_id, q0..q3)``; returns
    (total_expr, chunk_exprs, key_rows, hamming_expr)."""
    nib = "(strpos('0123456789abcdef', h[{p}]) - 1)"
    total = (
        "list_sum(list_transform(range(1, 65), i -> "
        "strpos('0123456789abcdef', h[CAST(i AS INT)]) - 1))"
    )
    per = _PHASH_NIBBLES // _PHASH_CHUNKS
    chunk_exprs = ", ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN {nib.format(p=j * per + i + 1)} * 64 > s "
            f"THEN 1 ELSE 0 END) * {1 << (per - 1 - i)}"
            for i in range(per)
        )
        + f" AS INTEGER) AS q{j}"
        for j in range(_PHASH_CHUNKS)
    )
    cols = ", ".join(f"q{j}" for j in range(_PHASH_CHUNKS))
    key_rows = " UNION ALL ".join(
        f"SELECT doc_id, {cols}, {j} AS tbl, q{j} AS key FROM sig"
        for j in range(_PHASH_CHUNKS)
    )
    ham = " + ".join(
        f"bit_count(xor(a.q{j}, b.q{j}))" for j in range(_PHASH_CHUNKS)
    )
    return total, chunk_exprs, key_rows, ham


def mm_phash_dedup_sql(max_hamming: int = 3) -> str:
    """DuckDB twin of mm_phash_dedup: same hex, same threshold, same
    twin planting, shared pigeonhole fragments (_phash_sql_parts)."""
    total, chunk_exprs, key_rows, ham = _phash_sql_parts()
    return (
        "WITH imgs AS (SELECT doc_id AS media_id, "
        "md5(text) || md5(reverse(text)) AS h FROM documents "
        "WHERE doc_id % 3 = 0), "
        "m AS (SELECT media_id, h FROM imgs UNION ALL "
        f"SELECT media_id + {_TWIN_OFFSET}, h FROM imgs "
        "WHERE media_id % 10 = 0), "
        f"withsum AS (SELECT media_id, h, {total} AS s FROM m), "
        f"sig AS (SELECT media_id AS doc_id, {chunk_exprs} FROM withsum), "
        f"keys AS ({key_rows}) "
        "SELECT DISTINCT a.doc_id AS media_a, b.doc_id AS media_b, "
        f"CAST({ham} AS BIGINT) AS hamming "
        "FROM keys a JOIN keys b ON a.tbl = b.tbl AND a.key = b.key "
        f"WHERE a.doc_id < b.doc_id AND {ham} <= {max_hamming}"
    )


def mm_audio_dedup(
    docs: DataFrame, chunk_bytes: int = 8, max_hamming: int = 3
) -> DataFrame:
    """Audio near-duplicate pairs — the audio column's dedup consumer,
    the LAST cell of the modality matrix (text: simhash/minhash,
    images: mm_phash_dedup, video: mm_video_keyframes): window the
    payload into audio_chunks' fixed-size chunks JVM-side, derive a
    per-chunk 64-nibble hash (standing in for 'decode window,
    spectral-fingerprint it' — the chromaprint shape — exactly as the
    fake decode stands in elsewhere), fingerprint with the SAME
    phash_from_hex and block with the SAME 4-table pigeonhole engine
    (dedup.chunk_hamming_pairs, exact for hamming ≤ 3), then
    aggregate chunk matches to audio pairs. Returns (audio_a,
    audio_b, n_chunk_matches, min_hamming).

    Twins (every tenth audio, +1e9, same payload → identical chunk
    hashes) are planted IN-QUERY as in the image/video paths, so a
    twin pair must surface with n_chunk_matches = its chunk count and
    min_hamming 0. Chunk id packing media_id·_KF_ID_BASE + idx is
    collision-free (idx < payload/chunk_bytes = 4 ≪ 1024).

    Scale: chunking multiplies rows ×(payload/chunk_bytes) BEFORE the
    fingerprint; everything that shuffles afterwards is 4 ints per
    chunk on uniform 65536-way keys, and the pair agg is co-keyed
    with the pair derivation. No all-pairs join at any level."""
    from .dedup import chunk_hamming_pairs

    media = synthesize_media(docs, spread=False)
    auds = media.where(F.col("kind") == "audio")
    twins = auds.where(F.col("media_id") % 10 == 0).withColumn(
        "media_id", F.col("media_id") + _TWIN_OFFSET
    )
    cb2 = 2 * chunk_bytes
    both = auds.unionByName(twins).select(
        "media_id", F.lower(F.hex(F.col("payload"))).alias("ah")
    )
    n_chunks = F.ceil(F.length("ah") / F.lit(cb2)).cast("int")
    ck = both.select(
        "media_id",
        "ah",
        F.explode(
            F.when(
                n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("chunk_idx"),
    ).select(
        "media_id",
        "chunk_idx",
        F.expr(f"substring(ah, chunk_idx * {cb2} + 1, {cb2})").alias("ch"),
    )
    chunks = ck.select(
        (F.col("media_id") * _KF_ID_BASE + F.col("chunk_idx")).alias(
            "media_id"
        ),
        F.concat(F.md5("ch"), F.md5(F.reverse("ch"))).alias("h"),
    )
    pairs = chunk_hamming_pairs(phash_from_hex(chunks), max_hamming)
    return (
        pairs.select(
            F.expr(f"doc_a div {_KF_ID_BASE}").alias("audio_a"),
            F.expr(f"doc_b div {_KF_ID_BASE}").alias("audio_b"),
            "hamming",
        )
        .where(F.col("audio_a") != F.col("audio_b"))
        .groupBy("audio_a", "audio_b")
        .agg(
            F.count(F.lit(1)).alias("n_chunk_matches"),
            F.min("hamming").alias("min_hamming"),
        )
    )


def mm_audio_dedup_sql(chunk_bytes: int = 8, max_hamming: int = 3) -> str:
    """DuckDB twin of mm_audio_dedup: audio is doc_id % 3 = 1, the
    payload hex IS md5(text)||md5(reverse(text)), chunk hex windows
    and the pigeonhole fragments shared with the image/video oracles
    (_phash_sql_parts)."""
    total, chunk_exprs, key_rows, ham = _phash_sql_parts()
    cb2 = 2 * chunk_bytes
    return (
        "WITH auds AS (SELECT doc_id AS media_id, "
        "md5(text) || md5(reverse(text)) AS ah FROM documents "
        "WHERE doc_id % 3 = 1), "
        "alla AS (SELECT media_id, ah FROM auds UNION ALL "
        f"SELECT media_id + {_TWIN_OFFSET}, ah FROM auds "
        "WHERE media_id % 10 = 0), "
        "ck AS (SELECT media_id, "
        f"UNNEST(range(0, CAST(CEIL(len(ah) / {cb2}.0) AS BIGINT))) AS chunk_idx, "
        "ah FROM alla), "
        f"m AS (SELECT media_id * {_KF_ID_BASE} + chunk_idx AS media_id, "
        f"md5(substr(ah, CAST(chunk_idx * {cb2} + 1 AS INT), {cb2})) || "
        f"md5(reverse(substr(ah, CAST(chunk_idx * {cb2} + 1 AS INT), {cb2}))) AS h "
        "FROM ck), "
        f"withsum AS (SELECT media_id, h, {total} AS s FROM m), "
        f"sig AS (SELECT media_id AS doc_id, {chunk_exprs} FROM withsum), "
        f"keys AS ({key_rows}), "
        "pairs AS (SELECT DISTINCT a.doc_id AS ka, b.doc_id AS kb, "
        f"CAST({ham} AS BIGINT) AS hamming "
        "FROM keys a JOIN keys b ON a.tbl = b.tbl AND a.key = b.key "
        f"WHERE a.doc_id < b.doc_id AND {ham} <= {max_hamming}) "
        f"SELECT ka // {_KF_ID_BASE} AS audio_a, "
        f"kb // {_KF_ID_BASE} AS audio_b, "
        "COUNT(*) AS n_chunk_matches, MIN(hamming) AS min_hamming "
        f"FROM pairs WHERE ka // {_KF_ID_BASE} <> kb // {_KF_ID_BASE} "
        "GROUP BY 1, 2"
    )


# keyframe id = media_id * _KF_ID_BASE + frame_idx; frame_idx < 300
# by construction (n_frames = doc_id % 300 + 1) so the packing is
# collision-free, and twin ids (~1e9) keep the product well inside
# int64.
_KF_ID_BASE = 1024


def mm_video_keyframes(
    docs: DataFrame, every_n: int = 30, max_hamming: int = 3
) -> DataFrame:
    """Video near-duplicate pairs — the video column's dedup consumer,
    closing the modality matrix (round 6 gave images mm_phash_dedup):
    sample keyframes JVM-side (frame_sample's stride explode), derive
    a per-keyframe 64-nibble hash from (payload hex, frame_idx) —
    standing in for 'decode frame, pHash it' exactly as the fake
    decode stands in elsewhere — fingerprint with the SAME
    phash_from_hex, block with the SAME 4-table pigeonhole engine
    (dedup.chunk_hamming_pairs, exact for hamming ≤ 3), then
    aggregate frame-level matches to video pairs. Returns (video_a,
    video_b, n_frame_matches, min_hamming).

    Twins (every tenth video, +1e9, same payload → identical frame
    hashes) are planted IN-QUERY as in mm_phash_dedup so the
    frame→video bridge provably carries pairs end-to-end; a twin pair
    must surface with n_frame_matches = its keyframe count and
    min_hamming 0.

    Scale: keyframes multiply rows ~x(n_frames/every_n) BEFORE the
    fingerprint, but everything that shuffles afterwards is 4 ints
    per keyframe (signatures, never payloads) on uniform 65536-way
    chunk keys; the final video-pair agg is co-keyed with the pair
    derivation. No all-pairs join at any level — same guarantee as
    the image path."""
    from .dedup import chunk_hamming_pairs

    media = synthesize_media(docs, spread=False)
    vids = media.where(F.col("kind") == "video")
    twins = vids.where(F.col("media_id") % 10 == 0).withColumn(
        "media_id", F.col("media_id") + _TWIN_OFFSET
    )
    kf = (
        vids.unionByName(twins)
        .select(
            "media_id",
            F.lower(F.hex(F.col("payload"))).alias("vh"),
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
    hx = F.concat(F.col("vh"), F.lit(":"), F.col("frame_idx").cast("string"))
    keyframes = kf.select(
        (F.col("media_id") * _KF_ID_BASE + F.col("frame_idx")).alias(
            "media_id"
        ),
        F.concat(F.md5(hx), F.md5(F.reverse(hx))).alias("h"),
    )
    pairs = chunk_hamming_pairs(phash_from_hex(keyframes), max_hamming)
    return (
        pairs.select(
            F.expr(f"doc_a div {_KF_ID_BASE}").alias("video_a"),
            F.expr(f"doc_b div {_KF_ID_BASE}").alias("video_b"),
            "hamming",
        )
        .where(F.col("video_a") != F.col("video_b"))
        .groupBy("video_a", "video_b")
        .agg(
            F.count(F.lit(1)).alias("n_frame_matches"),
            F.min("hamming").alias("min_hamming"),
        )
    )


def mm_video_keyframes_sql(every_n: int = 30, max_hamming: int = 3) -> str:
    """DuckDB twin of mm_video_keyframes: videos are doc_id % 3 = 2,
    n_frames = doc_id % 300 + 1 (synthesize_media), stride range =
    Spark's sequence(0, n_frames-1, every_n), keyframe hash and
    pigeonhole fragments shared with the image oracle."""
    total, chunk_exprs, key_rows, ham = _phash_sql_parts()
    hx = "vh || ':' || frame_idx"
    return (
        "WITH vids AS (SELECT doc_id AS media_id, "
        "md5(text) || md5(reverse(text)) AS vh, "
        "(doc_id % 300 + 1) AS n_frames FROM documents "
        "WHERE doc_id % 3 = 2), "
        "allv AS (SELECT media_id, vh, n_frames FROM vids UNION ALL "
        f"SELECT media_id + {_TWIN_OFFSET}, vh, n_frames FROM vids "
        "WHERE media_id % 10 = 0), "
        "fr AS (SELECT media_id, vh, "
        f"UNNEST(range(0, n_frames, {every_n})) AS frame_idx FROM allv), "
        f"m AS (SELECT media_id * {_KF_ID_BASE} + frame_idx AS media_id, "
        f"md5({hx}) || md5(reverse({hx})) AS h FROM fr), "
        f"withsum AS (SELECT media_id, h, {total} AS s FROM m), "
        f"sig AS (SELECT media_id AS doc_id, {chunk_exprs} FROM withsum), "
        f"keys AS ({key_rows}), "
        "pairs AS (SELECT DISTINCT a.doc_id AS ka, b.doc_id AS kb, "
        f"CAST({ham} AS BIGINT) AS hamming "
        "FROM keys a JOIN keys b ON a.tbl = b.tbl AND a.key = b.key "
        f"WHERE a.doc_id < b.doc_id AND {ham} <= {max_hamming}) "
        f"SELECT ka // {_KF_ID_BASE} AS video_a, "
        f"kb // {_KF_ID_BASE} AS video_b, "
        "COUNT(*) AS n_frame_matches, MIN(hamming) AS min_hamming "
        f"FROM pairs WHERE ka // {_KF_ID_BASE} <> kb // {_KF_ID_BASE} "
        "GROUP BY 1, 2"
    )


# --- scene-cut detection (round 9) --------------------------------------------

_SCENE_LEN = 60  # synthesized scene length in frames (2 keyframes/scene)


def mm_scene_cuts(
    docs: DataFrame, every_n: int = 30, threshold: int = 3
) -> DataFrame:
    """(media_id, frame_idx, prev_idx, hamming, is_cut): shot-boundary
    detection over sampled keyframes — the fingerprint distance
    between CONSECUTIVE keyframes of one video, flagged as a cut when
    it exceeds the hamming threshold. This is how a video pipeline
    segments footage before per-scene sampling/captioning (the
    classic pHash-difference shot detector); the dedup family asks
    'which videos repeat each other', this asks 'where does one video
    change'.

    The synthesized decode gets SCENE STRUCTURE (the honest-fake
    convention, one level richer): a keyframe's hash derives from
    (payload, frame_idx DIV 60) — constant within a 60-frame scene,
    md5-fresh across scene boundaries — so within-scene consecutive
    keyframes sit at hamming 0 and cross-boundary ones at ~32, and the
    threshold provably separates them (pinned in pytest).

    Scale: keyframe fingerprints are the shared phash_from_hex
    relation (4 ints each); the ONLY new work is one lag() window
    PARTITIONED BY media_id ordered by frame_idx — partition size =
    keyframes per video (≤ 10 here, bounded by footage length, never
    corpus-scale). No pair join at all: consecutive-frame comparison
    is a window, not a self-join."""
    media = synthesize_media(docs, spread=False)
    vids = media.where(F.col("kind") == "video")
    kf = vids.select(
        "media_id",
        F.lower(F.hex(F.col("payload"))).alias("vh"),
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
    hx = F.concat(
        F.col("vh"),
        F.lit("#"),
        # integer DIV, not /-then-cast: Spark's int cast truncates but
        # DuckDB's CAST(1.5 AS INT) rounds half-even — a scene-id trap
        F.expr(f"frame_idx div {_SCENE_LEN}").cast("string"),
    )
    keyframes = kf.select(
        (F.col("media_id") * _KF_ID_BASE + F.col("frame_idx")).alias(
            "media_id"
        ),
        F.concat(F.md5(hx), F.md5(F.reverse(hx))).alias("h"),
    )
    sig = phash_from_hex(keyframes).select(
        F.expr(f"doc_id div {_KF_ID_BASE}").alias("media_id"),
        (F.col("doc_id") % _KF_ID_BASE).alias("frame_idx"),
        *[f"q{j}" for j in range(_PHASH_CHUNKS)],
    )
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    lagged = sig.select(
        "media_id",
        "frame_idx",
        F.lag("frame_idx").over(w).alias("prev_idx"),
        *[
            c
            for j in range(_PHASH_CHUNKS)
            for c in (
                F.col(f"q{j}"),
                F.lag(f"q{j}").over(w).alias(f"p{j}"),
            )
        ],
    ).where(F.col("prev_idx").isNotNull())
    ham = None
    for j in range(_PHASH_CHUNKS):
        t = F.bit_count(F.col(f"q{j}").bitwiseXOR(F.col(f"p{j}")))
        ham = t if ham is None else ham + t
    return lagged.select(
        "media_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.col("prev_idx").cast("bigint").alias("prev_idx"),
        ham.cast("bigint").alias("hamming"),
        (ham > threshold).cast("bigint").alias("is_cut"),
    )


def mm_scene_cuts_sql(every_n: int = 30, threshold: int = 3) -> str:
    total, chunk_exprs, _, _ = _phash_sql_parts()
    hx = f"vh || '#' || CAST(frame_idx // {_SCENE_LEN} AS VARCHAR)"
    ham = " + ".join(
        f"bit_count(xor(q{j}, p{j}))" for j in range(_PHASH_CHUNKS)
    )
    lags = ", ".join(
        f"LAG(q{j}) OVER w AS p{j}" for j in range(_PHASH_CHUNKS)
    )
    return (
        "WITH vids AS (SELECT doc_id AS media_id, "
        "md5(text) || md5(reverse(text)) AS vh, "
        "(doc_id % 300 + 1) AS n_frames FROM documents "
        "WHERE doc_id % 3 = 2), "
        "fr AS (SELECT media_id, vh, "
        f"UNNEST(range(0, n_frames, {every_n})) AS frame_idx FROM vids), "
        f"m AS (SELECT media_id * {_KF_ID_BASE} + frame_idx AS media_id, "
        f"md5({hx}) || md5(reverse({hx})) AS h FROM fr), "
        f"withsum AS (SELECT media_id, h, {total} AS s FROM m), "
        f"sig0 AS (SELECT media_id AS doc_id, {chunk_exprs} FROM withsum), "
        f"sig AS (SELECT doc_id // {_KF_ID_BASE} AS media_id, "
        f"doc_id % {_KF_ID_BASE} AS frame_idx, "
        + ", ".join(f"q{j}" for j in range(_PHASH_CHUNKS))
        + " FROM sig0), "
        "lagged AS (SELECT media_id, frame_idx, "
        f"LAG(frame_idx) OVER w AS prev_idx, {lags}, "
        + ", ".join(f"q{j}" for j in range(_PHASH_CHUNKS))
        + " FROM sig WINDOW w AS "
        "(PARTITION BY media_id ORDER BY frame_idx)) "
        "SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx, "
        "CAST(prev_idx AS BIGINT) AS prev_idx, "
        f"CAST({ham} AS BIGINT) AS hamming, "
        f"CAST({ham} > {threshold} AS BIGINT) AS is_cut "
        "FROM lagged WHERE prev_idx IS NOT NULL"
    )


def mm_phash_sweep(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(radius, n_pairs, n_media): the hamming-radius tuning dial for
    IMAGE dedup (round 10) — dedup_simhash_sweep's argument applied to
    the perceptual-hash modality: how many near-dup pairs (and how
    many distinct images) each radius 0..max admits, measured from ONE
    pigeonhole pass at the max radius (a pair found at hamming h
    belongs to every radius ≥ h, so the sweep is a cumulative explode
    over the already-bounded pair relation, never a re-block). The
    dial an image-dedup run reads before picking its cutoff: radius 0
    is exact-payload (the planted twins), each +1 admits
    progressively-weaker matches."""
    pairs = mm_phash_dedup(docs, max_hamming)
    r = pairs.select(
        "media_a",
        "media_b",
        F.explode(
            F.sequence(F.col("hamming"), F.lit(int(max_hamming)))
        ).alias("radius"),
    )
    np_ = r.groupBy("radius").agg(F.count("*").cast("bigint").alias("n_pairs"))
    nm = (
        r.select(
            "radius", F.explode(F.array("media_a", "media_b")).alias("m")
        )
        .distinct()
        .groupBy("radius")
        .agg(F.count("*").cast("bigint").alias("n_media"))
    )
    return np_.join(nm, "radius").select(
        F.col("radius").cast("bigint").alias("radius"), "n_pairs", "n_media"
    )


def mm_phash_sweep_sql(max_hamming: int = 3) -> str:
    return (
        f"WITH pairs AS ({mm_phash_dedup_sql(max_hamming)}), "
        "r AS (SELECT media_a, media_b, UNNEST(range(hamming, "
        f"{int(max_hamming)} + 1)) AS radius FROM pairs), "
        "np AS (SELECT radius, COUNT(*) AS n_pairs FROM r GROUP BY radius), "
        "nm AS (SELECT radius, COUNT(*) AS n_media FROM ("
        "SELECT DISTINCT radius, m FROM (SELECT radius, media_a AS m FROM r "
        "UNION ALL SELECT radius, media_b FROM r)) GROUP BY radius) "
        "SELECT CAST(radius AS BIGINT) AS radius, "
        "CAST(n_pairs AS BIGINT) AS n_pairs, "
        "CAST(n_media AS BIGINT) AS n_media FROM np JOIN nm USING (radius)"
    )

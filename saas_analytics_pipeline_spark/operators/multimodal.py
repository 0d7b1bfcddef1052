"""Multimodal columns: binary payloads + typed metadata + Pandas-UDF decode.

North-star extension (BASELINE.json): treat image/audio/video as opaque
`binary` columns with typed metadata, and run decode / feature-extract as
Arrow-batched pandas over mapInPandas. The container has no codec
libraries, so pixel/sample decode is out of reach — but container HEADERS
are not: decode_media parses PNG IHDR and RIFF/WAVE fmt chunks with pure
python (`struct`), which covers the dimension/sample-rate routing a
curation pipeline needs before any pixel ever decodes. The rest of the
byte-level plumbing — schema, batch iteration, partitioning — is real.

Scale notes (100 TB of media): payload bytes stay columnar in parquet and
flow to Python via Arrow record batches (mapInPandas), never row-at-a-time.
Batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch so a
partition of large blobs doesn't OOM the worker. Feature extraction emits a
NARROW schema (drop the payload) so only features shuffle downstream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.sources import load_table

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, n_tokens int, format string"
)


def build_media_frame(docs: DataFrame) -> DataFrame:
    """Synthesize a multimodal frame from documents: payload = utf-8 bytes
    of the text (stand-in for image/audio bytes), metadata struct alongside.
    In production this is `spark.read.format('binaryFile')` or a parquet
    lake with a binary column."""
    return docs.select(
        "doc_id",
        "source",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
        ).alias("media_meta"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_media(payload: bytes, mime: str) -> dict[str, Any]:
    """Decode container-format headers with pure python (``struct``): PNG
    IHDR (width/height/bit depth/color type), RIFF/WAVE ``fmt `` chunk
    (channels/sample rate/bits per sample), JPEG SOF0-3 (width/height/
    components via marker-segment walk), and MP4 ``moov``/``mvhd``
    (timescale/duration via nested box walk). No codec libraries needed —
    dimensions and timing live in the container header, not the compressed
    stream, which is exactly what a 100 TB curation pass wants to read
    (filter/route on dimensions WITHOUT decoding pixels/samples).

    Full pixel/sample decode (PIL/librosa/av) plugs in here when those
    libs exist; unsupported mimes AND truncated/corrupt payloads raise
    ValueError so a bad route fails loudly instead of emitting garbage
    features (or leaking struct.error/IndexError to callers)."""
    import struct

    if mime == "image/png":
        if len(payload) < 26:
            raise ValueError(
                f"truncated PNG: {len(payload)} bytes < 26 (sig+IHDR)"
            )
        if payload[:8] != _PNG_SIG or payload[12:16] != b"IHDR":
            raise ValueError("not a PNG: bad signature or missing IHDR")
        width, height = struct.unpack(">II", payload[16:24])
        bit_depth, color_type = payload[24], payload[25]
        return {
            "kind": "png",
            "width": width,
            "height": height,
            "bit_depth": bit_depth,
            "color_type": color_type,
        }
    if mime in ("audio/wav", "audio/x-wav"):
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a WAV: bad RIFF/WAVE header")
        # walk chunks: 'fmt ' is usually first but not guaranteed
        off = 12
        while off + 8 <= len(payload):
            cid = payload[off : off + 4]
            (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
            if cid == b"fmt ":
                if off + 24 > len(payload) or size < 16:
                    raise ValueError("truncated WAV: fmt chunk body cut short")
                fmt, ch, sr, _br, _ba, bits = struct.unpack(
                    "<HHIIHH", payload[off + 8 : off + 24]
                )
                return {
                    "kind": "wav",
                    "audio_format": fmt,
                    "channels": ch,
                    "sample_rate": sr,
                    "bits_per_sample": bits,
                }
            off += 8 + size + (size & 1)  # chunks are word-aligned
        raise ValueError("WAV has no fmt chunk")
    if mime == "image/jpeg":
        if len(payload) < 4 or payload[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG: missing SOI marker")
        # walk marker segments: FF <type> <len16 incl itself>, allowing
        # legal 0xFF fill/padding bytes before the type and standalone
        # (length-less) markers — TEM (0x01), RST0-7, SOI, EOI. Any SOFn
        # (0xC0-0xCF except DHT/JPG/DAC = C4/C8/CC) carries precision/
        # height/width/ncomp. The walk stops at SOS: entropy-coded data
        # follows and a frame header must precede it.
        off = 2
        n = len(payload)
        while off + 2 <= n:
            if payload[off] != 0xFF:
                raise ValueError("corrupt JPEG: expected marker at segment")
            # skip 0xFF fill bytes: the marker code is the first non-FF
            while off + 1 < n and payload[off + 1] == 0xFF:
                off += 1
            marker = payload[off + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                if marker == 0xD9:  # EOI before any SOF
                    break
                off += 2  # standalone marker: no length word
                continue
            if marker == 0xDA:  # SOS before any SOF
                break
            if off + 4 > n:
                raise ValueError("truncated JPEG: segment length cut short")
            (seg_len,) = struct.unpack(">H", payload[off + 2 : off + 4])
            if seg_len < 2:
                raise ValueError("corrupt JPEG: segment length < 2")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if off + 10 > n:
                    raise ValueError("truncated JPEG: SOF header cut short")
                precision = payload[off + 4]
                height, width = struct.unpack(">HH", payload[off + 5 : off + 9])
                n_components = payload[off + 9]
                return {
                    "kind": "jpeg",
                    "width": width,
                    "height": height,
                    "channels": n_components,
                    "bit_depth": precision,
                }
            off += 2 + seg_len
        raise ValueError("JPEG has no SOF frame header")
    if mime == "video/mp4":
        # ISO BMFF box walk: size32 + fourcc; descend into 'moov' for the
        # 'mvhd' movie header (version, timescale, duration).
        def walk(buf: bytes, base: int, end: int) -> dict[str, Any] | None:
            off = base
            while off + 8 <= end:
                (size,) = struct.unpack(">I", buf[off : off + 4])
                box = buf[off + 4 : off + 8]
                if size < 8 or off + size > end:
                    raise ValueError("truncated MP4: box overruns payload")
                if box == b"moov":
                    found = walk(buf, off + 8, off + size)
                    if found is not None:
                        return found
                elif box == b"mvhd":
                    version = buf[off + 8]
                    if version == 1:
                        if off + 40 > end:
                            raise ValueError("truncated MP4: mvhd v1 cut short")
                        timescale, duration = struct.unpack(
                            ">IQ", buf[off + 28 : off + 40]
                        )
                    else:
                        if off + 28 > end:
                            raise ValueError("truncated MP4: mvhd v0 cut short")
                        timescale, duration = struct.unpack(
                            ">II", buf[off + 20 : off + 28]
                        )
                    return {
                        "kind": "mp4",
                        "timescale": timescale,
                        "duration": duration,
                    }
                off += size
            return None

        if len(payload) < 8:
            raise ValueError("truncated MP4: shorter than one box header")
        found = walk(payload, 0, len(payload))
        if found is None:
            raise ValueError("MP4 has no moov/mvhd box")
        return found
    raise ValueError(
        f"unsupported media type {mime!r}; supported: image/png, audio/wav,"
        " image/jpeg, video/mp4"
    )


def _extract_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: deterministic byte-level feature extraction.
    Arrow batches in, narrow feature rows out (payload dropped)."""
    for pdf in it:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1
                ).astype("int32"),
                "n_tokens": payloads.map(
                    lambda b: len(b.split(b" "))
                ).astype("int32"),
                "format": pdf["media_meta"].map(lambda m: m["mime"]),
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    return media.mapInPandas(_extract_batch, schema=FEATURE_SCHEMA)


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS n_unique_payloads
    FROM documents GROUP BY source
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata rollup: payload sizes + content hashes per
    source — all JVM-side (length/md5 work directly on binary)."""
    docs = load_table(spark, sf_dir, "documents")
    media = build_media_frame(docs)
    return media.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        F.countDistinct(F.md5("payload")).alias("n_unique_payloads"),
    )


@query(
    "q_multimodal_features",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               ascii(substr(text, 1, 1)) AS first_byte,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(first_byte) AS BIGINT) AS first_byte_sum
    FROM f
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF (mapInPandas) feature extraction over binary payloads,
    verified against a pure-SQL oracle computing the same byte-level
    features from the source text — proves the Arrow plumbing is lossless."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(build_media_frame(docs))
    return feats.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("first_byte").cast("long").alias("first_byte_sum"),
    )


# --------------------------------------------------------------------------
# resize / frame-sample plumbing (decode itself is stubbed: no codecs here)
# --------------------------------------------------------------------------
RESIZE_SCHEMA = "doc_id long, payload binary, width int, height int"
FRAME_BYTES = 256  # fake frame = fixed byte window of the payload


def _resize_batch(w: int, h: int):
    """Deterministic fake resize: crop/pad payload to w*h bytes. Real
    impl decodes via decode_media and resamples pixels; the batch shape
    (binary in -> binary out, 1:1 rows, narrow meta) is what production
    needs and what tests pin."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = w * h
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(
                        lambda b: bytes(b[:size]).ljust(size, b"\0")
                    ),
                    "width": w,
                    "height": h,
                }
            )

    return fn


def resize_media(media: DataFrame, width: int = 32, height: int = 8) -> DataFrame:
    """Arrow-batched 'resize' over binary payloads (1 row in -> 1 row out,
    fixed-size output payloads)."""
    return media.select("doc_id", "payload").mapInPandas(
        _resize_batch(width, height), schema=RESIZE_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: split each payload into FRAME_BYTES windows and keep
    every Nth (1 row in -> many rows out). Pure JVM: slice the binary with
    substring under an exploded frame index — no Python for the fan-out, so
    a 100 TB video lake fans out scan-side at full codegen speed."""
    n_frames = F.ceil(F.length("payload") / F.lit(FRAME_BYTES)).cast("int")
    return (
        media.select("doc_id", "payload", n_frames.alias("n_frames"))
        .select(
            "doc_id",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1)
            ).alias("frame_idx"),
            "payload",
        )
        .where(F.col("frame_idx") % every_n == 0)
        .select(
            "doc_id",
            "frame_idx",
            F.expr(
                f"substring(payload, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})"
            ).alias("frame"),
        )
    )


@query(
    "q_frame_sample",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
    ),
    f AS (
        SELECT doc_id,
               CAST(ceil(nb / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
               -- every 4th frame starting at 0: ceil(n_frames / 4)
               CAST(ceil(ceil(nb / {FRAME_BYTES}.0) / 4.0) AS BIGINT) AS n_sampled
        FROM m
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_frames) AS BIGINT) AS total_frames,
           CAST(SUM(n_sampled) AS BIGINT) AS sampled_frames
    FROM f
    """,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling rollup: total vs kept frames per the every-4th policy,
    verified against closed-form SQL on payload sizes (proves the
    explode/substring fan-out emits exactly the right frames)."""
    docs = load_table(spark, sf_dir, "documents")
    media = build_media_frame(docs)
    frames = sample_frames(media, every_n=4)
    per_doc = frames.groupBy("doc_id").agg(
        F.count("*").alias("n_sampled"),
    )
    totals = (
        media.select(
            "doc_id",
            F.ceil(F.length("payload") / F.lit(FRAME_BYTES))
            .cast("long")
            .alias("n_frames"),
        )
        .join(per_doc, "doc_id")
    )
    return totals.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_frames").cast("long").alias("total_frames"),
        F.sum("n_sampled").cast("long").alias("sampled_frames"),
    )


# --------------------------------------------------------------------------
# header decode: real PNG / WAV container parsing (pure python, no codecs)
# --------------------------------------------------------------------------
DIMS_SCHEMA = (
    "doc_id long, kind string, width int, height int,"
    " channels int, sample_rate int, timescale int, duration int"
)


def _le_hex(col: F.Column, nbytes: int) -> F.Column:
    """Little-endian hex rendering of an integer column (byte-swapped
    big-endian hex), for RIFF/WAVE fields."""
    h = F.lpad(F.hex(col), 2 * nbytes, "0")
    return F.concat(
        *[F.substring(h, 2 * i + 1, 2) for i in range(nbytes - 1, -1, -1)]
    )


def synth_media_payloads(docs: DataFrame) -> DataFrame:
    """Synthesize REAL container bytes per doc, JVM-side, four formats by
    doc_id % 4: PNG (signature + IHDR), RIFF/WAVE (PCM fmt chunk), JPEG
    (SOI + JFIF APP0 + SOF0 frame header), and MP4 (ftyp + moov/mvhd with
    timescale/duration) — all fields derived from doc_id so the oracle can
    recompute them closed-form. Stand-in for a binary-column media lake;
    every byte is built with hex/unhex/concat in codegen — no Python in
    the synth path."""
    fmt_sel = F.col("doc_id") % 4
    width = (F.lit(16) + F.col("doc_id") % 1024).cast("int")
    height = (F.lit(16) + (F.col("doc_id") * 7) % 512).cast("int")
    channels = (F.lit(1) + (F.col("doc_id") % 8) / F.lit(4)).cast("int")
    sample_rate = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    j_width = (F.lit(16) + (F.col("doc_id") * 3) % 1024).cast("int")
    j_height = (F.lit(16) + (F.col("doc_id") * 5) % 512).cast("int")
    timescale = F.element_at(
        F.array(F.lit(600), F.lit(1000), F.lit(90000)),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    duration = (timescale * (F.lit(1) + F.col("doc_id") % 30)).cast("int")
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),  # PNG signature
        F.lit("0000000D49484452"),  # IHDR chunk length 13 + type
        F.lpad(F.hex(width), 8, "0"),
        F.lpad(F.hex(height), 8, "0"),
        F.lit("0802000000"),  # bit depth 8, color type 2 (truecolor)
    )
    wav_hex = F.concat(
        F.lit("52494646"),  # 'RIFF'
        F.lit("1C000000"),  # riff size 28 LE: WAVE + fmt header + 16-byte body
        F.lit("57415645"),  # 'WAVE'
        F.lit("666D7420"),  # 'fmt '
        F.lit("10000000"),  # fmt chunk size 16 LE
        F.lit("0100"),  # PCM
        _le_hex(channels, 2),
        _le_hex(sample_rate, 4),
        _le_hex(sample_rate * channels * 2, 4),  # byte rate
        _le_hex(channels * 2, 2),  # block align
        F.lit("1000"),  # 16 bits/sample LE
    )
    jpeg_hex = F.concat(
        F.lit("FFD8"),  # SOI
        F.lit("FFE000104A46494600010100000100010000"),  # JFIF APP0, len 16
        F.lit("FFC00011"),  # SOF0 marker, segment length 17
        F.lit("08"),  # precision 8 bits
        F.lpad(F.hex(j_height), 4, "0"),
        F.lpad(F.hex(j_width), 4, "0"),
        F.lit("03"),  # 3 components (YCbCr)
        F.lit("011100021101031101"),  # component specs
        F.lit("FFD9"),  # EOI
    )
    mp4_hex = F.concat(
        F.lit("000000106674797069736F6D00000000"),  # ftyp isom, 16 bytes
        F.lit("000000746D6F6F76"),  # moov box, size 116
        F.lit("0000006C6D766864"),  # mvhd box, size 108
        F.lit("00000000"),  # version 0 + flags
        F.lit("0000000000000000"),  # creation + modification time
        F.lpad(F.hex(timescale), 8, "0"),  # timescale BE
        F.lpad(F.hex(duration), 8, "0"),  # duration BE (timescale units)
        F.lit("00010000"),  # rate 1.0 (16.16)
        F.lit("0100"),  # volume 1.0 (8.8)
        F.lit("0000" + "00" * 8),  # reserved
        # unity matrix (3x3 of 16.16 / 2.30 fixed point)
        F.lit("000100000000000000000000"),
        F.lit("000000000001000000000000"),
        F.lit("000000000000000040000000"),
        F.lit("00" * 24),  # pre_defined
        F.lit("00000002"),  # next_track_ID
    )
    payload_hex = (
        F.when(fmt_sel == 0, png_hex)
        .when(fmt_sel == 1, wav_hex)
        .when(fmt_sel == 2, jpeg_hex)
        .otherwise(mp4_hex)
    )
    mime = (
        F.when(fmt_sel == 0, F.lit("image/png"))
        .when(fmt_sel == 1, F.lit("audio/wav"))
        .when(fmt_sel == 2, F.lit("image/jpeg"))
        .otherwise(F.lit("video/mp4"))
    )
    return docs.select(
        "doc_id", F.unhex(payload_hex).alias("payload"), mime.alias("mime")
    )


def _dims_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode_media over each payload; nullable Int32
    keeps the per-kind N/A fields (wav has no width) as real nulls."""
    for pdf in it:
        rows = [
            decode_media(bytes(p), m)
            for p, m in zip(pdf["payload"], pdf["mime"])
        ]

        def col(name: str) -> pd.api.extensions.ExtensionArray:
            return pd.array([r.get(name) for r in rows], dtype="Int32")

        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": [r["kind"] for r in rows],
                "width": col("width"),
                "height": col("height"),
                "channels": col("channels"),
                "sample_rate": col("sample_rate"),
                "timescale": col("timescale"),
                "duration": col("duration"),
            }
        )


def media_dimensions(media: DataFrame) -> DataFrame:
    """Arrow-batched header decode: (payload, mime) -> typed dimensions."""
    return media.mapInPandas(_dims_batch, schema=DIMS_SCHEMA)


@query(
    "q_media_dimensions",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
                               WHEN 2 THEN 'jpeg' ELSE 'mp4' END AS kind,
               CASE WHEN doc_id % 4 = 0 THEN 16 + doc_id % 1024
                    WHEN doc_id % 4 = 2 THEN 16 + (doc_id * 3) % 1024
               END AS width,
               CASE WHEN doc_id % 4 = 0 THEN 16 + (doc_id * 7) % 512
                    WHEN doc_id % 4 = 2 THEN 16 + (doc_id * 5) % 512
               END AS height,
               CASE WHEN doc_id % 4 = 1 THEN 1 + (doc_id % 8) // 4
                    WHEN doc_id % 4 = 2 THEN 3
               END AS channels,
               CASE WHEN doc_id % 4 = 1 THEN
                    CASE doc_id % 3 WHEN 0 THEN 8000
                                    WHEN 1 THEN 16000
                                    ELSE 44100 END
               END AS sample_rate,
               CASE WHEN doc_id % 4 = 3 THEN
                    CASE doc_id % 3 WHEN 0 THEN 600
                                    WHEN 1 THEN 1000
                                    ELSE 90000 END
               END AS timescale
        FROM documents
    )
    SELECT kind,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(width) AS BIGINT) AS total_width,
           CAST(SUM(height) AS BIGINT) AS total_height,
           CAST(SUM(channels) AS BIGINT) AS total_channels,
           CAST(SUM(sample_rate) AS BIGINT) AS total_sample_rate,
           CAST(SUM(timescale * (1 + doc_id % 30)) AS BIGINT) AS total_duration
    FROM m GROUP BY kind ORDER BY kind
    """,
)
def q_media_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-decode rollup across FOUR container formats: synthesize real
    PNG / RIFF-WAVE / JPEG / MP4 bytes per doc (JVM-side), parse them back
    through the Arrow decode path (decode_media: struct-unpacked IHDR,
    fmt chunk, SOF0 marker walk, moov/mvhd box walk), and aggregate the
    decoded dimensions per kind. The oracle recomputes the same values
    closed-form from doc_id — so a wrong byte in the writer OR a wrong
    offset in the parser breaks the match. This is the dimension-routing
    pass a media lake runs before any pixel decode.

    Scale: payload bytes are born scan-side and die inside the Python
    worker; only (kind, 6 ints) per doc ever shuffles. Arrow batch size
    bounds worker memory regardless of blob size."""
    docs = load_table(spark, sf_dir, "documents")
    dims = media_dimensions(synth_media_payloads(docs))
    return (
        dims.groupBy("kind")
        .agg(
            F.count("*").cast("long").alias("n_media"),
            F.sum("width").cast("long").alias("total_width"),
            F.sum("height").cast("long").alias("total_height"),
            F.sum("channels").cast("long").alias("total_channels"),
            F.sum("sample_rate").cast("long").alias("total_sample_rate"),
            F.sum("duration").cast("long").alias("total_duration"),
        )
        .orderBy("kind")
    )


@query(
    "q_dedup_binary",
    oracle="""
    WITH hashed AS (
        SELECT doc_id, source, md5(text) AS h FROM documents
    )
    SELECT h AS payload_hash,
           COUNT(*) AS n_copies,
           COUNT(DISTINCT source) AS n_sources,
           MIN(doc_id) AS survivor_id
    FROM hashed
    GROUP BY h
    ORDER BY n_copies DESC, payload_hash
    LIMIT 20
    """,
)
def q_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary-payload dedup over the media frame: top duplicated
    payloads by copy count, with provenance spread and a keep-first
    survivor — the media twin of q_dedup_exact (images/audio dedup by
    content digest before any decode).

    Scale: md5 runs directly on the binary column scan-side; only the
    (hash, doc_id, source) triple ever shuffles — payload bytes stay in
    the scan, which is the entire point at 100 TB of media. The top-20 is
    TakeOrderedAndProject with a hash tie-break (deterministic under any
    partitioning). Oracle note: Spark hashes the payload BYTES
    (utf-8-encoded text, see build_media_frame); DuckDB's md5(text) hashes
    the same utf-8 byte stream, so the digests agree."""
    docs = load_table(spark, sf_dir, "documents")
    media = build_media_frame(docs)
    return (
        media.select("doc_id", "source", F.md5("payload").alias("payload_hash"))
        .groupBy("payload_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("survivor_id"),
        )
        .orderBy(F.desc("n_copies"), F.asc("payload_hash"))
        .limit(20)
    )

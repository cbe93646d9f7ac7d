"""Multimodal column plumbing (tier C11).

Images/audio/video travel as opaque ``binary`` columns plus typed metadata
(the lakehouse-standard layout); per-item processing runs in Arrow-batched
``mapInPandas`` stages so the Python boundary is crossed once per batch,
not once per row. The actual decoders (PIL/librosa/ffmpeg) are NOT in this
container, so the decode kernel is a clearly-marked deterministic stub —
the Spark-side contract (schema, batching, partitioning) is real and
tested; swapping in a real decoder changes one inner function only.

The embedding pipeline (vector feature extraction) is real end-to-end:
see :func:`embedding_features`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def _decode_stub(payload: bytes | None, kind: str) -> list[float]:
    """STUB decode kernel — deterministic fake features; the container
    default (PIL/librosa/ffmpeg are not installed here).

    Real deployment: ``register_decoder("image", my_pil_kernel)`` — the
    surrounding Arrow plumbing is unchanged. Raises
    ``NotImplementedError`` for kinds a real decoder must handle but the
    fake cannot fabricate meaningfully.
    """
    if kind not in {"image", "audio", "video"}:
        raise NotImplementedError(f"unknown media kind: {kind}")
    if payload is None:
        return []
    # deterministic 8-dim "feature": byte histogram over 8 bins
    hist = [0] * 8
    for b in payload:
        hist[b >> 5] += 1
    total = max(len(payload), 1)
    return [h / total for h in hist]


# decoder registry: kind -> (payload, kind) -> list[float]. The stub is
# the registered default for every kind; a deployment swaps kernels
# WITHOUT touching the mapInPandas stage (the registry is captured in the
# task closure at plan time, so registration must precede the action).
_DECODERS: dict[str, object] = {
    "image": _decode_stub,
    "audio": _decode_stub,
    "video": _decode_stub,
}


def register_decoder(kind: str, fn) -> None:
    """Install a real decode kernel ``fn(payload: bytes|None, kind: str)
    -> list[float]`` for one media kind (e.g. PIL for ``image``)."""
    if kind not in _DECODERS:
        raise ValueError(f"unknown media kind: {kind!r}")
    _DECODERS[kind] = fn


def extract_media_features(
    media: DataFrame, batch_hint: int = 1024, decoders: dict | None = None
) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas`` (Arrow batches),
    dispatching per-kind through the decoder registry. ``decoders``
    overrides individual kinds for THIS stage only (no global registry
    mutation — concurrent pipelines keep their own kernels).

    Partitioning contract: upstream should size partitions by *bytes* not
    rows (``spark.sql.files.maxPartitionBytes``) because payloads dominate;
    the stage is embarrassingly parallel — no shuffle.
    """
    # snapshot into the task closure (call-site overrides win)
    decoders = {**_DECODERS, **(decoders or {})}

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int32"),
                    "feature": [
                        decoders.get(k, _decode_stub)(p, k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    from neo4j_graphdb_spark.session import spread_partitions

    # project to exactly the columns the kernel touches BEFORE the Arrow
    # boundary: Spark cannot see inside the Python function, so without
    # this every extra input column (e.g. a per-row metadata map) ships
    # to the workers and back for nothing (guide §4.1)
    return spread_partitions(media.select("media_id", "kind", "payload")).mapInPandas(
        featurize, schema=FEATURE_SCHEMA
    )


def _resize_stub(payload: bytes | None, kind: str, max_bytes: int) -> bytes | None:
    """STUB resize kernel — deterministic fake thumbnail: the first
    ``max_bytes`` of the payload (a PIL kernel would decode, resample to
    the target box, and re-encode; the crop keeps the stub reproducible
    in the DuckDB oracle via ``substring(blob)``)."""
    if kind not in {"image", "audio", "video"}:
        raise NotImplementedError(f"unknown media kind: {kind}")
    if payload is None:
        return None
    return payload[:max_bytes]


_RESIZERS: dict[str, object] = {
    "image": _resize_stub,
    "audio": _resize_stub,
    "video": _resize_stub,
}


def register_resizer(kind: str, fn) -> None:
    """Install a real resize kernel ``fn(payload, kind, max_bytes) ->
    bytes|None`` for one media kind (e.g. PIL thumbnail for ``image``)."""
    if kind not in _RESIZERS:
        raise ValueError(f"unknown media kind: {kind!r}")
    _RESIZERS[kind] = fn


def resize_media(media: DataFrame, max_bytes: int = 4096) -> DataFrame:
    """Thumbnail/downsample stage: per-row payload transform via
    ``mapInPandas`` (Arrow batches, one Python crossing per batch),
    dispatching through the resizer registry. Embarrassingly parallel —
    no shuffle; partition sizing is byte-driven upstream, same contract
    as :func:`extract_media_features`.

    Output: ``(media_id, kind, out_bytes, thumb)`` with the resized
    payload as a binary column.
    """
    resizers = dict(_RESIZERS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [
                resizers.get(k, _resize_stub)(p, k, max_bytes)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "out_bytes": [0 if t is None else len(t) for t in thumbs],
                    "thumb": thumbs,
                }
            )

    from neo4j_graphdb_spark.session import spread_partitions

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("out_bytes", T.IntegerType(), True),
            T.StructField("thumb", T.BinaryType(), True),
        ]
    )
    # same §4.1 projection rationale as extract_media_features
    return spread_partitions(media.select("media_id", "kind", "payload")).mapInPandas(
        run, schema=schema
    )


def _frame_stub(payload: bytes | None, frame_bytes: int, stride: int) -> list[tuple[int, bytes]]:
    """STUB frame extractor — deterministic fake codec: the payload is
    treated as a stream of fixed ``frame_bytes`` frames, and every
    ``stride``-th frame is emitted (an ffmpeg kernel would decode the
    container and sample real frames; fixed-size slicing keeps the stub
    reproducible in the DuckDB oracle via ``substring(blob)``)."""
    if payload is None:
        return []
    n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
    return [
        (i, payload[i * frame_bytes : (i + 1) * frame_bytes])
        for i in range(0, n_frames, stride)
    ]


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, stride: int = 4
) -> DataFrame:
    """Frame-sampling stage for video rows: one output row per sampled
    frame, via ``mapInPandas`` (the 1→N row fanout is why this is a
    mapInPandas stage and not a scalar pandas UDF — each input batch
    yields a differently-sized output batch).

    At scale the fanout multiplies bytes, not keys: the stage stays
    shuffle-free, and downstream per-frame work inherits the input's
    partitioning. Output: ``(media_id, frame_idx, n_bytes, frame)``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, frames = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for i, fr in _frame_stub(p, frame_bytes, stride):
                    ids.append(mid)
                    idxs.append(i)
                    lens.append(len(fr))
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "n_bytes": pd.Series(lens, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    from neo4j_graphdb_spark.session import spread_partitions

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.LongType(), False),
            T.StructField("n_bytes", T.IntegerType(), True),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )
    vids = media.filter(F.col("kind") == "video")
    return spread_partitions(vids.select("media_id", "payload")).mapInPandas(
        run, schema=schema
    )


def synthetic_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture a deterministic media table from any text table (test
    harness for the plumbing: payload = utf-8 bytes of the text)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col(id_col) % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.create_map(F.lit("src"), F.lit("synthetic")).alias("meta"),
    )


def embedding_features(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Vector feature extraction that IS fully real: L2 norm, mean, max —
    computed JVM-side over the array column (no UDF)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sq = F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)
    return embeddings.select(
        "*",
        F.sqrt(sq).alias("l2_norm"),
        (F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / F.size(v)).alias("mean_val"),
        F.array_max(v).alias("max_val"),
    )


# ---------------------------------------------------------------------------
# A REAL image decoder — stdlib only, no PIL: uncompressed 24-bit BMP.
# Proof that the decoder registry's contract holds for a genuine binary
# format end-to-end (header parse → pixel decode → features), not just
# the deterministic stub. PNG/JPEG kernels would slot in identically
# once their codec libs exist in the runtime.
# ---------------------------------------------------------------------------


def bmp_encode(width: int, height: int, pixel_fn) -> bytes:
    """Build a spec-conformant uncompressed 24-bit BMP:
    BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows padded to 4
    bytes. ``pixel_fn(x, y, channel)`` supplies each byte (channel order
    B,G,R; y=0 is the TOP row — the encoder handles BMP's bottom-up
    storage)."""
    import struct

    row_size = (3 * width + 3) // 4 * 4
    body = bytearray()
    for y in range(height - 1, -1, -1):
        row = bytearray(
            pixel_fn(x, y, c) % 256 for x in range(width) for c in range(3)
        )
        row += b"\x00" * (row_size - len(row))
        body += row
    data_size = row_size * height
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return bytes(header + info + body)


def bmp_decode_kernel(payload: bytes | None, kind: str) -> list[float]:
    """REAL decode kernel for 24-bit BMP payloads: parses the file and
    info headers (magic, pixel offset, dimensions, bit depth), walks the
    padded bottom-up pixel rows, and returns
    ``[width, height, mean_B, mean_G, mean_R]`` — the shape a PIL/libjpeg
    kernel would produce for any raster format. Raises on malformed
    payloads (wrong magic / depth), which the surrounding stage surfaces
    per-row instead of killing the batch."""
    import struct

    if payload is None:
        return []
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack("<I", payload[10:14])[0]
    width = struct.unpack("<i", payload[18:22])[0]
    height = struct.unpack("<i", payload[22:26])[0]
    bpp = struct.unpack("<H", payload[28:30])[0]
    if bpp != 24:
        raise ValueError(f"unsupported bit depth {bpp}")
    row_size = (3 * width + 3) // 4 * 4
    sums = [0, 0, 0]
    for row_i in range(height):
        base = off + row_i * row_size
        for x in range(width):
            p = base + 3 * x
            sums[0] += payload[p]
            sums[1] += payload[p + 1]
            sums[2] += payload[p + 2]
    n = width * height
    return [
        float(width),
        float(height),
        sums[0] / n,
        sums[1] / n,
        sums[2] / n,
    ]


def wav_encode(n_samples: int, sample_rate: int, sample_fn) -> bytes:
    """Build a spec-conformant RIFF/WAVE file: PCM, 1 channel, 16-bit
    little-endian. ``sample_fn(i)`` supplies each sample (clamped to the
    int16 range). The audio twin of :func:`bmp_encode`."""
    import struct

    data = b"".join(
        struct.pack("<h", max(-32768, min(32767, int(sample_fn(i)))))
        for i in range(n_samples)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def wav_decode_kernel(payload: bytes | None, kind: str) -> list[float]:
    """REAL decode kernel for PCM16 WAV payloads: parses the RIFF
    container (chunk walk — fmt before data, extra chunks tolerated),
    validates PCM/16-bit, and returns
    ``[sample_rate, n_samples, mean, rms]`` — the shape a librosa kernel
    would produce. Raises on malformed containers so the stage surfaces
    bad rows instead of fabricating features."""
    import math
    import struct

    if payload is None:
        return []
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, bits, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, _ch, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 is supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # RIFF chunks pad to even
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n = len(data) // 2
    samples = struct.unpack(f"<{n}h", data[: 2 * n])
    mean = sum(samples) / n
    rms = math.sqrt(sum(s * s for s in samples) / n)
    return [float(sample_rate), float(n), mean, rms]


# Minimal VALID single-pixel LZW image data for a 2-color GIF frame
# (min code size 2: clear, one literal, end — the canonical smallest
# conformant stream), used by the synthetic encoder below.
_GIF_MIN_LZW = b"\x02\x02\x44\x01\x00"


def gif_encode(width: int, height: int, n_frames: int) -> bytes:
    """Build a structurally conformant animated GIF89a: logical screen
    descriptor with a 2-entry global color table, ``n_frames`` 1×1 image
    descriptors each carrying the minimal valid LZW stream, trailer.
    The container twin of :func:`bmp_encode`/:func:`wav_encode` — frame
    SAMPLING needs exactly this block structure; pixel decode would need
    an LZW codec (ffmpeg/PIL seam)."""
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80, 0, 0)  # GCT flag, 2 entries
    out += b"\x00\x00\x00\xff\xff\xff"  # the 2-color table
    for _ in range(n_frames):
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
        out += _GIF_MIN_LZW
    out += b"\x3b"
    return bytes(out)


def gif_probe_kernel(payload: bytes | None, kind: str) -> list[float]:
    """REAL container probe for GIF payloads: validates the signature,
    reads the logical screen descriptor (+ skips the global color
    table), then WALKS the block stream — image descriptors (skipping
    local tables and LZW sub-blocks), extensions, trailer — and returns
    ``[width, height, n_frames, gct_entries]``. This is the structural
    pass a frame sampler runs before any codec work; pixel decode stays
    behind the ffmpeg/PIL seam. Raises on malformed containers."""
    import struct

    if payload is None:
        return []
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    width, height, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = 0
    if packed & 0x80:
        gct = 2 << (packed & 0x07)
        pos += 3 * gct

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("truncated sub-blocks")
            n = payload[p]
            p += 1
            if n == 0:
                return p
            p += n

    frames = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            return [float(width), float(height), float(frames), float(gct)]
        if b == 0x2C:  # image descriptor
            ipacked = payload[pos + 9]
            pos += 10
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))  # local color table
            pos += 1  # LZW min code size
            pos = skip_subblocks(pos)
            frames += 1
        elif b == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("missing GIF trailer")


def bmp_dhash_bits(payload: bytes | None) -> int | None:
    """64-bit DIFFERENCE hash (dHash, Krawetz 2013) of a 9x8 24-bit BMP:
    per pixel, grayscale = (B+G+R)/3; bit(x, y) = 1 iff
    gray(x, y) > gray(x+1, y) for x in 0..7, y in 0..7 (y=0 is the TOP
    row), packed MSB-first (bit for (x=0, y=0) is the highest bit). The
    canonical perceptual fingerprint: local brightness gradients survive
    re-encoding/resizing, so near-identical images land within a few
    bits. A PIL kernel for arbitrary rasters resizes to 9x8 first and
    reuses this exact bit rule.

    ``None`` payloads hash to ``None`` (nullable LongType downstream) —
    NOT to a sentinel 0, which would surface every missing image as a
    distance-0 "near-duplicate" of every other missing/blank image."""
    import struct

    if payload is None:
        return None
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack("<I", payload[10:14])[0]
    width = struct.unpack("<i", payload[18:22])[0]
    height = struct.unpack("<i", payload[22:26])[0]
    if (width, height) != (9, 8):
        raise ValueError(f"dhash kernel expects a 9x8 raster, got {width}x{height}")
    row_size = (3 * width + 3) // 4 * 4

    def gray(x: int, y: int) -> float:
        # BMP rows are stored bottom-up: top row y=0 is the LAST stored row
        base = off + (height - 1 - y) * row_size + 3 * x
        return (payload[base] + payload[base + 1] + payload[base + 2]) / 3.0

    bits = 0
    for y in range(8):
        for x in range(8):
            bits = (bits << 1) | (1 if gray(x, y) > gray(x + 1, y) else 0)
    # two's-complement into a signed 64-bit long (Spark LongType)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def bmp_dhash(media: DataFrame) -> DataFrame:
    """Per-image perceptual hash stage: ``(media_id, kind, payload)`` →
    ``(media_id, dhash long)`` via one Arrow-batched ``mapInPandas`` —
    embarrassingly parallel, no shuffle; the hash is 8 bytes per image,
    so downstream near-dup joins never move payloads."""
    from pyspark.sql import types as T

    from neo4j_graphdb_spark.session import spread_partitions

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": [bmp_dhash_bits(p) for p in pdf["payload"]],
                }
            )

    # kernel reads only (media_id, payload) — project before Arrow (§4.1)
    return spread_partitions(media.select("media_id", "payload")).mapInPandas(
        run, schema=schema
    )

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as ``binary`` columns with a typed
metadata struct, and run decode / feature-extraction as Arrow-batched
Python over ``mapInPandas``. The image decode is capability-probed in
preference order — PIL, then imageio (faster C codecs when a production
environment has them), then the engine's OWN pure-stdlib PNG codec
(``png_codec.py``, zlib + numpy from the public PNG spec), which is
always available — so ``decode_image`` is a REAL lossless codec in this
container too, the exact analog of the audio tier's stdlib ``wave``
path, and ``image_resize`` runs a genuine encode→decode round trip on
every row. PNG being lossless, every oracle is identical whichever
codec wins the probe. The NotImplementedError guards remain only for a
probe that finds ALL tiers broken. The AUDIO path: ``audio_decode_wav``
encodes and decodes genuine RIFF/WAVE containers with CPython's stdlib
codec. Everything Spark-side is real and tested in all cases: the binary
column, the metadata struct schema, the mapInPandas batch shape, and the
partition-preserving plumbing.

Scale notes: payload bytes never shuffle — feature extraction is a
narrow ``mapInPandas`` over the scan, and only the (id, features) rows
flow onward. Metadata-only predicates (width/height/format) prune before
any decode runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans.registry import register

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, channels long, mean_byte double"
)


# Capability probe, once at module import (executors re-probe on their own
# import): probed in preference order PIL -> imageio (production C codecs
# win when installed) -> the engine's own pure-stdlib PNG codec
# (png_codec.py), which makes the real round trip available in THIS
# container too. Oracles hold whichever tier wins because PNG is lossless
# (encode→decode is the identity on the grid).
#
# The probe EXECUTES a tiny in-memory PNG encode→decode round trip rather
# than keying off import success: imageio installed without a PNG-capable
# plugin (no pillow/pypng backend) imports fine but throws plugin errors
# on first use, which would otherwise surface inside executor tasks
# instead of falling through to the next tier.
def _probe_image_codec() -> str | None:  # pragma: no cover - env-dependent
    global _PILImage, _imageio, _pngc
    grid = np.arange(9, dtype=np.uint8).reshape(3, 3)
    try:
        import io

        from PIL import Image as _PILImage  # type: ignore

        buf = io.BytesIO()
        _PILImage.fromarray(grid, mode="L").save(buf, format="PNG")
        if np.array_equal(np.asarray(_PILImage.open(io.BytesIO(buf.getvalue()))), grid):
            return "PIL"
    except Exception:
        pass
    try:
        import imageio.v3 as _imageio  # type: ignore

        png = _imageio.imwrite("<bytes>", grid, extension=".png")
        if np.array_equal(_imageio.imread(png, extension=".png"), grid):
            return "imageio"
    except Exception:
        pass
    try:
        from pythonmapreduce_spark.pipeline import png_codec as _pngc

        if np.array_equal(_pngc.decode_png(_pngc.encode_png(grid)), grid):
            return "stdlib"
    except Exception:
        pass
    return None


_IMAGE_CODEC: str | None = _probe_image_codec()


def encode_image(arr: "np.ndarray") -> bytes:
    """Encode a (h, w) uint8 grid to lossless PNG bytes via whichever
    codec won the probe (PIL/imageio when installed, the stdlib PNG
    codec otherwise); NotImplementedError only when every tier failed
    the executed round-trip probe."""
    import io

    if _IMAGE_CODEC == "PIL":
        buf = io.BytesIO()
        _PILImage.fromarray(arr, mode="L").save(buf, format="PNG")
        return buf.getvalue()
    if _IMAGE_CODEC == "imageio":
        return _imageio.imwrite("<bytes>", arr, extension=".png")
    if _IMAGE_CODEC == "stdlib":
        # zlib level 1: the engine's encodes feed an immediate in-worker
        # decode (image_resize's round trip), so compression ratio buys
        # nothing — losslessness is level-independent, throughput is not
        # (measured 6.35 -> 4.8 s min-of-5 on the sf0.1 resize at level 1).
        return _pngc.encode_png(arr, level=1)
    raise NotImplementedError("no working image codec tier (probe failed)")


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an encoded image payload to a uint8 ndarray.

    Always a REAL decode: PIL, then imageio, then the engine's stdlib
    PNG codec (pure zlib + numpy, CRC-verified) — the same
    capability-over-import-success contract, now with a tier that every
    CPython environment has. Oracles are codec-independent because PNG
    is lossless. tests/test_multimodal_edge exercises round trips,
    foreign-filter decode, and corruption rejection."""
    import io

    if _IMAGE_CODEC == "PIL":
        return np.asarray(_PILImage.open(io.BytesIO(payload)))
    if _IMAGE_CODEC == "imageio":
        return _imageio.imread(payload, extension=".png")
    if _IMAGE_CODEC == "stdlib":
        return _pngc.decode_png(payload)
    raise NotImplementedError("no working image codec tier (probe failed)")


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata struct.

    The payload here is the UTF-8 text bytes standing in for an encoded
    image; metadata (width/height/channels/format) is derived
    deterministically so tests are reproducible.

    Rows with NULL text (a missing blob in real life) are dropped at the
    scan: every downstream decode/resize/chunk stage needs bytes, and a
    NULL payload would go ragged inside the Arrow batches. Observable
    loss accounting for such rows is bad_records_quarantine's job.
    """
    docs = docs.where(F.col("text").isNotNull() & F.col("n_chars").isNotNull())
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 32).cast("long").alias("width"),
            (F.col("doc_id") % 480 + 32).cast("long").alias("height"),
            F.lit(3).cast("long").alias("channels"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake feature extractor (deterministic stand-in for a
    real decoder): byte stats straight off the payload buffer."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len).astype("int64")

        def _mean4(b: bytes) -> float:
            if not len(b):
                return 0.0
            m = float(np.frombuffer(b, dtype=np.uint8).mean())
            # round half away from zero (SQL ROUND), not banker's rounding
            return float(np.floor(m * 10000 + 0.5) / 10000)

        mean_byte = payloads.map(_mean4)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "width": pdf["meta"].map(lambda m: m["width"]).astype("int64"),
                "height": pdf["meta"].map(lambda m: m["height"]).astype("int64"),
                "channels": pdf["meta"].map(lambda m: m["channels"]).astype("int64"),
                "mean_byte": mean_byte.astype("float64"),
            }
        )


@register(
    "multimodal_features",
    oracle="""
    -- BYTE-exact oracle: DuckDB exposes no direct byte iteration over a
    -- BLOB, so bytes are recovered from hex(encode(text)) two hex digits
    -- at a time. ascii(c) per CHARACTER (the old form) silently computed
    -- code points, which only equals the byte stream on pure-ASCII
    -- corpora — the charset robustness sweep (tools/gen_unicode_fixture)
    -- caught exactly that divergence on multi-byte text.
    WITH f AS (
        SELECT doc_id, n_chars, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb
        FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
    )
    SELECT doc_id,
           CAST(nb AS BIGINT)                 AS n_bytes,
           CAST(n_chars % 640 + 32 AS BIGINT) AS width,
           CAST(doc_id % 480 + 32 AS BIGINT)  AS height,
           CAST(3 AS BIGINT)                  AS channels,
           COALESCE(ROUND(list_avg(list_transform(range(1, nb + 1),
               i -> 16 * (strpos('0123456789ABCDEF',
                                 substring(hx, CAST(2*i-1 AS BIGINT), 1)) - 1)
                  + strpos('0123456789ABCDEF',
                           substring(hx, CAST(2*i AS BIGINT), 1)) - 1)), 4),
               0.0) AS mean_byte
    FROM f
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via mapInPandas.

    The oracle cross-checks byte length, metadata, and the per-byte mean
    in SQL — over the payload's actual UTF-8 BYTES (hex-pair recovery),
    so the compare holds on any corpus, not just ASCII. With real image
    bytes only the rows-only check would apply; the plumbing (schema,
    batching, narrow execution) is identical.
    """
    docs = with_payload(load(spark, sf_dir, "documents"))
    return docs.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, n_frames long, n_sampled long, checksum long"
_FRAME_STRIDE = 4  # keep every 4th frame


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampler over the opaque payload.

    Stands in for video frame extraction (ffmpeg not in this container):
    the payload is treated as fixed-width frames of `width` bytes; every
    _FRAME_STRIDE-th frame is kept and checksummed. With a real codec only
    the per-frame decode changes — batching, schema, and stride logic stay.
    """
    for pdf in batches:
        rows = []
        for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
            w = int(meta["width"])
            buf = np.frombuffer(payload, dtype=np.uint8)
            n_frames = -(-len(buf) // w) if len(buf) else 0
            idxs = range(0, n_frames, _FRAME_STRIDE)
            checksum = sum(int(buf[i * w : (i + 1) * w].sum()) for i in idxs)
            rows.append((int(doc_id), n_frames, len(idxs), checksum))
        yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "n_sampled", "checksum"])


@register(
    "frame_sample",
    oracle="""
    -- BYTE-exact oracle (see multimodal_features): frames are w BYTES of
    -- the UTF-8 payload, recovered via hex pairs; the old char-indexed
    -- substr + ascii() form diverged on multi-byte text (charset sweep).
    WITH f AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb,
               n_chars % 640 + 32 AS w
        FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
    ),
    b AS (
        SELECT doc_id, w, nb,
               CAST(CEIL(CAST(nb AS DOUBLE) / w) AS BIGINT) AS nf,
               list_transform(range(1, nb + 1),
                   i -> 16 * (strpos('0123456789ABCDEF',
                                     substring(hx, CAST(2*i-1 AS BIGINT), 1)) - 1)
                      + strpos('0123456789ABCDEF',
                               substring(hx, CAST(2*i AS BIGINT), 1)) - 1) AS bl
        FROM f
    )
    SELECT doc_id, nf AS n_frames,
           CAST(LEN(range(0, nf, 4)) AS BIGINT) AS n_sampled,
           CAST(COALESCE(list_sum(list_transform(range(0, nf, 4),
                i -> COALESCE(list_sum(
                         bl[CAST(i * w + 1 AS BIGINT)
                            :CAST(LEAST((i + 1) * w, nb) AS BIGINT)]), 0))), 0)
               AS BIGINT) AS checksum
    FROM b
    """,
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frame sampling over binary payloads (video-style).

    The oracle recomputes frame count, sample count, and the sampled-frame
    checksum over the payload's actual BYTES in SQL, proving the
    mapInPandas chunking math exactly on any corpus. Narrow plan: payload
    bytes never shuffle; only (doc_id, 3 longs) leave the scan stage.
    """
    docs = with_payload(load(spark, sf_dir, "documents"))
    return docs.mapInPandas(_sample_frames, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id long, src_w long, src_h long, dst_w long, dst_h long, resized_len long, corner_byte long"
_DST_W, _DST_H = 16, 12


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake resize: nearest-neighbor sampling of the payload
    buffer viewed as a (height, width) byte grid — the exact index
    arithmetic a real nearest-neighbor image resize performs, minus the
    codec. Deterministic; output length is always dst_w * dst_h."""
    for pdf in batches:
        rows = []
        for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
            w, h = int(meta["width"]), int(meta["height"])
            buf = np.frombuffer(payload, dtype=np.uint8)
            # pad/tile the stand-in buffer to the declared w*h grid, exactly
            # like the oracle's modular indexing
            grid = buf[(np.arange(w * h) % max(len(buf), 1))] if len(buf) else np.zeros(
                w * h, dtype=np.uint8
            )
            grid = grid.reshape(h, w)
            if _IMAGE_CODEC is not None:
                # Real codec round trip when the environment has one:
                # encode the grid to PNG and decode it back before
                # resampling. PNG is lossless, so the oracle-pinned
                # numbers are unchanged — but the actual decode kernel
                # (the stubbed part everywhere else) runs for real.
                grid = decode_image(encode_image(grid)).reshape(h, w)
            ys = (np.arange(_DST_H) * h) // _DST_H
            xs = (np.arange(_DST_W) * w) // _DST_W
            resized = grid[np.ix_(ys, xs)]
            rows.append(
                (doc_id, w, h, _DST_W, _DST_H, resized.size, int(resized[0, 0]))
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "src_w", "src_h", "dst_w", "dst_h", "resized_len", "corner_byte",
            ],
        )


@register(
    "image_resize",
    oracle=f"""
    -- corner_byte is the payload's first BYTE (hex pair 1), not the
    -- first character's code point — ascii() diverged on multi-byte
    -- text (charset sweep, see multimodal_features)
    SELECT doc_id,
           CAST(n_chars % 640 + 32 AS BIGINT) AS src_w,
           CAST(doc_id % 480 + 32 AS BIGINT)  AS src_h,
           CAST({_DST_W} AS BIGINT) AS dst_w,
           CAST({_DST_H} AS BIGINT) AS dst_h,
           CAST({_DST_W * _DST_H} AS BIGINT) AS resized_len,
           CAST(16 * (strpos('0123456789ABCDEF',
                             substring(hex(encode(text)), 1, 1)) - 1)
                + strpos('0123456789ABCDEF',
                         substring(hex(encode(text)), 2, 1)) - 1
                AS BIGINT) AS corner_byte
    FROM documents
    WHERE text IS NOT NULL AND n_chars IS NOT NULL AND LENGTH(text) > 0
    """,
)
def image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor resize plumbing over binary image columns.

    The index arithmetic (source grid → strided row/col sample) is the real
    resize kernel; the codec is the stubbed part (payloads are stand-in
    bytes — see decode_image). The oracle pins the geometry (src/dst dims,
    output size) and the top-left sample, which for stand-in payloads is
    the text's first byte. Narrow plan: one mapInPandas over the scan, no
    shuffle — at 100 TB this runs at source-read throughput next to the
    object store.
    """
    docs = with_payload(load(spark, sf_dir, "documents")).where(
        F.length("payload") > 0
    )
    return docs.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


# BYTE-exact chunking: DuckDB 1.0's sha256 is VARCHAR-only, so BOTH
# engines hash the uppercase-hex encoding of each 64-byte chunk (Spark
# F.hex == DuckDB hex, byte-for-byte) — a 64-byte chunk is 128 hex chars
# sliced from hex(encode(text)). The old form chunked by 64 CHARACTERS,
# which only equals 64 bytes on pure-ASCII corpora (charset sweep catch;
# a chunk boundary may split a multi-byte char — fine, chunks are bytes).
_CHUNK_ORACLE = """
WITH d AS (
    SELECT doc_id, hex(encode(text)) AS hx,
           octet_length(encode(text)) AS nb
    FROM documents
    WHERE text IS NOT NULL AND n_chars IS NOT NULL
      AND octet_length(encode(text)) >= 64
),
chunks AS (
    -- integer division (//), NOT CAST(nb/64 AS BIGINT): DuckDB's / is
    -- float division and double→BIGINT CAST ROUNDS half-away, so a blob
    -- with nb % 64 >= 32 would mint a phantom short tail chunk the
    -- engine (Spark cast = truncate) never produces — latent until two
    -- docs share identical tail bytes, then a ROWS_MISMATCH
    SELECT doc_id,
           UNNEST(generate_series(0, nb // 64 - 1)) AS ci,
           hx
    FROM d
)
SELECT sha256(substring(hx, CAST(ci * 128 + 1 AS BIGINT), 128)) AS chunk_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM chunks
GROUP BY 1
HAVING COUNT(DISTINCT doc_id) >= 2
"""


@register("media_chunk_dedup", oracle=_CHUNK_ORACLE)
def media_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup over binary payloads: split every blob into
    fixed 64-byte chunks, hash each, and report chunks shared by >= 2
    documents.

    The binary-column twin of dup_ngram_spans, and the mechanism behind
    content-addressed media storage: re-encoded or partially-edited
    assets share most chunks even when whole-file hashes differ. The
    chunk explode is a pure Column pipeline (sequence + substring on the
    binary — no Python touches the bytes), and ONLY the 32-byte sha2
    digests shuffle, never the payloads: shuffle volume is
    bytes/chunk_size * 32 regardless of blob size. ``media_chunk_cdc``
    is the content-defined (rolling-hash boundary) variant — insertion-
    robust chunking with the same digest-only exchange profile.
    """
    docs = with_payload(load(spark, sf_dir, "documents"))
    chunks = (
        docs.where(F.length("payload") >= 64)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), (F.length("payload") / F.lit(64)).cast("long") - 1)
            ).alias("ci"),
            "payload",
        )
        .select(
            "doc_id",
            # hash the chunk's hex form: content-equivalent to hashing the
            # bytes (hex is injective) and expressible in both engines —
            # DuckDB 1.0's sha256 accepts VARCHAR only
            F.sha2(
                F.hex(F.expr("substring(payload, CAST(ci * 64 + 1 AS INT), 64)")),
                256,
            ).alias("chunk_hash"),
        )
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_docs") >= 2)
    )


# Rolling-hash weights for the 8-byte CDC boundary window: H(i) =
# Σ_{j=0..7} byte[i-7+j] · 31^(7-j). Max value 255·Σ31^k ≈ 7.2e12 —
# BIGINT/int64-safe with no modular reduction, so both engines compute
# the identical integer.
_CDC_WINDOW = 8
_CDC_MASK = 64  # boundary when H % 64 == 0 → ~64-byte expected chunks

_CDC_ORACLE = """
WITH d AS (
    SELECT doc_id, hex(encode(text)) AS hx,
           octet_length(encode(text)) AS nb
    FROM documents
    WHERE text IS NOT NULL AND n_chars IS NOT NULL
      AND octet_length(encode(text)) >= 1
),
b AS (
    SELECT doc_id, hx, nb,
           list_transform(range(1, nb + 1),
               i -> 16 * (strpos('0123456789ABCDEF',
                                 substring(hx, CAST(2*i-1 AS BIGINT), 1)) - 1)
                  + strpos('0123456789ABCDEF',
                           substring(hx, CAST(2*i AS BIGINT), 1)) - 1) AS bl
    FROM d
),
cutlists AS (
    -- a cut AFTER 1-based byte i, for i in [8, nb-1] (range(8, nb) is
    -- 8..nb-1: the final chunk always ends at nb, so a window landing
    -- exactly on nb adds nothing), where the 8-byte window ending at i
    -- rolls to 0 mod 64. Explicit Horner-free polynomial so the lambda
    -- stays a flat expression.
    SELECT doc_id, hx,
           list_concat(list_concat([CAST(0 AS BIGINT)],
               list_filter(range(8, nb),
                   i -> (bl[i-7]*27512614111 + bl[i-6]*887503681
                       + bl[i-5]*28629151 + bl[i-4]*923521
                       + bl[i-3]*29791 + bl[i-2]*961
                       + bl[i-1]*31 + bl[i]) % 64 = 0)),
               [CAST(nb AS BIGINT)]) AS cuts
    FROM b
),
chunks AS (
    SELECT doc_id,
           UNNEST(list_transform(range(1, LEN(cuts)), k ->
               sha256(substring(hx, CAST(2*cuts[k] + 1 AS BIGINT),
                                CAST(2*(cuts[k+1] - cuts[k]) AS BIGINT)))))
               AS chunk_hash
    FROM cutlists
)
SELECT chunk_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM chunks
GROUP BY 1
HAVING COUNT(DISTINCT doc_id) >= 2
"""


def _cdc_chunk_hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    from numpy.lib.stride_tricks import sliding_window_view

    w31 = np.array([31**k for k in range(_CDC_WINDOW - 1, -1, -1)], dtype=np.int64)
    for pdf in batches:
        ids: list = []
        hashes: list = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8)
            nb = len(b)
            if nb == 0:
                continue
            cuts = [0]
            if nb > _CDC_WINDOW:
                # h[t] is the window covering 1-based bytes t+1..t+8, i.e.
                # ending at i = t+8; drop the last window (i = nb) — the
                # final chunk ends there unconditionally
                h = sliding_window_view(b, _CDC_WINDOW).astype(np.int64) @ w31
                cuts += (np.nonzero(h[:-1] % _CDC_MASK == 0)[0] + _CDC_WINDOW).tolist()
            cuts.append(nb)
            for a, c in zip(cuts, cuts[1:]):
                ids.append(doc_id)
                # hash the uppercase-hex form of the chunk bytes — the
                # engine-portable content address every chunk query here
                # uses (DuckDB sha256 is VARCHAR-only; hex is injective)
                hashes.append(
                    hashlib.sha256(
                        b[a:c].tobytes().hex().upper().encode()
                    ).hexdigest()
                )
        yield pd.DataFrame({"doc_id": ids, "chunk_hash": hashes})


@register("media_chunk_cdc", oracle=_CDC_ORACLE)
def media_chunk_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup: chunk boundaries fall where an
    8-byte rolling polynomial hash ≡ 0 (mod 64), so an insertion or
    deletion only re-chunks its local neighborhood — every boundary
    downstream of the edit re-synchronizes, unlike ``media_chunk_dedup``'s
    fixed grid where one inserted byte shifts (and misses) every
    subsequent chunk. The production CDC regime (LBFS/rsync lineage) for
    re-encoded / partially-edited media assets.

    Scale shape: boundary detection reads only a local 8-byte window —
    per-document, no cross-row state — so the whole chunker is one
    Arrow-batched mapInPandas over the scan stage; payload bytes never
    leave it, and only (doc_id, 32-byte digest) pairs shuffle to the
    share-count aggregate (identical exchange profile to the fixed-grid
    variant). The boundary rule is positionally independent, which is
    what keeps the DuckDB oracle a flat list expression; production CDC
    adds min/max chunk clamps (sequential state) — a deployment knob,
    not a different plan. Expected chunk = mask size (64 B) at fixture
    scale; at real media scale the window/mask widen (48-bit Rabin,
    8-KB masks) with the same plan.
    """
    docs = with_payload(load(spark, sf_dir, "documents"))
    chunks = docs.select("doc_id", "payload").mapInPandas(
        _cdc_chunk_hashes, schema="doc_id long, chunk_hash string"
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_docs") >= 2)
    )


_MAGIC = {
    0: bytes.fromhex("89504E470D0A1A0A"),          # PNG signature
    1: bytes.fromhex("FFD8FFE0"),                   # JPEG/JFIF SOI
    2: b"RIFF" + bytes(4) + b"WAVE",                # RIFF container, WAVE form
    # Raw-text branch carries a 1-byte NUL sentinel so a text that happens
    # to BEGIN with a container signature ("RIFF....WAVE", an FFD8FF-
    # decodable prefix) can never be sniffed as media — the classification
    # is collision-proof for arbitrary corpus content, not just the
    # vocabulary-random fixture (ADVICE r3). Mirrored as +1 in the
    # oracle's byte-length arithmetic.
    3: b"\x00",                                     # raw blob, sentinel byte
}


@register(
    "media_type_sniff",
    oracle="""
    SELECT CASE doc_id % 4 WHEN 0 THEN 'image/png'
                           WHEN 1 THEN 'image/jpeg'
                           WHEN 2 THEN 'audio/wav'
                           ELSE 'application/octet-stream' END AS detected_type,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(OCTET_LENGTH(ENCODE(text))
                    + CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                                      WHEN 2 THEN 12 ELSE 1 END) AS BIGINT)
               AS total_bytes
    FROM documents
    WHERE text IS NOT NULL
    GROUP BY 1
    """,
)
def media_type_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type sniffing by MAGIC BYTES — the ingestion gate that
    trusts the payload, not the filename/metadata (mislabeled blobs are
    routine in crawled media, and a wrong decoder pick crashes or, worse,
    silently mangles). Payloads get real container signatures (PNG
    8-byte signature, JPEG/JFIF SOI, RIFF....WAVE) prepended
    deterministically by doc_id, and the sniffer classifies from the
    leading bytes ALONE; the oracle derives the expected class from the
    same doc_id rule, independently of the byte matching.

    Scale shape: the whole sniff is substring(payload, 1, 12) + a hex
    prefix CASE — JVM expressions in the scan stage, no Python, no
    decode; payload bytes never reach an exchange (the aggregate ships
    (type, count, bytes) partials). This is the cheap pre-filter in
    front of multimodal_features' per-type decode fan-out.
    """
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    payload = F.concat(
        F.when(F.col("doc_id") % 4 == 0, F.lit(_MAGIC[0]))
        .when(F.col("doc_id") % 4 == 1, F.lit(_MAGIC[1]))
        .when(F.col("doc_id") % 4 == 2, F.lit(_MAGIC[2]))
        .otherwise(F.lit(_MAGIC[3])),
        F.encode(F.col("text"), "UTF-8"),
    )
    hx = F.hex(F.expr("substring(payload, 1, 12)"))
    detected = (
        F.when(hx.startswith("89504E470D0A1A0A"), "image/png")
        .when(hx.startswith("FFD8FF"), "image/jpeg")
        .when(
            hx.startswith("52494646") & (F.substring(hx, 17, 8) == F.lit("57415645")),
            "audio/wav",
        )
        .otherwise("application/octet-stream")
    )
    return (
        docs.select(payload.alias("payload"))
        .select(detected.alias("detected_type"), F.length("payload").alias("nb"))
        .groupBy("detected_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("nb").cast("long").alias("total_bytes"),
        )
    )


WAV_SCHEMA = (
    "doc_id long, n_frames long, framerate long, sampwidth long, "
    "n_channels long, container_bytes long, checksum long"
)
_WAV_RATE = 8000


def _wav_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched REAL audio codec round trip (stdlib ``wave``).

    Like the image tier's stdlib PNG codec (png_codec.py — see
    decode_image's capability probe), the WAV container codec ships with
    CPython, so this path exercises a genuine encode→decode:
    deterministic int16 PCM is
    serialized into real RIFF/WAVE bytes by the stdlib writer, then the
    stdlib reader parses the container BACK — header fields (channel
    count, sample width, frame rate, frame count) come from the decoded
    byte stream, not from the inputs — and the decoded samples are
    verified bit-exact before their checksum is emitted. A corrupted
    container or a lossy round trip fails loudly, not silently.
    """
    import io
    import wave

    for pdf in batches:
        rows = []
        for doc_id, n in zip(pdf["doc_id"], pdf["n"]):
            doc_id, n = int(doc_id), int(n)
            samples = (
                (doc_id * 31 + np.arange(n, dtype=np.int64) * 17) % 65536 - 32768
            ).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(_WAV_RATE)
                w.writeframes(samples.tobytes())
            payload = buf.getvalue()
            with wave.open(io.BytesIO(payload), "rb") as r:
                nch, sw, fr, nf = (
                    r.getnchannels(),
                    r.getsampwidth(),
                    r.getframerate(),
                    r.getnframes(),
                )
                decoded = np.frombuffer(r.readframes(nf), dtype="<i2")
            if not np.array_equal(decoded, samples):  # pragma: no cover
                raise ValueError(f"WAV round trip corrupted doc {doc_id}")
            rows.append(
                (
                    doc_id,
                    nf,
                    fr,
                    sw,
                    nch,
                    len(payload),
                    int(decoded.astype(np.int64).sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_frames",
                "framerate",
                "sampwidth",
                "n_channels",
                "container_bytes",
                "checksum",
            ],
        )


@register(
    "audio_decode_wav",
    oracle=f"""
    -- Every emitted field is read back from REAL decoded WAV bytes on the
    -- Spark side; the oracle recomputes what a correct codec round trip
    -- must produce: header fields as written, container_bytes = the
    -- canonical 44-byte RIFF/fmt/data header + 2 bytes per mono 16-bit
    -- frame, checksum = the sum of the deterministic PCM samples. Any
    -- container corruption, header misparse, or sample mangling lands as
    -- a hash mismatch here (or an in-engine bit-exactness error first).
    WITH d AS (
        SELECT doc_id, n_chars % 256 + 16 AS n
        FROM documents WHERE n_chars IS NOT NULL
    )
    SELECT doc_id,
           CAST(n AS BIGINT)            AS n_frames,
           CAST({_WAV_RATE} AS BIGINT)  AS framerate,
           CAST(2 AS BIGINT)            AS sampwidth,
           CAST(1 AS BIGINT)            AS n_channels,
           CAST(44 + 2 * n AS BIGINT)   AS container_bytes,
           CAST(list_sum(list_transform(range(0, CAST(n AS BIGINT)),
                i -> (doc_id * 31 + i * 17) % 65536 - 32768)) AS BIGINT)
               AS checksum
    FROM d
    """,
)
def audio_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode: per-document PCM synthesized deterministically
    (frame count keyed off n_chars, samples off doc_id), encoded into a
    genuine RIFF/WAVE container and decoded back with CPython's stdlib
    ``wave`` codec inside one narrow mapInPandas — the audio analog of
    multimodal_features. Both media tiers now decode for real in every
    environment: the image tier's capability probe bottoms out in the
    engine's own stdlib PNG codec (png_codec.py), the audio tier here in
    stdlib ``wave``.

    Scale shape: only (doc_id, n) — two longs — enter the Python stage,
    and only seven longs leave it; no payload ever shuffles, so at 100 TB
    this runs at scan throughput with the codec on the executor, exactly
    where a real librosa/ffmpeg extraction would sit.
    """
    docs = load(spark, sf_dir, "documents").where(F.col("n_chars").isNotNull())
    src = docs.select("doc_id", (F.col("n_chars") % 256 + 16).alias("n"))
    return src.mapInPandas(_wav_roundtrip, schema=WAV_SCHEMA)

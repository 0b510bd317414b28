"""Multimodal column plumbing — opaque binary payloads with typed
metadata, decoded via Arrow-batched `mapInPandas` (builder brief:
image/audio/video as `binary` columns; decode/feature-extract/
frame-sample as Pandas UDFs).

The container ships no image/audio libraries, so the DECODE step is a
deterministic fake (`_fake_decode`) — but everything Spark-side is
real and tested: the binary column, the mapInPandas batch iteration,
the output schema contract, and the frame-sample fan-out. A real
decoder (PIL etc.) drops in through the `decoder=` parameter; when the
library is absent `real_decoder()` raises ImportError at call time —
it is NOT silently faked.

Payloads are derived from `documents.text` (UTF-8 bytes) because the
testdata has no binary column; the plumbing is payload-agnostic.

100 TB notes: mapInPandas streams Arrow batches — constant memory per
task regardless of table size; no shuffle at all for decode (narrow),
one explode-shaped fan-out for frame sampling. Binary payloads stay
off the driver entirely.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load

DECODE_SCHEMA = "doc_id long, n_bytes bigint, first_byte bigint, width bigint, height bigint"
FRAME_SCHEMA = "doc_id long, frame_idx bigint, frame_byte bigint"
FRAME_STRIDE = 16
N_FRAMES = 3


def payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal frame: opaque binary + typed metadata columns."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for an image decode: pseudo dimensions
    derived from the bytes. Same arithmetic as the SQL oracle."""
    n = len(payload)
    first = payload[0] if n else 0
    return n, first, n % 100 + 1, first % 64 + 1


def real_decoder():
    """Return a PIL-backed decoder when available. The image libraries
    are not in this container, so this raises ImportError here — the
    gate is explicit, never a silent fake."""
    from PIL import Image  # noqa: F401  (ImportError = no real decoder)

    def decode(payload: bytes):
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        return len(payload), payload[0], img.width, img.height

    return decode


def decode_payloads(
    df: DataFrame, decoder: Callable[[bytes], tuple] | None = None
) -> DataFrame:
    """Arrow-batched decode: binary -> (n_bytes, first_byte, w, h)."""
    dec = decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [dec(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": [d[0] for d in decoded],
                    "first_byte": [d[1] for d in decoded],
                    "width": [d[2] for d in decoded],
                    "height": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(run, DECODE_SCHEMA)


def sample_frames(
    df: DataFrame, stride: int = FRAME_STRIDE, n_frames: int = N_FRAMES
) -> DataFrame:
    """Frame sampling fan-out: every stride-th byte becomes a 'frame'
    row (the video-sampling UDTF shape; 1 input row -> <= n_frames)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, vals = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(n_frames):
                    off = i * stride
                    if off < len(payload):
                        ids.append(doc_id)
                        idxs.append(i)
                        vals.append(payload[off])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_byte": vals}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, resized binary, out_w bigint, out_h bigint"
)
MAX_SIDE = 8
HIST_SCHEMA = "doc_id long, bin bigint, cnt bigint, n_bytes bigint"
HIST_BINS = 16


def resize_payloads(
    df: DataFrame,
    decoder: Callable[[bytes], tuple] | None = None,
    max_side: int = MAX_SIDE,
) -> DataFrame:
    """The resize step of the brief (decode / feature-extract / RESIZE
    / frame-sample): binary in -> smaller binary out, Arrow-batched.
    The fake 'resize' strides through the payload to out_w*out_h
    bytes (same deterministic arithmetic as the oracle); a real
    image resize drops in through `decoder` + PIL the same way as
    `decode_payloads`. The resized column stays BINARY so downstream
    native ops (octet_length, md5) keep working on it — that flow is
    the thing being tested."""
    dec = decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, ws, hs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n, _first, w, h = dec(payload)
                ow, oh = min(w, max_side), min(h, max_side)
                k = ow * oh
                stride = max(1, n // k)
                blob = bytes(
                    payload[i * stride]
                    for i in range(k)
                    if i * stride < n
                )
                ids.append(doc_id)
                blobs.append(blob)
                ws.append(ow)
                hs.append(oh)
            yield pd.DataFrame(
                {"doc_id": ids, "resized": blobs, "out_w": ws, "out_h": hs}
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


def byte_histogram(df: DataFrame, bins: int = HIST_BINS) -> DataFrame:
    """Feature extraction: fixed-length byte-histogram vector per
    payload (bin = byte >> 3 over the ASCII range), emitted as
    (doc_id, bin, cnt, n_bytes) rows — the modality-agnostic feature
    the pipeline can cluster/classify on. This one is NOT a fake:
    byte histograms are real features. All `bins` rows emit per doc,
    including empty bins (fixed-length vector semantics). The UDF
    emits INTEGER counts only; the share ratio is computed natively
    downstream so rounding follows the engines' shared half-away
    convention (np.round is banker's — deliberately avoided)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bs, cnts, ns = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if not len(payload):
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8) >> 3
                counts = np.bincount(arr, minlength=bins)[:bins]
                ids.extend([doc_id] * bins)
                bs.extend(range(bins))
                cnts.extend(int(c) for c in counts)
                ns.extend([len(payload)] * bins)
            yield pd.DataFrame(
                {"doc_id": ids, "bin": bs, "cnt": cnts, "n_bytes": ns}
            )

    return df.mapInPandas(run, HIST_SCHEMA)


def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_payloads(payloads(spark, sf_dir)).orderBy("doc_id")


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(payloads(spark, sf_dir)).orderBy("doc_id", "frame_idx")


def mm_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + NATIVE post-ops on the resized binary: octet_length
    and md5 run JVM-side on the UDF's output column, proving binary
    flows through the Python/Arrow boundary intact (the md5 hex is
    compared byte-for-byte against the oracle's reconstruction)."""
    resized = resize_payloads(payloads(spark, sf_dir))
    return resized.select(
        "doc_id",
        "out_w",
        "out_h",
        F.octet_length("resized").cast("bigint").alias("n_out"),
        F.md5("resized").alias("resized_md5"),
    ).orderBy("doc_id")


def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram feature rows with the share computed natively
    (see byte_histogram)."""
    h = byte_histogram(payloads(spark, sf_dir))
    return h.select(
        "doc_id",
        "bin",
        F.round(F.col("cnt") / F.col("n_bytes"), 6).alias("share"),
    ).orderBy("doc_id", "bin")


QUERIES = {
    "mm_payload_stats": mm_payload_stats,
    "mm_frame_sample": mm_frame_sample,
    "mm_resize_stats": mm_resize_stats,
    "mm_byte_histogram": mm_byte_histogram,
}

# documents.text is ASCII in the testdata, so byte offsets == char
# offsets and ascii() == byte value; octet_length(encode()) is exact
# regardless.
ORACLES = {
    "mm_payload_stats": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
               octet_length(encode(text)) % 100 + 1 AS width,
               CAST(ascii(substr(text, 1, 1)) AS BIGINT) % 64 + 1 AS height
        FROM documents
        ORDER BY doc_id
    """,
    "mm_frame_sample": f"""
        SELECT doc_id,
               CAST(i AS BIGINT) AS frame_idx,
               CAST(ascii(substr(text, 1 + i * {FRAME_STRIDE}, 1)) AS BIGINT)
                   AS frame_byte
        FROM documents, range({N_FRAMES}) r(i)
        WHERE 1 + i * {FRAME_STRIDE} <= length(text)
        ORDER BY doc_id, frame_idx
    """,
    # reconstructs the strided resize byte-for-byte and md5s it — the
    # hex must equal Spark's native md5 over the UDF's binary output
    "mm_resize_stats": f"""
        WITH d AS (
            SELECT doc_id, text, length(text) AS n,
                   least(length(text) % 100 + 1, {MAX_SIDE}) AS ow,
                   least(ascii(substr(text, 1, 1)) % 64 + 1, {MAX_SIDE})
                       AS oh
            FROM documents
        ),
        s AS (
            SELECT doc_id, text, n, ow, oh,
                   greatest(1, n // (ow * oh)) AS stride,
                   ow * oh AS k
            FROM d
        )
        SELECT doc_id,
               CAST(ow AS BIGINT) AS out_w,
               CAST(oh AS BIGINT) AS out_h,
               CAST(len(list_filter(range(k), i -> i * stride < n))
                    AS BIGINT) AS n_out,
               md5(array_to_string(
                   list_transform(
                       list_filter(range(k), i -> i * stride < n),
                       i -> substr(text, CAST(1 + i * stride AS BIGINT), 1)),
                   '')) AS resized_md5
        FROM s
        ORDER BY doc_id
    """,
    "mm_byte_histogram": f"""
        WITH docs AS (
            SELECT doc_id, text, length(text) AS n
            FROM documents WHERE length(text) > 0
        ),
        b AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, n + 1),
                       i -> ascii(substr(text, CAST(i AS BIGINT), 1)) // 8))
                       AS bin
            FROM docs
        ),
        c AS (
            SELECT doc_id, bin, count(*) AS cnt
            FROM b GROUP BY doc_id, bin
        )
        SELECT docs.doc_id,
               CAST(r.i AS BIGINT) AS bin,
               round(coalesce(c.cnt, 0) / CAST(docs.n AS DOUBLE), 6)
                   AS share
        FROM docs
        CROSS JOIN range({HIST_BINS}) r(i)
        LEFT JOIN c ON c.doc_id = docs.doc_id AND c.bin = r.i
        ORDER BY docs.doc_id, bin
    """,
}

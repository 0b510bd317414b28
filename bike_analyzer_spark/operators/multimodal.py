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


def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_payloads(payloads(spark, sf_dir)).orderBy("doc_id")


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(payloads(spark, sf_dir)).orderBy("doc_id", "frame_idx")


QUERIES = {
    "mm_payload_stats": mm_payload_stats,
    "mm_frame_sample": mm_frame_sample,
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
}

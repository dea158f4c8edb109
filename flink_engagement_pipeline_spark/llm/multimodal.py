"""Multimodal columns: image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested: a typed media schema
(binary payload + struct metadata), Arrow-batched `mapInPandas`
feature extraction with a declared output schema, and partition-size
discipline (binary rows are big — `maxRecordsPerBatch` bounds Arrow
batch memory, and repartition-by-size would be the cluster-side knob).

The actual codec work (image decode, resize, audio frame sampling) is
STUBBED: the container has no image/audio libraries, so those steps
raise NotImplementedError unless `fake=True`, which substitutes a
deterministic byte-derived fake so the full pipeline (schema, batch
shape, UDF signature) can be exercised end-to-end in tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id bigint, kind string, payload binary"
FEATURES_SCHEMA = "doc_id bigint, n_bytes bigint, payload_md5 string"
DECODED_SCHEMA = (
    "doc_id bigint, width int, height int, n_frames int, feature_norm double"
)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents fixture into a media-shaped table: the text
    bytes stand in for an opaque blob (same columnar layout a real
    image/audio table would have: key + kind + binary)."""
    return docs.select(
        F.col("doc_id"),
        F.lit("text/plain").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    `mapInPandas` streams Arrow record batches; payloads arrive as
    Python bytes. This (not a row-at-a-time UDF) is the pattern for
    any per-blob compute at 100 TB — vectorized transfer, per-batch
    amortized overhead, output schema declared up front.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "payload_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURES_SCHEMA)


MEDIA_FEATURES_ORACLE = """
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       md5(text)                        AS payload_md5
FROM documents
"""


def decode_media(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode/resize/frame-sample stub.

    Real decode needs Pillow/libav, which this container does not ship
    — with ``fake=False`` the task raises NotImplementedError at
    execution time. ``fake=True`` derives deterministic pseudo-features
    from the payload bytes so the plumbing (schema, batching,
    downstream joins) is fully testable.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in "
                    "this environment; pass fake=True for the deterministic "
                    "test double"
                )
            digests = pdf["payload"].map(lambda b: hashlib.md5(b).digest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": digests.map(lambda d: 64 + d[0] % 192),
                    "height": digests.map(lambda d: 64 + d[1] % 192),
                    "n_frames": digests.map(lambda d: 1 + d[2] % 32),
                    "feature_norm": digests.map(lambda d: d[3] / 255.0),
                }
            )

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_md5 string"


def sample_frames(media: DataFrame, every_k: int = 4, *, fake: bool = False) -> DataFrame:
    """Frame-sampling stub: every k-th frame of a video payload as its
    own output row — the 1->N mapInPandas shape (one input blob, many
    frame rows), which is how video decode fans out at scale. Real
    frame extraction needs libav (absent here); ``fake=True`` derives a
    deterministic frame count and per-frame digest from the payload so
    the fan-out plumbing is fully testable. Arrow batches bound memory
    per task regardless of fan-out factor.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires video codecs not present in this "
                    "environment; pass fake=True for the deterministic test double"
                )
            out_ids, out_idx, out_md5 = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = hashlib.md5(payload).digest()
                n_frames = 1 + d[2] % 32
                for idx in range(0, n_frames, every_k):
                    out_ids.append(doc_id)
                    out_idx.append(idx)
                    # text suffix (not raw int bytes): keeps the fake
                    # reproducible by a SQL oracle, whose md5 is
                    # VARCHAR-only
                    out_md5.append(
                        hashlib.md5(
                            payload + f":frame:{idx}".encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_md5": out_md5}
            )

    return media.mapInPandas(_sample, schema=FRAMES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, orig_w int, orig_h int, new_w int, new_h int, resized_md5 string"
)


def resize_media(
    media: DataFrame, max_side: int = 128, *, fake: bool = False
) -> DataFrame:
    """Resize stub completing the decode/extract/resize/frame-sample
    quartet: cap the longer image side at ``max_side`` preserving
    aspect ratio (integer arithmetic only, so the scaled dims are
    engine-exact). Real resampling needs Pillow (absent here);
    ``fake=True`` derives the original dims from the payload digest
    (same convention as decode_media) and digests the would-be resized
    payload, so schema, batching, and both scale branches (shrink vs
    passthrough) are fully testable — and SQL-reproducible."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires Pillow, not present in this "
                    "environment; pass fake=True for the deterministic test double"
                )
            ids, ows, ohs, nws, nhs, md5s = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = hashlib.md5(payload).digest()
                ow, oh = 64 + d[0] % 192, 64 + d[1] % 192
                mx = max(ow, oh)
                if mx > max_side:
                    nw, nh = ow * max_side // mx, oh * max_side // mx
                else:
                    nw, nh = ow, oh
                ids.append(doc_id); ows.append(ow); ohs.append(oh)
                nws.append(nw); nhs.append(nh)
                md5s.append(
                    hashlib.md5(payload + f":resize:{nw}x{nh}".encode()).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids, "orig_w": ows, "orig_h": ohs,
                    "new_w": nws, "new_h": nhs, "resized_md5": md5s,
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


# Exact DuckDB replication of the fake resizer (bytes 0/1 of the md5
# digest are hex chars 1-2 / 3-4; integer-division scaling).
MEDIA_RESIZE_ORACLE = """
WITH m AS (
    SELECT doc_id, text,
           64 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 192 AS ow,
           64 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 192 AS oh
    FROM documents
),
r AS (
    SELECT doc_id, text, ow, oh,
           CASE WHEN greatest(ow, oh) > 128
                THEN (ow * 128) // greatest(ow, oh) ELSE ow END AS nw,
           CASE WHEN greatest(ow, oh) > 128
                THEN (oh * 128) // greatest(ow, oh) ELSE oh END AS nh
    FROM m
)
SELECT doc_id,
       CAST(ow AS INT) AS orig_w, CAST(oh AS INT) AS orig_h,
       CAST(nw AS INT) AS new_w,  CAST(nh AS INT) AS new_h,
       md5(text || ':resize:' || CAST(nw AS VARCHAR) || 'x' || CAST(nh AS VARCHAR))
           AS resized_md5
FROM r
"""


# Exact DuckDB replication of the fake frame sampler (documents stand
# in for the blob table, so payload bytes == utf8 text bytes): byte 2
# of the md5 digest is hex chars 5-6, and the per-frame digest is the
# md5 of text + ':frame:<idx>'.
MEDIA_FRAME_SAMPLE_ORACLE = """
WITH m AS (
    SELECT doc_id, text,
           1 + CAST(('0x' || substr(md5(text), 5, 2)) AS INT) % 32 AS n_frames
    FROM documents
)
SELECT doc_id,
       CAST(unnest(range(0, n_frames, 4)) AS INT)          AS frame_idx,
       md5(text || ':frame:' ||
           CAST(unnest(range(0, n_frames, 4)) AS VARCHAR)) AS frame_md5
FROM m
"""

"""Multimodal column plumbing (images/audio/video as opaque binary).

The Spark-side contract is real and tested: media rides in a
``binary`` column with typed metadata beside it; decode / feature
extraction runs as Arrow-batched ``mapInPandas`` over partitions of
(id, payload) — the only part that is stubbed is the codec itself,
because no image/audio library ships in this container. The stub is a
deterministic fake (documented below) behind the same function
signature a real decoder would have, so swapping in Pillow/torchaudio
changes one inner function, not the plumbing, schema, partitioning, or
batch shape.

Scale posture: payloads never pass through Python row-at-a-time —
mapInPandas streams Arrow record batches; partition sizing is by bytes
(media is wide), so re-partition by a size-bucketed key upstream if
payload sizes are skewed. Feature outputs are narrow rows (id +
features) — project the binary away before any shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = "doc_id bigint, byte_len int, width int, height int, n_frames int"


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: materialize an opaque binary payload column
    (UTF-8 bytes of the text) + media-style metadata. On a real corpus
    this column comes from the lakehouse (parquet BINARY / blob refs)."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def fake_decode_image(payload: bytes) -> tuple[int, int, int]:
    """STUB CODEC — deterministic fake standing in for a real image
    decoder (no imaging libs in this container). Derives (width,
    height, n_frames) from payload length so tests are reproducible.
    Replace with e.g. PIL.Image.open for real media; raise
    NotImplementedError semantics live here, not in the plumbing.
    """
    n = len(payload)
    return (64 + n % 64, 64 + (n // 64) % 64, 1 + n % 3)


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (doc_id, payload).

    Batch shape: each pandas DataFrame chunk carries the binary column
    as Python bytes; output rows are narrow typed features. This is
    the real production plumbing — only ``fake_decode_image`` is a stub.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fake_decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(decode, DECODED_SCHEMA)


def media_byte_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata path (no Python at all): byte length stats of
    the binary column — the query you run before deciding how to
    partition a decode job."""
    return media.select(
        "doc_id",
        F.length("payload").cast("int").alias("byte_len"),
        "mime",
    )


MEDIA_BYTE_STATS_SQL = """SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS byte_len,
       'application/octet-stream' AS mime
FROM documents"""


#: resize target: fit into a 224x224 box preserving aspect ratio
RESIZE_BOX = 224


def resize_plan(decoded: DataFrame) -> DataFrame:
    """Resize planning: target dimensions fitting each image into a
    RESIZE_BOX² box preserving aspect ratio — pure integer/JVM
    arithmetic over the decoded metadata (the actual pixel resample
    would ride the same mapInPandas as the decoder; planning dims is
    the engine's job and is oracle-checkable).

    target = (dim * BOX) DIV max(w, h) — INTEGER division, not a
    float scale then cast (double→int casts truncate in Spark but
    round in DuckDB — the same trap as simhash bit extraction).
    """
    longest = F.greatest(F.col("width"), F.col("height"))
    tw = F.expr(f"CAST((width * {RESIZE_BOX}) DIV greatest(width, height) AS INT)")
    th = F.expr(f"CAST((height * {RESIZE_BOX}) DIV greatest(width, height) AS INT)")
    return decoded.select(
        "doc_id",
        "width",
        "height",
        tw.alias("target_w"),
        th.alias("target_h"),
        ((F.col("width") > RESIZE_BOX) | (F.col("height") > RESIZE_BOX)).alias(
            "downscaled"
        ),
    )


def frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling plumbing: one output row per kept frame index
    (every ``every_k``-th of n_frames), via the same Arrow-batched
    mapInPandas path a real video decoder would use. Output is narrow
    (doc_id, frame_idx, frame_bytes-placeholder-length) — the binary
    never shuffles."""
    import pandas as pd

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_len": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = 1 + len(payload) % 3  # n_frames, same fake as decode
                for idx in range(0, n, every_k):
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(idx)
                    rows["frame_len"].append(len(payload) // n)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        sample, "doc_id bigint, frame_idx int, frame_len int"
    )

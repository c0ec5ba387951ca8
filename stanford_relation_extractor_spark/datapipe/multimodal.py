"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride Spark as `binary` columns with a metadata
struct; decode / feature-extraction run as Arrow-batched pandas UDFs
over `mapInPandas` (bytes transfer via Arrow buffers, never Python
pickling per row). The actual codecs are NOT in this container, so
`decode_image`/`decode_audio` are clearly-marked stubs behind
try-imports; `byte_features` is a deterministic stand-in that keeps the
Spark-side plumbing (schema, batch shape, UDF signature) real and
testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_payload(docs: DataFrame, mime: str = "application/octet-stream") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + metadata struct."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Stub: image decoding requires PIL/opencv, not present here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires pillow; payload plumbing is tested via byte_features"
        ) from exc
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """Stub: audio decoding requires soundfile/ffmpeg, not present here."""
    raise NotImplementedError(
        "audio decode requires soundfile/ffmpeg; payload plumbing is tested via byte_features"
    )


def byte_features(multimodal: DataFrame) -> DataFrame:
    """(doc_id, mime, n_bytes, feat0): deterministic payload features.

    The real pipeline would decode and embed here; the batch/UDF shape
    (iterator of Arrow record batches, binary column in, fixed-width
    features out) is exactly what a codec-backed extractor uses.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = [len(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": n_bytes,
                    "feat0": [n % 7 for n in n_bytes],
                }
            )

    return multimodal.mapInPandas(
        run, schema="doc_id bigint, mime string, n_bytes int, feat0 int"
    )

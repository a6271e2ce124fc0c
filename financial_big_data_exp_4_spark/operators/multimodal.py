"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata
processed through Arrow-batched ``mapInPandas`` (BASELINE north star).

The *plumbing* is real and tested: binary column construction, an explicit
output schema, Arrow batch transfer, and a pandas-side per-batch transform.
The actual image decode is stubbed (:func:`decode_image` raises
``NotImplementedError`` — the container has no image libraries) behind a
deterministic fake (:func:`_fake_decode_dims`) so the pipeline is
end-to-end runnable and oracle-checkable.

100 TB design notes: payload bytes flow executor-side only (never
collected); ``mapInPandas`` streams Arrow record batches, so peak memory is
one batch of payloads, tunable via
``spark.sql.execution.arrow.maxRecordsPerBatch`` — the knob to turn when
payloads are MBs (images) instead of KBs. Metadata-only outputs mean the
shuffle after this stage never carries the payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, n_bytes long, img_w long, img_h long, digest string"
)


def decode_image(payload: bytes) -> object:
    """Decode an image payload. STUB — no image codec ships in this
    container; a deployment would back this with PIL/libvips and the
    pipeline shape would not change."""
    raise NotImplementedError(
        "image decode requires an image codec (PIL/libvips) not present "
        "in this environment; the pipeline uses _fake_decode_dims instead"
    )


def _fake_decode_dims(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in for decoded image dimensions (documented
    fake): w = n % 640, h = (n * 31) % 480."""
    return n_bytes % 640, (n_bytes * 31) % 480


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n,
                "img_w": n % 640,
                "img_h": (n * 31) % 480,
                "digest": pdf["payload"].map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
            }
        )


def multimodal_metadata(docs: DataFrame) -> DataFrame:
    """documents.text → utf-8 ``binary`` payload → mapInPandas metadata
    extraction (byte length, fake-decoded dims, md5 digest).

    The digest doubles as the oracle hook: md5 over the utf-8 payload
    equals the SQL engine's ``md5(text)``.
    """
    payloads = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(_meta_batches, META_SCHEMA)

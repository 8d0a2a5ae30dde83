"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with typed
metadata, processed in Arrow batches via ``mapInPandas`` — the Spark-side
plumbing (schema, batch shape, partitioning) is real; the actual codec is
STUBBED (``decode_image`` raises NotImplementedError) because media
libraries are not available in this environment. ``extract_meta`` uses a
deterministic fake "decode" so the pipeline is testable end to end.

Scale notes: binary payloads dominate row size — ``maxPartitionBytes``
governs scan granularity, and mapInPandas streams Arrow batches so a task
never holds more than one batch of payloads. Nothing here shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - intentional stub
    """STUB: real image decode requires PIL/opencv, absent in this
    environment. The Spark plumbing around it (binary column in, Arrow batch
    through mapInPandas, typed struct out) is the real, tested part.

    A real decoder drops in WITHOUT touching that plumbing: pass any
    ``bytes -> (width, height, n_frames)`` callable as
    ``extract_meta(df, decoder=...)``. Proven by
    tests/test_dedup_similarity_text.py::test_extract_meta_real_codec_drops_in,
    which routes a pure-Python PPM (P6) header parser through the same
    interface and recovers the true pixel dimensions."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "extract_meta() uses a deterministic fake decode instead"
    )


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Testing adapter: wrap a text column as an opaque binary payload with a
    media-type tag, producing the schema a real ingest (image bytes from
    object storage) would have."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def extract_meta(df: DataFrame, decoder=None) -> DataFrame:
    """Per-payload metadata via Arrow-batched mapInPandas.

    ``decoder`` is the codec seam: any ``bytes -> (width, height,
    n_frames)`` callable (a real header parse — PIL, a PPM reader, an
    ffprobe wrapper) runs per payload inside the same Arrow batch loop.
    Default ``None`` keeps the deterministic fake — (width, height,
    n_frames) derived from the byte length — which stands in for a codec
    header parse and is what the DuckDB oracle replays. The drop-in
    property is pinned by test_extract_meta_real_codec_drops_in (a pure
    PPM parser through this exact parameter)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens = pdf["payload"].map(len)
            if decoder is None:
                w = (lens % 640 + 1).astype("int32")
                h = ((lens * 7) % 480 + 1).astype("int32")
                nf = (lens % 16 + 1).astype("int32")
            else:
                decoded = [decoder(bytes(p)) for p in pdf["payload"]]
                ix = pdf.index  # keep batch alignment with doc_id/lens
                w = pd.Series([d[0] for d in decoded], dtype="int32", index=ix)
                h = pd.Series([d[1] for d in decoded], dtype="int32", index=ix)
                nf = pd.Series([d[2] for d in decoded], dtype="int32", index=ix)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": lens.astype("int64"),
                    "width": w,
                    "height": h,
                    "n_frames": nf,
                }
            )

    return df.mapInPandas(batches, schema=META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_off", T.LongType(), False),
        T.StructField("frame_len", T.LongType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: one output row per every_n-th frame of each payload —
    the one-to-many batch shape of a real video sampler (decode is the same
    fake as extract_meta: n_frames from the byte length, frame bytes are an
    even slice of the payload). Arrow-batched mapInPandas; a real codec swaps
    only the body.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_len": [], "frame_payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = n % 16 + 1
                flen = max(n // n_frames, 1)
                for f in range(0, n_frames, every_n):
                    off = f * flen
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f)
                    out["frame_off"].append(off)
                    out["frame_len"].append(min(flen, n - off))
                    out["frame_payload"].append(bytes(payload[off:off + flen]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_off": pd.Series(out["frame_off"], dtype="int64"),
                    "frame_len": pd.Series(out["frame_len"], dtype="int64"),
                    "frame_payload": pd.Series(out["frame_payload"], dtype=object),
                }
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


def embed_payload(df: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction: payload -> fixed-dim float vector, vectorized over
    the Arrow batch (the embed-model stand-in; deterministic so the DuckDB
    oracle can reproduce it exactly: v[i] = ((byte_len*(i+3)) mod 997)/997).
    Output: (doc_id, embedding array<double>)."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.DoubleType(), False), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens = pdf["payload"].map(len).to_numpy(dtype="int64")
            mat = (
                (lens[:, None] * (np.arange(dim, dtype="int64") + 3)[None, :]) % 997
            ) / 997.0
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "embedding": list(mat),
                }
            )

    return df.mapInPandas(batches, schema=schema)

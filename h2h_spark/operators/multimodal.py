"""Multimodal (binary) columns (engine extension, SURVEY.md §2.3 E3).

Images / audio / video are opaque ``binary`` payload columns with a typed
metadata struct.  The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` decode stage — is real and tested; the actual media decode
is stubbed behind an import-try (PIL / soundfile are not in this
container) with a deterministic fallback, as mandated by the build brief.

Scale notes: payloads stay OUT of shuffle paths — derive features first,
then drop or pass-through the blob; for >2 GB objects store a pointer
(URI) column and fetch lazily inside the decode stage.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, payload_md5 string, width int, height int, decoder string"
)


def with_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Attach an opaque binary payload + metadata struct (here synthesized
    from text, since the container ships no media files)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("content_type"),
        ).alias("meta"),
    )


def _try_real_decode(payload: bytes) -> tuple[int, int, str]:
    """Real image decode if PIL is importable; deterministic fake otherwise."""
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, "pillow"
    except Exception:
        # Deterministic fake: derive a plausible (width, height) from the
        # payload hash so downstream plumbing sees realistic variety.
        h = hashlib.md5(payload).digest()
        return 64 + h[0] % 192, 64 + h[1] % 192, "stub"


def decode_features(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` keeps the blob local to its partition (no shuffle); the
    output is small typed features only.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            widths, heights, decoders = [], [], []
            for p in payloads:
                w, h, d = _try_real_decode(bytes(p))
                widths.append(w)
                heights.append(h)
                decoders.append(d)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len),
                    "payload_md5": payloads.map(
                        lambda p: hashlib.md5(bytes(p)).hexdigest()
                    ),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "decoder": decoders,
                }
            )

    return binary_df.mapInPandas(_decode, DECODE_SCHEMA)


def resize_images(
    binary_df: DataFrame,
    id_col: str,
    width: int,
    height: int,
) -> DataFrame:
    """'Image resize' stage: binary in → binary out through an
    Arrow-batched ``mapInPandas`` — the schema/batch plumbing a real
    resize needs (PIL absent in this container, so the pixel transform is
    STUBBED as a deterministic byte truncation to the target budget; swap
    ``_stub_resize`` for a real decoder+resampler in production).  The
    payload column round-trips python→Arrow→JVM as ``binary``, which is
    the property under test: derived blobs stay columnar, never shuffled
    as strings."""
    budget = width * height

    def _stub_resize(payload: bytes) -> bytes:
        try:  # pragma: no cover - PIL absent in this container
            import io

            from PIL import Image  # type: ignore

            img = Image.open(io.BytesIO(payload)).resize((width, height))
            out = io.BytesIO()
            img.save(out, format="PNG")
            return out.getvalue()
        except Exception:
            return payload[:budget]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "resized": [_stub_resize(bytes(p)) for p in pdf["payload"]],
                }
            )

    return binary_df.mapInPandas(
        _resize, "doc_id long, width int, height int, resized binary"
    )


def audio_stats(
    binary_df: DataFrame,
    id_col: str = "doc_id",
    sample_rate: int = 8000,
    clip_margin: int = 6,
) -> DataFrame:
    """'Audio' feature stage: treat the payload as unsigned 8-bit PCM
    (center 128) and derive waveform statistics — sample count, duration,
    peak amplitude, mean absolute amplitude, and a clipping count (samples
    within ``clip_margin`` of full scale).  A real pipeline swaps the
    ``np.frombuffer`` for soundfile/ffmpeg decode (absent in this
    container); the Arrow batch shape, numpy vectorization, and
    features-only output schema are the production plumbing.

    Everything is numpy over the whole batch — no per-row Python.
    Duration and mean amplitude are FIXED-POINT integers (milliseconds /
    milli-units, floor division): fractional features as integers are
    bit-stable across platforms and engines, which keeps distributed
    equality compares (and the DuckDB oracle) exact instead of
    float-rounding-dependent.
    """
    import numpy as np

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_samples, peaks, means, clips = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col].to_numpy(), pdf["payload"]):
                samples = np.frombuffer(bytes(payload), dtype=np.uint8)
                ids.append(doc_id)
                n_samples.append(samples.size)
                if samples.size:
                    amp = np.abs(samples.astype(np.int64) - 128)
                    peaks.append(int(samples.max()))
                    means.append(int(amp.sum()) * 1000 // samples.size)
                    clips.append(
                        int(((samples >= 256 - clip_margin) | (samples < clip_margin)).sum())
                    )
                else:
                    peaks.append(0)
                    means.append(0)
                    clips.append(0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": pd.Series(n_samples, dtype="int64"),
                    "duration_ms": pd.Series(
                        [n * 1000 // sample_rate for n in n_samples], dtype="int64"
                    ),
                    "peak": pd.Series(peaks, dtype="int32"),
                    "mean_amp_milli": pd.Series(means, dtype="int64"),
                    "n_clipped": pd.Series(clips, dtype="int64"),
                }
            )

    return binary_df.mapInPandas(
        _stats,
        "doc_id long, n_samples long, duration_ms long, peak int, mean_amp_milli long, n_clipped long",
    )


def frame_sample(
    binary_df: DataFrame, id_col: str, frame_bytes: int = 1024, stride: int = 4
) -> DataFrame:
    """'Video' frame sampling stub: treat the payload as fixed-size frames,
    emit every ``stride``-th frame index + its md5.  Exercises the
    explode-to-frames schema a real video pipeline needs."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s = [], [], []
            # zip over numpy/ndarray columns — not iterrows (which builds a
            # Series per row); md5 itself is per-chunk C code.
            for doc_id, payload in zip(pdf[id_col].to_numpy(), pdf["payload"]):
                data = bytes(payload)
                n = max(1, len(data) // frame_bytes)
                frame_idx = range(0, n, stride)
                ids.extend([doc_id] * len(frame_idx))
                idxs.extend(frame_idx)
                md5s.extend(
                    hashlib.md5(data[i * frame_bytes : (i + 1) * frame_bytes]).hexdigest()
                    for i in frame_idx
                )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.Series(idxs, dtype="int32"), "frame_md5": md5s}
            )

    return binary_df.mapInPandas(_frames, "doc_id long, frame_idx int, frame_md5 string")

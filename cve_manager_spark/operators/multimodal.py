"""Multimodal columns (SURVEY §2.8 N5): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` UDFs.

The Spark-side plumbing is real and tested — schemas, batch iteration,
partition-preserving transforms; the actual media decode is stubbed
(image/audio libraries are not in this environment) behind
``decode_stub``: pass ``real_decoder=...`` to plug in PIL/librosa/etc.
Everything else (batching, schema contract, deterministic fallback
features) is exactly what a production pipeline runs.

Scale notes: binary payloads ride through shuffles, so feature extraction
happens BEFORE any wide op (narrow mapInPandas over the scan), and the
payload column is dropped as soon as features exist. Batch size is
controlled by spark.sql.execution.arrow.maxRecordsPerBatch — size it so
batch_bytes ≈ payload × records fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_sha string, head_hex string"
)

THUMB_SCHEMA = "doc_id bigint, width int, height int, thumb binary"


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Demo payload: UTF-8 bytes of a text column as the opaque binary
    (the testdata has no media table; the column type and everything
    downstream is identical for real payloads)."""
    return df.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("data")
    )


def extract_features(df: DataFrame, id_col: str = "doc_id", data_col: str = "data") -> DataFrame:
    """Deterministic per-blob features via mapInPandas: byte length,
    sha256, first-8-bytes hex. Arrow-batched; no Python per-row calls
    outside the vectorized loop."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf[data_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": data.map(len).astype("int64"),
                    "content_sha": data.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "head_hex": data.map(lambda b: bytes(b[:8]).hex()),
                }
            )

    return df.mapInPandas(feats, schema=FEATURE_SCHEMA)


def decode_stub(data: bytes, target: tuple[int, int] = (32, 32)) -> bytes:
    """Placeholder for the media decode+resize step. Replace with a real
    decoder (PIL.Image.open(...).resize(target).tobytes()); this fake is
    deterministic so plumbing tests have stable expectations."""
    h = hashlib.sha256(data).digest()
    n = target[0] * target[1]
    return (h * (n // len(h) + 1))[:n]


def decode_resize(
    df: DataFrame,
    target: tuple[int, int] = (32, 32),
    id_col: str = "doc_id",
    data_col: str = "data",
    real_decoder=None,
) -> DataFrame:
    """Decode/resize pipeline shape: mapInPandas producing fixed-size
    thumbnails + dimensions. ``real_decoder(bytes, target) -> bytes``
    plugs in an actual image library; default is the deterministic stub.

    The default decoder is a NESTED copy of ``decode_stub``, not a
    reference to it: a module-level function would be pickled by module
    path and force every executor worker to import cve_manager_spark —
    which fails when the driver process found the package via sys.path
    manipulation rather than an installed distribution. Nested functions
    are pickled by value, so the closure ships self-contained."""
    if real_decoder is None:

        def real_decoder(data: bytes, t: tuple[int, int] = target) -> bytes:
            dg = hashlib.sha256(data).digest()
            n = t[0] * t[1]
            return (dg * (n // len(dg) + 1))[:n]

    decoder = real_decoder
    w, h = target

    def thumbs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": w,
                    "height": h,
                    "thumb": pdf[data_col].map(lambda b: decoder(bytes(b), target)),
                }
            )

    return df.mapInPandas(thumbs, schema=THUMB_SCHEMA)


def frame_sample(
    df: DataFrame, every_n: int = 10, id_col: str = "doc_id", data_col: str = "data"
) -> DataFrame:
    """Video frame-sampling shape: one input blob → many output rows
    (frame index + frame payload). The stub slices the blob; a real
    implementation decodes containers per batch."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for i, b in zip(pdf[id_col], pdf[data_col]):
                blob = bytes(b)
                for k, off in enumerate(range(0, len(blob), every_n)):
                    ids.append(i)
                    idxs.append(k)
                    payloads.append(blob[off : off + every_n])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": payloads})

    return df.mapInPandas(frames, schema="doc_id bigint, frame_idx int, frame binary")


def audio_frame_energy(
    df: DataFrame,
    frame_bytes: int = 256,
    id_col: str = "doc_id",
    data_col: str = "data",
    real_decoder=None,
) -> DataFrame:
    """Audio feature shape: one blob → fixed-length sample windows → one
    scalar per window (doc_id, frame_idx, energy). By default the
    payload is treated as unsigned 8-bit PCM already; pass
    ``real_decoder(bytes) -> bytes`` to unwrap a container first (e.g.
    stdlib ``wave`` for RIFF/WAV — exercised with a real WAV payload in
    tests/test_multimodal.py). The energy is exact integer
    sum-of-squares per window (numpy-vectorized inside the Arrow
    batch). This is the third multimodal batch shape next to
    extract_features (1→1 scalars) and frame_sample (1→many payloads):
    1→many scalars."""
    import numpy as np

    decode = real_decoder if real_decoder is not None else (lambda b: b)

    def energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # only the variable-length decode runs per row; the output
        # columns assemble as numpy repeats/concats, not per-frame
        # Python-int appends (guide §4.2: vectorize the whole batch)
        for pdf in batches:
            sums_l: list = []
            counts: list = []
            for b in pdf[data_col]:
                a = np.frombuffer(decode(bytes(b)), dtype=np.uint8).astype(np.int64)
                if len(a) == 0:
                    counts.append(0)
                    continue
                sums_l.append(
                    np.add.reduceat(a * a, np.arange(0, len(a), frame_bytes))
                )
                counts.append(len(sums_l[-1]))
            n = np.asarray(counts, dtype=np.int64)
            if n.sum() == 0:
                yield pd.DataFrame(
                    {
                        "doc_id": np.array([], dtype=np.int64),
                        "frame_idx": np.array([], dtype=np.int32),
                        "energy": np.array([], dtype=np.int64),
                    }
                )
                continue
            ids = np.repeat(pdf[id_col].to_numpy(), n)
            # frame_idx restarts at 0 per doc: global arange minus each
            # frame's doc-start offset
            starts = np.repeat(np.cumsum(n) - n, n)
            idxs = (np.arange(int(n.sum())) - starts).astype(np.int32)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "energy": np.concatenate(sums_l)}
            )

    return df.mapInPandas(
        energies, schema="doc_id bigint, frame_idx int, energy bigint"
    )


PHASH_SCHEMA = (
    "doc_id bigint, phash_hex string, band0 int, band1 int, band2 int, band3 int"
)


def phash_ahash(
    df: DataFrame, id_col: str = "doc_id", thumb_col: str = "thumb"
) -> DataFrame:
    """Perceptual average-hash over fixed 64-pixel thumbnails (the
    ``decode_resize(target=(8, 8))`` output): bit i is the exact integer
    test ``px[i]·64 > Σpx`` (no float mean, no rounding edge), folded
    MSB-first into a 16-hex-char fingerprint plus four 16-bit integer
    LSH bands for Hamming-banded near-dup joins (the SimHash banding
    discipline, operators/dedup.py). One numpy pass per Arrow batch —
    the narrow signature map a 100 TB image corpus gets; Hamming
    distance downstream is Σ per-band ``bit_count(xor)``, so no signed
    64-bit arithmetic exists anywhere in the pipeline."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w64 = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
        w16 = (1 << np.arange(15, -1, -1)).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            arr = np.stack(
                [np.frombuffer(bytes(b), dtype=np.uint8) for b in pdf[thumb_col]]
            ).astype(np.int64)
            if arr.shape[1] != 64:
                raise ValueError(
                    f"phash_ahash expects 64-byte thumbnails, got {arr.shape[1]}"
                )
            tot = arr.sum(axis=1, keepdims=True)
            bits = (arr * 64 > tot)
            val = (bits.astype(np.uint64) * w64).sum(axis=1, dtype=np.uint64)
            out = {
                "doc_id": pdf[id_col].to_numpy(),
                "phash_hex": [format(int(v), "016x") for v in val],
            }
            for j in range(4):
                out[f"band{j}"] = (
                    (bits[:, 16 * j : 16 * j + 16].astype(np.int64) * w16)
                    .sum(axis=1)
                    .astype(np.int32)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=PHASH_SCHEMA)

"""Multimodal column handling — opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; all
heavy per-item work (decode, resize, frame-sample, feature-extract) runs as
Arrow-batched ``mapInPandas`` stages so a 100 TB corpus streams through in
columnar batches without driver involvement.

The actual codec libraries are NOT in this container, so the decode step is
pluggable: ``decoder=None`` installs a deterministic fake (byte-stat
features) and real decoders raise NotImplementedError until a library is
injected. The Spark-side plumbing — schema, batch iteration, partitioning —
is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, duration_ms int, codec string"
)


def attach_binary_payload(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Testing aid: treat a string column as an opaque binary payload."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def payload_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata over binary payloads — no decode needed."""
    p = F.col(payload_col)
    return df.withColumn("n_bytes", F.octet_length(p)).withColumn(
        "sha256", F.sha2(p, 256)
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder: derives pseudo-dimensions
    from byte statistics. Replace with a real codec via `decoder=`."""
    n = len(payload)
    checksum = sum(payload[:256]) if n else 0
    return {
        "media_type": "fake",
        "width": (checksum % 64) + 1,
        "height": (n % 64) + 1,
        "duration_ms": n,
        "codec": "deterministic-fake",
    }


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], dict] | None = None,
    batch_feature_dim: int = 4,
) -> DataFrame:
    """mapInPandas decode/feature stage. Emits (id, media meta, features).

    With a real image/audio library available, pass ``decoder=`` (bytes →
    metadata dict); otherwise the deterministic fake keeps the pipeline
    testable end-to-end.
    """
    decode = decoder or _fake_decode
    out_schema = f"{id_col} long, {MEDIA_META_SCHEMA}, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(bytes(b)) for b in pdf[payload_col]]
            feats = [
                [float(m["width"]), float(m["height"]), float(m["duration_ms"] % 97),
                 float(len(bytes(b)) % 89)][:batch_feature_dim]
                for m, b in zip(metas, pdf[payload_col])
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "media_type": [m["media_type"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                    "codec": [m["codec"] for m in metas],
                    "features": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def real_decoder_stub(payload: bytes) -> dict:  # pragma: no cover
    """Placeholder for a real codec-backed decoder (PIL/librosa/ffmpeg are
    not in this container)."""
    raise NotImplementedError(
        "real media decoding requires codec libraries not present in this "
        "environment; inject a decoder via decode_media(decoder=...)"
    )


FRAME_BYTES = 32
FRAME_STRIDE = 2


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Frame-sampling stage (video → every stride-th frame): an Arrow-batched
    1→N expansion where each binary payload explodes into per-frame rows.
    Frames here are fixed byte windows with a checksum standing in for the
    decoded frame tensor (the codec is pluggable exactly as in decode_media);
    the Spark-side contract — mapInPandas expansion, typed per-frame schema,
    batch iteration — is the real thing a video pipeline runs at 100 TB,
    with frame decode parallelism following data partitioning."""
    out_schema = f"{id_col} long, frame_idx long, frame_len int, checksum long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list = []
            lens: list = []
            cks: list = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(b)
                n_frames = -(-len(data) // frame_bytes)
                for fi in range(0, n_frames, stride):
                    seg = data[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(i)
                    idxs.append(fi)
                    lens.append(len(seg))
                    cks.append(sum(seg))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "checksum": pd.Series(cks, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def frame_energy(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_len: int = 32,
    max_bytes: int = 256,
    loud_threshold: int = 100,
) -> DataFrame:
    """REAL vectorized audio-style feature extraction over binary payloads:
    bytes are treated as unsigned 8-bit PCM samples, framed at `frame_len`,
    and each frame emits exact-integer energy (Σ s²) and loud-sample count
    (s ≥ threshold) — the per-frame DSP pass an audio curation pipeline
    runs before VAD/quality gates. Unlike the stubbed image/video decode
    (codec libraries absent in this container), this path does the actual
    math with numpy inside an Arrow-batched mapInPandas — frombuffer,
    int64 square-sum per frame, no Python loop over samples — so it is the
    template for any codec-backed extractor: swap np.frombuffer for the
    decoder, keep the batch shape. Output is (id, frame_idx, n_samples,
    energy, n_loud); everything integer, fully oracle-checkable."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, nsamp, energy, nloud = [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(payload)[:max_bytes], dtype=np.uint8)
                for f in range(0, len(arr), frame_len):
                    frame = arr[f : f + frame_len].astype(np.int64)
                    ids.append(rid)
                    fidx.append(f // frame_len)
                    nsamp.append(len(frame))
                    energy.append(int((frame * frame).sum()))
                    nloud.append(int((frame >= loud_threshold).sum()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int64"),
                    "n_samples": pd.Series(nsamp, dtype="int64"),
                    "energy": pd.Series(energy, dtype="int64"),
                    "n_loud": pd.Series(nloud, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        extract,
        schema=f"{id_col} bigint, frame_idx bigint, n_samples bigint, "
        "energy bigint, n_loud bigint",
    )


def image_patch_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    side: int = 8,
    patch: int = 4,
) -> DataFrame:
    """REAL vectorized image-style feature extraction over binary payloads:
    the first side² bytes are an 8×8 grayscale raster, split into a 2×2
    grid of 4×4 patches; each patch emits exact-integer brightness sum /
    min / max and the horizontal-gradient magnitude Σ|I[r,c+1]-I[r,c]|
    (within-patch columns) — the luminance/contrast screen an image
    curation pipeline runs before any model-based scoring. Same contract
    as frame_energy: numpy does the actual math (frombuffer → reshape →
    vectorized diffs) inside Arrow-batched mapInPandas, payloads shorter
    than side² are skipped, everything is integer and oracle-checkable.
    A codec-backed extractor swaps frombuffer for the decoder and keeps
    the batch shape."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    n_per_side = side // patch

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pidx, s_, mn, mx, grad = [], [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)[: side * side]
                if len(raw) < side * side:
                    continue
                img = np.frombuffer(raw, dtype=np.uint8).reshape(side, side)
                img = img.astype(np.int64)
                for pr in range(n_per_side):
                    for pc in range(n_per_side):
                        block = img[
                            pr * patch : (pr + 1) * patch,
                            pc * patch : (pc + 1) * patch,
                        ]
                        ids.append(rid)
                        pidx.append(pr * n_per_side + pc)
                        s_.append(int(block.sum()))
                        mn.append(int(block.min()))
                        mx.append(int(block.max()))
                        grad.append(
                            int(np.abs(np.diff(block, axis=1)).sum())
                        )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "patch_idx": pd.Series(pidx, dtype="int64"),
                    "brightness": pd.Series(s_, dtype="int64"),
                    "min_px": pd.Series(mn, dtype="int64"),
                    "max_px": pd.Series(mx, dtype="int64"),
                    "h_gradient": pd.Series(grad, dtype="int64"),
                }
            )

    out_schema = (
        f"{id_col} long, patch_idx long, brightness long, "
        "min_px long, max_px long, h_gradient long"
    )
    return df.select(id_col, payload_col).mapInPandas(extract, out_schema)


def video_scene_cuts(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 16,
    n_frames: int = 16,
    cut_threshold: int = 200,
) -> DataFrame:
    """REAL vectorized video-style scene-cut detection over binary
    payloads — the VIDEO member of the multimodal matrix (audio:
    frame_energy, image: image_patch_stats): the first
    n_frames·frame_bytes bytes are a frame sequence, each frame's
    luminance proxy is its byte sum, and a scene cut fires where the
    absolute frame-to-frame energy delta exceeds the threshold — the
    standard first-pass shot-boundary heuristic a video curation
    pipeline runs before any model. numpy does frombuffer → reshape →
    per-frame sums → np.abs(np.diff) inside Arrow-batched mapInPandas
    (no per-byte Python); payloads shorter than the window are skipped;
    everything is exact integers, so the SQL mirror (ord/substr frame
    sums + one per-doc lag) reproduces every value. A codec-backed
    decoder swaps frombuffer for real frame extraction and keeps the
    batch shape and schema."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    need = frame_bytes * n_frames

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nf, nc, mx, mn_d = [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)[:need]
                if len(raw) < need:
                    continue
                frames = np.frombuffer(raw, dtype=np.uint8).reshape(
                    n_frames, frame_bytes
                )
                energy = frames.astype(np.int64).sum(axis=1)
                diffs = np.abs(np.diff(energy))
                ids.append(rid)
                nf.append(n_frames)
                nc.append(int((diffs > cut_threshold).sum()))
                mx.append(int(diffs.max()))
                mn_d.append(int(diffs.sum() * 1000) // int(len(diffs)))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_frames": pd.Series(nf, dtype="int64"),
                    "n_cuts": pd.Series(nc, dtype="int64"),
                    "max_frame_delta": pd.Series(mx, dtype="int64"),
                    "mean_delta_milli": pd.Series(mn_d, dtype="int64"),
                }
            )

    out_schema = (
        f"{id_col} long, n_frames long, n_cuts long, "
        "max_frame_delta long, mean_delta_milli long"
    )
    return df.select(id_col, payload_col).mapInPandas(extract, out_schema)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages. The Spark
side (schema, partitioning, batch shape, UDF signatures) is real and
tested. Image decode is ALSO real: Pillow when importable, else the
pure-stdlib PNG codec (``functions/png_codec.py`` — zlib is all PNG
needs), with the deterministic byte-histogram stub as the last resort
for payloads neither path can decode (and for audio/video, whose
codecs genuinely aren't in this environment). Swap in libav etc. by
registering a decoder.

Scale notes: payload columns are the widest thing in the pipeline, so
every transform here projects metadata-only where it can (decode is the
ONLY stage that touches bytes), and batches flow through Arrow without
row-at-a-time pickling. Partition sizing: keep
``spark.sql.files.maxPartitionBytes`` small enough that a batch of
payloads fits executor memory (binary columns defeat parquet column
pruning savings when selected).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, modality string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_SCHEMA = "media_id long, modality string, n_bytes int, feature array<float>, digest string"


class DecoderNotAvailable(NotImplementedError):
    pass


_JPEG_SOI = b"\xff\xd8\xff"


def looks_like_jpeg(data: bytes) -> bool:
    """JPEG start-of-image marker sniff (JFIF/EXIF/raw all start
    FF D8 FF)."""
    return data[: len(_JPEG_SOI)] == _JPEG_SOI


def _stub_decode(payload: bytes, mime: str) -> dict:
    """Deterministic fake decode: byte-histogram 'features'. Stands in
    for libav etc. so the distributed plumbing is fully exercisable."""
    hist = [0] * 16
    for b in payload[:4096]:
        hist[b >> 4] += 1
    total = max(sum(hist), 1)
    return {
        "feature": [h / total for h in hist],
        "digest": hashlib.md5(payload).hexdigest(),
    }


try:  # optional dependency: most Spark images ship Pillow
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - absent in this container
    _PILImage = None

_PIL_CHANNELS = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}


def _decode_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, raw pixels) via Pillow when importable,
    else the pure-stdlib PNG codec. Raises ValueError if neither can."""
    if _PILImage is not None:
        import io

        try:
            im = _PILImage.open(io.BytesIO(payload))
            im.load()
        except Exception as exc:  # PIL raises a zoo of types
            raise ValueError(f"undecodable image payload: {exc}") from exc
        if im.mode not in _PIL_CHANNELS:
            im = im.convert("RGBA")
        return im.width, im.height, _PIL_CHANNELS[im.mode], im.tobytes()
    if looks_like_jpeg(payload):
        # a well-formed JPEG is NOT a corrupt payload — silently routing
        # it to the byte-histogram stub would poison real training
        # corpora (mostly JPEG) with meaningless features. Without
        # Pillow this is a missing-capability error, raised loudly;
        # extract_features offers stub_missing_codecs=True as the
        # documented opt-in for synthetic pipelines.
        raise DecoderNotAvailable(
            "JPEG payload but Pillow is not importable (the pure-stdlib "
            "fallback codec only covers PNG); install Pillow, "
            "register_decoder('image', ...), or opt in to the stub with "
            "extract_features(..., stub_missing_codecs=True)"
        )
    from hpc_hd_textreuse_etl_spark.functions.png_codec import png_decode

    return png_decode(payload)


def _pixel_features(w: int, h: int, c: int, pixels: bytes) -> list[float]:
    """16-float content feature (same arity as the stub): geometry +
    global mean + 12-bin luminance histogram, all deterministic."""
    n = max(len(pixels), 1)
    # luminance = first channel for grey/LA, integer-weighted RGB else
    lum_hist = [0] * 12
    step = c
    count = 0
    for i in range(0, len(pixels), step):
        if c >= 3:
            lum = (77 * pixels[i] + 150 * pixels[i + 1] + 29 * pixels[i + 2]) >> 8
        else:
            lum = pixels[i]
        lum_hist[min(lum * 12 // 256, 11)] += 1
        count += 1
    count = max(count, 1)
    return [
        w / 4096.0,
        h / 4096.0,
        c / 4.0,
        sum(pixels) / (255.0 * n),
        *[b / count for b in lum_hist],
    ]


def _image_decode(payload: bytes, mime: str) -> dict:
    """Real image decode (Pillow → pure-PNG → stub fallback): feature is
    content-derived when the payload decodes, the byte-histogram stub
    when it doesn't — never a silent skip."""
    try:
        w, h, c, pixels = _decode_pixels(bytes(payload))
    except (ValueError, zlib.error, struct.error):
        # png_codec re-raises malformed-input failures as ValueError, but
        # catch the raw codec error types too: a payload with a valid PNG
        # signature and corrupt body must hit the stub, never kill the task
        return _stub_decode(payload, mime)
    return {
        "feature": _pixel_features(w, h, c, pixels),
        "digest": hashlib.md5(payload).hexdigest(),
    }


#: modality → decoder(payload, mime) -> {"feature": [...], "digest": str}
DECODERS: dict[str, Callable[[bytes, str], dict]] = {
    "image": _image_decode,
    "audio": _stub_decode,
    "video": _stub_decode,
}


def register_decoder(modality: str, fn: Callable[[bytes, str], dict]) -> None:
    DECODERS[modality] = fn


def extract_features(
    df: DataFrame,
    batch_hint: int | None = None,
    *,
    stub_missing_codecs: bool = False,
) -> DataFrame:
    """binary payloads → feature vectors via Arrow-batched mapInPandas.

    Input needs MEDIA_META_SCHEMA columns. Unknown modalities raise
    DecoderNotAvailable — silent skips would corrupt training sets.
    Likewise, a decodable format whose codec is missing from the
    environment (JPEG without Pillow) raises rather than silently
    stubbing; ``stub_missing_codecs=True`` is the explicit opt-in that
    routes those payloads to the deterministic byte-histogram stub
    (synthetic pipelines / plumbing tests only — NEVER for real
    training data).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, digests, sizes = [], [], []
            for payload, modality, mime in zip(
                pdf["payload"], pdf["modality"], pdf["mime"]
            ):
                decoder = DECODERS.get(modality)
                if decoder is None:
                    raise DecoderNotAvailable(
                        f"no decoder registered for modality={modality!r}"
                    )
                try:
                    out = decoder(bytes(payload), mime)
                except DecoderNotAvailable:
                    if not stub_missing_codecs:
                        raise
                    out = _stub_decode(bytes(payload), mime)
                feats.append(out["feature"])
                digests.append(out["digest"])
                sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pd.array(sizes, dtype="int32"),
                    "feature": feats,
                    "digest": digests,
                }
            )

    return df.select(
        "media_id", "modality", "mime", "payload"
    ).mapInPandas(run, schema=FEATURE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation — never touches payload bytes, so the
    parquet scan prunes the binary column entirely."""
    return df.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),  # length is cheap; see note
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
    )


def resize_images(
    df: DataFrame, target_width: int, target_height: int
) -> DataFrame:
    """Image resize plan: payload → resized payload + updated metadata.

    Decodable payloads are REALLY resized — Pillow's nearest-neighbor
    resample when importable, else decode → ``resize_nearest`` →
    re-encode through the pure-stdlib PNG codec. Payloads neither path
    can decode — including JPEG when Pillow is absent — pass through
    UNCHANGED (metadata still updated): unlike feature extraction,
    pass-through preserves the original bytes rather than fabricating
    data, so it is safe-by-default and needs no opt-in."""

    def _resize(payload: bytes, w: int, h: int) -> bytes:
        if _PILImage is not None:
            import io

            try:
                im = _PILImage.open(io.BytesIO(payload))
                out = io.BytesIO()
                im.resize((w, h), _PILImage.NEAREST).save(out, format="PNG")
                return out.getvalue()
            except Exception:
                return payload
        from hpc_hd_textreuse_etl_spark.functions.png_codec import (
            png_decode,
            png_encode,
            resize_nearest,
        )

        try:
            sw, sh, c, pixels = png_decode(payload)
        except (ValueError, zlib.error, struct.error):
            return payload
        return png_encode(w, h, c, resize_nearest(sw, sh, c, pixels, w, h))

    def run(batches):
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                _resize(bytes(p), target_width, target_height)
                for p in out["payload"]
            ]
            out["width"] = target_width
            out["height"] = target_height
            yield out

    images = df.filter(F.col("modality") == "image")
    return images.mapInPandas(run, schema=df.schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explodes sample timestamps
    JVM-side; the (stubbed) per-frame decode happens only downstream."""
    return (
        df.filter(F.col("modality") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
                )
            ),
        )
        .select("media_id", "mime", "frame_ms", "payload")
    )


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash / aHash) — multimodal × dedup bridge
# ---------------------------------------------------------------------------


def _grayscale(w: int, h: int, c: int, pixels: bytes) -> bytes:
    """Integer luminance plane (the _pixel_features weights: RGB →
    (77R + 150G + 29B) >> 8; 1/2-channel images use the first channel).
    Pure-integer, so bit-reproducible everywhere."""
    if c == 1:
        return pixels
    out = bytearray(w * h)
    for i in range(w * h):
        base = i * c
        if c >= 3:
            out[i] = (
                77 * pixels[base] + 150 * pixels[base + 1] + 29 * pixels[base + 2]
            ) >> 8
        else:
            out[i] = pixels[base]
    return bytes(out)


def _pack_bits(bits: list[bool]) -> int:
    """LSB-first bit pack into a SIGNED 64-bit value (two's-complement
    wrap — what a Spark/DuckDB BIGINT column holds)."""
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def dhash_bytes(payload: bytes, hash_w: int = 8, hash_h: int = 8) -> int:
    """Difference hash of an encoded image: decode → grayscale →
    nearest-neighbor resize to (hash_w+1) × hash_h → one bit per
    horizontal neighbor comparison ``p[r][c] > p[r][c+1]`` (bit index
    ``r*hash_w + c``, LSB first). Every step is integer arithmetic over
    the decoded pixels, so the hash is deterministic across platforms —
    which is what lets the DuckDB oracle recompute it from the pixel
    formula alone (the PNG encode/decode round-trip cancels)."""
    from hpc_hd_textreuse_etl_spark.functions.png_codec import resize_nearest

    w, h, c, pixels = _decode_pixels(payload)
    gray = _grayscale(w, h, c, pixels)
    small = resize_nearest(w, h, 1, gray, hash_w + 1, hash_h)
    bits = [
        small[r * (hash_w + 1) + col] > small[r * (hash_w + 1) + col + 1]
        for r in range(hash_h)
        for col in range(hash_w)
    ]
    return _pack_bits(bits)


def ahash_bytes(payload: bytes, hash_w: int = 8, hash_h: int = 8) -> int:
    """Average hash: decode → grayscale → resize to hash_w × hash_h →
    one bit per pixel-above-mean. The mean comparison is the exact
    integer cross-multiplication ``p * n > Σp`` (no float division), so
    the hash is bit-deterministic like :func:`dhash_bytes`."""
    from hpc_hd_textreuse_etl_spark.functions.png_codec import resize_nearest

    w, h, c, pixels = _decode_pixels(payload)
    gray = _grayscale(w, h, c, pixels)
    small = resize_nearest(w, h, 1, gray, hash_w, hash_h)
    n = hash_w * hash_h
    total = sum(small)
    bits = [small[i] * n > total for i in range(n)]
    return _pack_bits(bits)


_PHASH_FNS = {"dhash": dhash_bytes, "ahash": ahash_bytes}


def perceptual_image_hashes(
    df: DataFrame,
    id_col: str = "media_id",
    data_col: str = "data",
    method: str = "dhash",
    hash_w: int = 8,
    hash_h: int = 8,
) -> DataFrame:
    """``(id, phash)`` — 64-bit perceptual hash per image, the dedup
    key for near-identical images (re-encodes, crops of boilerplate,
    resized logos) that byte-level sha256 dedup can never catch.

    Arrow-batched ``mapInPandas`` over the binary column (the decode is
    Python by necessity; everything downstream — banding, pair
    verification — is Catalyst). At 100 TB the hash pass streams the
    image bytes ONCE and emits 8-byte signatures; all subsequent dedup
    shuffles carry (id, phash) pairs only, the same never-shuffle-
    payloads contract as every other dedup family
    (reference has no image path at all — beyond-parity; pairs via
    operators/dedup.py signature_near_duplicates).

    Totality: rows with a NULL payload are dropped (an absent image has
    no hash — callers wanting to treat them as errors should assert on
    ``data_col`` upstream); integer id dtypes are normalized to long
    before the Arrow exchange, and any other id dtype except string is
    rejected here with a clear message instead of failing later inside
    the Arrow conversion."""
    import pandas as pd

    if method not in _PHASH_FNS:
        raise ValueError(f"unknown perceptual hash method {method!r}")
    fn = _PHASH_FNS[method]
    id_dtype = dict(df.dtypes)[id_col]
    if id_dtype in ("bigint", "int", "smallint", "tinyint"):
        # cast up front so the pandas values match the declared long
        # schema (a smallint column declared long would otherwise die in
        # the Arrow conversion)
        df = df.withColumn(id_col, F.col(id_col).cast("long"))
        id_sql = "long"
    elif id_dtype == "string":
        id_sql = "string"
    else:
        raise ValueError(
            f"perceptual_image_hashes: unsupported id dtype {id_dtype!r} "
            f"for {id_col!r} (expected an integer type or string)"
        )
    df = df.where(F.col(data_col).isNotNull())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "phash": [
                        fn(bytes(p), hash_w, hash_h) for p in pdf[data_col]
                    ],
                }
            )

    # persist: the signature table feeds BOTH sides of the downstream
    # banding self-join (and the delta legs probe it twice), and
    # Catalyst cannot CSE through an opaque Python node — unpinned, the
    # image decode ran once PER CONSUMER SUBTREE (measured: 4
    # MapInPandas nodes in the near-dup plan), which broke this
    # docstring's "streams the image bytes ONCE" contract. The pin is
    # (id, 8-byte phash) rows, released at the registry/bench hygiene
    # points — the minhash signature-persist pattern (dedup.py).
    return (
        df.select(id_col, data_col)
        .mapInPandas(run, schema=f"{id_col} {id_sql}, phash long")
        .persist()
    )


# ---------------------------------------------------------------------------
# Audio: WAV/PCM fingerprinting (the audio leg of the multimodal ladder)
# ---------------------------------------------------------------------------


def audio_fingerprint_bytes(payload: bytes, n_segments: int = 64) -> int:
    """64-bit energy-contour fingerprint of an encoded WAV clip: decode
    (functions/wav_codec.py, stdlib struct) → integer mono downmix →
    ``n_segments`` equal time segments → per-segment summed absolute
    amplitude → dHash-style ring comparison (bit i set iff
    ``energy[i] > energy[(i + 1) % n_segments]``), LSB-first packed
    into a signed BIGINT. Every step is integer arithmetic, so the
    fingerprint is bit-reproducible across engines and partitionings —
    the same property the image dHash has, which is what lets a DuckDB
    oracle gate the audio chain end to end when the samples come from
    a portable formula (plans/queries.py audio_fingerprint_codes).

    Robust to the transforms a near-dup audio pipeline meets (volume
    is monotone in the comparisons' inputs only through segment sums,
    re-containering cancels entirely); NOT a music-recognition
    chromaprint — it is the dedup key for re-encoded/re-uploaded
    clips, the audio twin of the image dHash."""
    from hpc_hd_textreuse_etl_spark.functions.wav_codec import (
        pcm_samples,
        wav_decode,
    )

    _rate, channels, width, frames = wav_decode(payload)
    samples = pcm_samples(channels, width, frames)
    n = len(samples)
    energy = [0] * n_segments
    for i, s in enumerate(samples):
        energy[i * n_segments // n] += abs(s)
    return _pack_bits(
        [
            energy[i] > energy[(i + 1) % n_segments]
            for i in range(n_segments)
        ]
    )


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "media_id",
    data_col: str = "data",
    n_segments: int = 64,
) -> DataFrame:
    """``(id, afp, sample_rate, n_samples)`` — 64-bit energy-contour
    fingerprint per WAV clip (:func:`audio_fingerprint_bytes`) plus the
    decoded header facts, the audio entry point of the signature-dedup
    family: feed ``afp`` to operators/dedup.py
    ``signature_near_duplicates`` (batch, delta, star-collapse and
    streaming legs all apply unchanged — the banding engine is
    signature-agnostic).

    Same contract as :func:`perceptual_image_hashes`: Arrow-batched
    ``mapInPandas`` streams the audio bytes ONCE and emits 8-byte
    signatures; every downstream dedup shuffle carries (id, afp) pairs,
    never payloads. NULL payloads are dropped; integer id dtypes are
    normalized to long before the Arrow exchange; other id dtypes
    except string are rejected loudly."""
    import pandas as pd

    from hpc_hd_textreuse_etl_spark.functions.wav_codec import (
        pcm_samples,
        wav_decode,
    )

    if n_segments < 2 or n_segments > 64:
        raise ValueError(
            f"n_segments must be in [2, 64] (one BIGINT), got {n_segments}"
        )
    id_dtype = dict(df.dtypes)[id_col]
    if id_dtype in ("bigint", "int", "smallint", "tinyint"):
        df = df.withColumn(id_col, F.col(id_col).cast("long"))
        id_sql = "long"
    elif id_dtype == "string":
        id_sql = "string"
    else:
        raise ValueError(
            f"audio_fingerprints: unsupported id dtype {id_dtype!r} "
            f"for {id_col!r} (expected an integer type or string)"
        )
    df = df.where(F.col(data_col).isNotNull())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {id_col: [], "afp": [], "sample_rate": [], "n_samples": []}
            for mid, payload in zip(pdf[id_col], pdf[data_col]):
                rate, channels, width, frames = wav_decode(bytes(payload))
                samples = pcm_samples(channels, width, frames)
                n = len(samples)
                energy = [0] * n_segments
                for i, s in enumerate(samples):
                    energy[i * n_segments // n] += abs(s)
                rows[id_col].append(mid)
                rows["afp"].append(
                    _pack_bits(
                        [
                            energy[i] > energy[(i + 1) % n_segments]
                            for i in range(n_segments)
                        ]
                    )
                )
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
            yield pd.DataFrame(rows)

    # persist for the same reason as perceptual_image_hashes: the
    # fingerprint table feeds both sides of the banding self-join and
    # Catalyst cannot CSE through the Python decode — unpinned, the WAV
    # decode ran once per consumer subtree. Released at the
    # registry/bench hygiene points.
    return (
        df.select(id_col, data_col)
        .mapInPandas(
            run,
            schema=f"{id_col} {id_sql}, afp long, sample_rate int, n_samples long",
        )
        .persist()
    )


def audio_metadata(
    df: DataFrame, id_col: str = "media_id", data_col: str = "data"
) -> DataFrame:
    """``(id, sample_rate, channels, sample_width, n_frames,
    duration_ms)`` per WAV clip — header-only facts for QC dashboards
    and partition planning (bucket clips by duration before feature
    extraction). NULL payloads are dropped, mirroring
    :func:`audio_fingerprints`."""
    import pandas as pd

    from hpc_hd_textreuse_etl_spark.functions.wav_codec import wav_decode

    id_dtype = dict(df.dtypes)[id_col]
    if id_dtype in ("bigint", "int", "smallint", "tinyint"):
        df = df.withColumn(id_col, F.col(id_col).cast("long"))
        id_sql = "long"
    elif id_dtype == "string":
        id_sql = "string"
    else:
        raise ValueError(
            f"audio_metadata: unsupported id dtype {id_dtype!r} for "
            f"{id_col!r} (expected an integer type or string)"
        )
    df = df.where(F.col(data_col).isNotNull())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {
                id_col: [], "sample_rate": [], "channels": [],
                "sample_width": [], "n_frames": [], "duration_ms": [],
            }
            for mid, payload in zip(pdf[id_col], pdf[data_col]):
                rate, channels, width, frames = wav_decode(bytes(payload))
                n_frames = len(frames) // (channels * width)
                rows[id_col].append(mid)
                rows["sample_rate"].append(rate)
                rows["channels"].append(channels)
                rows["sample_width"].append(width)
                rows["n_frames"].append(n_frames)
                rows["duration_ms"].append(n_frames * 1000.0 / rate)
            yield pd.DataFrame(rows)

    return df.select(id_col, data_col).mapInPandas(
        run,
        schema=(
            f"{id_col} {id_sql}, sample_rate int, channels int, "
            "sample_width int, n_frames long, duration_ms double"
        ),
    )

"""Audio multimodal leg: WAV codec round-trip + refusals, energy-contour
fingerprints (determinism, hand-computed bits, dedup composition), and
header metadata. The audio twin of the image dHash tests."""

from __future__ import annotations

import struct

import pyspark.sql.functions as F
import pytest

from hpc_hd_textreuse_etl_spark.functions.wav_codec import (
    is_wav,
    pcm_samples,
    wav_decode,
    wav_encode,
)
from hpc_hd_textreuse_etl_spark.operators.multimodal import (
    audio_fingerprint_bytes,
    audio_fingerprints,
    audio_metadata,
)


def _clip16(samples, rate=8000, channels=1):
    return wav_encode(
        rate, channels, 2, struct.pack(f"<{len(samples)}h", *samples)
    )


def test_wav_roundtrip_16bit_stereo():
    frames = struct.pack("<6h", 100, -100, 2000, -2000, 32767, -32768)
    data = wav_encode(44100, 2, 2, frames)
    assert is_wav(data)
    assert wav_decode(data) == (44100, 2, 2, frames)


def test_wav_roundtrip_8bit_mono_odd_length_padded():
    frames = bytes([0, 128, 255])  # odd data length → RIFF pad byte
    data = wav_encode(8000, 1, 1, frames)
    assert len(data) % 2 == 0
    assert wav_decode(data) == (8000, 1, 1, frames)


def test_wav_codec_refusals():
    with pytest.raises(ValueError, match="signature"):
        wav_decode(b"not audio at all")
    with pytest.raises(ValueError, match="sample width"):
        wav_encode(8000, 1, 3, b"\x00" * 6)
    with pytest.raises(ValueError, match="whole number"):
        wav_encode(8000, 2, 2, b"\x00" * 5)
    # float PCM (format tag 3) must be refused, not misread
    good = wav_encode(8000, 1, 2, struct.pack("<2h", 1, 2))
    float_tag = good.replace(
        b"fmt " + struct.pack("<IH", 16, 1),
        b"fmt " + struct.pack("<IH", 16, 3),
    )
    with pytest.raises(ValueError, match="format tag"):
        wav_decode(float_tag)
    with pytest.raises(ValueError, match="fmt or data"):
        wav_decode(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_pcm_downmix_is_integer_exact():
    frames = struct.pack("<6h", 10, 20, -7, -8, 5, -5)
    # floor division: (10+20)//2=15, (-7-8)//2=-8 (floors), (5-5)//2=0
    assert pcm_samples(2, 2, frames) == [15, -8, 0]
    assert pcm_samples(1, 1, bytes([0, 128, 255])) == [-128, 0, 127]


def test_fingerprint_hand_computed_bits():
    # 8 samples, 4 segments → energies [20, 0, 10, 0]; ring comparison
    # sets bits 0 (20>0) and 2 (10>0): afp = 0b101 = 5
    clip = _clip16([10, 10, 0, 0, 5, 5, 0, 0])
    assert audio_fingerprint_bytes(clip, n_segments=4) == 5
    # identical audio re-containered at another rate → same fingerprint
    assert (
        audio_fingerprint_bytes(
            _clip16([10, 10, 0, 0, 5, 5, 0, 0], rate=44100), n_segments=4
        )
        == 5
    )
    # uniform volume scaling preserves every comparison
    assert (
        audio_fingerprint_bytes(
            _clip16([30, 30, 0, 0, 15, 15, 0, 0]), n_segments=4
        )
        == 5
    )


def test_audio_fingerprints_operator_and_dedup(spark):
    from hpc_hd_textreuse_etl_spark.operators.dedup import (
        signature_near_duplicates,
    )

    base = [(i * 37) % 200 - 100 for i in range(256)]
    tweaked = list(base)
    tweaked[13] += 9  # sub-segment nudge: a near-identical re-encode
    other = [((i * i) % 199) - 99 for i in range(256)]
    rows = [
        (1, _clip16(base)),
        (2, _clip16(base, rate=16000)),   # same audio, re-containered
        (3, _clip16(tweaked)),
        (4, _clip16(other)),
        (5, None),                        # absent payload → dropped
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    fps = audio_fingerprints(df, "media_id", "data")
    got = {r.media_id: r for r in fps.collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1].afp == got[2].afp
    assert got[1].n_samples == 256 and got[1].sample_rate == 8000
    d13 = bin(got[1].afp ^ got[3].afp).count("1")
    d14 = bin(got[1].afp ^ got[4].afp).count("1")
    assert d13 <= 4 < d14  # near-dup close, distinct clip far
    pairs = {
        (r.id_a, r.id_b)
        for r in signature_near_duplicates(
            fps, "media_id", "afp", max_hamming=4
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p for p in pairs)
    # partition independence: same fingerprints from any layout
    again = {
        r.media_id: r.afp
        for r in audio_fingerprints(
            df.repartition(7), "media_id", "data"
        ).collect()
    }
    assert again == {k: v.afp for k, v in got.items()}


def test_audio_fingerprints_validations(spark):
    df = spark.createDataFrame(
        [(1.5, b"x")], "media_id double, data binary"
    )
    with pytest.raises(ValueError, match="id dtype"):
        audio_fingerprints(df, "media_id", "data")
    ok = spark.createDataFrame([(1, _clip16([1, 2]))], "media_id long, data binary")
    with pytest.raises(ValueError, match="n_segments"):
        audio_fingerprints(ok, "media_id", "data", n_segments=65)


def test_audio_metadata(spark):
    rows = [
        (1, _clip16([0] * 400, rate=8000)),
        (2, wav_encode(16000, 2, 1, bytes(range(32)))),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {r.media_id: r for r in audio_metadata(df).collect()}
    assert set(got) == {1, 2}
    assert (
        got[1].sample_rate, got[1].channels, got[1].sample_width,
        got[1].n_frames, got[1].duration_ms,
    ) == (8000, 1, 2, 400, 50.0)
    assert (got[2].channels, got[2].n_frames) == (2, 16)

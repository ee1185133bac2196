"""Minimal pure-stdlib WAV (RIFF/PCM) codec for the multimodal audio
operators — the audio sibling of functions/png_codec.py.

This container ships no audio libraries, but canonical PCM WAV needs
none: the format is RIFF chunk framing (``struct``) around raw sample
frames. The codec covers the shapes a synthetic-media pipeline
produces — 8-bit unsigned / 16-bit signed little-endian PCM, mono or
multi-channel, a plain ``fmt `` + ``data`` chunk layout — and refuses
the rest loudly (compressed codecs, float PCM, 24/32-bit), so callers
can register a richer decoder (operators/multimodal.py
``register_decoder`` convention) without the plumbing changing.

Scale note: like the PNG codec this runs INSIDE Arrow-batched
``mapInPandas`` workers on per-row-bounded payloads; it is deliberately
dependency-free rather than fast.
"""

from __future__ import annotations

import struct

#: PCM format tag in the fmt chunk; everything else (float, ADPCM,
#: mu-law, extensible) is refused loudly
_WAVE_FORMAT_PCM = 1

#: hostile-input bounds: a crafted header may declare absurd sizes, so
#: cap the decoded frame buffer before any allocation sized from
#: attacker-controlled fields (1 GiB ≈ 3 hours of 16-bit stereo at
#: 48 kHz — far past anything this fallback codec is for)
_MAX_DATA_BYTES = 1 << 30


def is_wav(data: bytes) -> bool:
    return (
        len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    )


def wav_encode(
    sample_rate: int, channels: int, sample_width: int, frames: bytes
) -> bytes:
    """PCM frames → WAV bytes. ``frames`` is the interleaved raw sample
    buffer (8-bit unsigned or 16-bit signed little-endian — the two PCM
    shapes this codec speaks); its length must be a whole number of
    ``channels * sample_width`` frames."""
    if sample_width not in (1, 2):
        raise ValueError(
            f"unsupported sample width {sample_width} (only 8/16-bit PCM)"
        )
    if channels < 1 or sample_rate < 1:
        raise ValueError(
            f"implausible WAV shape: channels={channels} rate={sample_rate}"
        )
    block_align = channels * sample_width
    if len(frames) % block_align:
        raise ValueError(
            f"frame buffer of {len(frames)} bytes is not a whole number "
            f"of {block_align}-byte frames"
        )
    fmt = struct.pack(
        "<HHIIHH",
        _WAVE_FORMAT_PCM,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        sample_width * 8,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
        + (b"\x00" if len(frames) % 2 else b"")  # RIFF word padding
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """WAV bytes → ``(sample_rate, channels, sample_width, frames)``.
    Raises ``ValueError`` on non-WAV input and on unsupported shapes
    (non-PCM codecs, widths other than 8/16-bit)."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        typ = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        pos += 8
        chunk = data[pos : pos + length]
        pos += length + (length % 2)  # RIFF chunks are word-aligned
        if typ == b"fmt " and fmt is None:
            if len(chunk) < 16:
                raise ValueError(f"malformed fmt chunk ({len(chunk)} bytes)")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif typ == b"data" and frames is None:
            if length > _MAX_DATA_BYTES:
                raise ValueError(
                    f"implausible WAV data size {length} bytes"
                )
            if len(chunk) < length:
                raise ValueError("truncated WAV data chunk")
            frames = chunk
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt or data chunk")
    format_tag, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if format_tag != _WAVE_FORMAT_PCM:
        raise ValueError(
            f"unsupported WAV format tag {format_tag} (only integer PCM)"
        )
    if bits not in (8, 16):
        raise ValueError(f"unsupported bit depth {bits} (only 8/16-bit)")
    sample_width = bits // 8
    if channels < 1 or block_align != channels * sample_width:
        raise ValueError(
            f"inconsistent WAV fmt: channels={channels} "
            f"block_align={block_align} width={sample_width}"
        )
    if len(frames) % block_align:
        raise ValueError(
            f"WAV data of {len(frames)} bytes is not a whole number of "
            f"{block_align}-byte frames"
        )
    return sample_rate, channels, sample_width, frames


def pcm_samples(
    channels: int, sample_width: int, frames: bytes
) -> list[int]:
    """Interleaved PCM frames → per-frame MONO samples as signed ints
    (multi-channel frames are downmixed by floor-dividing the channel
    sum — integer-exact, so fingerprints are engine-reproducible).
    8-bit WAV is unsigned with a 128 bias (the format's convention);
    16-bit is signed little-endian."""
    if sample_width == 1:
        vals = [b - 128 for b in frames]
    elif sample_width == 2:
        vals = list(
            struct.unpack(f"<{len(frames) // 2}h", frames)
        )
    else:
        raise ValueError(f"unsupported sample width {sample_width}")
    if channels == 1:
        return vals
    return [
        sum(vals[i : i + channels]) // channels
        for i in range(0, len(vals), channels)
    ]

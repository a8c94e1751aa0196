"""Stdlib codec round trip: _try_real_decode must parse spec-valid
PNG/WAV payloads exactly and keep the NotImplementedError boundary for
formats whose codecs are genuinely absent (video, non-grayscale PNG,
non-PCM WAV)."""

from __future__ import annotations

import numpy as np
import pytest

from spark_spotify.multimodal import (
    _png_encode,
    _try_real_decode,
    _wav_encode,
)


def test_png_round_trip():
    w, h = 7, 5
    pix = (np.arange(w * h, dtype=np.int64) * 7 + 4) % 251
    got = _try_real_decode(
        _png_encode(w, h, pix.astype(np.uint8).tobytes()), "image"
    )
    assert got == (w, h, int(pix.sum()))


def test_wav_round_trip():
    smp = ((13 + np.arange(40, dtype=np.int64) * 31) % 65536) - 32768
    got = _try_real_decode(_wav_encode(16000, smp), "audio")
    assert got == (16000, 40, int(smp.sum()))


def test_video_still_gated():
    with pytest.raises(NotImplementedError, match="video"):
        _try_real_decode(b"\x00" * 64, "video")


def test_corrupt_streams_rejected():
    with pytest.raises(ValueError, match="PNG"):
        _try_real_decode(b"JFIF" + b"\x00" * 64, "image")
    with pytest.raises(ValueError, match="RIFF"):
        _try_real_decode(b"OggS" + b"\x00" * 64, "audio")


def test_unsupported_profiles_gated():
    import io
    import wave

    # stereo WAV: PCM but not the mono profile the stdlib path decodes
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x00" * 8)
    with pytest.raises(NotImplementedError, match="mono"):
        _try_real_decode(buf.getvalue(), "audio")

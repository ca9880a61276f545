"""Pluggable media codecs for the multimodal operators (VERDICT r3
task #7: make the decode tier production-shaped).

`decode_image` / `decode_audio_features` (operators/multimodal.py)
sniff each payload's container magic and dispatch to the first codec
that claims it. Three tiers ship:

1. **FAKE containers** (FAKI/FAKA) — the deterministic in-repo formats
   every driver query and byte-true test uses; always registered.
2. **Real pure-stdlib containers** — binary PGM (P5) images parsed
   with numpy and PCM WAV audio parsed with the stdlib ``wave``
   module. These are real public formats decoded for real, proving
   the dispatch tier with zero third-party dependencies.
3. **Feature-flagged library adapters** — PIL (jpeg/png) and
   soundfile (flac/ogg/…) register themselves only when the library
   imports. In this sandbox neither ships, so their tests are
   skip-marked; in a real deployment they light up with no code
   change, exactly as `multimodal.py`'s module docstring promises.

Every image codec returns a 2-D uint8 grayscale array; every audio
codec returns ``(sample_rate, int16 samples)``. The Arrow batching,
pooling/feature math, output schemas, and error quarantine live in
multimodal.py and are codec-agnostic.
"""

from __future__ import annotations

import io
import wave
from dataclasses import dataclass
from typing import Callable

import numpy as np

__all__ = [
    "ImageCodec",
    "AudioCodec",
    "image_codecs",
    "audio_codecs",
    "HAVE_PIL",
    "HAVE_SOUNDFILE",
]


@dataclass(frozen=True)
class ImageCodec:
    """name + sniff(bytes)->bool + decode(bytes)->2-D uint8 array."""

    name: str
    sniff: Callable[[bytes], bool]
    decode: Callable[[bytes], np.ndarray]


@dataclass(frozen=True)
class AudioCodec:
    """name + sniff(bytes)->bool + decode(bytes)->(rate, int16 array)."""

    name: str
    sniff: Callable[[bytes], bool]
    decode: Callable[[bytes], tuple[int, np.ndarray]]


# --- tier 1: FAKE containers (see multimodal.py for the format spec) --

FAKE_IMAGE_MAGIC = b"FAKI"
FAKE_AUDIO_MAGIC = b"FAKA"


def _decode_faki(b: bytes) -> np.ndarray:
    if len(b) < 8:
        raise ValueError("truncated FAKI header")
    w = int.from_bytes(b[4:6], "big")
    h = int.from_bytes(b[6:8], "big")
    if len(b) != 8 + w * h:
        raise ValueError("FAKI pixel grid length mismatch")
    return np.frombuffer(b[8:], dtype=np.uint8).reshape(h, w)


def _decode_faka(b: bytes) -> tuple[int, np.ndarray]:
    if len(b) < 12:
        raise ValueError("truncated FAKA header")
    rate = int.from_bytes(b[4:8], "big")
    n = int.from_bytes(b[8:12], "big")
    if rate == 0:
        raise ValueError("FAKA zero sample rate")
    if len(b) != 12 + 2 * n:
        raise ValueError("FAKA sample buffer length mismatch")
    return rate, np.frombuffer(b[12:], dtype="<i2")


# --- tier 2: real pure-stdlib containers -----------------------------


def _pgm_tokens(b: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII ints after the P5 magic,
    honoring ``#`` comments (the PGM spec); returns (values, offset of
    the byte AFTER the single whitespace that terminates the last
    token — where the raster begins)."""
    vals: list[int] = []
    i = 2  # past "P5"
    while len(vals) < n:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":
            while i < len(b) and b[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PGM header")
        vals.append(int(b[i:j]))
        i = j
    # the spec terminates the header with a SINGLE whitespace byte,
    # but Windows writers commonly emit CRLF; treat "\r\n" as one
    # terminator or the raster silently shifts by a byte (the 0x0A
    # would decode as pixel 0 and the true last pixel would drop).
    # The trade: a spec-exact \r-terminated raster whose first pixel
    # is 10 misparses — a far rarer artifact than CRLF headers.
    if b[i : i + 2] == b"\r\n":
        return vals, i + 2
    return vals, i + 1


def _decode_pgm(b: bytes) -> np.ndarray:
    (w, h, maxval), off = _pgm_tokens(b, 3)
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    if len(b) < off + w * h:
        raise ValueError("PGM raster truncated")
    return np.frombuffer(b[off : off + w * h], dtype=np.uint8).reshape(h, w)


def _decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    try:
        with wave.open(io.BytesIO(b)) as wf:
            if wf.getsampwidth() != 2:
                raise ValueError("only 16-bit PCM WAV supported")
            rate = wf.getframerate()
            nch = wf.getnchannels()
            frames = wf.readframes(wf.getnframes())
    except wave.Error as e:
        raise ValueError(f"malformed WAV: {e}") from e
    # stdlib wave accepts fmt chunks declaring framerate=0; downstream
    # duration math divides by rate, so reject here (mirrors FAKA)
    if rate == 0:
        raise ValueError("WAV declares zero sample rate")
    x = np.frombuffer(frames, dtype="<i2")
    if nch > 1:  # downmix to mono by channel mean (round toward zero)
        x = (
            x.reshape(-1, nch).astype(np.int32).mean(axis=1).astype("<i2")
        )
    return rate, x


# --- tier 3: feature-flagged library adapters ------------------------

try:  # pragma: no cover - not installed in the sandbox
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

try:  # pragma: no cover - not installed in the sandbox
    import soundfile as _soundfile

    HAVE_SOUNDFILE = True
except ImportError:
    _soundfile = None
    HAVE_SOUNDFILE = False


def _decode_pil(b: bytes) -> np.ndarray:  # pragma: no cover
    img = _PILImage.open(io.BytesIO(b)).convert("L")
    return np.asarray(img, dtype=np.uint8)


def _decode_soundfile(b: bytes) -> tuple[int, np.ndarray]:  # pragma: no cover
    try:
        data, rate = _soundfile.read(io.BytesIO(b), dtype="int16")
    except RuntimeError as e:
        # soundfile.LibsndfileError subclasses RuntimeError, which the
        # decode quarantine does not catch — normalize to ValueError so
        # a corrupt flac/ogg payload quarantines instead of killing the
        # stage in skip mode
        raise ValueError(f"malformed audio container: {e}") from e
    x = np.asarray(data, dtype=np.int16)
    if x.ndim > 1:
        x = x.astype(np.int32).mean(axis=1).astype(np.int16)
    if int(rate) == 0:
        raise ValueError("audio container declares zero sample rate")
    return int(rate), x


def image_codecs() -> list[ImageCodec]:
    """Registered image codecs, most specific magic first. Library
    adapters appear only when their import succeeded."""
    out = [
        ImageCodec("faki", lambda b: b[:4] == FAKE_IMAGE_MAGIC, _decode_faki),
        ImageCodec("pgm", lambda b: b[:2] == b"P5", _decode_pgm),
    ]
    if HAVE_PIL:  # pragma: no cover
        out.append(
            ImageCodec(
                "pil",
                lambda b: b[:3] == b"\xff\xd8\xff"
                or b[:8] == b"\x89PNG\r\n\x1a\n",
                _decode_pil,
            )
        )
    return out


def audio_codecs() -> list[AudioCodec]:
    """Registered audio codecs, most specific magic first."""
    out = [
        AudioCodec("faka", lambda b: b[:4] == FAKE_AUDIO_MAGIC, _decode_faka),
        AudioCodec(
            "wav",
            lambda b: b[:4] == b"RIFF" and b[8:12] == b"WAVE",
            _decode_wav,
        ),
    ]
    if HAVE_SOUNDFILE:  # pragma: no cover
        out.append(
            AudioCodec(
                "soundfile",
                lambda b: b[:4] in (b"fLaC", b"OggS"),
                _decode_soundfile,
            )
        )
    return out

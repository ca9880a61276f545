"""Codec adapter tier (operators/codecs.py): real PGM/WAV containers
decode through the same Arrow-batched plumbing as the FAKE tier; PIL/
soundfile adapters register only when importable (skip-marked here —
neither library ships in the sandbox)."""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pytest

from datawaves_etl_airflow_spark.operators import codecs, multimodal


def _pgm_bytes(w: int, h: int, seed: int, comment: bool = False) -> bytes:
    px = (hashlib.sha256(str(seed).encode()).digest() * (w * h // 32 + 1))[
        : w * h
    ]
    head = b"P5\n"
    if comment:
        head += b"# a spec-legal comment\n"
    return head + f"{w} {h}\n255\n".encode() + px


def _wav_bytes(rate: int, samples: np.ndarray, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


class TestPurePython:
    def test_pgm_roundtrip_with_comment(self):
        b = _pgm_bytes(20, 10, seed=7, comment=True)
        img = codecs._decode_pgm(b)
        assert img.shape == (10, 20)
        assert img.tobytes() == b[-200:]

    def test_pgm_truncated_raster_raises(self):
        b = _pgm_bytes(20, 10, seed=7)[:-5]
        with pytest.raises(ValueError, match="truncated"):
            codecs._decode_pgm(b)

    def test_wav_roundtrip_mono(self):
        x = (np.arange(100) * 31 % 2048 - 1024).astype(np.int16)
        rate, got = codecs._decode_wav(_wav_bytes(16000, x))
        assert rate == 16000
        assert np.array_equal(got, x)

    def test_wav_stereo_downmixes(self):
        left = np.full(10, 100, dtype=np.int16)
        right = np.full(10, 300, dtype=np.int16)
        inter = np.empty(20, dtype=np.int16)
        inter[0::2], inter[1::2] = left, right
        rate, got = codecs._decode_wav(_wav_bytes(8000, inter, nch=2))
        assert np.array_equal(got, np.full(10, 200, dtype=np.int16))

    def test_wav_garbage_riff_raises_valueerror(self):
        junk = b"RIFF1234WAVE" + b"\x00" * 20
        with pytest.raises(ValueError, match="malformed WAV"):
            codecs._decode_wav(junk)


class TestSparkDispatch:
    def test_mixed_corpus_image(self, spark):
        """FAKI and PGM payloads in ONE DataFrame decode through one
        dispatch pass; garbage quarantines under on_error='skip'."""
        faki = (
            codecs.FAKE_IMAGE_MAGIC
            + (8).to_bytes(2, "big")
            + (4).to_bytes(2, "big")
            + bytes(range(32))
        )
        pgm = _pgm_bytes(8, 4, seed=3)
        rows = [(1, faki), (2, pgm), (3, b"GARBAGE!")]
        df = spark.createDataFrame(rows, "id long, payload binary")
        out = {
            r["id"]: r
            for r in multimodal.decode_image(
                df, max_side=4, on_error="skip"
            ).collect()
        }
        assert set(out) == {1, 2}
        for r in out.values():
            assert (r["width"], r["height"]) == (8, 4)
            assert (r["out_w"], r["out_h"]) == (4, 2)
        # PGM pixel math matches a direct numpy pool of the raster
        raster = np.frombuffer(pgm[-32:], dtype=np.uint8).reshape(4, 8)
        assert out[2]["mean_px"] == pytest.approx(float(raster.mean()))

    def test_mixed_corpus_audio(self, spark):
        x = (np.arange(64) * 97 % 4096 - 2048).astype(np.int16)
        faka = (
            codecs.FAKE_AUDIO_MAGIC
            + (16000).to_bytes(4, "big")
            + (64).to_bytes(4, "big")
            + x.astype("<i2").tobytes()
        )
        rows = [(1, faka), (2, _wav_bytes(16000, x)), (3, b"RIFFjunk")]
        df = spark.createDataFrame(rows, "id long, payload binary")
        out = {
            r["id"]: r
            for r in multimodal.decode_audio_features(
                df, target_rate=8000, on_error="skip"
            ).collect()
        }
        assert set(out) == {1, 2}
        want_rms = float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))
        for r in out.values():
            assert r["sample_rate"] == 16000
            assert r["n_samples"] == 64
            assert r["n_resampled"] == 32
            assert r["rms"] == pytest.approx(want_rms)
            assert r["peak"] == int(np.abs(x).max())

    def test_fail_mode_names_the_payload(self, spark):
        df = spark.createDataFrame(
            [(9, b"NOTAFORMAT")], "id long, payload binary"
        )
        with pytest.raises(Exception, match="bad image container"):
            multimodal.decode_image(df, on_error="fail").collect()

    def test_explicit_codec_list_overrides_registry(self, spark):
        """A caller-supplied codec list is honored — FAKI-only sees a
        PGM payload as unclaimed."""
        df = spark.createDataFrame(
            [(1, _pgm_bytes(4, 4, seed=1))], "id long, payload binary"
        )
        only_faki = [c for c in codecs.image_codecs() if c.name == "faki"]
        out = multimodal.decode_image(
            df, on_error="skip", codecs=only_faki
        )
        assert out.count() == 0


class TestLibraryAdapters:
    @pytest.mark.skipif(not codecs.HAVE_PIL, reason="PIL not installed")
    def test_pil_png_decodes(self, spark):  # pragma: no cover
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.arange(64, dtype=np.uint8).reshape(8, 8)
        ).save(buf, format="PNG")
        df = spark.createDataFrame(
            [(1, buf.getvalue())], "id long, payload binary"
        )
        row = multimodal.decode_image(df, max_side=8).collect()[0]
        assert (row["width"], row["height"]) == (8, 8)

    @pytest.mark.skipif(
        not codecs.HAVE_SOUNDFILE, reason="soundfile not installed"
    )
    def test_soundfile_flac_decodes(self, spark):  # pragma: no cover
        import soundfile

        x = (np.arange(128) % 256 - 128).astype(np.int16)
        buf = io.BytesIO()
        soundfile.write(buf, x, 8000, format="FLAC")
        df = spark.createDataFrame(
            [(1, buf.getvalue())], "id long, payload binary"
        )
        row = multimodal.decode_audio_features(df).collect()[0]
        assert row["n_samples"] == 128

    def test_registry_shape_without_libraries(self):
        """In this sandbox the registries hold exactly the FAKE + pure
        stdlib tiers."""
        inames = [c.name for c in codecs.image_codecs()]
        anames = [c.name for c in codecs.audio_codecs()]
        assert inames[:2] == ["faki", "pgm"]
        assert anames[:2] == ["faka", "wav"]
        if not codecs.HAVE_PIL:
            assert "pil" not in inames
        if not codecs.HAVE_SOUNDFILE:
            assert "soundfile" not in anames


class TestReviewRegressions:
    """Pins for the r4 review findings."""

    def test_wav_zero_rate_quarantines_not_crashes(self, spark):
        """A fmt chunk declaring framerate=0 passes stdlib wave; it
        must quarantine in skip mode, not ZeroDivisionError the
        stage."""
        import struct

        x = np.zeros(4, dtype=np.int16)
        data = x.tobytes()
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 0, 0, 2, 16)
            + b"data" + struct.pack("<I", len(data))
        )
        payload = hdr + data
        with pytest.raises(ValueError, match="zero sample rate"):
            codecs._decode_wav(payload)
        df = spark.createDataFrame(
            [(1, payload)], "id long, payload binary"
        )
        assert multimodal.decode_audio_features(
            df, on_error="skip"
        ).count() == 0

    def test_pgm_crlf_header_decodes_exactly(self):
        raster = bytes(range(10, 16))
        b = b"P5\r\n3 2\r\n255\r\n" + raster
        img = codecs._decode_pgm(b)
        assert img.tobytes() == raster
        assert img.shape == (2, 3)

    def test_magic_constants_single_source(self):
        assert multimodal.FAKE_IMAGE_MAGIC is codecs.FAKE_IMAGE_MAGIC
        assert multimodal.FAKE_AUDIO_MAGIC is codecs.FAKE_AUDIO_MAGIC

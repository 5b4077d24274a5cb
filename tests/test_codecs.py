"""Real stdlib codecs: minimal PDF, PNG, WAV round trips."""

import numpy as np
import pytest

from crawl4ai_ray.functions.pdfmini import PdfError, read_pdf, write_pdf
from crawl4ai_ray.functions.pngmini import PngError, read_png, write_png


class TestPng:
    def test_rgb_roundtrip(self):
        img = np.random.RandomState(1).randint(0, 256, (17, 23, 3), dtype=np.uint8)
        assert (read_png(write_png(img)) == img).all()

    def test_rgba_roundtrip(self):
        img = np.random.RandomState(2).randint(0, 256, (5, 9, 4), dtype=np.uint8)
        assert (read_png(write_png(img)) == img).all()

    def test_bad_signature(self):
        with pytest.raises(PngError):
            read_png(b"JFIF not a png")

    def test_crc_checked(self):
        png = bytearray(write_png(np.zeros((2, 2, 3), np.uint8)))
        png[40] ^= 0xFF  # corrupt a body byte inside IDAT
        with pytest.raises(PngError):
            read_png(bytes(png))

    def test_all_filter_types_decode(self):
        # encode with filter 0 then re-filter rows manually (1,2,3,4)
        import struct
        import zlib

        from crawl4ai_ray.functions.pngmini import _SIG, _chunk

        rng = np.random.RandomState(3)
        h, w, ch = 4, 6, 3
        base = rng.randint(0, 256, (h, w, ch), dtype=np.uint8)
        stride = w * ch
        flat = base.reshape(h, stride).astype(np.int32)
        rows = []
        prev = np.zeros(stride, np.int32)

        def paeth(a, b, c):
            p = a + b - c
            pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
            return a if pa_ <= pb and pa_ <= pc_ else (b if pb <= pc_ else c)

        for y, ft in enumerate([1, 2, 3, 4]):
            cur = flat[y]
            enc = cur.copy()
            if ft == 1:
                for i in range(stride - 1, ch - 1, -1):
                    enc[i] = (cur[i] - cur[i - ch]) % 256
            elif ft == 2:
                enc = (cur - prev) % 256
            elif ft == 3:
                for i in range(stride - 1, -1, -1):
                    left = cur[i - ch] if i >= ch else 0
                    enc[i] = (cur[i] - ((left + prev[i]) >> 1)) % 256
            else:
                for i in range(stride - 1, -1, -1):
                    left = cur[i - ch] if i >= ch else 0
                    ul = prev[i - ch] if i >= ch else 0
                    enc[i] = (cur[i] - paeth(left, prev[i], ul)) % 256
            rows.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
            prev = cur
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        png = (
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _chunk(b"IEND", b"")
        )
        assert (read_png(png) == base).all()


class TestWav:
    def test_pcm16_roundtrip(self):
        import io
        import wave

        from crawl4ai_ray.stages.multimodal import WavCodec

        pcm = (np.sin(np.linspace(0, 20, 800)) * 20000).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(pcm.tobytes())
        out = WavCodec().decode_audio(buf.getvalue())
        assert out.shape == (800,)
        assert np.allclose(out, pcm / 32768.0, atol=1e-6)

    def test_stereo_downmix(self):
        import io
        import wave

        from crawl4ai_ray.stages.multimodal import WavCodec

        left = np.full(100, 1000, "<i2")
        right = np.full(100, 3000, "<i2")
        inter = np.empty(200, "<i2")
        inter[0::2], inter[1::2] = left, right
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(inter.tobytes())
        out = WavCodec().decode_audio(buf.getvalue())
        assert out.shape == (100,)
        assert np.allclose(out, 2000 / 32768.0)


class TestRealMediaPipeline:
    def test_image_features_on_real_pngs(self, ray_session):
        import ray.data as rd

        from crawl4ai_ray.stages.multimodal import (
            ImageFeatureStage,
            synth_media_table,
        )

        t = synth_media_table(n=12, width=16, height=16)
        out = (
            rd.from_arrow(t)
            .map_batches(ImageFeatureStage, batch_format="pyarrow",
                         concurrency=2, batch_size=4)
            .to_pandas()
        )
        assert len(out) == 12
        # mean rgb of uniform-random uint8 pixels concentrates near 127
        mr = np.vstack(out["mean_rgb"].to_numpy())
        assert ((mr > 80) & (mr < 175)).all()

    def test_audio_features_on_real_wavs(self, ray_session):
        import ray.data as rd

        from crawl4ai_ray.stages.multimodal import (
            AudioFeatureStage,
            synth_audio_table,
        )

        t = synth_audio_table(n=6)
        out = (
            rd.from_arrow(t)
            .map_batches(AudioFeatureStage, batch_format="pyarrow", concurrency=2)
            .to_pandas()
        )
        assert len(out) == 6
        assert (out["duration_sec"] > 0).all()
        assert (out["rms"] > 0).all()


class TestPdfEdgeCases:
    def test_multi_page_order_via_kids(self):
        pdf = write_pdf([f"page {i}" for i in range(1, 8)])
        out = read_pdf(pdf)
        assert [p["text"] for p in out] == [f"page {i}" for i in range(1, 8)]

    def test_uncompressed_stream_supported(self):
        # hand-build a page whose content stream is NOT Flate-encoded
        content = b"BT /F1 12 Tf 72 720 Td (plain stream) Tj ET"
        body = (
            b"%%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (len(content), content)
        )
        out = read_pdf(body)
        assert out[0]["text"] == "plain stream"

    def test_encrypted_rejected(self):
        with pytest.raises(PdfError):
            read_pdf(b"%PDF-1.4\n/Encrypt 5 0 R\n1 0 obj\n<<>>\nendobj")


class TestMediaDecodeDims:
    """media_decode_dims contract: dims decoded from payload BYTES
    equal the closed-form the SQL oracle recomputes from media_id."""

    def test_image_dims_roundtrip(self):
        from crawl4ai_ray.stages.multimodal import (
            image_dims_batch,
            synth_media_table_dims,
        )

        t = synth_media_table_dims(21)
        out = image_dims_batch(t)
        for i, (a, b) in enumerate(
            zip(out.column("dim_a").to_pylist(), out.column("dim_b").to_pylist())
        ):
            assert a == 16 + (i % 7) * 4
            assert b == 16 + (i % 5) * 4

    def test_audio_dims_roundtrip(self):
        from crawl4ai_ray.stages.multimodal import (
            audio_dims_batch,
            synth_audio_table_dims,
        )

        t = synth_audio_table_dims(13)
        out = audio_dims_batch(t)
        for i, (a, b) in enumerate(
            zip(out.column("dim_a").to_pylist(), out.column("dim_b").to_pylist())
        ):
            assert a == 1024 + (i % 8) * 256
            assert b == 8000 + (i % 4) * 4000

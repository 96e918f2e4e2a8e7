"""Native C++ framer/converter parity with the NumPy reference path."""

import io

import numpy as np
import pytest

from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.runtime import native
from msk144cudecoder_tpu.runtime.stream import window_stream

pytestmark = pytest.mark.skipif(not native.available(), reason="no native lib/toolchain")


class TestNativeFramer:
    def test_audio_framing_matches_python(self):
        s = np.arange(C.WINDOW_LEN * 3 + 123, dtype=np.int16)
        py = list(window_stream(io.BytesIO(s.tobytes()), 1))
        nat = list(native.native_window_stream(io.BytesIO(s.tobytes()), 1, chunk_bytes=997))
        assert len(py) == len(nat)
        for a, b in zip(py, nat):
            np.testing.assert_array_equal(a, b)

    def test_iq_framing_matches_python(self):
        s = (np.arange(C.WINDOW_LEN * 5, dtype=np.int32) % 127).astype(np.int8)
        py = list(window_stream(io.BytesIO(s.tobytes()), 2))
        nat = list(native.native_window_stream(io.BytesIO(s.tobytes()), 2, chunk_bytes=4096))
        assert len(py) == len(nat) >= 2
        for a, b in zip(py, nat):
            np.testing.assert_array_equal(a, b)

    def test_incremental_push_pop(self):
        f = native.NativeFramer(1)
        s = np.arange(C.WINDOW_LEN + C.HOP_LEN, dtype=np.int16).tobytes()
        # drip-feed one byte short of a window, then the rest
        n_first = C.WINDOW_LEN * 2 - 1
        assert f.push(s[:n_first]) == 0
        assert f.pop() is None
        assert f.push(s[n_first:]) == 2
        w0 = f.pop()
        w1 = f.pop()
        assert f.pop() is None
        np.testing.assert_array_equal(
            w1[: C.HOP_LEN], w0[C.HOP_LEN :])  # 50% overlap slide
        assert f.windows_emitted == 2

    def test_bad_read_mode(self):
        with pytest.raises(ValueError):
            native.NativeFramer(3)


class TestNativeConvert:
    def test_int16_rms(self):
        x = np.random.default_rng(0).integers(-3000, 3000, C.WINDOW_LEN).astype(np.int16)
        out, rms = native.convert_int16_rms(x)
        want_rms = np.sqrt(np.mean(x.astype(np.float64) ** 2))
        assert rms == pytest.approx(want_rms, rel=1e-6)
        np.testing.assert_allclose(out, x.astype(np.float32) / want_rms, rtol=1e-5)

    def test_iq8_scale(self):
        iq = np.random.default_rng(1).integers(-128, 128, 256).astype(np.int8)
        np.testing.assert_allclose(native.convert_iq8(iq), iq.astype(np.float32) / 128.0)

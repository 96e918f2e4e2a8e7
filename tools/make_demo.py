"""Generate demo/capture.raw — the synthetic stand-in for the reference's
stripped demo WAV (/root/reference/README.md:70-73, demo/0001.wav listed in
.MISSING_LARGE_BLOBS).

A 6-second 12 kS/s 16-bit mono capture containing three meteor pings at
mixed SNR/frequency/length over a realistic noise floor:

  ~0.4 s  CQ K1ABC FN42     1500 Hz  +8 dB  (strong, short burst)
  ~2.2 s  K1ABC W9XYZ EN37  1485 Hz  +1 dB  (weak, longer: needs averaging)
  ~4.3 s  W9XYZ K1ABC RR73  1520 Hz  +4 dB

Decode it:   cat demo/capture.raw | python -m msk144cudecoder_tpu
Deterministic (fixed seeds): re-running this script reproduces the file
byte for byte.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from msk144cudecoder_tpu import constants as C  # noqa: E402
from msk144cudecoder_tpu import golden as G  # noqa: E402

PINGS = [  # (text, f0_hz, snr_db, start_s, num_frames)
    ("CQ K1ABC FN42", 1500.0, 8.0, 0.40, 5),
    ("K1ABC W9XYZ EN37", 1485.0, 1.0, 2.20, 6),
    ("W9XYZ K1ABC RR73", 1520.0, 4.0, 4.30, 5),
]
SECONDS = 6.0


def main() -> int:
    rng = np.random.default_rng(20260820)
    n = int(SECONDS * C.SAMPLE_RATE)
    t = np.arange(n)
    sig = np.zeros(n, dtype=np.complex128)
    for text, f0, snr, t0, frames in PINGS:
        bb = np.tile(G.modulate_frame(G.frame_bits_from_message(text)), frames)
        amp = np.sqrt(2.0 * 10 ** (snr / 10.0))
        lo = int(t0 * C.SAMPLE_RATE)
        hi = lo + len(bb)
        sig[lo:hi] += amp * bb * np.exp(
            2j * np.pi * f0 * t[lo:hi] / C.SAMPLE_RATE)
    noise_sigma = np.sqrt(0.5 * (C.SAMPLE_RATE / 2) / 2500.0) * np.sqrt(2.0)
    sig += noise_sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = np.clip(np.round(sig.real * 1000.0), -32768, 32767).astype(np.int16)

    out = pathlib.Path(__file__).resolve().parents[1] / "demo" / "capture.raw"
    out.parent.mkdir(exist_ok=True)
    out.write_bytes(audio.tobytes())
    print(f"wrote {out} ({len(audio) * 2} bytes, {SECONDS:g} s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Protocol-layer tests: CRC13, LDPC(128,90), 77-bit message codec."""

import numpy as np
import pytest

from msk144cudecoder_tpu.protocol import crc, ldpc_tables, msg77


class TestCRC13:
    def test_matrix_equals_serial(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            m = rng.integers(0, 2, 77).astype(np.uint8)
            assert (crc.crc13_matrix(m) == crc.crc13_bits(m)).all()

    def test_reference_byte_table_algorithm(self):
        # Transcribed semantics of ldpc_kernel.cuh:32-63 + ldpc_context.cuh:185-213.
        def gen_table():
            table = []
            for i in range(256):
                dividend, rem = i, 0
                for _ in range(8):
                    if dividend & 0x80:
                        rem ^= 1 << 12
                    quotient = rem & (1 << 12)
                    rem = (rem << 1) & 0x3FFF
                    if quotient:
                        rem ^= crc.CRC13_POLY
                    dividend = (dividend << 1) & 0xFF
                table.append(rem & 0x1FFF)
            return table

        T = gen_table()

        def ref_crc(bits77):
            bits = np.zeros(96, dtype=np.uint8)
            bits[:77] = bits77
            rem = 0
            for b in np.packbits(bits)[:12]:
                idx = (rem >> 5) & 0xFF
                rem = ((rem << 8) | int(b)) ^ T[idx]
            return rem & 0x1FFF

        rng = np.random.default_rng(1)
        for _ in range(100):
            m = rng.integers(0, 2, 77).astype(np.uint8)
            mine = int("".join(map(str, crc.crc13_bits(m))), 2)
            assert mine == ref_crc(m)

    def test_attach_and_check(self):
        m = np.random.default_rng(2).integers(0, 2, 77).astype(np.uint8)
        info = crc.attach_crc(m)
        assert info.shape == (90,)
        assert crc.check_crc(info)
        info[3] ^= 1
        assert not crc.check_crc(info)


class TestLDPC:
    def test_structure(self):
        H = ldpc_tables.parity_check_matrix()
        assert H.shape == (38, 128)
        assert (H.sum(axis=0) == 3).all()  # every bit in exactly 3 checks
        deg = H.sum(axis=1)
        assert sorted(np.where(deg == 11)[0].tolist()) == [2, 4, 5, 26]
        assert ((deg == 10) | (deg == 11)).all()
        assert deg.sum() == 384

    def test_nm_mn_consistency(self):
        NM, MN = ldpc_tables.NM, ldpc_tables.MN
        for b in range(128):
            for k in range(3):
                r, slot = MN[b, k]
                assert NM[r, slot] == b

    def test_encode_satisfies_parity(self):
        H = ldpc_tables.parity_check_matrix()
        rng = np.random.default_rng(3)
        for _ in range(20):
            info = rng.integers(0, 2, 90).astype(np.uint8)
            cw = ldpc_tables.encode(info)
            assert cw.shape == (128,)
            assert (cw[:90] == info).all()
            assert ((H @ cw) % 2 == 0).all()


ROUNDTRIP_MESSAGES = [
    "CQ K1ABC FN42",
    "CQ RA9YER MO65",
    "K1ABC W9XYZ EN37",
    "W9XYZ K1ABC -11",
    "K1ABC W9XYZ R-09",
    "W9XYZ K1ABC RRR",
    "K1ABC W9XYZ 73",
    "K1ABC W9XYZ RR73",
    "CQ TEST K1ABC FN42",
    "CQ 001 G4ABC IO91",
    "K1ABC/R W9XYZ EN37",
    "W9XYZ K1ABC/R RR73",
    "K1ABC/P W9XYZ JO22",
    "G4ABC/P PA9XYZ JO22",
    "UA9ABC RA9YER MO65",
    "VK7ABC ZL4XYZ RE68",
    "TNX BOB 73 GL",
    "HELLO WORLD",
    "CQ PJ4/K1ABC",
    "3DA0XYZ K1ABC FN42",
    "3XA1AB K1ABC -05",
    "A45XR W9XYZ +10",
    "K1ABC W9XYZ R FN42",
    "K1ABC W9XYZ RR73",
    "K1ABC W9XYZ RRR",
    "K1ABC W9XYZ 73",
    "CQ DX K1ABC FN42",
    "CQ TEST K1ABC FN42",
    "K1ABC W9XYZ R-07",
    "W9XYZ <PJ4/K1ABC> -11",
    "<PJ4/K1ABC> W9XYZ R-09",
]


class TestMsg77Roundtrip:
    @pytest.mark.parametrize("msg", ROUNDTRIP_MESSAGES)
    def test_roundtrip(self, msg):
        h = msg77.CallsignHashTable()
        bits = msg77.pack77(msg, h)
        assert bits.shape == (77,)
        ok, out = msg77.unpack77(bits, h)
        assert ok, msg
        assert out == msg

    def test_nonstd_hash_pair(self):
        h = msg77.CallsignHashTable()
        bits = msg77.pack77("PJ4/K1ABC W9XYZ RRR", h)
        ok, out = msg77.unpack77(bits, h)
        assert ok
        assert out == "PJ4/K1ABC <W9XYZ> RRR"

    def test_hash_resolution_across_messages(self):
        h = msg77.CallsignHashTable()
        # First hear the nonstandard call in a CQ, then by hash reference.
        ok, out = msg77.unpack77(msg77.pack77("CQ PJ4/K1ABC", h), h)
        assert ok and out == "CQ PJ4/K1ABC"
        bits = msg77.pack77("<PJ4/K1ABC> W9XYZ FN42", h)
        ok, out = msg77.unpack77(bits, h)
        assert ok
        assert out == "<PJ4/K1ABC> W9XYZ FN42"

    def test_unknown_hash_shows_dots(self):
        h_tx = msg77.CallsignHashTable()
        bits = msg77.pack77("<PJ4/K1ABC> W9XYZ FN42", h_tx)
        h_rx = msg77.CallsignHashTable()  # fresh receiver: hash unknown
        ok, out = msg77.unpack77(bits, h_rx)
        assert ok
        assert out == "<...> W9XYZ FN42"

    def test_telemetry(self):
        h = msg77.CallsignHashTable()
        bits = msg77.pack77("123456789ABCDEF", h)
        ok, out = msg77.unpack77(bits, h)
        assert ok and out == "123456789ABCDEF"

    def test_free_text_13_chars(self):
        h = msg77.CallsignHashTable()
        ok, out = msg77.unpack77(msg77.pack77("ABC DEF 12/45", h), h)
        assert ok and out == "ABC DEF 12/45"

    def test_plausibility_filter(self):
        # i3=0/n3=0 free text passes; i3=3 (RTTY) is rejected by the filter.
        free = msg77.pack77("HELLO")
        assert msg77.plausible_message_type(free)
        rtty = np.zeros(77, dtype=np.uint8)
        rtty[74:77] = [0, 1, 1]  # i3 = 3
        assert not msg77.plausible_message_type(rtty)
        tele = msg77.pack77("123456789ABCDEF")
        assert msg77.plausible_message_type(tele)

    def test_callsign_alignment(self):
        assert msg77.std_call_to_6("K1ABC") == " K1ABC"
        assert msg77.std_call_to_6("RA9YER") == "RA9YER"
        assert msg77.std_call_to_6("A45XR") == "A45XR "
        assert msg77.std_call_to_6("KH6ABC") == "KH6ABC"
        assert msg77.std_call_to_6("PJ4/K1ABC") is None

    def test_hash_function_is_stable(self):
        # Known-structure sanity: hashes fit their bit widths and differ.
        calls = ["K1ABC", "W9XYZ", "PJ4/K1ABC", "RA9YER"]
        for m in (10, 12, 22):
            hs = [msg77.ihashcall(c, m) for c in calls]
            assert all(0 <= h < (1 << m) for h in hs)
            assert len(set(hs)) == len(hs)

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

    def test_fuzz_standard_messages(self):
        """Seeded sweep of the standard-message space: random callsign
        shapes x random grid/report/token suffixes must round-trip
        exactly (500 messages)."""
        rng = np.random.default_rng(2024)
        L = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        D = "0123456789"

        def call():
            # no leading Q: Q prefixes are unassigned to any country, and
            # the c28 field reuses them to fold Guinea 3X calls ("3XA.." is
            # 7 chars, packed as "QA.."), so unpack unfolds Q+alpha to 3X
            c = rng.choice(list(L.replace("Q", ""))) \
                + ("" if rng.random() < 0.5 else rng.choice(list(L + D)))
            c += rng.choice(list(D))
            c += "".join(rng.choice(list(L))
                         for _ in range(rng.integers(1, 4)))
            return c

        def suffix():
            r = rng.random()
            if r < 0.25:  # grid4
                return (rng.choice(list(L[:18])) + rng.choice(list(L[:18]))
                        + rng.choice(list(D)) + rng.choice(list(D)))
            if r < 0.4:
                return rng.choice(["RRR", "RR73", "73", ""])
            rpt = int(rng.integers(-30, 33))
            return f"{'+' if rpt >= 0 else '-'}{abs(rpt):02d}"

        for _ in range(500):
            c1 = "CQ" if rng.random() < 0.2 else call()
            sfx = suffix()
            msg = " ".join(t for t in (c1, call(), sfx) if t)
            if sfx == "RR73" and msg.startswith("CQ"):
                pass  # still a valid standard message
            h = msg77.CallsignHashTable()
            bits = msg77.pack77(msg, h)
            ok, out = msg77.unpack77(bits, h)
            assert ok and out == msg, msg

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
        # telemetry displays as 18 hex digits with at most the single
        # leading zero blanked (WSJT-X semantics); shorter TX input is
        # zero-extended on receive, and the 17-digit display still
        # re-packs as telemetry (stripping ALL zeros would re-pack as
        # free text — see EDGE_ANSWER leading-zero vectors)
        h = msg77.CallsignHashTable()
        bits = msg77.pack77("123456789ABCDEF", h)
        ok, out = msg77.unpack77(bits, h)
        assert ok and out == "00123456789ABCDEF"
        assert np.array_equal(msg77.pack77(out, h), bits)
        # value >= 2^68: first digit nonzero, full 18 kept
        bits18 = msg77.pack77("123456789ABCDEF012", h)
        ok, out = msg77.unpack77(bits18, h)
        assert ok and out == "123456789ABCDEF012"

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


# Known-answer vectors derived INDEPENDENTLY of protocol/msg77.py, straight
# from the published WSJT-X 77-bit field tables (c28/g15/g25/h-hash/c58/f71
# encodings re-derived from scratch; see VERDICT round-1 item 2). Each entry:
# (type, message, 77-bit payload as 20 hex digits (MSB-first), hash seeds the
# receive side needs for <call> display). Two vectors per i3/n3 type.
KNOWN_ANSWER = [
    ("0.0", "TNX BOB 73 GL", "0C7DB9DC5495C0FEA000", []),
    ("0.0", "HELLO WORLD/1", "078041603C713988A680", []),
    ("0.1", "K1ABC RR73; W9XYZ <KH1/KH7Z> -08", "0137BC6A185277064AC8",
     ["KH1/KH7Z"]),
    ("0.1", "WA9XYZ RR73; KA1ABC <PJ4/K1ABC> +02", "1CE10DB92B8CA42AD408",
     ["PJ4/K1ABC"]),
    ("0.2", "PA3XYZ/P R 590003 IO91NP", "16F3BE05F0068BAC0710", []),
    ("0.2", "G4ABC 520047 JO22DB", "012182CC005E9AE1C910", []),
    ("0.3", "WA9XYZ KA1ABC R 16A EMA", "1CE10DB92B8CA43F02D8", []),
    ("0.3", "K1ABC W9XYZ 6B WI", "0137BC6A185277053358", []),
    ("0.4", "WA9XYZ KA1ABC R 32A EMA", "1CE10DB92B8CA43F02E0", []),
    ("0.4", "K1ABC W9XYZ 17D SNJ", "0137BC6A1852770070E0", []),
    ("0.5", "123456789ABCDEF012", "048D159E26AF37BC04A8", []),
    ("0.5", "7FFFFFFFFFFFFFFFFF", "1FFFFFFFFFFFFFFFFFE8", []),
    ("1", "CQ K1ABC FN42", "0000000409BDE3514331", []),
    ("1", "K1ABC/R W9XYZ/R R FN42", "0137BC6B0C293B8D4331", []),
    ("1", "K1ABC W9XYZ R-17", "0137BC6A0C293B87F511", []),
    ("1", "K1ABC W9XYZ RR73", "0137BC6A0C293B83F499", []),
    ("2", "PA3XYZ/P G4ABC/P R JO22", "16F3BE05090C166E26B2", []),
    ("2", "G4ABC PA3XYZ/P 73", "012182CCB79DF02BF4A2", []),
    ("3", "TU; W9XYZ K1ABC R 579 MA", "10C293B809BDE35DFAAB", []),
    ("3", "K1ABC W9XYZ 529 0013", "009BDE350C293B80006B", []),
    ("4", "<W9XYZ> PJ4/K1ABC RR73", "1E6200347462395400A4", ["W9XYZ"]),
    ("4", "CQ KH1/KH7Z", "000000011E0D19D8120C", []),
    ("5", "<PA3XYZ> <G4ABC> R 570123 JO22DB", "191655B29E87B4D70E4D",
     ["PA3XYZ", "G4ABC"]),
    ("5", "<G4ABC> <PA3XYZ> 550001 IO91NP", "055B917EF980145D603D",
     ["G4ABC", "PA3XYZ"]),
]

# Edge-case vectors (round-3 VERDICT item 4), derived by the same
# independent script (tools/derive_kat.py derive_edge_answer): the
# RR73-token-vs-grid ambiguity and its neighbor grids, g15 grid/report
# boundary values, CQ modifiers (3-digit and 1..4-letter), 11-character
# nonstandard calls at the c58 limit, iflip, and telemetry with leading
# zeros (which must display as the full 18 digits to stay round-trippable).
EDGE_ANSWER = [
    ("1", "K1ABC W9XYZ RR64", "0137BC6A0C293B83F361", []),
    ("1", "K1ABC W9XYZ R RR74", "0137BC6A0C293B87F3B1", []),
    ("1", "K1ABC W9XYZ RRR", "0137BC6A0C293B83F491", []),
    ("1", "K1ABC W9XYZ 73", "0137BC6A0C293B83F4A1", []),
    ("1", "K1ABC W9XYZ", "0137BC6A0C293B83F489", []),
    ("1", "K1ABC W9XYZ AA00", "0137BC6A0C293B800001", []),
    ("1", "K1ABC W9XYZ RR99", "0137BC6A0C293B83F479", []),
    ("1", "K1ABC W9XYZ -30", "0137BC6A0C293B83F4A9", []),
    ("1", "K1ABC W9XYZ R+32", "0137BC6A0C293B87F699", []),
    ("1", "CQ 000 K1ABC FN42", "0000000609BDE3514331", []),
    ("1", "CQ 999 K1ABC FN42", "000007D409BDE3514331", []),
    ("1", "CQ TEST K1ABC FN42", "000C2BF209BDE3514331", []),
    ("1", "CQ A K1ABC FN42", "0000A19C09BDE3514331", []),
    ("1", "CQ ZZZZ K1ABC FN42", "00103FB609BDE3514331", []),
    ("4", "CQ 3XY1ABCD/MM", "000036DBCB5E0AAB0A8C", []),
    ("4", "<K1ABC> VK9ABCDE/MM 73", "16476B1E216DEFBB4EB4", ["K1ABC"]),
    ("4", "PJ4/K1ABC <W9XYZ> RRR", "1E6200347462395400D4", ["W9XYZ"]),
    ("0.5", "00000000000000001", "00000000000000000068", []),
    ("0.5", "000000000000000FF", "00000000000000003FE8", []),
]

ALL_ANSWER = KNOWN_ANSWER + EDGE_ANSWER


def _hex_to_bits77(hx: str) -> np.ndarray:
    v = int(hx, 16)
    return np.array([(v >> (76 - i)) & 1 for i in range(77)], dtype=np.uint8)


class TestMsg77KnownAnswers:
    @pytest.mark.parametrize("typ,msg,hx,seeds", ALL_ANSWER,
                             ids=[f"{t}-{m[:18]}" for t, m, _, _ in ALL_ANSWER])
    def test_pack_matches_spec(self, typ, msg, hx, seeds):
        bits = msg77.pack77(msg, msg77.CallsignHashTable())
        assert bits.shape == (77,)
        got = "".join(str(int(b)) for b in bits)
        exp = "".join(str(int(b)) for b in _hex_to_bits77(hx))
        assert got == exp, f"{typ} {msg}: packed bits differ from spec"

    @pytest.mark.parametrize("typ,msg,hx,seeds", ALL_ANSWER,
                             ids=[f"{t}-{m[:18]}" for t, m, _, _ in ALL_ANSWER])
    def test_unpack_matches_spec(self, typ, msg, hx, seeds):
        h = msg77.CallsignHashTable()
        for s in seeds:
            h.add(s)
        ok, out = msg77.unpack77(_hex_to_bits77(hx), h)
        assert ok and out == msg

    def test_tables_match_independent_derivation(self):
        """Cross-implementation check: tools/derive_kat.py re-derives every
        vector from the published field tables with no import of msg77; the
        committed literals must match it exactly (VERDICT r3 item 4)."""
        import importlib.util
        import pathlib

        p = pathlib.Path(__file__).resolve().parents[1] / "tools" / "derive_kat.py"
        spec = importlib.util.spec_from_file_location("derive_kat", p)
        dk = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(dk)
        assert [tuple(v) for v in dk.derive_known_answer()] == [
            tuple(v) for v in KNOWN_ANSWER]
        assert [tuple(v) for v in dk.derive_edge_answer()] == [
            tuple(v) for v in EDGE_ANSWER]

    def test_hash_collision_display(self):
        """Two distinct calls with colliding 10-bit hashes (found by
        tools/derive_kat.py find_hash_collision): the table keeps the most
        recently heard call per hash, so the display resolves to it."""
        a, b = "K1AAT", "K1AQJ"
        assert msg77.ihashcall(a, 10) == msg77.ihashcall(b, 10)
        assert msg77.ihashcall(a, 22) != msg77.ihashcall(b, 22)
        h = msg77.CallsignHashTable()
        h.add(a)
        h.add(b)  # most recent wins the h10 slot
        bits = msg77.pack77(f"K1ABC RR73; W9XYZ <{a}> -08",
                            msg77.CallsignHashTable())
        ok, out = msg77.unpack77(bits, h)
        assert ok and out == f"K1ABC RR73; W9XYZ <{b}> -08"

    def test_ihashcall_int64_overflow_semantics(self):
        """The 47055833459*n product overflows int64 for long calls; WSJT-X
        relies on Fortran wraparound then takes the TOP m bits of the 64-bit
        pattern. Exercise a call whose product exceeds 2^63 (n large)."""
        big = "ZZZZZZZZZZZ"  # n = 38^11-ish, max fold value
        n = 0
        for ch in big:
            n = 38 * n + msg77.A_HASH.find(ch)
        prod = (47055833459 * n) % (1 << 64)
        assert 47055833459 * n >= (1 << 64)  # overflow definitely happens
        for m in (10, 12, 22):
            assert msg77.ihashcall(big, m) == prod >> (64 - m)


NEW_TYPE_ROUNDTRIPS = [
    "PA3XYZ/P R 590003 IO91NP",   # 0.2 EU VHF
    "PA3XYZ 520001 JO22DB",       # 0.2, no R, no /P
    "K1ABC W9XYZ 579 WI",         # 3 RTTY state
    "TU; K1ABC W9XYZ R 589 0013", # 3 RTTY TU+R+serial
    "<PA3XYZ> <G4ABC> R 570123 JO22DB",  # 5 EU VHF 6-grid
    "WA9XYZ KA1ABC R 16A EMA",    # 0.3 Field Day
    "WA9XYZ KA1ABC 32A SNJ",      # 0.4 Field Day
    "K1ABC RR73; W9XYZ <KH1/KH7Z> -08",  # 0.1 DXpedition
]


class TestNewTypeRoundtrips:
    @pytest.mark.parametrize("msg", NEW_TYPE_ROUNDTRIPS)
    def test_roundtrip(self, msg):
        h = msg77.CallsignHashTable()
        bits = msg77.pack77(msg, h)
        ok, out = msg77.unpack77(bits, h)
        assert ok and out == msg

    def test_type_02_admitted_by_reference_gate(self):
        bits = msg77.pack77("PA3XYZ/P R 590003 IO91NP")
        assert msg77.plausible_message_type(bits)

    def test_gated_types_rejected_like_reference(self):
        # decode_softbits.cpp:29 drops 0.1/0.3/0.4 and i3=3 before unpack
        for msg in ("K1ABC RR73; W9XYZ <KH1/KH7Z> -08",
                    "WA9XYZ KA1ABC R 16A EMA",
                    "K1ABC W9XYZ 579 WI"):
            assert not msg77.plausible_message_type(msg77.pack77(msg))


class TestBoundedHashTable:
    def test_fifo_eviction_at_cap(self, monkeypatch):
        monkeypatch.setattr(msg77, "HASH_TABLE_MAX", 8)
        h = msg77.CallsignHashTable()
        calls = [f"K{i}ABC" for i in range(1, 13)]  # 12 distinct calls
        for c in calls:
            h.add(c)
        assert len(h.h22) <= 8
        # the most recent calls survive, the oldest were evicted
        assert h.lookup(h.h22, msg77.ihashcall("K12ABC", 22)) == "<K12ABC>"
        assert h.lookup(h.h22, msg77.ihashcall("K1ABC", 22)) == "<...>"

    def test_readd_refreshes_age(self, monkeypatch):
        monkeypatch.setattr(msg77, "HASH_TABLE_MAX", 4)
        h = msg77.CallsignHashTable()
        for c in ("K1ABC", "W2DEF", "N3GHI", "K4JKL"):
            h.add(c)
        h.add("K1ABC")  # refresh: K1ABC becomes newest
        h.add("W5MNO")  # evicts W2DEF (now the oldest), not K1ABC
        assert h.lookup(h.h22, msg77.ihashcall("K1ABC", 22)) == "<K1ABC>"
        assert h.lookup(h.h22, msg77.ihashcall("W2DEF", 22)) == "<...>"

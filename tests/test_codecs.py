"""Codec round-trip + property tests (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from vault_8_hive_spark.functions.codecs import (
    crc16,
    decode_beacon,
    embed_size,
    encode_beacon,
    extract_size,
    session_key_from_reply,
    xtea_decrypt,
    xtea_encrypt,
)

KEY = hashlib.md5(b"test-key").digest()


@given(st.binary(min_size=0, max_size=256))
@settings(max_examples=200)
def test_xtea_roundtrip(data):
    ct = xtea_encrypt(data, KEY)
    assert len(ct) % 8 == 0
    pt = xtea_decrypt(ct, KEY)
    assert pt[: len(data)] == data  # zero padding beyond


@given(st.integers(min_value=0, max_value=10**12), st.binary(min_size=64, max_size=64))
def test_size_embed_roundtrip(size, preamble):
    assert extract_size(embed_size(size, preamble)) == size


@given(st.binary(min_size=37, max_size=37))
def test_session_key_extract(reply):
    k = session_key_from_reply(reply)
    assert len(k) == 16
    off = (reply[0] ^ 5) % 15
    assert k == reply[off + 1 : off + 17]


def test_crc16_known_vector():
    # CRC-16/CCITT-FALSE of "123456789" is the published check value 0x29B1
    assert crc16(b"123456789") == 0x29B1


@given(st.binary(min_size=1, max_size=64))
def test_crc16_detects_single_bit_flip(data):
    orig = crc16(data)
    flipped = bytes([data[0] ^ 0x01]) + data[1:]
    assert crc16(flipped) != orig


mac_st = st.from_regex(r"[0-9a-f]{2}(-[0-9a-f]{2}){5}", fullmatch=True)
text_st = st.none() | st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
)


@given(
    version=st.integers(min_value=1, max_value=29),
    os=st.sampled_from([0, 20, 21, 31, 40, 41, 42, 43, 50, 60, 61]),
    mac=mac_st,
    uptime=st.integers(min_value=0, max_value=2**40),
    nxt=st.integers(min_value=1, max_value=86400),
    proc=text_st,
    ipc=text_st,
    rn=text_st,
    an=text_st,
)
@settings(max_examples=100, deadline=None)
def test_beacon_roundtrip_property(version, os, mac, uptime, nxt, proc, ipc, rn, an):
    """encode -> decode is the identity on every field, across the
    compressed (>=23) and uncompressed (<23) version branches and with
    any subset of absent TLV sections."""
    rec = {
        "beacon_id": 0,
        "version": version,
        "os": os,
        "mac": mac,
        "uptime_s": uptime,
        "next_beacon_s": nxt,
        "proc_list": proc,
        "ipconfig": ipc,
        "netstat_rn": rn,
        "netstat_an": an,
    }
    out = decode_beacon(encode_beacon(rec, KEY), KEY)
    assert out["version"] == version
    assert out["os"] == os
    assert out["mac"] == mac
    assert out["uptime_s"] == uptime
    assert out["next_beacon_s"] == nxt
    assert out["proc_list"] == proc
    assert out["ipconfig"] == ipc
    assert out["netstat_rn"] == rn
    assert out["netstat_an"] == an


@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=0, max_value=65535),
    st.binary(min_size=20, max_size=20),
)
@settings(max_examples=200, deadline=None)
def test_trigger_roundtrip_property(seed, addr, port, kh):
    from vault_8_hive_spark.functions.codecs import decode_trigger, encode_trigger

    blob = encode_trigger(seed, addr, port, kh)
    assert len(blob) == 29
    d = decode_trigger(blob)
    assert d["crc_ok"] is True
    assert d["seed"] == seed
    assert d["callback_port"] == port
    assert d["key_hash_hex"] == kh.hex()
    assert d["callback_ip"] == ".".join(str((addr >> s) & 0xFF) for s in (24, 16, 8, 0))


_ip_st = st.tuples(*[st.integers(0, 255)] * 4).map(lambda t: ".".join(map(str, t)))


@given(
    payload=st.binary(min_size=0, max_size=512),
    beacon_ip=st.none() | _ip_st,
    dst_ip=st.none() | _ip_st,
    proxy_ip=st.none() | _ip_st,
    proxy_id=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=200, deadline=None)
def test_bthp_roundtrip_property(payload, beacon_ip, dst_ip, proxy_ip, proxy_id):
    """BTHP envelope encode -> decode is the identity on the payload and
    every sub-header field, for any subset of present IPs."""
    from vault_8_hive_spark.functions.codecs import decode_bthp, encode_bthp

    blob = encode_bthp(
        payload, beacon_ip=beacon_ip, dst_ip=dst_ip, proxy_ip=proxy_ip, proxy_id=proxy_id
    )
    env, inner = decode_bthp(blob)
    assert inner == payload
    assert env["beacon_ip"] == beacon_ip
    assert env["dst_ip"] == dst_ip
    assert env["proxy_ip"] == proxy_ip
    assert env["proxy_id"] == proxy_id
    assert env["bytecount"] == len(payload)


def test_fixture_blob_full_chain():
    """Envelope + beacon chain: encode_fixture_blob -> decode_bthp ->
    decode_beacon recovers every fixture field (the pipeline from_hive_beacon
    runs per row)."""
    from vault_8_hive_spark.functions.codecs import decode_beacon, decode_bthp
    from vault_8_hive_spark.sources.beacons import (
        FIXTURE_KEY,
        encode_fixture_blob,
        make_fixture_records,
    )

    for rec in make_fixture_records(n=25):
        env, inner = decode_bthp(encode_fixture_blob(rec))
        assert env["beacon_ip"] == rec["beacon_ip"]
        assert env["proxy_ip"] == rec["proxy_ip"]
        assert env["bytecount"] == len(inner)
        d = decode_beacon(inner, FIXTURE_KEY)
        assert d["mac"] == rec["mac"]
        assert d["os"] == rec["os"]
        assert d["proc_list"] == rec["proc_list"]


def test_dialect_renderers_cover_all_families():
    """Every OS code maps to a dialect and the rendered telemetry carries
    the dialect's parse markers (the LP's dispatch cues)."""
    from vault_8_hive_spark.functions.codecs import OS_NAMES
    from vault_8_hive_spark.sources.beacons import (
        dialect_of,
        render_ifconfig,
        render_routes,
    )

    markers = {
        "linux": ("Link encap", "inet addr:"),
        "solaris": ("<", "\tinet ", "\tether "),
        "mikrotik": (": <", "HW addr:\t", "inet addr:\t"),
    }
    seen = set()
    for code in OS_NAMES:
        d = dialect_of(code)
        seen.add(d)
        ifc = render_ifconfig(d, "10.1.2.3", "aa-bb-cc-dd-ee-ff")
        for m in markers[d]:
            assert m in ifc, (d, m)
        rt = render_routes(d, "10.1.2.1", "10.1.2")
        assert "UG" in rt
        if d == "solaris":
            assert rt.startswith("default ")
        elif d == "mikrotik":
            assert rt.startswith(" 0.0.0.0 ")
        else:
            assert rt.startswith("0.0.0.0 ")
    assert seen == {"linux", "solaris", "mikrotik"}


@given(st.integers(min_value=1, max_value=28), st.integers(min_value=1, max_value=255))
@settings(max_examples=100, deadline=None)
def test_trigger_corruption_detected(pos, flip):
    """Any single-byte corruption of the obfuscated body must fail the CRC
    (or, for byte 0, change the seed and thus scramble the body)."""
    from vault_8_hive_spark.functions.codecs import decode_trigger, encode_trigger

    blob = encode_trigger(90, 0x0A00020F, 4444, b"\x11" * 20)
    bad = blob[:pos] + bytes([blob[pos] ^ flip]) + blob[pos + 1 :]
    assert decode_trigger(bad)["crc_ok"] is False

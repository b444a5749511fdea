"""Fixture codecs for the reference's wire formats (SURVEY.md §1, §2A).

These reimplement — from the surveyed record-format *specifications*, not
from reference code — the codec chain a Hive listening post applies to a
beacon record:

    TLV sections -> bzip2 (version >= 23) -> BEACON_HDR prepend -> XTEA-ECB

Provenance (spec only; cited for parity checking):
- BEACON_HDR {u16 version, u16 os} + TLV {u16 type, u16 len} sections,
  types 1..7, zero-TLV terminator: reference server/beacon.h:34-77,
  server/beacon.c:200-458.
- bzip2 only when version >= 23: honeycomb/honeycomb.py:209-213.
- XTEA-ECB over 8-byte blocks, zero-padded: server/beacon.c:620-653.
- session-key extraction offset=(b[0]^5)%15, 16 bytes at offset+1 from the
  37-byte LP reply: server/beacon.c:669-678.
- XOR-masked ASCII size embedded in a 64-byte random preamble:
  server/beacon.c:77-94.
- CRC16 (CCITT polynomial) over trigger payloads: server/tiny_crc16.c.

All functions are pure Python: they exist to generate/validate fixtures
and to back the `from_hive_beacon` parsing UDF (sources/beacons.py). The
engine never performs any operational function of the reference — these
are record-format parsers only (SURVEY.md §0 scope guard).
"""

from __future__ import annotations

import bz2
import struct

# TLV section type codes (server/beacon.h:34-41)
T_MAC = 1
T_UPTIME = 2
T_PROCESS_LIST = 3
T_IPCONFIG = 4
T_NETSTAT_RN = 5
T_NETSTAT_AN = 6
T_NEXT_BEACON_TIME = 7

_DELTA = 0x9E3779B9
_MASK = 0xFFFFFFFF


def xtea_encrypt_block(v0: int, v1: int, key: tuple[int, int, int, int]) -> tuple[int, int]:
    s = 0
    for _ in range(32):
        v0 = (v0 + (((v1 << 4 ^ v1 >> 5) + v1) ^ (s + key[s & 3]))) & _MASK
        s = (s + _DELTA) & _MASK
        v1 = (v1 + (((v0 << 4 ^ v0 >> 5) + v0) ^ (s + key[(s >> 11) & 3]))) & _MASK
    return v0, v1


def xtea_decrypt_block(v0: int, v1: int, key: tuple[int, int, int, int]) -> tuple[int, int]:
    s = (_DELTA * 32) & _MASK
    for _ in range(32):
        v1 = (v1 - (((v0 << 4 ^ v0 >> 5) + v0) ^ (s + key[(s >> 11) & 3]))) & _MASK
        s = (s - _DELTA) & _MASK
        v0 = (v0 - (((v1 << 4 ^ v1 >> 5) + v1) ^ (s + key[s & 3]))) & _MASK
    return v0, v1


def _key_words(key16: bytes) -> tuple[int, int, int, int]:
    if len(key16) != 16:
        raise ValueError("XTEA key must be 16 bytes")
    return struct.unpack(">4I", key16)


def xtea_encrypt(data: bytes, key16: bytes) -> bytes:
    """XTEA-ECB, zero-padded to 8-byte blocks (pad survives; the embedded
    TLV terminator lets the decoder ignore trailing zeros)."""
    key = _key_words(key16)
    if len(data) % 8:
        data = data + b"\x00" * (8 - len(data) % 8)
    out = bytearray()
    for i in range(0, len(data), 8):
        v0, v1 = struct.unpack(">2I", data[i : i + 8])
        out += struct.pack(">2I", *xtea_encrypt_block(v0, v1, key))
    return bytes(out)


def xtea_decrypt(data: bytes, key16: bytes) -> bytes:
    key = _key_words(key16)
    if len(data) % 8:
        raise ValueError("ciphertext not 8-byte aligned")
    out = bytearray()
    for i in range(0, len(data), 8):
        v0, v1 = struct.unpack(">2I", data[i : i + 8])
        out += struct.pack(">2I", *xtea_decrypt_block(v0, v1, key))
    return bytes(out)


def session_key_from_reply(reply37: bytes) -> bytes:
    """Key schedule of the LP's 37-byte random reply: offset=(b0^5)%15,
    key = 16 bytes starting at offset+1."""
    if len(reply37) < 31:
        # worst-case offset is 14, so 14 + 1 + 16 = 31 bytes must exist
        raise ValueError("reply too short (need >= 31 bytes)")
    off = (reply37[0] ^ 5) % 15
    return reply37[off + 1 : off + 17]


def embed_size(size: int, preamble64: bytes) -> bytes:
    """Mask the ASCII decimal size into bytes 1..N of a 64-byte preamble by
    XOR with the preamble's first byte (format per spec: xor-masked ASCII
    digits, NUL-terminated)."""
    if len(preamble64) != 64:
        raise ValueError("preamble must be 64 bytes")
    digits = str(int(size)).encode()
    if len(digits) > 20:
        raise ValueError("size too large")
    mask = preamble64[0]
    body = bytearray(preamble64)
    for i, d in enumerate(digits):
        body[1 + i] = d ^ mask
    body[1 + len(digits)] = 0 ^ mask
    return bytes(body)


def extract_size(preamble64: bytes) -> int:
    mask = preamble64[0]
    digits = bytearray()
    for i in range(1, 22):
        b = preamble64[i] ^ mask
        if b == 0:
            break
        digits.append(b)
    return int(digits.decode())


def crc16(data: bytes, poly: int = 0x1021, init: int = 0xFFFF) -> int:
    """CRC-16/CCITT-FALSE — the validation checksum family used for the
    trigger-payload fixtures."""
    crc = init
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# --- trigger payload (D2) fixture codec ------------------------------------
# Record shape per the reference's Payload struct (server/trigger_payload.h:
# 32-39): {u8 seed, u32 callback_addr, u16 callback_port, u8[20] idKey_hash,
# u16 crc} = 29 packed network-order bytes; deobfuscate-then-CRC-validate
# flow per server/trigger_payload.c:96-133. Fixture simplification: the
# keystream is the seed byte repeated (the analytics engine needs the
# record SHAPE and a validatable checksum, not protocol fidelity).


def encode_trigger(seed: int, callback_addr: int, callback_port: int, key_hash20: bytes) -> bytes:
    """Pack + seed-XOR a 29-byte trigger payload; CRC16 over the clear body."""
    import struct

    body = struct.pack(">IH20s", callback_addr, callback_port, key_hash20)
    clear = body + struct.pack(">H", crc16(body))
    return bytes([seed]) + bytes(b ^ seed for b in clear)


def decode_trigger(blob: bytes) -> dict:
    """Deobfuscate + parse + CRC-validate a trigger payload blob."""
    import struct

    if len(blob) != 29:
        return {"seed": None, "callback_ip": None, "callback_port": None,
                "key_hash_hex": None, "crc_ok": False}
    seed = blob[0]
    clear = bytes(b ^ seed for b in blob[1:])
    addr, port, kh = struct.unpack(">IH20s", clear[:26])
    (crc,) = struct.unpack(">H", clear[26:28])
    return {
        "seed": seed,
        "callback_ip": ".".join(str((addr >> s) & 0xFF) for s in (24, 16, 8, 0)),
        "callback_port": port,
        "key_hash_hex": kh.hex(),
        "crc_ok": crc16(clear[:26]) == crc,
    }


# --- BTHP proxy envelope ----------------------------------------------------
# Record shape per the LP's proxy transport (reference honeycomb/honeycomb.py:
# 67-68 declares the formats, :138-183 the parse): outer header '>BBHII'
# {ver, type, hdrLen, dataLen, proxyId}, then a chain of '>BB' {type, len}
# additional headers carrying 4-byte inet addresses (2 = beacon_ip,
# 3 = dst_ip, 6 = proxy_ip), terminated by type=0,len=0; the encapsulated
# beacon payload follows.

BTHP_HDR_FMT = ">BBHII"
BTHP_ADDL_FMT = ">BB"
BTHP_T_BEACON_IP = 2
BTHP_T_DST_IP = 3
BTHP_T_PROXY_IP = 6


def _ip_bytes(ip: str) -> bytes:
    parts = [int(o) for o in ip.split(".")]
    if len(parts) != 4 or any(not 0 <= p <= 255 for p in parts):
        raise ValueError(f"bad IPv4 {ip!r}")
    return bytes(parts)


def _ip_str(b: bytes) -> str:
    return ".".join(str(x) for x in b)


def encode_bthp(
    payload: bytes,
    beacon_ip: str | None = None,
    dst_ip: str | None = None,
    proxy_ip: str | None = None,
    proxy_id: int = 1,
    ver: int = 1,
    typ: int = 1,
) -> bytes:
    """Wrap a beacon payload in a BTHP proxy envelope."""
    addl = bytearray()
    for t, ip in (
        (BTHP_T_BEACON_IP, beacon_ip),
        (BTHP_T_DST_IP, dst_ip),
        (BTHP_T_PROXY_IP, proxy_ip),
    ):
        if ip is not None:
            addl += struct.pack(BTHP_ADDL_FMT, t, 4) + _ip_bytes(ip)
    addl += struct.pack(BTHP_ADDL_FMT, 0, 0)
    hdr_len = struct.calcsize(BTHP_HDR_FMT) + len(addl)
    return (
        struct.pack(BTHP_HDR_FMT, ver, typ, hdr_len, len(payload), proxy_id)
        + bytes(addl)
        + payload
    )


def decode_bthp(blob: bytes) -> tuple[dict, bytes]:
    """Parse the BTHP envelope; returns (envelope fields, inner payload)."""
    ver, typ, _hdr_len, data_len, proxy_id = struct.unpack_from(BTHP_HDR_FMT, blob, 0)
    off = struct.calcsize(BTHP_HDR_FMT)
    out: dict = {
        "bthp_ver": ver,
        "bthp_type": typ,
        "proxy_id": proxy_id,
        "bytecount": data_len,
        "beacon_ip": None,
        "dst_ip": None,
        "proxy_ip": None,
    }
    while True:
        t, ln = struct.unpack_from(BTHP_ADDL_FMT, blob, off)
        off += struct.calcsize(BTHP_ADDL_FMT)
        if t == 0 and ln == 0:
            break
        val = blob[off : off + ln]
        off += ln
        if t == BTHP_T_BEACON_IP:
            out["beacon_ip"] = _ip_str(val)
        elif t == BTHP_T_DST_IP:
            out["dst_ip"] = _ip_str(val)
        elif t == BTHP_T_PROXY_IP:
            out["proxy_ip"] = _ip_str(val)
    return out, blob[off : off + data_len]


# --- beacon record ---------------------------------------------------------


def encode_beacon(rec: dict, key16: bytes) -> bytes:
    """dict -> wire bytes (TLV -> bz2 if version>=23 -> hdr -> XTEA)."""
    version = int(rec["version"])
    sections = bytearray()

    def tlv(t: int, payload: bytes) -> None:
        sections.extend(struct.pack(">2H", t, len(payload)))
        sections.extend(payload)

    if rec.get("mac") is not None:
        tlv(T_MAC, rec["mac"].encode())
    if rec.get("uptime_s") is not None:
        tlv(T_UPTIME, str(int(rec["uptime_s"])).encode())
    if rec.get("proc_list") is not None:
        tlv(T_PROCESS_LIST, rec["proc_list"].encode())
    if rec.get("ipconfig") is not None:
        tlv(T_IPCONFIG, rec["ipconfig"].encode())
    if rec.get("netstat_rn") is not None:
        tlv(T_NETSTAT_RN, rec["netstat_rn"].encode())
    if rec.get("netstat_an") is not None:
        tlv(T_NETSTAT_AN, rec["netstat_an"].encode())
    if rec.get("next_beacon_s") is not None:
        tlv(T_NEXT_BEACON_TIME, str(int(rec["next_beacon_s"])).encode())
    tlv(0, b"")  # terminator

    body = bytes(sections)
    if version >= 23:
        body = bz2.compress(body, 9)
    plain = struct.pack(">2H", version, int(rec["os"])) + body
    return xtea_encrypt(plain, key16)


def decode_beacon(blob: bytes, key16: bytes) -> dict:
    """wire bytes -> dict (the pure-python reference for from_hive_beacon)."""
    plain = xtea_decrypt(blob, key16)
    version, os_code = struct.unpack(">2H", plain[:4])
    body = plain[4:]
    if version >= 23:
        body = bz2.decompress(body)
    out: dict = {
        "version": version,
        "os": os_code,
        "mac": None,
        "uptime_s": None,
        "next_beacon_s": None,
        "proc_list": None,
        "ipconfig": None,
        "netstat_rn": None,
        "netstat_an": None,
    }
    i = 0
    while i + 4 <= len(body):
        t, ln = struct.unpack(">2H", body[i : i + 4])
        i += 4
        if t == 0:
            break
        payload = body[i : i + ln]
        i += ln
        if t == T_MAC:
            out["mac"] = payload.decode()
        elif t == T_UPTIME:
            out["uptime_s"] = int(payload.decode())
        elif t == T_NEXT_BEACON_TIME:
            out["next_beacon_s"] = int(payload.decode())
        elif t == T_PROCESS_LIST:
            out["proc_list"] = payload.decode()
        elif t == T_IPCONFIG:
            out["ipconfig"] = payload.decode()
        elif t == T_NETSTAT_RN:
            out["netstat_rn"] = payload.decode()
        elif t == T_NETSTAT_AN:
            out["netstat_an"] = payload.decode()
    return out


# OS code -> name enrichment (server/beacon.h:20-32 value set:
# BH_UNDEFINED=0, BH_WINDOWS=10, BH_LINUX_X86=20, BH_LINUX_X86_64=21,
# BH_SOLARIS_SPARC=30, BH_SOLARIS_X86=31, BH_MIKROTIK_MIPS=40,
# BH_MIKROTIK_MIPSEL=41, BH_MIKROTIK_X86=42, BH_MIKROTIK_PPC=43,
# BH_UBIQUITI_MIPS=50, BH_ARM=60, BH_AVTECH_ARM=61)
OS_NAMES = {
    0: "undefined",
    10: "windows",
    20: "linux-x86",
    21: "linux-x86_64",
    30: "solaris-sparc",
    31: "solaris-x86",
    40: "mikrotik-mips",
    41: "mikrotik-mipsel",
    42: "mikrotik-x86",
    43: "mikrotik-ppc",
    50: "ubiquiti-mips",
    60: "arm",
    61: "avtech-arm",
}

"""Network-domain scalar helpers (SURVEY.md §2B scalar:net row).

All pure Column expressions (no UDFs): MAC normalization across the wire
formats the reference emits/parses (dash `aa-bb-..` per beacon.c:657-666,
colon `aa:bb:..`, bare `AABB..`, Cisco dotted `aabb.ccdd.eeff`), and IPv4
prefix keys for the longest-prefix-match join family.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mac_normalize(col: Column | str) -> Column:
    """Any common MAC format -> canonical lowercase `aa-bb-cc-dd-ee-ff`;
    returns NULL for strings that don't contain exactly 12 hex digits."""
    c = F.col(col) if isinstance(col, str) else col
    hexonly = F.lower(F.regexp_replace(c, "[^0-9a-fA-F]", ""))
    pairs = F.concat_ws(
        "-", *[F.substring(hexonly, i * 2 + 1, 2) for i in range(6)]
    )
    return F.when(F.length(hexonly) == 12, pairs).otherwise(F.lit(None))


def ip_prefix(col: Column | str, octets: int) -> Column:
    """First N octets of a dotted IPv4 as a join key ('10.1.2' for /24)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(".", *[F.split(c, "\\.").getItem(i) for i in range(octets)])


def ip_in_prefix(ip: Column | str, prefix_ip: Column | str, bits: int) -> Column:
    """True if `ip` falls in prefix_ip/bits (bits in {8,16,24,32})."""
    if bits not in (8, 16, 24, 32):
        raise ValueError("octet-aligned prefixes only: bits in {8,16,24,32}")
    n = bits // 8
    return ip_prefix(ip, n) == ip_prefix(prefix_ip, n)

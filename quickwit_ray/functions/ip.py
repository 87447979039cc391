"""IP address field support (field type `ip`, reference IpAddr):
addresses normalize to their IPv6-mapped EXPLODED form (fixed-width hex
string), whose lexicographic order equals numeric order — so string fast
fields give correct equality and range semantics for mixed v4/v6 data.
"""

from __future__ import annotations

import ipaddress

import numpy as np


def normalize_ip(value: str) -> str:
    addr = ipaddress.ip_address(str(value).strip())
    if isinstance(addr, ipaddress.IPv4Address):
        addr = ipaddress.IPv6Address("::ffff:" + str(addr))
    return addr.exploded


def normalize_ips(values) -> np.ndarray:
    out = np.empty(len(values), object)
    for i, v in enumerate(values):
        if v is None or v == "":
            out[i] = None
            continue
        try:
            out[i] = normalize_ip(v)
        except ValueError:
            out[i] = None
    return out

"""Versioned binary container for filter/sketch blobs.

The reference documents field-level serialization only (struct fields +
raw fingerprint bytes, `[U README.md §Serialization]`); for a
distributed engine we need a self-describing blob that can live in a
DataFrame BinaryType column, be broadcast, checkpointed to parquet and
merged. Layout (little-endian):

    magic   4s   b"FFSK"
    version u16  format version (1)
    kind    u16  FilterKind
    header  u32  length of the json-encoded params dict
    params  utf-8 json (geometry ints, seed, n, width, ...)
    payload raw bytes (numpy array dumps, kind-specific)
"""

from __future__ import annotations

import json
import struct
from typing import Any, Dict, Tuple

MAGIC = b"FFSK"
VERSION = 1

KIND_BINARY_FUSE = 1
KIND_XOR = 2
KIND_XOR_PLUS = 3
KIND_BLOOM = 4
KIND_HLL = 5
KIND_CMS = 6
KIND_KLL = 7
KIND_TDIGEST = 8
KIND_THETA = 9
KIND_CUCKOO = 10
KIND_MG = 11
KIND_FUSE = 12
KIND_BLOCKED_BLOOM = 13


def pack(kind: int, params: Dict[str, Any], payload: bytes) -> bytes:
    pjson = json.dumps(params, separators=(",", ":"), sort_keys=True).encode()
    return MAGIC + struct.pack("<HHI", VERSION, kind, len(pjson)) + pjson + payload


def unpack(blob: bytes) -> Tuple[int, Dict[str, Any], bytes]:
    if blob[:4] != MAGIC:
        raise ValueError("not an FFSK blob")
    version, kind, plen = struct.unpack_from("<HHI", blob, 4)
    if version != VERSION:
        raise ValueError(f"unsupported FFSK version {version}")
    off = 12
    params = json.loads(blob[off : off + plen].decode())
    return kind, params, blob[off + plen :]

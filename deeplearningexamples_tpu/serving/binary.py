"""Binary tensor framing for the inference server.

JSON tensor transport costs ~2s for an image-sized payload on one host core;
this is the KServe-binary-extension analogue: a frame is

    [4-byte little-endian header length][JSON header][raw buffers...]

header = {"tensors": [{"name", "dtype", "shape", "nbytes"}, ...]} with the
raw buffers concatenated in header order (C-contiguous).
"""

from __future__ import annotations

import json
import struct
from typing import Mapping

import numpy as np

__all__ = ["encode_tensors", "decode_tensors", "CONTENT_TYPE"]

CONTENT_TYPE = "application/x-dlx-tensor"


def encode_tensors(tensors: Mapping[str, np.ndarray]) -> bytes:
    metas, bufs = [], []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        metas.append(
            {"name": name, "dtype": str(arr.dtype), "shape": list(arr.shape),
             "nbytes": arr.nbytes}
        )
        bufs.append(arr.tobytes())
    header = json.dumps({"tensors": metas}).encode()
    return struct.pack("<I", len(header)) + header + b"".join(bufs)


def decode_tensors(payload: bytes) -> dict[str, np.ndarray]:
    if len(payload) < 4:
        raise ValueError("truncated tensor frame")
    (hlen,) = struct.unpack("<I", payload[:4])
    if 4 + hlen > len(payload):
        raise ValueError("truncated tensor header")
    header = json.loads(payload[4 : 4 + hlen])
    out = {}
    off = 4 + hlen
    for meta in header["tensors"]:
        n = int(meta["nbytes"])
        if off + n > len(payload):
            raise ValueError(f"truncated tensor body for {meta['name']!r}")
        arr = np.frombuffer(payload[off : off + n], dtype=meta["dtype"])
        out[meta["name"]] = arr.reshape(meta["shape"])
        off += n
    return out

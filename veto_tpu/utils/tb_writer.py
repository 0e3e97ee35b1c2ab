"""Dependency-free TensorBoard scalar event writer.

The reference logs scalars to TensorBoard via torch's SummaryWriter
(reference utils/logger.py + relation_train_net.py meters).  This
environment has no tensorboard package, so this module hand-encodes the
two protos a scalar stream needs — Event{wall_time, step,
summary{value{tag, simple_value}}} — and frames them in the TFRecord
format (length + masked-crc32c(length) + payload + masked-crc32c(payload))
that TensorBoard reads.  ~90 lines, stdlib only; files open fine in any
TensorBoard build.
"""

from __future__ import annotations

import os
import struct
import time
from typing import Optional

__all__ = ["TBWriter"]

# ---- crc32c (software, table-driven) --------------------------------------

_POLY = 0x82F63B78
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (_POLY if _c & 1 else 0)
    _TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


# ---- minimal protobuf encoding ---------------------------------------------

def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _double(num: int, v: float) -> bytes:
    return _field(num, 1) + struct.pack("<d", v)


def _float(num: int, v: float) -> bytes:
    return _field(num, 5) + struct.pack("<f", v)


def _int64(num: int, v: int) -> bytes:
    return _field(num, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _scalar_event(tag: str, value: float, step: int,
                  wall_time: float) -> bytes:
    # Summary.Value: tag=1 (string), simple_value=2 (float)
    sval = _len_delim(1, tag.encode()) + _float(2, float(value))
    # Summary: value=1 (repeated message)
    summary = _len_delim(1, sval)
    # Event: wall_time=1 (double), step=2 (int64), summary=5 (message)
    return _double(1, wall_time) + _int64(2, int(step)) + _len_delim(
        5, summary)


def _record(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", _masked_crc(header))
            + payload + struct.pack("<I", _masked_crc(payload)))


class TBWriter:
    """Append-only scalar event file (``events.out.tfevents.*``)."""

    def __init__(self, log_dir: str, suffix: str = ""):
        os.makedirs(log_dir, exist_ok=True)
        fname = (f"events.out.tfevents.{int(time.time())}."
                 f"{os.uname().nodename}{suffix}")
        self._path = os.path.join(log_dir, fname)
        self._f = open(self._path, "ab")
        # file-version header event (TensorBoard expects it first)
        ver = _double(1, time.time()) + _len_delim(3, b"brain.Event:2")
        self._f.write(_record(ver))
        self._f.flush()

    @property
    def path(self) -> str:
        return self._path

    def add_scalar(self, tag: str, value: float, step: int,
                   wall_time: Optional[float] = None) -> None:
        ev = _scalar_event(tag, value, step, wall_time or time.time())
        self._f.write(_record(ev))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()

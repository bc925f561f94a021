"""Pure-Python TensorBoard scalar event writer.

Replaces torch.utils.tensorboard.SummaryWriter in the training runtime so
torch is needed only for checkpoint interop (VERDICT weak #9): writes
tfevents files directly — TFRecord framing with masked CRC32C and
hand-encoded Event/Summary protobuf messages (only the scalar fields the
MetricRecorder emits; reference metric_recorder.py:236-259 logs scalars
only). Readable by standard TensorBoard.

Wire format:
    record  = uint64le(len) crc32c(len) data crc32c(data)   # masked CRCs
    Event   = 1: wall_time (double), 2: step (int64),
              3: file_version (string) | 5: summary (Summary)
    Summary = repeated 1: Value{1: tag (string), 2: simple_value (float)}
"""

from __future__ import annotations

import os
import socket
import struct
import time
from pathlib import Path

_CRC_TABLE = []


def _make_table() -> None:
    poly = 0x82F63B78  # CRC-32C (Castagnoli), reflected
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        _CRC_TABLE.append(c)


_make_table()


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def _varint(n: int) -> bytes:
    if n < 0:
        # protobuf int64: negative values are two's-complement 64-bit
        # (10-byte varint); Python's arithmetic shift on a negative int
        # never reaches 0 and would loop forever
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _encode_event(
    wall_time: float,
    step: int = 0,
    file_version: str | None = None,
    scalars: dict | None = None,
) -> bytes:
    msg = bytearray()
    msg += _key(1, 1) + struct.pack("<d", wall_time)
    if step:
        msg += _key(2, 0) + _varint(step)
    if file_version is not None:
        data = file_version.encode()
        msg += _key(3, 2) + _varint(len(data)) + data
    if scalars:
        summary = bytearray()
        for tag, value in scalars.items():
            tag_b = str(tag).encode()
            val = bytearray()
            val += _key(1, 2) + _varint(len(tag_b)) + tag_b
            val += _key(2, 5) + struct.pack("<f", float(value))
            summary += _key(1, 2) + _varint(len(val)) + bytes(val)
        msg += _key(5, 2) + _varint(len(summary)) + bytes(summary)
    return bytes(msg)


class SummaryWriter:
    """add_scalar/flush/close-compatible scalar-only writer."""

    def __init__(self, log_dir: str | Path) -> None:
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        fname = (
            f"events.out.tfevents.{int(time.time())}."
            f"{socket.gethostname()}.{os.getpid()}.0"
        )
        self._fh = open(self.log_dir / fname, "wb")
        self._write(_encode_event(time.time(), file_version="brain.Event:2"))

    def _write(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._fh.write(header)
        self._fh.write(struct.pack("<I", _masked_crc(header)))
        self._fh.write(payload)
        self._fh.write(struct.pack("<I", _masked_crc(payload)))

    def add_scalar(self, tag: str, value, global_step: int = 0) -> None:
        self._write(
            _encode_event(time.time(), step=int(global_step or 0),
                          scalars={tag: value})
        )

    def add_scalars(self, main_tag: str, tag_scalar_dict, global_step=0):
        for k, v in tag_scalar_dict.items():
            self.add_scalar(f"{main_tag}/{k}", v, global_step)

    def flush(self) -> None:
        self._fh.flush()

    def close(self) -> None:
        if not self._fh.closed:
            self._fh.flush()
            self._fh.close()

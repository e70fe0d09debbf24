"""Length-prefixed row codec + partition splitter (the data-loader hot path).

Wire/disk format, parity with the reference (reference
src/service/storage_service.cpp:19-28): each row is [u32 LE size][payload];
the stored row INCLUDES the 4-byte header ("size += sizeof(size)").

The splitter is implemented natively (native/rowcodec.cpp, loaded via ctypes)
with this pure-Python fallback — mirroring the reference's C++ streamed
splitter (src/service/storage_service.cpp:100-150).
"""

from __future__ import annotations

import ctypes
import pathlib
import struct
from typing import Callable, Protocol


class _UploadStateLike(Protocol):
    current_partition: int
    rows_stored_in_partition: int


_U32 = struct.Struct("<I")

_native = None
_native_checked = False


def _load_native():
    global _native, _native_checked
    if _native_checked:
        return _native
    _native_checked = True
    lib_path = (
        pathlib.Path(__file__).resolve().parent.parent.parent
        / "native" / "build" / "libherdsman_native.so"
    )
    if lib_path.exists():
        try:
            lib = ctypes.CDLL(str(lib_path))
            lib.hm_split_rows.restype = ctypes.c_int64
            lib.hm_split_rows.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,   # data
                ctypes.c_char_p,                     # frame dir
                ctypes.POINTER(ctypes.c_int64),      # state (3 x i64 in/out)
                ctypes.POINTER(ctypes.c_int64),      # max_rows per partition
                ctypes.c_int64,                      # partitions
            ]
            _native = lib
        except OSError:
            _native = None
    return _native


def parse_rows(data: bytes) -> list[bytes]:
    """Parse framed rows -> list of payloads (headers stripped)."""
    rows = []
    off = 0
    n = len(data)
    while off < n:
        if off + 4 > n:
            raise ValueError("truncated row header")
        (size,) = _U32.unpack_from(data, off)
        if off + 4 + size > n:
            raise ValueError("truncated row payload")
        rows.append(data[off + 4 : off + 4 + size])
        off += 4 + size
    return rows


def frame_rows(payloads: list[bytes]) -> bytes:
    """Frame payloads with u32 size headers."""
    out = bytearray()
    for p in payloads:
        out += _U32.pack(len(p))
        out += p
    return bytes(out)


def split_rows(
    data: bytes,
    frame_dir: pathlib.Path,
    state: _UploadStateLike,
    max_rows: Callable[[int], int],
    partitions: int,
) -> int:
    """Append framed rows to partition files, rolling to the next partition
    when full (reference src/service/storage_service.cpp:119-150). Returns
    the number of rows consumed."""
    lib = _load_native()
    if lib is not None:
        sizes = (ctypes.c_int64 * partitions)(
            *[max_rows(i) for i in range(partitions)]
        )
        st = (ctypes.c_int64 * 2)(
            state.current_partition, state.rows_stored_in_partition
        )
        rows_read = lib.hm_split_rows(
            data, len(data), str(frame_dir).encode(), st, sizes, partitions
        )
        if rows_read < 0:
            raise ValueError("truncated row in upload chunk")
        state.current_partition = int(st[0])
        state.rows_stored_in_partition = int(st[1])
        return int(rows_read)

    rows_read = 0
    off = 0
    n = len(data)
    while off < n:
        if state.current_partition >= partitions:
            raise ValueError("upload overrun: all partitions full")
        part_path = frame_dir / str(state.current_partition)
        cap = max_rows(state.current_partition)
        with open(part_path, "ab") as f:
            while off < n:
                if off + 4 > n:
                    raise ValueError("truncated row header")
                (size,) = _U32.unpack_from(data, off)
                end = off + 4 + size
                if end > n:
                    raise ValueError("truncated row payload")
                f.write(data[off:end])  # stored row includes the header
                off = end
                rows_read += 1
                state.rows_stored_in_partition += 1
                if state.rows_stored_in_partition == cap:
                    state.current_partition += 1
                    state.rows_stored_in_partition = 0
                    break
    return rows_read

"""Chunked bulk file writes for this platform's pathological ext4.

Measured (docs/TPU_PLATFORM_NOTES.md): a single write() syscall of >= 4 MB
to a fresh file stalls 12-20 s in the kernel's dirty-page throttle, while
the same bytes in <= 1 MB slices land in the page cache at ~1 GB/s — a
100-400x difference. numpy's save/savez hand the whole array buffer to one
write(), so every bulk writer here must go through this wrapper. (The C
fast path has its own fwrite_chunked — native/fastxpack.cpp.)
"""

from __future__ import annotations

import io
from typing import BinaryIO

CHUNK = 1 << 20


class ChunkedWriter(io.RawIOBase):
    """File-object proxy that slices every write into <= CHUNK-byte ops."""

    def __init__(self, raw: BinaryIO):
        self._raw = raw

    def write(self, data) -> int:
        mv = memoryview(data).cast("B")
        n = len(mv)
        for off in range(0, n, CHUNK):
            self._raw.write(mv[off : off + CHUNK])
        return n

    def writable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return self._raw.seekable()

    def seek(self, pos, whence=0) -> int:
        return self._raw.seek(pos, whence)

    def tell(self) -> int:
        return self._raw.tell()

    def flush(self) -> None:
        self._raw.flush()

    def close(self) -> None:
        if not self.closed:
            try:
                self._raw.close()
            finally:
                super().close()


def np_save_chunked(path: str, arr) -> None:
    import numpy as np

    with open(path, "wb") as f:
        np.save(ChunkedWriter(f), arr)


def np_savez_chunked(path: str, compressed: bool = False, **arrays) -> None:
    import numpy as np

    save = np.savez_compressed if compressed else np.savez
    with open(path, "wb") as f:
        save(ChunkedWriter(f), **arrays)

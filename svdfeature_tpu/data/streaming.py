"""Out-of-core streaming input pipeline.

The reference's reason for 4 MiB pages and the producer-thread double
buffer (apex-utils/apex_buffer_loader.h:39-233, apex_svd_data.h:239-345)
is training datasets that do not fit in memory.  The TPU-native
equivalent: read the binary feature buffer incrementally in bounded
CHUNKS of examples, pack each chunk on the host, and overlap the host
read+pack+device transfer of chunk i+1 with the on-device training of
chunk i — one producer thread and a depth-2 queue, exactly the
reference's ThreadBufferIterator discipline with the device as the
consumer.

Trajectory guarantee: when ``examples_per_chunk`` is a multiple of the
solver batch size, the chunked batch partitioning is identical to the
staged whole-dataset packing, so streaming produces the SAME parameter
trajectory (padding rows carry weight 0); pinned by
tests/test_streaming.py.

Shape stability: all chunks are packed to identical [Tc, B, S] shapes
(final partial chunk padded with empty batches), and the per-row segment
widths are discovered by a cheap structure-only pre-scan of the buffer
(row_ptr arrays only, feature data skipped with seek) — one compilation
covers the whole stream.
"""

from __future__ import annotations

import struct
import threading
import queue
from typing import Iterator, Optional

import numpy as np

from .csr import CSRDataset


class StreamingCSRBuffer:
    """Bounded-memory reader over a random-order binary buffer
    (SVDFeatureCSRFactory layout, apex_svd_data.cpp:116-270)."""

    def __init__(self, path: str, examples_per_chunk: int = 1 << 20):
        self.path = path
        self.examples_per_chunk = examples_per_chunk
        self.num_row = 0
        # structure pre-scan: row counts + per-segment max nnz per row
        self.max_nnz = [1, 1, 1]
        with open(path, "rb") as f:
            (self.num_batch, self.batch_size_file, _) = struct.unpack(
                "<iii", f.read(12)
            )
            for _ in range(self.num_batch):
                num_row, num_val = struct.unpack("<ii", f.read(8))
                rp = np.frombuffer(f.read(4 * (3 * num_row + 1)), "<i4")
                seg = rp.reshape(-1)[: 3 * num_row + 1]
                lens = np.diff(seg.astype(np.int64))
                if num_row:
                    per_row = lens.reshape(num_row, 3)
                    for s in range(3):
                        m = int(per_row[:, s].max(initial=0))
                        if m > self.max_nnz[s]:
                            self.max_nnz[s] = m
                self.num_row += num_row
                f.seek(4 * num_row + 8 * num_val, 1)

    def chunks(self) -> Iterator[CSRDataset]:
        """Yield CSRDatasets of at most examples_per_chunk rows each."""
        from .buffer import _read_csr_block

        with open(self.path, "rb") as f:
            f.read(12)
            parts = []
            rows = 0
            for _ in range(self.num_batch):
                blk = _read_csr_block(f)
                parts.append(blk)
                rows += blk.num_row
                if rows >= self.examples_per_chunk:
                    yield CSRDataset.concat(parts)
                    parts, rows = [], 0
            if parts:
                yield CSRDataset.concat(parts)


def stream_train_round(trainer, source: StreamingCSRBuffer, prefetch: int = 2):
    """One training round over a streaming source with a producer thread.

    The producer reads, packs and stages chunk i+1 while chunk i trains
    on device (jax dispatch is asynchronous, so staging overlaps compute
    naturally; the queue bounds host memory to ``prefetch`` chunks).
    """
    import jax

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    Tc = -(-min(source.examples_per_chunk, source.num_row) // trainer.batch_size)

    def produce():
        try:
            for chunk in source.chunks():
                if stop.is_set():
                    return
                arrays, nrow = trainer.pack_chunk(chunk, Tc, source.max_nnz)
                q.put((jax.device_put(arrays), nrow))
        except BaseException as e:  # pragma: no cover
            q.put(e)
            return
        q.put(None)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            arrays, _ = item
            trainer.train_chunk(arrays)
    finally:
        stop.set()
        t.join(timeout=30)

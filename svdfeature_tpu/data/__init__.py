"""Data pipeline: 3-segment sparse rows, text loaders, binary buffers,
pairwise-rank synthesis, and device batch packing.

Array-of-rows design replacing the reference's per-Elem pointer views
(apex_svd_data.h:34-231): datasets are whole numpy CSR arrays, loaders are
vectorized parsers, and iterators yield fixed-shape padded device batches.
"""

from .csr import CSRDataset, PlusBlock, PlusDataset
from .text import load_basic_text, load_feature_text, load_plus_text
from .buffer import (
    read_csr_buffer,
    write_csr_buffer,
    read_plus_buffer,
    write_plus_buffer,
)

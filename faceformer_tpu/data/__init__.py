"""Data pipeline: reference-format JSON samples -> packed static-shape arrays.

The reference uses torch Dataset/DataLoader with per-sample Python
(faceformer/datasets/data.py, data_para.py). Here packing is pure numpy on
the host and batches are delivered as one dict of static-shape arrays, ready
to shard over a device mesh — no per-sample device work.
"""

from faceformer_tpu.data.packing import (  # noqa: F401
    pack_input_edges,
    pack_label_parallel,
    pack_label_single,
)
from faceformer_tpu.data.dataset import (  # noqa: F401
    ABCDataset,
    ABCDatasetParallel,
    parse_splits_list,
)

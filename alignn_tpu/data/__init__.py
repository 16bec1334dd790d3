"""Dataset / storage / batching layer (reference L2).

Replaces `alignn/data.py`, `alignn/dataset.py`, `alignn/lmdb_dataset.py`:
deterministic splits, record->graph conversion with target wiring, a disk
cache of preprocessed graphs, and a bucketed loader that emits padded
:class:`~alignn_tpu.graph.batch.GraphBatch` pytrees with static shapes.
"""

from alignn_tpu.data.splits import get_id_train_val_test
from alignn_tpu.data.dataset import (
    GraphDataset,
    load_folder_records,
    records_to_graphs,
)
from alignn_tpu.data.loader import BucketedLoader, get_train_val_loaders

__all__ = [
    "get_id_train_val_test",
    "GraphDataset",
    "load_folder_records",
    "records_to_graphs",
    "BucketedLoader",
    "get_train_val_loaders",
]

"""Data layer: array-backed datasets, registry, non-IID partitioners, and the
OCT folder loader (reference federated_learning/utils.py:87-669 + the
gitignored datasets/dataloader_cell.py re-specified from its call signature)."""

from shapley_vit_tpu.data.arrays import ArrayDataset, batches  # noqa: F401
from shapley_vit_tpu.data.partition import (  # noqa: F401
    partition_labeldir,
    partition_labeldir2,
    partition_labeldir_med,
    record_net_data_stats,
    make_client_datasets,
)
from shapley_vit_tpu.data.registry import get_dataset  # noqa: F401
from shapley_vit_tpu.data.oct import CellDataset  # noqa: F401

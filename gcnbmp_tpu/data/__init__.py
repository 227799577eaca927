"""Data layer: pair datasets, batching/padding/packing, CSV parsing, splits."""

from gcnbmp_tpu.data.dataset import (
    PairDataset,
    PaddedPairBatch,
    pad_graphs,
    bucket_size,
    batch_iterator,
)
from gcnbmp_tpu.data.parsers import (
    CSVPairParser,
    parse_pair_csv,
)

__all__ = [
    "PairDataset",
    "PaddedPairBatch",
    "pad_graphs",
    "bucket_size",
    "batch_iterator",
    "CSVPairParser",
    "parse_pair_csv",
]

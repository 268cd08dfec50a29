from .dataset import (Batcher, TokenDataset, init_dataset, interleave,
                      load_token_dataset, pack_into_rows, pad_into_rows)
from .preference import init_preference_optimization_dataset
from .prepare import prepare_tokens_file, process_feature_line

__all__ = [
    "Batcher", "TokenDataset", "init_dataset", "interleave",
    "load_token_dataset", "pack_into_rows", "pad_into_rows",
    "init_preference_optimization_dataset",
    "prepare_tokens_file", "process_feature_line",
]

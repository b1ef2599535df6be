from .dataset import (ChainedDataLoader, CombinedLoaders, FullSeqDataset,
                      SeqDataset, SeqToSeqDataset, TripletDataset, UserDataset)
from .advance_dataset import ALSDataset
from .frame import Frame
from .fields import FieldSpec, parse_field, parse_fields, PAD_TOKEN

__all__ = [
    "TripletDataset", "UserDataset", "SeqDataset", "FullSeqDataset",
    "SeqToSeqDataset", "ALSDataset", "Frame", "FieldSpec", "parse_field",
    "parse_fields", "PAD_TOKEN", "ChainedDataLoader", "CombinedLoaders",
]

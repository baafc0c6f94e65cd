from .datasets import (
    SingleTapSeqsDataset,
    TactileSRDataset,
    TactileSRDatasetSeq,
    TPSFNetDataset,
)
from .loader import DeviceData, HostLoader, epoch_batches
from .raw_process import (
    augment_rotations,
    binarize_depth,
    extract_contact_seqs,
    load_raw_dataset,
    load_seq_dataset_sr,
)
from .generate import (
    generate_seqs_srdataset,
    generate_single_srdataset,
    tpsf_apply_batched,
)
from .synthetic import generate_rotate_dataset, make_tap_record, write_raw_blob

__all__ = [
    "TPSFNetDataset",
    "TactileSRDataset",
    "TactileSRDatasetSeq",
    "SingleTapSeqsDataset",
    "HostLoader",
    "DeviceData",
    "epoch_batches",
    "extract_contact_seqs",
    "binarize_depth",
    "augment_rotations",
    "load_raw_dataset",
    "load_seq_dataset_sr",
    "generate_rotate_dataset",
    "make_tap_record",
    "write_raw_blob",
    "generate_single_srdataset",
    "generate_seqs_srdataset",
    "tpsf_apply_batched",
]

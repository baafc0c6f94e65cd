from .datasets import (
    SingleTapSeqsDataset,
    TactileSRDataset,
    TactileSRDatasetSeq,
    TPSFNetDataset,
)
from .loader import epoch_batches
from .raw_process import (
    augment_rotations,
    binarize_depth,
    extract_contact_seqs,
    load_raw_dataset,
    load_seq_dataset_sr,
)
from .synthetic import generate_rotate_dataset, make_tap_record, write_raw_blob


def __getattr__(name):
    # lazy: generate pulls in the model stack; also keeps
    # `python -m tactilesr_tpu.data.generate` free of double-import warnings
    if name in (
        "generate_single_srdataset",
        "generate_seqs_srdataset",
        "tpsf_apply_batched",
    ):
        from . import generate

        return getattr(generate, name)
    raise AttributeError(name)

__all__ = [
    "TPSFNetDataset",
    "TactileSRDataset",
    "TactileSRDatasetSeq",
    "SingleTapSeqsDataset",
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

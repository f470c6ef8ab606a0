"""Data layer: on-device multi-digit canvas synthesis + loaders.

Covers the reference's L5 layer (``attend_infer_repeat/data.py`` and the
offline ``scripts/create_dataset.sh`` generator — SURVEY §3 #6-7, §4.4),
re-designed per the north star: dataset creation is an *on-device
preprocessing stage* (jit-compiled canvas synthesis from a device-resident
digit bank, keyed RNG per sample) instead of offline pickles — though the
reference's pickle format is still supported for parity.
"""

from attend_infer_repeat_tpu.data.digits import load_digit_bank
from attend_infer_repeat_tpu.data.loader import (
    InMemoryDataset,
    batch_iterator,
    load_data,
    tensors_from_data,
)
from attend_infer_repeat_tpu.data.synth import (
    make_synth_fn,
    synthesize_batch,
)

__all__ = [
    "load_digit_bank",
    "InMemoryDataset",
    "batch_iterator",
    "load_data",
    "tensors_from_data",
    "make_synth_fn",
    "synthesize_batch",
]

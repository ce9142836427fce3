"""Typed configuration for qea_ocr_tpu.

Replaces the reference's module-constant soup (`/root/reference/properties.py:1-42`)
with frozen dataclasses, while keeping exact value parity where semantics depend
on it (charset, input size, max label length, dataset split dir names).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# ---------------------------------------------------------------------------
# Charset. Value parity with reference `properties.py:35-36`: 95 characters,
# index 0 is '`' which doubles as the CTC blank (reference greedy decode drops
# index 0, `utils.py:74-92`).
# ---------------------------------------------------------------------------
CHAR_SET: Tuple[str, ...] = tuple(
    ['`', ' ', '!', '"', '#', '$', '%', '&', "'", '(', ')', '*', '+', ',',
     '-', '.', '0', '1', '2', '3', '4', '5', '6', '7', '8', '9', ':', ';',
     '<', '=', '>', '?', '@', 'A', 'B', 'C', 'D', 'E', 'F', 'G', 'H', 'I',
     'J', 'K', 'L', 'M', 'N', 'O', 'P', 'Q', 'R', 'S', 'T', 'U', 'V', 'W',
     'X', 'Y', 'Z', '[', ']', '^', 'a', 'b', 'c', 'd', 'e', 'f', 'g', 'h',
     'i', 'j', 'k', 'l', 'm', 'n', 'o', 'p', 'q', 'r', 's', 't', 'u', 'v',
     'w', 'x', 'y', 'z', '{', '|', '~', '€', '}', '\\', '/']
)

BLANK_ID = 0                 # CTC blank == CHAR_SET[0] == '`'
EMPTY_CHAR = ' '             # reference properties.py:40
MAX_CHAR_LEN = 100           # reference properties.py:41
# Canonical selection / weight-generator keys (reference factory parity:
# `selection_utils.py:220-229`, `tracking_methods.py:118-124`). Single
# source of truth for CLI `choices`, quality-run validation, and the
# factories (consistency asserted in tests/test_selection.py).
SELECTION_KEYS: Tuple[str, ...] = (
    "random", "topKCER", "uniformCERglobal", "randomglobal", "rangeCER",
    "uniformEntropy")
WEIGHTGEN_KEYS: Tuple[str, ...] = ("levenshtein", "self_attention",
                                   "decaying")

INPUT_SIZE: Tuple[int, int] = (32, 128)   # (H, W) of a text strip, properties.py:33
DOC_SIZE: Tuple[int, int] = (400, 512)    # padded document size, patch_dataset.py:21
CRNN_TIME_STEPS = 31         # (32,128) input -> 31 CTC timesteps (model_crnn geometry)

# Dataset split directory names (reference properties.py:1-20).
POS_TEXT_TRAIN = "textarea_dataset_train"
POS_TEXT_TEST = "textarea_dataset_test"
POS_TEXT_DEV = "textarea_dataset_dev"
VGG_TEXT_TRAIN = "vgg_train"
VGG_TEXT_TEST = "vgg_test"
VGG_TEXT_DEV = "vgg_dev"
PATCH_TRAIN = "patch_dataset_train"
PATCH_TEST = "patch_dataset_test"
PATCH_DEV = "patch_dataset_dev"
WR_TRAIN = "wildreceipt_train"
WR_TEST = "wildreceipt_test"
WR_DEV = "wildreceipt_dev"


@dataclasses.dataclass(frozen=True)
class VocabConfig:
    """Vocabulary / CTC geometry shared by every component."""
    char_set: Tuple[str, ...] = CHAR_SET
    blank_id: int = BLANK_ID
    max_char_len: int = MAX_CHAR_LEN

    @property
    def vocab_size(self) -> int:
        return len(self.char_set)

    @property
    def pad_id(self) -> int:
        """Padding index for encoded labels (== vocab_size, one past the charset).

        Matches the reference's label padding convention
        (`tracking_utils.py:25-29` pads with `vocab_size`).
        """
        return len(self.char_set)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """CRNN / UNet geometry. Mirrors reference model hyperparameters."""
    vocab_size: int = len(CHAR_SET)
    lstm_hidden: int = 256
    lstm_layers: int = 2
    conv_features: Tuple[int, ...] = (64, 128, 256, 256, 512, 512, 512)
    unet_features: int = 32
    input_size: Tuple[int, int] = INPUT_SIZE
    doc_size: Tuple[int, int] = DOC_SIZE
    # Compute dtype: convs/matmuls run in bfloat16 on the MXU, params and
    # losses stay float32.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    """Label-history tracking (reference `tracking_utils.py`, window etc.)."""
    window_size: int = 1
    weightgen_method: str = "decaying"   # decaying | levenshtein | self_attention
    decay_factor: float = 0.7
    # HistoryAttention hyperparams (reference patch_cli.py:125-140)
    emb_dim: int = 256
    query_dim: int = 32
    attn_activation: str = "sigmoid"


@dataclasses.dataclass(frozen=True)
class SelectionConfig:
    method: str | None = None            # random|topKCER|rangeCER|uniformEntropy|uniformCERglobal|randomglobal
    prop: float = 0.5                    # minibatch_subset_prop: fraction NOT queried
    discount_factor: float = 1.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr_crnn: float = 1e-4
    lr_prep: float = 5e-5
    weight_decay: float = 5e-4
    epochs: int = 25
    warmup_epochs: int = 0
    inner_limit: int = 2
    inner_limit_skip: bool = False
    update_crnn: bool = False
    sec_loss_scalar: float = 1.0
    std: int = 5                          # gaussian jitter std (divided by 100)
    random_std: bool = True
    random_seed: int = 42
    batch_docs: int = 1                   # documents per step (reference fixes 1)
    max_strips: int = 64                  # fixed strip-slot count per document
    start_epoch: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit/shard_map data parallelism."""
    data_axis: str = "data"
    num_devices: int | None = None        # None -> all available

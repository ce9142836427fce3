"""Character/vocabulary maps and label tokenization.

TPU-native counterpart of reference `utils.py:22-40` (`get_char_maps`) and
`utils.py:57-71` (`get_ununicode`), plus vectorized encode/decode between
python strings and fixed-shape int arrays (the on-device label format).

Labels live on device as `(B, max_char_len)` int32 padded with `pad_id`
(== vocab_size), the same padding convention as reference
`tracking_utils.py:25-29`.
"""

from __future__ import annotations

import dataclasses
import unicodedata
from typing import Dict, List, Sequence, Tuple

import numpy as np

from qea_ocr_tpu.config import CHAR_SET, EMPTY_CHAR, MAX_CHAR_LEN


def get_char_maps(vocabulary: Sequence[str] | None = None):
    """char<->index maps. Parity with reference `utils.py:22-40`.

    With no vocabulary: index 0 is '-' (the CTC blank) followed by a-z, A-Z,
    0-9. With the default CHAR_SET, index 0 is '`' and doubles as blank.
    """
    if vocabulary is None:
        vocab = (
            ["-"]
            + [chr(ord("a") + i) for i in range(26)]
            + [chr(ord("A") + i) for i in range(26)]
            + [chr(ord("0") + i) for i in range(10)]
        )
    else:
        vocab = list(vocabulary)
    char_to_index = {c: i for i, c in enumerate(vocab)}
    index_to_char = {i: c for i, c in enumerate(vocab)}
    return char_to_index, index_to_char, len(vocab)


# Pre/post replacement pairs applied around ASCII transliteration.
# Mirrors reference `utils.py:57-71`.
_PRE_REPLACEMENTS = (
    ("_", "-"),
    ("`", "'"),
    ("©", "c"),
    ("°", "'"),
    ("£", "E"),
    ("§", "S"),
)


def _ascii_transliterate(text: str) -> str:
    """Minimal `unidecode` stand-in: NFKD-decompose, drop combining marks,
    keep printable ASCII, map everything else through a small common table."""
    common = {
        "—": "--", "–": "-", "‘": "'", "’": "'", "“": '"', "”": '"',
        "…": "...", "•": "*", "·": "*", "×": "x", "÷": "/", "±": "+-",
        "™": "(tm)", "®": "(r)", "¢": "c", "¥": "Y", "µ": "u",
        "✓": "", "✔": "",
    }
    out = []
    for ch in text:
        if ord(ch) < 128:
            out.append(ch)
            continue
        if ch in common:
            out.append(common[ch])
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in decomp if ord(c) < 128 and not unicodedata.combining(c))
        out.append(kept)
    return "".join(out)


def get_ununicode(text: str) -> str:
    """Normalize OCR output to the framework charset.

    Same contract as reference `utils.py:57-71`: a handful of targeted
    replacements, then ASCII transliteration, with '€' round-tripped intact
    (it is part of CHAR_SET).
    """
    for a, b in _PRE_REPLACEMENTS:
        text = text.replace(a, b)
    index = text.find("€")
    if index >= 0:
        text = text.replace("€", "<eur>")
    out = _ascii_transliterate(text)
    if index >= 0:
        out = out.replace("<eur>", "€")
    return out


@dataclasses.dataclass(frozen=True)
class CharMap:
    """Vocabulary with vectorized string<->array codecs.

    The on-device label format is int32 `(…, max_len)` padded with `pad_id`.
    """

    char_to_index: Dict[str, int]
    index_to_char: Dict[int, str]
    vocab_size: int
    max_len: int = MAX_CHAR_LEN

    @classmethod
    def default(cls, max_len: int = MAX_CHAR_LEN) -> "CharMap":
        c2i, i2c, vs = get_char_maps(CHAR_SET)
        return cls(c2i, i2c, vs, max_len)

    @property
    def pad_id(self) -> int:
        return self.vocab_size

    @property
    def blank_id(self) -> int:
        return 0

    def clean(self, text: str) -> str:
        """Drop characters outside the charset (OCR engines emit arbitrary
        text); overly long labels collapse to the empty char, mirroring the
        reference helpers' `max_char_len` cap (`tess_helper.py:33-35`)."""
        text = "".join(c for c in text if c in self.char_to_index)
        if len(text) > self.max_len:
            return EMPTY_CHAR
        return text

    def encode(self, words: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Strings -> (labels (B, max_len) int32 pad-filled, lengths (B,) int32).

        Unknown characters are dropped (the reference would KeyError; OCR
        outputs are normalized before reaching here).
        """
        n = len(words)
        labels = np.full((n, self.max_len), self.pad_id, dtype=np.int32)
        lengths = np.zeros((n,), dtype=np.int32)
        for i, word in enumerate(words):
            ids = [self.char_to_index[c] for c in word if c in self.char_to_index]
            ids = ids[: self.max_len]
            labels[i, : len(ids)] = ids
            lengths[i] = len(ids)
        return labels, lengths

    def decode(self, labels: np.ndarray, lengths: np.ndarray | None = None) -> List[str]:
        """(B, L) int arrays -> strings, stopping at pad_id or `lengths`."""
        labels = np.asarray(labels)
        out = []
        for i in range(labels.shape[0]):
            row = labels[i]
            if lengths is not None:
                row = row[: int(lengths[i])]
            chars = []
            for idx in row:
                idx = int(idx)
                if idx == self.pad_id:
                    break
                chars.append(self.index_to_char.get(idx, ""))
            out.append("".join(chars))
        return out

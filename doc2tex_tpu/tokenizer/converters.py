"""Label converters: text <-> token-id arrays.

Behavioral parity with the reference converters
(``doc2tex/modules/converter/attn_converter.py:5-77`` and
``doc2tex/modules/converter/tfm_converter.py:5-82``), re-implemented on numpy
so encode emits device-ready int32 arrays with a *static* width — the XLA
shape contract: every encoded batch for a given ``batch_max_length`` has shape
``(B, batch_max_length + 2)``.

Encode layout (identical to reference):
  Attn:  [GO] t1 t2 ... tn [s] [GO] [GO] ...   (pad value == GO == 0)
  TFM :  [GO] t1 t2 ... tn [s] [PAD] ...       (pad value == PAD == 0)

Quirk preserved: reference truncation keeps ``batch_max_length`` tokens
(after the internal ``+= 1``) before appending [s]
(``attn_converter.py:40-43``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


class _BaseConverter:
    """Shared encode/decode machinery; subclasses define the special tokens."""

    list_token: list[str] = []

    def __init__(self, character: Sequence[str], device=None):
        # `device` accepted for API compatibility; placement is the caller's
        # job in JAX (jax.device_put / sharding), not the tokenizer's.
        self.character: list[str] = list(self.list_token) + list(character)
        self.dict: dict[str, int] = {c: i for i, c in enumerate(self.character)}
        self.ignore_idx: int = self.dict[self.pad_token()]
        # O(1) id lookups for hot paths
        self._unk = self.dict["[UNK]"]
        self._end = self.dict["[s]"]
        self._go = self.dict["[GO]"]

    # --- special-token ids (class-level, match reference statics) ---
    @classmethod
    def START(cls) -> int:
        return cls.list_token.index("[GO]")

    @classmethod
    def END(cls) -> int:
        return cls.list_token.index("[s]")

    @classmethod
    def UNK(cls) -> int:
        return cls.list_token.index("[UNK]")

    @classmethod
    def pad_token(cls) -> str:
        raise NotImplementedError

    @property
    def num_classes(self) -> int:
        return len(self.character)

    # --- encode -------------------------------------------------------
    def encode(
        self, text: Sequence[Sequence[str]] | Sequence[str], batch_max_length: int = 25
    ) -> tuple[np.ndarray, np.ndarray]:
        """Encode a batch of token sequences.

        Returns ``(ids, lengths)`` where ids is int32 ``(B, batch_max_length+2)``
        and lengths counts tokens + 1 (for the [s] terminator), matching the
        reference (``attn_converter.py:31-52``).
        """
        length = np.asarray([len(s) + 1 for s in text], dtype=np.int32)
        inner_max = batch_max_length + 1  # reference does batch_max_length += 1
        width = inner_max + 1
        batch = np.full((len(text), width), self.ignore_idx, dtype=np.int32)
        batch[:, 0] = self._go
        d = self.dict
        unk = self._unk
        for i, toks in enumerate(text):
            toks = list(toks)
            if len(toks) > inner_max:
                toks = toks[: inner_max - 1]
            ids = [d.get(ch, unk) for ch in toks]
            ids.append(self._end)
            batch[i, 1 : 1 + len(ids)] = ids
        return batch, length

    # --- decode -------------------------------------------------------
    def decode(self, text_index: np.ndarray, token_level: str = "word") -> list[str]:
        """Token-id matrix -> list of joined strings (reference decode)."""
        sep = " " if token_level == "word" else ""
        chars = self.character
        return [
            sep.join(chars[int(i)] for i in row) for row in np.asarray(text_index)
        ]

    def detokenize(self, token_ids: np.ndarray) -> list[list[str]]:
        """Token-id matrix -> token lists, cut at the first [s]."""
        chars = self.character
        end = self._end
        out: list[list[str]] = []
        for row in np.asarray(token_ids):
            toks: list[str] = []
            for i in row:
                i = int(i)
                if i == end:
                    break
                toks.append(chars[i])
            out.append(toks)
        return out


class AttnLabelConverter(_BaseConverter):
    """Specials [GO],[s],[UNK]; pad == GO == 0 (reference attn_converter.py:8-17)."""

    list_token = ["[GO]", "[s]", "[UNK]"]

    @classmethod
    def pad_token(cls) -> str:
        return "[GO]"


class TFMLabelConverter(_BaseConverter):
    """Specials [PAD],[GO],[s],[UNK]; pad == PAD == 0 (reference tfm_converter.py:8-18)."""

    list_token = ["[PAD]", "[GO]", "[s]", "[UNK]"]

    @classmethod
    def pad_token(cls) -> str:
        return "[PAD]"

    @classmethod
    def PAD(cls) -> int:
        return cls.list_token.index("[PAD]")


def create_converter(config, device=None):
    """Converter factory (reference ``doc2tex/modules/converter/builder.py:5-12``).

    Loads the vocab file into ``config['character']`` and picks the converter
    family from the Prediction head name.
    """
    from .vocab import load_vocab

    if not config.get("character"):
        vocab_path = config.get("vocab")
        if vocab_path:
            config["character"] = load_vocab(vocab_path)
        elif config.get("synthetic_data"):
            from ..data.synthetic import SYNTH_VOCAB

            config["character"] = list(SYNTH_VOCAB)
        else:
            raise ValueError("config needs 'vocab' path or 'character' list")
    pred = config["Prediction"]["name"]
    if pred.startswith("Attn"):
        return AttnLabelConverter(config["character"])
    if pred in ("TFM", "MS_TFM"):
        return TFMLabelConverter(config["character"])
    raise ValueError(f"Unknown Prediction head: {pred!r}")

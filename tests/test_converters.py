"""Converter parity tests.

Oracle: the reference converters (pure torch+numpy files) loaded directly
from /root/reference by module path — behavior must match byte-for-byte on
encode/decode/detokenize.
"""

import importlib.util
import sys

import numpy as np
import pytest

from doc2tex_tpu.tokenizer import AttnLabelConverter, TFMLabelConverter

REF = "/root/reference/doc2tex/modules/converter"


def _load_ref(name):
    torch = pytest.importorskip("torch")  # noqa: F841
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


VOCAB = ["\\frac", "{", "}", "x", "y", "+", "=", "2", "\\alpha"]
BATCH = [
    ["x", "+", "y", "=", "2"],
    ["\\frac", "{", "x", "}", "{", "y", "}"],
    ["\\alpha"],
    ["x", "unknown_token", "y"],
]


class TestAttnConverter:
    def test_specials(self):
        assert AttnLabelConverter.START() == 0
        assert AttnLabelConverter.END() == 1
        assert AttnLabelConverter.UNK() == 2

    def test_encode_matches_reference(self):
        ref_mod = _load_ref("attn_converter")
        ref = ref_mod.AttnLabelConverter(VOCAB, "cpu")
        ours = AttnLabelConverter(VOCAB)
        ref_ids, ref_len = ref.encode(BATCH, batch_max_length=12)
        ids, lengths = ours.encode(BATCH, batch_max_length=12)
        np.testing.assert_array_equal(ids, ref_ids.numpy())
        np.testing.assert_array_equal(lengths, ref_len.numpy())

    def test_decode_detokenize_match_reference(self):
        ref_mod = _load_ref("attn_converter")
        ref = ref_mod.AttnLabelConverter(VOCAB, "cpu")
        ours = AttnLabelConverter(VOCAB)
        ids, _ = ours.encode(BATCH, batch_max_length=12)
        import torch

        tids = torch.from_numpy(ids.astype(np.int64))
        assert ours.decode(ids) == ref.decode(tids)
        assert ours.detokenize(ids[:, 1:]) == ref.detokenize(tids[:, 1:])

    def test_truncation(self):
        ours = AttnLabelConverter(VOCAB)
        long = [["x"] * 50]
        ids, _ = ours.encode(long, batch_max_length=10)
        assert ids.shape == (1, 12)
        # truncated to 10 tokens + [s]
        assert ids[0, 11] == AttnLabelConverter.END()


class TestTFMConverter:
    def test_specials(self):
        assert TFMLabelConverter.PAD() == 0
        assert TFMLabelConverter.START() == 1
        assert TFMLabelConverter.END() == 2
        assert TFMLabelConverter.UNK() == 3

    def test_encode_matches_reference(self):
        ref_mod = _load_ref("tfm_converter")
        ref = ref_mod.TFMLabelConverter(VOCAB, "cpu")
        ours = TFMLabelConverter(VOCAB)
        ref_ids, ref_len = ref.encode(BATCH, batch_max_length=12)
        ids, lengths = ours.encode(BATCH, batch_max_length=12)
        np.testing.assert_array_equal(ids, ref_ids.numpy())
        np.testing.assert_array_equal(lengths, ref_len.numpy())

    def test_roundtrip(self):
        ours = TFMLabelConverter(VOCAB)
        ids, _ = ours.encode(BATCH, batch_max_length=12)
        toks = ours.detokenize(ids[:, 1:])
        assert toks[0] == BATCH[0]
        assert toks[3] == ["x", "[UNK]", "y"]

"""Top-level model assembly from the YAML config.

Parity target: reference ``Model`` + stage builders
(``doc2tex/modules/build_model.py:7-79``,
``doc2tex/modules/recognizers/build_feat.py:8-63`` /
``build_seq.py:7-83`` / ``build_pred.py:9-50``): a 3-stage composition
FeatureExtraction -> SequenceModeling -> Prediction configured by the
``FeatureExtraction`` / ``SequenceModeling`` / ``Prediction`` YAML blocks.

Supported stage combinations (same as the configs the reference ships):
- Feat 'None'   + Seq 'ViT' (hybrid resnet/vgg/raw-patch) + Pred 'Attnv2'/'Attn'/'TFM'
- Feat 'ResNet'/'VGG' + Seq 'BiLSTM'/'None' + Pred 'Attn'/'TFM'

The model is one linen module exposing:
- ``__call__(image, text, train)``  teacher-forced logits (training/val loss)
- ``encode(image)``                 encoder memory
- ``init_decode_state(enc, max_steps)`` / ``decode_step(state, tokens)``
  the step interface consumed by ``doc2tex_tpu.decode`` (greedy/beam).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .bilstm import BiLSTMSeqModeling
from .decoder_lstm import LSTMAttentionDecoder
from .decoder_tfm import TransformerDecoder
from .resnet import ResNetFeatureExtractor
from .vgg import VGGFeatureExtractor
from .vit import ViTEncoder, grid_size_for

Dtype = Any


def _vit_from_config(config, dtype) -> ViTEncoder:
    sm = config["SequenceModeling"]["params"]
    backbone = sm.get("backbone")
    backbone_name = backbone["name"] if backbone else None
    if backbone_name == "cnn":
        backbone_name = None
    patch = tuple(sm.get("patch_size", [2, 2]))
    max_dim = (
        (config["imgH"], config["max_dimension"][1])
        if config.get("imgH")
        else tuple(config["max_dimension"])
    )
    patching_style = sm.get("patching_style", "2d")
    max_grid = grid_size_for(max_dim, patch, backbone_name, patching_style)
    if patching_style == "1d":
        mode = "interpolate"     # TRIGBaseEncoder uses a learned 1D table
    elif sm.get("fix_embed", False):
        mode = "sincos"          # ViTEncoderV3 (vit_encoder.py:296-297)
    elif not sm.get("interpolate_embed", True):
        mode = "truncate"        # ViTEncoderV2
    else:
        mode = "interpolate"     # ViTEncoder (DINO-style)
    return ViTEncoder(
        embed_dim=sm["hidden_size"],
        depth=sm["depth"],
        num_heads=sm["num_heads"],
        patch_size=patch,
        patching_style=patching_style,
        max_grid=max_grid,
        backbone_name=backbone_name,
        backbone_channels=(backbone or {}).get("output_channel", 512),
        input_channel=sm.get("input_channel", 1),
        gcb=(backbone or {}).get("gcb", False),
        pos_embed_mode=mode,
        dtype=dtype,
    )


class Model(nn.Module):
    """3-stage recognizer assembled from a reference-format config dict."""

    config: dict
    num_classes: int

    def setup(self):
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.get("dtype", "bfloat16") == "bfloat16" else jnp.float32
        self._dtype = dtype
        feat = cfg["FeatureExtraction"]["name"]
        seq = cfg["SequenceModeling"]["name"]
        pred = cfg["Prediction"]["name"]
        self.stages = (feat, seq, pred)

        if "Vi" in seq and feat != "None":
            raise ValueError("ViT sequence modeling requires Feat='None'")

        # --- feature extraction stage ---
        if feat == "ResNet":
            p = cfg["FeatureExtraction"].get("params", {})
            self.featextractor = ResNetFeatureExtractor(
                input_channel=p.get("input_channel", 1),
                output_channel=p.get("output_channel", 512),
                gcb=p.get("gcb", False),
                dtype=dtype,
            )
        elif feat == "VGG":
            p = cfg["FeatureExtraction"].get("params", {})
            self.featextractor = VGGFeatureExtractor(
                input_channel=p.get("input_channel", 1),
                output_channel=p.get("output_channel", 512),
                dtype=dtype,
            )
        elif feat == "None":
            self.featextractor = None
        else:
            raise ValueError(f"unknown FeatureExtraction {feat!r}")

        # --- sequence modeling stage ---
        if seq == "ViT":
            self.seqmodeler = _vit_from_config(cfg, dtype)
            enc_dim = cfg["SequenceModeling"]["params"]["hidden_size"]
        elif seq == "BiLSTM":
            p = cfg["SequenceModeling"].get("params", {})
            self.seqmodeler = BiLSTMSeqModeling(
                hidden_size=p.get("hidden_size", 256),
                output_size=p.get("output_size", p.get("hidden_size", 256)),
                num_layers=p.get("num_layers", 2),
                use_pos_enc=p.get("pos_enc", False),
            )
            enc_dim = p.get("output_size", p.get("hidden_size", 256))
        elif seq == "None":
            self.seqmodeler = None
            enc_dim = cfg["FeatureExtraction"].get("params", {}).get(
                "output_channel", 512
            )
        else:
            raise ValueError(f"unknown SequenceModeling {seq!r}")

        # --- prediction stage ---
        pp = dict(cfg["Prediction"].get("params", {}))
        if pred in ("Attn", "Attnv2"):
            self.predicter = LSTMAttentionDecoder(
                num_classes=self.num_classes,
                input_size=pp.get("input_size", enc_dim),
                hidden_size=pp.get("hidden_size", 256),
                embed_dim=pp.get("embed_dim"),
                kernel_size=pp.get("kernel_size", 2),
                kernel_dim=pp.get("kernel_dim", 128),
                attn_type=pp.get("attn_type", "coverage"),
                method=pp.get("method", "dot"),
                embed_target=pp.get("embed_target", True),
                enc_init=pp.get("enc_init", False),
                seqmodel=pp.get("seqmodel", "TFM"),
                v2=(pred == "Attnv2"),
                droprate=pp.get("droprate", 0.1),
                dtype=dtype,
            )
        elif pred == "TFM":
            self.predicter = TransformerDecoder(
                num_classes=self.num_classes,
                d_model=pp.get("d_model", enc_dim),
                nhead=pp.get("nhead", 8),
                num_decoder_layers=pp.get("num_decoder_layers", 3),
                dim_feedforward=pp.get("dim_feedforward", 1024),
                dropout=pp.get("dropout", 0.3),
                max_seq_len=cfg.get("batch_max_length", 150) + 2,
                padding_idx=0,
                dtype=dtype,
            )
        else:
            raise ValueError(f"unknown Prediction {pred!r}")

    # ------------------------------------------------------------------
    def encode(self, image, train: bool = False):
        """image: (B, H, W, C) normalized floats -> encoder memory (B, S, D)."""
        x = image.astype(self._dtype)
        if self.featextractor is not None:
            x = self.featextractor(x, train)
        if self.stages[1] == "ViT":
            tokens, _grid = self.seqmodeler(x, train)
            return tokens
        if self.stages[1] == "None" and self.stages[2] == "TFM":
            # keep the 2D map: h/w-split sin-cos PE then flatten HW
            # (reference build_seq.py:36-38,71-77 PositionalEncoding2D path)
            from .layers import posenc_2d_hw

            B, H, W, C = x.shape
            pe = jnp.asarray(posenc_2d_hw(H, W, C))
            x = x + pe[None].astype(x.dtype)
            return x.reshape(B, H * W, C)
        # Attn/BiLSTM CNN path: collapse height (reference build_feat.py
        # AdaptiveAvgPool to h=1) then (B, W, C)
        x = x.mean(axis=1)
        if self.seqmodeler is not None:
            x = self.seqmodeler(x)
        return x

    def __call__(self, image, text, train: bool = True):
        """Teacher-forced logits (B, T, V); text is encoded[:, :-1]."""
        enc = self.encode(image, train)
        return self.predicter(enc, text, train)

    # --- decode interface ---
    def init_decode_state(
        self,
        enc,
        max_steps: int,
        beam_size: int = 1,
        live_steps: int | None = None,
    ):
        """``enc`` is the UNexpanded (B, S, D) encoder output; per-beam
        state leaves are allocated at B*beam_size rows while the attention
        memory stays shared at B (see DecoderState/TFMState docstrings).
        ``live_steps`` (TFM head only) caps the initial KV-cache capacity
        for chunked decode — see ``decoder_tfm.grow_decode_state``."""
        if self.stages[2] == "TFM":
            return self.predicter.init_state(
                enc, max_steps, beam_size, live_steps=live_steps
            )
        return self.predicter.init_state(enc, beam_size)

    def decode_step(self, state, tokens):
        return self.predicter.step(state, tokens)


def build_model(config, num_classes: int) -> Model:
    return Model(config=dict(config), num_classes=num_classes)

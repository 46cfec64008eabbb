"""Import reference PyTorch checkpoints into doc2tex_tpu parameter trees.

Maps the reference ``Model`` state_dict (``doc2tex/modules/build_model.py``)
onto our flax params/batch_stats for the flagship architecture family
(hybrid-ResNet ViT encoder + Attn/Attnv2 LSTM decoder or TFM decoder).
Enables (a) running released reference checkpoints on TPU and (b) the
cross-framework forward-parity tests in tests/test_torch_parity.py.

Layout conversions:
  torch Conv2d (O, I, kh, kw)  -> flax (kh, kw, I, O)
  torch Conv1d (O, I, k)       -> ours (k, I, O)
  torch Linear (O, I)          -> ours x@W matrices (I, O)
  torch BN weight/bias/running_mean/running_var
                               -> flax scale/bias + batch_stats mean/var
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _c2d(w):  # torch conv2d -> flax
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _c1d(w):  # torch conv1d -> ours (k, I, O)
    return np.transpose(np.asarray(w), (2, 1, 0))


def _lin(w):  # torch linear -> x@W
    return np.transpose(np.asarray(w))


def _bn(dst_params, dst_stats, our_prefix, sd, ref_prefix):
    dst_params[f"{our_prefix}/scale"] = np.asarray(sd[f"{ref_prefix}.weight"])
    dst_params[f"{our_prefix}/bias"] = np.asarray(sd[f"{ref_prefix}.bias"])
    dst_stats[f"{our_prefix}/mean"] = np.asarray(sd[f"{ref_prefix}.running_mean"])
    dst_stats[f"{our_prefix}/var"] = np.asarray(sd[f"{ref_prefix}.running_var"])


# FAN ResNet: reference layer -> (our BasicBlock start index, block count)
_RESNET_LAYERS = {"layer1": (0, 1), "layer2": (1, 2), "layer3": (3, 5), "layer4": (8, 3)}
_RESNET_CONVS = {
    "conv0_1": "ConvBN_0", "conv0_2": "ConvBN_1", "conv1": "ConvBN_2",
    "conv2": "ConvBN_3", "conv3": "ConvBN_4", "conv4_1": "ConvBN_5",
    "conv4_2": "ConvBN_6",
}


def _import_resnet(params, stats, sd, ref_bb: str, our_bb: str) -> None:
    for ref_name, our_name in _RESNET_CONVS.items():
        bn_name = "bn" + ref_name[4:] if ref_name.startswith("conv") else ref_name
        params[f"{our_bb}/{our_name}/Conv_0/kernel"] = _c2d(
            sd[f"{ref_bb}.{ref_name}.weight"]
        )
        _bn(params, stats, f"{our_bb}/{our_name}/BatchNorm_0", sd,
            f"{ref_bb}.{bn_name}")
    for lname, (start, count) in _RESNET_LAYERS.items():
        for j in range(count):
            rp = f"{ref_bb}.{lname}.{j}"
            op = f"{our_bb}/BasicBlock_{start + j}"
            params[f"{op}/ConvBN_0/Conv_0/kernel"] = _c2d(sd[f"{rp}.conv1.weight"])
            _bn(params, stats, f"{op}/ConvBN_0/BatchNorm_0", sd, f"{rp}.bn1")
            params[f"{op}/ConvBN_1/Conv_0/kernel"] = _c2d(sd[f"{rp}.conv2.weight"])
            _bn(params, stats, f"{op}/ConvBN_1/BatchNorm_0", sd, f"{rp}.bn2")
            if f"{rp}.downsample.0.weight" in sd:
                params[f"{op}/Conv_0/kernel"] = _c2d(sd[f"{rp}.downsample.0.weight"])
                _bn(params, stats, f"{op}/BatchNorm_0", sd, f"{rp}.downsample.1")
    # GCB blocks: the reference appends GlobalContext as the layer's last
    # Sequential member (resnet.py:200-201), i.e. layerN.<block_count>
    for gi, (lname, (_start, count)) in enumerate(_RESNET_LAYERS.items()):
        rp = f"{ref_bb}.{lname}.{count}"
        if f"{rp}.global_cxt.weight" not in sd:
            continue
        op = f"{our_bb}/GCB_{gi}"
        params[f"{op}/Conv_0/kernel"] = _c2d(sd[f"{rp}.global_cxt.weight"])
        params[f"{op}/Conv_0/bias"] = np.asarray(sd[f"{rp}.global_cxt.bias"])
        mlp = f"{rp}.bottleneck_add"
        fc1 = np.asarray(sd[f"{mlp}.fc1.weight"])  # (C, C, 1, 1) conv1x1 == dense
        params[f"{op}/Dense_0/kernel"] = fc1[:, :, 0, 0].T
        params[f"{op}/Dense_0/bias"] = np.asarray(sd[f"{mlp}.fc1.bias"])
        params[f"{op}/LayerNorm_0/scale"] = np.asarray(sd[f"{mlp}.norm.weight"])
        params[f"{op}/LayerNorm_0/bias"] = np.asarray(sd[f"{mlp}.norm.bias"])
        fc2 = np.asarray(sd[f"{mlp}.fc2.weight"])
        params[f"{op}/Dense_1/kernel"] = fc2[:, :, 0, 0].T
        params[f"{op}/Dense_1/bias"] = np.asarray(sd[f"{mlp}.fc2.bias"])


def _import_vit(params, stats, sd, depth: int, learned_pos: bool) -> None:
    enc = "seqmodeler.SequenceModeling"
    ours = "seqmodeler"
    ref_bb = f"{enc}.patch_embed.backbone.ConvNet"
    if f"{ref_bb}.conv0_1.weight" in sd:
        _import_resnet(
            params, stats, sd, ref_bb,
            f"{ours}/HybridEmbed_0/ResNetFeatureExtractor_0/FANResNet_0",
        )
        proj_prefix = f"{ours}/HybridEmbed_0/Conv_0"
    else:
        proj_prefix = f"{ours}/PatchEmbed_0/Conv_0"
    params[f"{proj_prefix}/kernel"] = _c2d(sd[f"{enc}.patch_embed.proj.weight"])
    params[f"{proj_prefix}/bias"] = np.asarray(sd[f"{enc}.patch_embed.proj.bias"])
    params[f"{ours}/cls_token"] = np.asarray(sd[f"{enc}.cls_token"])[0][None]
    if learned_pos and f"{enc}.pos_embed" in sd:
        params[f"{ours}/pos_embed"] = np.asarray(sd[f"{enc}.pos_embed"])[0]
    for i in range(depth):
        rb, ob = f"{enc}.blocks.{i}", f"{ours}/Block_{i}"
        for rn, on in (("norm1", "LayerNorm_0"), ("norm2", "LayerNorm_1")):
            params[f"{ob}/{on}/scale"] = np.asarray(sd[f"{rb}.{rn}.weight"])
            params[f"{ob}/{on}/bias"] = np.asarray(sd[f"{rb}.{rn}.bias"])
        params[f"{ob}/SelfAttention_0/Dense_0/kernel"] = _lin(sd[f"{rb}.attn.qkv.weight"])
        params[f"{ob}/SelfAttention_0/Dense_0/bias"] = np.asarray(sd[f"{rb}.attn.qkv.bias"])
        params[f"{ob}/SelfAttention_0/Dense_1/kernel"] = _lin(sd[f"{rb}.attn.proj.weight"])
        params[f"{ob}/SelfAttention_0/Dense_1/bias"] = np.asarray(sd[f"{rb}.attn.proj.bias"])
        params[f"{ob}/Mlp_0/Dense_0/kernel"] = _lin(sd[f"{rb}.mlp.fc1.weight"])
        params[f"{ob}/Mlp_0/Dense_0/bias"] = np.asarray(sd[f"{rb}.mlp.fc1.bias"])
        params[f"{ob}/Mlp_0/Dense_1/kernel"] = _lin(sd[f"{rb}.mlp.fc2.weight"])
        params[f"{ob}/Mlp_0/Dense_1/bias"] = np.asarray(sd[f"{rb}.mlp.fc2.bias"])
    params[f"{ours}/LayerNorm_0/scale"] = np.asarray(sd[f"{enc}.norm.weight"])
    params[f"{ours}/LayerNorm_0/bias"] = np.asarray(sd[f"{enc}.norm.bias"])


def _import_attn_decoder(params, sd) -> None:
    p = "predicter.Prediction"
    o = "predicter"
    params[f"{o}/embedding"] = np.asarray(sd[f"{p}.embedding.weight"])
    cell = f"{p}.attention_cell"
    attn = f"{cell}.attn"
    if f"{attn}.loc_conv.weight" in sd:
        params[f"{o}/loc_conv_w"] = _c1d(sd[f"{attn}.loc_conv.weight"])
        params[f"{o}/loc_conv_b"] = np.asarray(sd[f"{attn}.loc_conv.bias"])
        params[f"{o}/w_loc"] = _lin(sd[f"{attn}.loc_proj.weight"])
        params[f"{o}/b_loc"] = np.asarray(sd[f"{attn}.loc_proj.bias"])
    for rn, on in (("query_proj", "query"), ("key_proj", "key"), ("score", "score")):
        key = f"{attn}.{rn}" if f"{attn}.{rn}.weight" in sd else f"{cell}.{rn}"
        # bias check too: bahdanau's bias-free projections map below
        if f"{key}.weight" in sd and f"{key}.bias" in sd:
            params[f"{o}/w_{on}"] = _lin(sd[f"{key}.weight"])
            params[f"{o}/b_{on}"] = np.asarray(sd[f"{key}.bias"])
    # luong cell (reference LuongAttentionCell, attention1D.py:38-71):
    # fc (no bias) for general/concat, `weight` (1, H) as the concat v
    if f"{attn}.fc.weight" in sd:
        params[f"{o}/w_luong"] = _lin(sd[f"{attn}.fc.weight"])
    if f"{attn}.weight" in sd:
        params[f"{o}/v_luong"] = np.asarray(sd[f"{attn}.weight"]).T
    # bahdanau cell (BahdanauAttentionCell, attention1D.py:74-86):
    # i2h -> key (bias-free), h2h -> query (with bias), score (bias-free)
    if f"{attn}.i2h.weight" in sd:
        params[f"{o}/w_key"] = _lin(sd[f"{attn}.i2h.weight"])
        params[f"{o}/b_key"] = np.zeros(
            sd[f"{attn}.i2h.weight"].shape[0], np.float32
        )
        params[f"{o}/w_query"] = _lin(sd[f"{attn}.h2h.weight"])
        params[f"{o}/b_query"] = np.asarray(sd[f"{attn}.h2h.bias"])
        params[f"{o}/w_score"] = _lin(sd[f"{attn}.score.weight"])
        params[f"{o}/b_score"] = np.zeros(1, np.float32)
    params[f"{o}/w_ih"] = _lin(sd[f"{cell}.rnn.weight_ih"])
    params[f"{o}/w_hh"] = _lin(sd[f"{cell}.rnn.weight_hh"])
    params[f"{o}/b_ih"] = np.asarray(sd[f"{cell}.rnn.bias_ih"])
    params[f"{o}/b_hh"] = np.asarray(sd[f"{cell}.rnn.bias_hh"])
    params[f"{o}/w_gen"] = _lin(sd[f"{cell}.generator.weight"])
    params[f"{o}/b_gen"] = np.asarray(sd[f"{cell}.generator.bias"])
    if f"{p}.proj_init_h.weight" in sd:
        params[f"{o}/w_init_h"] = _lin(sd[f"{p}.proj_init_h.weight"])
        params[f"{o}/b_init_h"] = np.asarray(sd[f"{p}.proj_init_h.bias"])
        params[f"{o}/w_init_c"] = _lin(sd[f"{p}.proj_init_c.weight"])
        params[f"{o}/b_init_c"] = np.asarray(sd[f"{p}.proj_init_c.bias"])


def _import_tfm_decoder(params, sd, num_layers: int) -> None:
    p = "predicter.Prediction"
    o = "predicter"
    params[f"{o}/word_embed"] = np.asarray(sd[f"{p}.word_embed.weight"])
    params[f"{o}/w_proj"] = _lin(sd[f"{p}.proj.weight"])
    params[f"{o}/b_proj"] = np.asarray(sd[f"{p}.proj.bias"])
    for i in range(num_layers):
        rl = f"{p}.model.layers.{i}"
        d = np.asarray(sd[f"{rl}.self_attn.in_proj_weight"]).shape[0] // 3
        inw = np.asarray(sd[f"{rl}.self_attn.in_proj_weight"])
        inb = np.asarray(sd[f"{rl}.self_attn.in_proj_bias"])
        for j, nm in enumerate("qkv"):
            params[f"{o}/l{i}_sa_w{nm}"] = _lin(inw[j * d : (j + 1) * d])
            params[f"{o}/l{i}_sa_b{nm}"] = inb[j * d : (j + 1) * d]
        params[f"{o}/l{i}_sa_wo"] = _lin(sd[f"{rl}.self_attn.out_proj.weight"])
        params[f"{o}/l{i}_sa_bo"] = np.asarray(sd[f"{rl}.self_attn.out_proj.bias"])
        inw = np.asarray(sd[f"{rl}.multihead_attn.in_proj_weight"])
        inb = np.asarray(sd[f"{rl}.multihead_attn.in_proj_bias"])
        for j, nm in enumerate("qkv"):
            params[f"{o}/l{i}_ca_w{nm}"] = _lin(inw[j * d : (j + 1) * d])
            params[f"{o}/l{i}_ca_b{nm}"] = inb[j * d : (j + 1) * d]
        params[f"{o}/l{i}_ca_wo"] = _lin(sd[f"{rl}.multihead_attn.out_proj.weight"])
        params[f"{o}/l{i}_ca_bo"] = np.asarray(sd[f"{rl}.multihead_attn.out_proj.bias"])
        params[f"{o}/l{i}_ff_w1"] = _lin(sd[f"{rl}.linear1.weight"])
        params[f"{o}/l{i}_ff_b1"] = np.asarray(sd[f"{rl}.linear1.bias"])
        params[f"{o}/l{i}_ff_w2"] = _lin(sd[f"{rl}.linear2.weight"])
        params[f"{o}/l{i}_ff_b2"] = np.asarray(sd[f"{rl}.linear2.bias"])
        for rn, on in (("norm1", "n1"), ("norm2", "n2"), ("norm3", "n3")):
            params[f"{o}/l{i}_{on}_s"] = np.asarray(sd[f"{rl}.{rn}.weight"])
            params[f"{o}/l{i}_{on}_b"] = np.asarray(sd[f"{rl}.{rn}.bias"])


def import_torch_state_dict(
    state_dict: Mapping[str, Any], config, template_params, template_stats
):
    """state_dict (torch tensors or numpy) -> (params, batch_stats) trees.

    ``config`` is the reference-format model config; ``template_*`` come
    from ``model.init`` and provide the tree structure + dtypes.
    """
    from flax import serialization, traverse_util

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # strip DataParallel prefixes (reference checkpoints.py:4-10)
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}

    params: dict[str, np.ndarray] = {}
    stats: dict[str, np.ndarray] = {}

    if config["SequenceModeling"]["name"] == "ViT":
        smp = config["SequenceModeling"]["params"]
        _import_vit(
            params, stats, sd, smp["depth"],
            learned_pos=not smp.get("fix_embed", False),
        )
    pred = config["Prediction"]["name"]
    if pred.startswith("Attn"):
        _import_attn_decoder(params, sd)
    elif pred in ("TFM", "MS_TFM"):
        _import_tfm_decoder(
            params, sd, config["Prediction"]["params"].get("num_decoder_layers", 3)
        )

    flat_t = traverse_util.flatten_dict(
        serialization.to_state_dict(template_params), sep="/"
    )
    flat_s = traverse_util.flatten_dict(
        serialization.to_state_dict(template_stats), sep="/"
    )
    missing = [k for k in flat_t if k not in params]
    for k, v in params.items():
        if k not in flat_t:
            raise KeyError(f"mapped key {k} not in template params")
        if flat_t[k].shape != v.shape:
            raise ValueError(f"{k}: shape {v.shape} != template {flat_t[k].shape}")
        flat_t[k] = v.astype(flat_t[k].dtype)
    for k, v in stats.items():
        if k not in flat_s:
            raise KeyError(f"mapped key {k} not in template batch_stats")
        flat_s[k] = v.astype(flat_s[k].dtype)

    import jax.numpy as jnp

    new_params = serialization.from_state_dict(
        template_params,
        traverse_util.unflatten_dict({tuple(k.split("/")): v for k, v in flat_t.items()}),
    )
    new_stats = serialization.from_state_dict(
        template_stats,
        traverse_util.unflatten_dict({tuple(k.split("/")): v for k, v in flat_s.items()}),
    )
    import jax

    new_params = jax.tree_util.tree_map(jnp.asarray, new_params)
    new_stats = jax.tree_util.tree_map(jnp.asarray, new_stats)
    return new_params, new_stats, missing


def load_torch_checkpoint(path: str, config, template_params, template_stats):
    """Load a reference .pth checkpoint file (torch required)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() for k, v in sd.items()}
    return import_torch_state_dict(sd, config, template_params, template_stats)

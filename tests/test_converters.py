"""Converter plumbing tests: synthesize checkpoint-style state dicts by
inverse-mapping our own param trees, convert them back, and require exact
round-trips.  (No real weights exist offline — these validate key mapping
and transpose conventions, per convert_florence.py's stated caveat.)"""

import numpy as np
import jax
import pytest

from omniparser_tpu.models.yolov8 import Detector
from omniparser_tpu.weights.convert_yolo import _LAYER_MAP, convert_yolo_state_dict


def _inv_conv(k):  # flax [kh,kw,I,O] -> torch [O,I,kh,kw]
    return np.transpose(k, (3, 2, 0, 1))


def _emit_convbn(sd, src, p, s):
    sd[f"{src}.conv.weight"] = _inv_conv(p["conv"]["kernel"])
    sd[f"{src}.bn.weight"] = p["bn"]["scale"]
    sd[f"{src}.bn.bias"] = p["bn"]["bias"]
    sd[f"{src}.bn.running_mean"] = s["bn"]["mean"]
    sd[f"{src}.bn.running_var"] = s["bn"]["var"]


def _synthesize_ultralytics_sd(variables):
    """Our param tree -> ultralytics-style state_dict (the inverse map)."""
    p_all, s_all = variables["params"], variables["batch_stats"]
    sd = {}
    for idx, name in _LAYER_MAP.items():
        p, s = p_all[name], s_all[name]
        if "conv" in p:  # plain Conv
            _emit_convbn(sd, idx, p, s)
        else:
            _emit_convbn(sd, f"{idx}.cv1", p["cv1"], s["cv1"])
            _emit_convbn(sd, f"{idx}.cv2", p["cv2"], s["cv2"])
            i = 0
            while f"m{i}" in p:
                _emit_convbn(sd, f"{idx}.m.{i}.cv1", p[f"m{i}"]["cv1"], s[f"m{i}"]["cv1"])
                _emit_convbn(sd, f"{idx}.m.{i}.cv2", p[f"m{i}"]["cv2"], s[f"m{i}"]["cv2"])
                i += 1
    hp, hs = p_all["head"], s_all["head"]
    for lvl in range(3):
        for branch, ours in (("cv2", "box"), ("cv3", "cls")):
            _emit_convbn(sd, f"22.{branch}.{lvl}.0", hp[f"{ours}{lvl}_0"], hs[f"{ours}{lvl}_0"])
            _emit_convbn(sd, f"22.{branch}.{lvl}.1", hp[f"{ours}{lvl}_1"], hs[f"{ours}{lvl}_1"])
            sd[f"22.{branch}.{lvl}.2.weight"] = _inv_conv(hp[f"{ours}{lvl}_2"]["kernel"])
            sd[f"22.{branch}.{lvl}.2.bias"] = hp[f"{ours}{lvl}_2"]["bias"]
    return {f"model.{k}": v for k, v in sd.items()}


def test_yolo_converter_roundtrip():
    det = Detector(variant="n", num_classes=1, imgsz=64, max_det=8)
    variables = jax.tree.map(np.asarray, det.init_params(jax.random.PRNGKey(1)))
    sd = _synthesize_ultralytics_sd(variables)
    converted = convert_yolo_state_dict(sd)

    ref_leaves = jax.tree_util.tree_flatten_with_path(variables)[0]
    got = {jax.tree_util.keystr(p): v
           for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert len(ref_leaves) == len(got)
    for path, v in ref_leaves:
        key = jax.tree_util.keystr(path)
        assert key in got, key
        np.testing.assert_array_equal(got[key], np.asarray(v), err_msg=key)


def test_yolo_converter_missing_layer_raises():
    det = Detector(variant="n", num_classes=1, imgsz=64, max_det=8)
    variables = jax.tree.map(np.asarray, det.init_params(jax.random.PRNGKey(1)))
    sd = _synthesize_ultralytics_sd(variables)
    sd = {k: v for k, v in sd.items() if not k.startswith("model.9.")}  # drop SPPF
    with pytest.raises(KeyError):
        convert_yolo_state_dict(sd)


# ---------------------------------------------------------------- #
# Florence converter
# ---------------------------------------------------------------- #

from omniparser_tpu.models.florence2 import Florence2, FlorenceDims
from omniparser_tpu.weights.convert_florence import convert_florence_state_dict

TINY = FlorenceDims(
    embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 4, 8), num_groups=(1, 2, 4, 8),
    depths=(1, 1, 2, 1), window_size=4, d_model=32, encoder_layers=2,
    decoder_layers=2, attn_heads=4, ffn_dim=64, vocab_size=100, max_positions=64,
)


def _inv_lin(k):
    return np.transpose(k, (1, 0))


def _synthesize_florence_sd(variables, dims):
    p = variables["params"]
    sd = {}
    dav = p["vision"]["davit"]
    for s in range(4):
        sd[f"vision_tower.convs.{s}.proj.weight"] = _inv_conv(dav[f"patch_embed{s}_conv"]["kernel"])
        sd[f"vision_tower.convs.{s}.proj.bias"] = dav[f"patch_embed{s}_conv"]["bias"]
        sd[f"vision_tower.convs.{s}.norm.weight"] = dav[f"patch_embed{s}_norm"]["scale"]
        sd[f"vision_tower.convs.{s}.norm.bias"] = dav[f"patch_embed{s}_norm"]["bias"]
        for d in range(dims.depths[s]):
            for half, kind in (("0", "spatial"), ("1", "channel")):
                blk = dav[f"stage{s}_blk{d}_{kind}"]
                pre = f"vision_tower.blocks.{s}.{d}.{half}"
                for cpe, torch_name in (("cpe1", "conv1.fn.dw"), ("cpe2", "conv2.fn.dw")):
                    sd[f"{pre}.{torch_name}.weight"] = _inv_conv(blk[cpe]["proj"]["kernel"])
                    sd[f"{pre}.{torch_name}.bias"] = blk[cpe]["proj"]["bias"]
                for nm in ("norm1", "norm2"):
                    sd[f"{pre}.{nm}.weight"] = blk[nm]["scale"]
                    sd[f"{pre}.{nm}.bias"] = blk[nm]["bias"]
                sd[f"{pre}.attn.qkv.weight"] = _inv_lin(blk["attn"]["qkv"]["kernel"])
                sd[f"{pre}.attn.qkv.bias"] = blk["attn"]["qkv"]["bias"]
                sd[f"{pre}.attn.proj.weight"] = _inv_lin(blk["attn"]["proj"]["kernel"])
                sd[f"{pre}.attn.proj.bias"] = blk["attn"]["proj"]["bias"]
                sd[f"{pre}.ffn.fn.net.fc1.weight"] = _inv_lin(blk["mlp"]["fc1"]["kernel"])
                sd[f"{pre}.ffn.fn.net.fc1.bias"] = blk["mlp"]["fc1"]["bias"]
                sd[f"{pre}.ffn.fn.net.fc2.weight"] = _inv_lin(blk["mlp"]["fc2"]["kernel"])
                sd[f"{pre}.ffn.fn.net.fc2.bias"] = blk["mlp"]["fc2"]["bias"]
    vis = p["vision"]
    sd["image_projection"] = vis["image_projection"]
    sd["image_proj_norm.weight"] = vis["image_proj_norm"]["scale"]
    sd["image_proj_norm.bias"] = vis["image_proj_norm"]["bias"]
    sd["image_pos_embed.row_embeddings.weight"] = vis["image_pos_embed_row"]
    sd["image_pos_embed.column_embeddings.weight"] = vis["image_pos_embed_col"]

    lm = p["language_model"]
    sd["language_model.model.shared.weight"] = lm["shared"]["embedding"]
    for side in ("encoder", "decoder"):
        sd[f"language_model.model.{side}.embed_positions.weight"] = (
            lm[f"{side}_embed_positions"]["embedding"]
        )
        sd[f"language_model.model.{side}.layernorm_embedding.weight"] = (
            lm[f"{side}_layernorm_embedding"]["scale"]
        )
        sd[f"language_model.model.{side}.layernorm_embedding.bias"] = (
            lm[f"{side}_layernorm_embedding"]["bias"]
        )
        n_layers = dims.encoder_layers if side == "encoder" else dims.decoder_layers
        for i in range(n_layers):
            layer = lm[f"{side}_layer{i}"]
            pre = f"language_model.model.{side}.layers.{i}"
            attns = ["self_attn"] + (["encoder_attn"] if side == "decoder" else [])
            for attn in attns:
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    sd[f"{pre}.{attn}.{proj}.weight"] = _inv_lin(layer[attn][proj]["kernel"])
                    sd[f"{pre}.{attn}.{proj}.bias"] = layer[attn][proj]["bias"]
                sd[f"{pre}.{attn}_layer_norm.weight"] = layer[f"{attn}_layer_norm"]["scale"]
                sd[f"{pre}.{attn}_layer_norm.bias"] = layer[f"{attn}_layer_norm"]["bias"]
            for fc in ("fc1", "fc2"):
                sd[f"{pre}.{fc}.weight"] = _inv_lin(layer[fc]["kernel"])
                sd[f"{pre}.{fc}.bias"] = layer[fc]["bias"]
            sd[f"{pre}.final_layer_norm.weight"] = layer["final_layer_norm"]["scale"]
            sd[f"{pre}.final_layer_norm.bias"] = layer["final_layer_norm"]["bias"]
    sd["language_model.final_logits_bias"] = lm["final_logits_bias"].reshape(1, -1)
    return {k: np.asarray(v) for k, v in sd.items()}


def test_florence_converter_roundtrip():
    import jax.numpy as jnp

    model = Florence2(dims=TINY)
    variables = jax.tree.map(
        np.asarray,
        model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, 3), jnp.float32),
            jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, 2), jnp.int32),
        ),
    )
    sd = _synthesize_florence_sd(variables, TINY)
    converted, unmatched = convert_florence_state_dict(sd, TINY)
    assert unmatched == [], unmatched[:10]

    ref = {jax.tree_util.keystr(p): v
           for p, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
    got = {jax.tree_util.keystr(p): v
           for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    # temporal embed is synthesized (cosine) when absent from the checkpoint
    for key in ref:
        assert key in got, key
        if "visual_temporal_embed" in key:
            assert got[key].shape == ref[key].shape
            continue
        np.testing.assert_array_equal(got[key], ref[key], err_msg=key)
    assert set(got) == set(ref)


# ---------------------------------------------------------------- #
# BLIP-2 converter
# ---------------------------------------------------------------- #

from omniparser_tpu.models.blip2 import TINY_BLIP2, Blip2
from omniparser_tpu.weights.convert_blip2 import convert_blip2_state_dict


def _synthesize_blip2_sd(variables, dims):
    p = variables["params"]
    sd = {}
    vm = p["vision_model"]
    sd["vision_model.embeddings.class_embedding"] = vm["class_embedding"].reshape(1, 1, -1)
    sd["vision_model.embeddings.position_embedding"] = vm["position_embedding"][None]
    sd["vision_model.embeddings.patch_embedding.weight"] = _inv_conv(vm["patch_embedding"]["kernel"])
    sd["vision_model.embeddings.patch_embedding.bias"] = vm["patch_embedding"]["bias"]
    sd["vision_model.post_layernorm.weight"] = vm["post_layernorm"]["scale"]
    sd["vision_model.post_layernorm.bias"] = vm["post_layernorm"]["bias"]
    for i in range(dims.vision_layers):
        pre = f"vision_model.encoder.layers.{i}"
        sd[f"{pre}.self_attn.qkv.weight"] = _inv_lin(vm[f"l{i}_attn"]["qkv"]["kernel"])
        sd[f"{pre}.self_attn.qkv.bias"] = vm[f"l{i}_attn"]["qkv"]["bias"]
        sd[f"{pre}.self_attn.projection.weight"] = _inv_lin(vm[f"l{i}_attn"]["projection"]["kernel"])
        sd[f"{pre}.self_attn.projection.bias"] = vm[f"l{i}_attn"]["projection"]["bias"]
        for fc in ("fc1", "fc2"):
            sd[f"{pre}.mlp.{fc}.weight"] = _inv_lin(vm[f"l{i}_{fc}"]["kernel"])
            sd[f"{pre}.mlp.{fc}.bias"] = vm[f"l{i}_{fc}"]["bias"]
        for ln, ours in (("layer_norm1", "ln1"), ("layer_norm2", "ln2")):
            sd[f"{pre}.{ln}.weight"] = vm[f"l{i}_{ours}"]["scale"]
            sd[f"{pre}.{ln}.bias"] = vm[f"l{i}_{ours}"]["bias"]

    qf = p["qformer"]
    sd["query_tokens"] = qf["query_tokens"]
    sd["qformer.layernorm.weight"] = qf["layernorm"]["scale"]
    sd["qformer.layernorm.bias"] = qf["layernorm"]["bias"]
    for i in range(dims.qformer_layers):
        pre = f"qformer.encoder.layer.{i}"
        blocks = [("attention", f"l{i}_self")]
        if i % dims.cross_frequency == 0:
            blocks.append(("crossattention", f"l{i}_cross"))
        for hf_name, ours in blocks:
            blk = qf[ours]
            for proj in ("query", "key", "value"):
                sd[f"{pre}.{hf_name}.attention.{proj}.weight"] = _inv_lin(blk[proj]["kernel"])
                sd[f"{pre}.{hf_name}.attention.{proj}.bias"] = blk[proj]["bias"]
            sd[f"{pre}.{hf_name}.output.dense.weight"] = _inv_lin(blk["output_dense"]["kernel"])
            sd[f"{pre}.{hf_name}.output.dense.bias"] = blk["output_dense"]["bias"]
            sd[f"{pre}.{hf_name}.output.LayerNorm.weight"] = blk["output_ln"]["scale"]
            sd[f"{pre}.{hf_name}.output.LayerNorm.bias"] = blk["output_ln"]["bias"]
        sd[f"{pre}.intermediate_query.dense.weight"] = _inv_lin(qf[f"l{i}_fc1"]["kernel"])
        sd[f"{pre}.intermediate_query.dense.bias"] = qf[f"l{i}_fc1"]["bias"]
        sd[f"{pre}.output_query.dense.weight"] = _inv_lin(qf[f"l{i}_fc2"]["kernel"])
        sd[f"{pre}.output_query.dense.bias"] = qf[f"l{i}_fc2"]["bias"]
        sd[f"{pre}.output_query.LayerNorm.weight"] = qf[f"l{i}_ffn_ln"]["scale"]
        sd[f"{pre}.output_query.LayerNorm.bias"] = qf[f"l{i}_ffn_ln"]["bias"]

    sd["language_projection.weight"] = _inv_lin(p["language_projection"]["kernel"])
    sd["language_projection.bias"] = p["language_projection"]["bias"]
    lm = p["language_model"]
    sd["language_model.model.decoder.embed_tokens.weight"] = lm["embed_tokens"]["embedding"]
    sd["language_model.model.decoder.embed_positions.weight"] = lm["embed_positions"]["embedding"]
    sd["language_model.model.decoder.final_layer_norm.weight"] = lm["final_layer_norm"]["scale"]
    sd["language_model.model.decoder.final_layer_norm.bias"] = lm["final_layer_norm"]["bias"]
    for i in range(dims.lm_layers):
        pre = f"language_model.model.decoder.layers.{i}"
        layer = lm[f"layer{i}"]
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{pre}.self_attn.{proj}.weight"] = _inv_lin(layer[proj]["kernel"])
            sd[f"{pre}.self_attn.{proj}.bias"] = layer[proj]["bias"]
        for fc in ("fc1", "fc2"):
            sd[f"{pre}.{fc}.weight"] = _inv_lin(layer[fc]["kernel"])
            sd[f"{pre}.{fc}.bias"] = layer[fc]["bias"]
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{pre}.{ln}.weight"] = layer[ln]["scale"]
            sd[f"{pre}.{ln}.bias"] = layer[ln]["bias"]
    return {k: np.asarray(v) for k, v in sd.items()}


def test_blip2_converter_roundtrip():
    import jax.numpy as jnp

    model = Blip2(dims=TINY_BLIP2)
    variables = jax.tree.map(
        np.asarray,
        model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 28, 28, 3), jnp.float32),
            jnp.zeros((1, 3), jnp.int32),
            jnp.zeros((1, 2), jnp.int32),
        ),
    )
    sd = _synthesize_blip2_sd(variables, TINY_BLIP2)
    converted, unmatched = convert_blip2_state_dict(sd, TINY_BLIP2)
    assert unmatched == [], unmatched[:10]
    ref = {jax.tree_util.keystr(p): v
           for p, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
    got = {jax.tree_util.keystr(p): v
           for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(got) == set(ref), (set(ref) - set(got), set(got) - set(ref))
    for key in ref:
        np.testing.assert_array_equal(got[key], ref[key], err_msg=key)

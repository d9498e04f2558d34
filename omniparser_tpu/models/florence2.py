"""Florence-2-class icon captioner, TPU-first.

From-scratch JAX implementation of the architecture family the reference
drives through HF `trust_remote_code` (util/utils.py:61-68: Florence-2-base
processor + fine-tuned weights; generation at util/utils.py:115:
max_new_tokens=20, greedy):

  * DaViT vision tower — dual attention (windowed spatial + channel-group)
    blocks, depths (1, 1, 9, 1), dims (128, 256, 512, 1024);
  * learned 2D image position embedding + temporal embedding, spatial/
    temporal average-pool feature sources, linear projection to d_model;
  * BART-family language model — 6+6 layers, d=768, learned positions with
    the BART +2 offset, shared embeddings, tied LM head;
  * greedy KV-cache decode as one `lax.scan` over max_new_tokens steps —
    the whole generate() is a single jitted graph on fixed shapes (the
    reference's HF generate loop re-dispatches per token from host).

Parameter tree names mirror HF's florence-2 safetensors keys closely so
weights/convert_florence.py is a mechanical rename (see that module).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from omniparser_tpu.config import CaptionerConfig


@dataclasses.dataclass(frozen=True)
class FlorenceDims:
    """florence-2-base dims (HF config.json of microsoft/Florence-2-base)."""

    embed_dims: Tuple[int, ...] = (128, 256, 512, 1024)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    num_groups: Tuple[int, ...] = (4, 8, 16, 32)
    depths: Tuple[int, ...] = (1, 1, 9, 1)
    patch_size: Tuple[int, ...] = (7, 3, 3, 3)
    patch_stride: Tuple[int, ...] = (4, 2, 2, 2)
    patch_padding: Tuple[int, ...] = (3, 1, 1, 1)
    # True = LayerNorm the stage INPUT before its conv (the genuine
    # Florence-2 DaViT: convs.{1,2,3}.norm has embed_dim[s-1] params);
    # False = post-norm the conv output.  Legacy first-party checkpoints
    # (cap_synth) predate this fix and load with all-False.
    patch_prenorm: Tuple[bool, ...] = (False, True, True, True)
    window_size: int = 12
    mlp_ratio: float = 4.0
    d_model: int = 768
    encoder_layers: int = 6
    decoder_layers: int = 6
    attn_heads: int = 12
    ffn_dim: int = 3072
    vocab_size: int = 51289
    max_positions: int = 1024
    pos_embed_grid: int = 50  # learned 2D image pos-embed table side
    pad_token_id: int = 1
    bos_token_id: int = 0
    eos_token_id: int = 2
    decoder_start_token_id: int = 2


BASE = FlorenceDims()


# --------------------------------------------------------------------- #
# DaViT vision tower
# --------------------------------------------------------------------- #


class ConvPosEnc(nn.Module):
    """3x3 depthwise conv positional encoding (DaViT conv_at_attn/ffn)."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        h, w = hw
        b, n, c = x.shape
        y = x.reshape(b, h, w, c)
        y = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                    dtype=self.dtype, name="proj")(y)
        return x + y.reshape(b, n, c)


class WindowAttention(nn.Module):
    """Spatial attention in non-overlapping windows (global if map fits)."""

    dim: int
    heads: int
    window: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        h, w = hw
        b, n, c = x.shape
        ws = min(self.window, h, w)
        pad_h = (-h) % ws
        pad_w = (-w) % ws
        hp, wp = h + pad_h, w + pad_w

        y = x.reshape(b, h, w, c)
        y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        nh, nw = hp // ws, wp // ws
        y = y.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b * nh * nw, ws * ws, c)

        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.heads

        def heads_split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = map(heads_split, (q, k, v))
        attn = (q * (hd ** -0.5)) @ k.transpose(0, 1, 3, 2)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(-1, ws * ws, c)
        y = nn.Dense(c, dtype=self.dtype, name="proj")(y)

        y = y.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b, hp, wp, c)[:, :h, :w, :]
        return y.reshape(b, n, c)


class ChannelAttention(nn.Module):
    """DaViT channel-group attention: softmax over channel-channel pairs."""

    dim: int
    groups: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        gd = c // self.groups
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def grp(t):
            return t.reshape(b, n, self.groups, gd).transpose(0, 2, 1, 3)  # [B,G,N,gd]

        q, k, v = map(grp, (q, k, v))
        attn = (q * (gd ** -0.5)).transpose(0, 1, 3, 2) @ k  # [B,G,gd,gd]
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        y = (attn @ v.transpose(0, 1, 3, 2)).transpose(0, 1, 3, 2)  # [B,G,N,gd]
        y = y.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(y)


class Mlp(nn.Module):
    dim: int
    ratio: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(int(self.dim * self.ratio), dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class SpatialBlock(nn.Module):
    dim: int
    heads: int
    window: int
    ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw):
        x = ConvPosEnc(self.dim, self.dtype, name="cpe1")(x, hw)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + WindowAttention(self.dim, self.heads, self.window, self.dtype, name="attn")(y, hw)
        x = ConvPosEnc(self.dim, self.dtype, name="cpe2")(x, hw)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        return x + Mlp(self.dim, self.ratio, self.dtype, name="mlp")(y)


class ChannelBlock(nn.Module):
    dim: int
    groups: int
    ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw):
        x = ConvPosEnc(self.dim, self.dtype, name="cpe1")(x, hw)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + ChannelAttention(self.dim, self.groups, self.dtype, name="attn")(y)
        x = ConvPosEnc(self.dim, self.dtype, name="cpe2")(x, hw)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        return x + Mlp(self.dim, self.ratio, self.dtype, name="mlp")(y)


class DaViT(nn.Module):
    """4-stage dual-attention vision tower: [B,H,W,3] -> [B, N, C4]."""

    dims: FlorenceDims = BASE
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = self.dims
        for stage in range(4):
            k, s, p = d.patch_size[stage], d.patch_stride[stage], d.patch_padding[stage]
            if d.patch_prenorm[stage]:
                # genuine checkpoint semantics (patch_prenorm = False,
                # True, True, True): stages 1-3 LayerNorm the INPUT
                # channels before the conv — convs.{s}.norm.weight has
                # shape embed_dim[s-1] in microsoft/Florence-2-base
                # (pinned by tests/test_hf_keys.py against the
                # first-party transformers Florence2VisionBackbone)
                x = nn.LayerNorm(dtype=jnp.float32,
                                 name=f"patch_embed{stage}_norm")(x).astype(self.dtype)
            x = nn.Conv(d.embed_dims[stage], (k, k), strides=(s, s),
                        padding=[(p, p), (p, p)], dtype=self.dtype,
                        name=f"patch_embed{stage}_conv")(x)
            b, h, w, c = x.shape
            x = x.reshape(b, h * w, c)
            if not d.patch_prenorm[stage]:
                x = nn.LayerNorm(dtype=jnp.float32,
                                 name=f"patch_embed{stage}_norm")(x).astype(self.dtype)
            for blk in range(d.depths[stage]):
                x = SpatialBlock(c, d.num_heads[stage], d.window_size,
                                 d.mlp_ratio, self.dtype,
                                 name=f"stage{stage}_blk{blk}_spatial")(x, (h, w))
                x = ChannelBlock(c, d.num_groups[stage], d.mlp_ratio, self.dtype,
                                 name=f"stage{stage}_blk{blk}_channel")(x, (h, w))
            if stage < 3:
                x = x.reshape(b, h, w, c)
        return x  # [B, N, C4]


class Florence2VisionEncoder(nn.Module):
    """DaViT + pos embeds + (spatial, temporal) pooled features + projection
    to d_model (mirrors the HF model's _encode_image)."""

    dims: FlorenceDims = BASE
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel_values):
        d = self.dims
        x = DaViT(d, self.dtype, name="davit")(pixel_values)  # [B, N, C4]
        b, n, c = x.shape
        side = int(round(n ** 0.5))

        # learned 2D position embedding (row + column tables)
        row = self.param("image_pos_embed_row", nn.initializers.normal(0.02),
                         (d.pos_embed_grid, c))
        col = self.param("image_pos_embed_col", nn.initializers.normal(0.02),
                         (d.pos_embed_grid, c))
        pos = (row[:side, None, :] + col[None, :side, :]).reshape(1, n, c)
        x = x + pos.astype(self.dtype)

        # temporal embedding (T=1)
        temporal = self.param("visual_temporal_embed", nn.initializers.normal(0.02), (1, c))
        x = x + temporal[None].astype(self.dtype)

        # feature sources: spatial_avg_pool (1 token) + temporal_avg_pool (N tokens)
        spatial = x.mean(axis=1, keepdims=True)  # [B, 1, C]
        feats = jnp.concatenate([spatial, x], axis=1)  # [B, 1+N, C]

        proj = self.param("image_projection", nn.initializers.normal(0.02),
                          (c, d.d_model))
        y = feats @ proj.astype(self.dtype)
        return nn.LayerNorm(dtype=jnp.float32, name="image_proj_norm")(y).astype(self.dtype)


# --------------------------------------------------------------------- #
# BART-family language model
# --------------------------------------------------------------------- #


class BartAttention(nn.Module):
    """Multi-head attention with optional KV cache (decode) and cross-attn.

    For cross-attention during decode, pass `kv_heads=(k, v)` (head-split,
    precomputed once from the encoder states via `project_kv`) so the scan
    doesn't re-project the full encoder sequence every step.
    """

    d_model: int
    heads: int
    dtype: Any = jnp.bfloat16
    quant: bool = False  # int8 weight-only projections (models/quant.py)

    def setup(self):
        if self.quant:
            from omniparser_tpu.models.quant import QDense

            dense = partial(QDense, dtype=self.dtype)
        else:
            dense = partial(nn.Dense, dtype=self.dtype)
        self.q_proj = dense(self.d_model)
        self.k_proj = dense(self.d_model)
        self.v_proj = dense(self.d_model)
        self.out_proj = dense(self.d_model)

    def _split(self, t):
        hd = self.d_model // self.heads
        return t.reshape(t.shape[0], t.shape[1], self.heads, hd)

    def project_kv(self, kv_in):
        """Head-split (k, v) of encoder states — hoist out of decode loops."""
        return self._split(self.k_proj(kv_in)), self._split(self.v_proj(kv_in))

    def __call__(self, x, kv=None, mask=None, cache=None, cache_index=None,
                 kv_heads=None):
        hd = self.d_model // self.heads
        q = self._split(self.q_proj(x))
        if kv_heads is not None:
            k, v = kv_heads
        else:
            kv_in = x if kv is None else kv
            k, v = self._split(self.k_proj(kv_in)), self._split(self.v_proj(kv_in))

        if cache is not None:
            # decode step: write this step's k/v at cache_index
            ck, cv = cache
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
            k, v = ck, cv
            cache = (ck, cv)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
        if mask is not None:
            attn = jnp.where(mask, attn, jnp.finfo(attn.dtype).min)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(out.shape[0], out.shape[1], self.d_model)
        return self.out_proj(out), cache


class BartEncoderLayer(nn.Module):
    dims: FlorenceDims
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask):
        d = self.dims
        y, _ = BartAttention(d.d_model, d.attn_heads, self.dtype, name="self_attn")(x, mask=mask)
        x = nn.LayerNorm(dtype=jnp.float32, name="self_attn_layer_norm")(x + y).astype(self.dtype)
        y = nn.Dense(d.ffn_dim, dtype=self.dtype, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d.d_model, dtype=self.dtype, name="fc2")(y)
        return nn.LayerNorm(dtype=jnp.float32, name="final_layer_norm")(x + y).astype(self.dtype)


class BartDecoderLayer(nn.Module):
    dims: FlorenceDims
    dtype: Any = jnp.bfloat16
    quant: bool = False  # int8 weight-only decode matmuls (models/quant.py)

    def setup(self):
        d = self.dims
        if self.quant:
            from omniparser_tpu.models.quant import QDense

            dense = partial(QDense, dtype=self.dtype)
        else:
            dense = partial(nn.Dense, dtype=self.dtype)
        self.self_attn = BartAttention(d.d_model, d.attn_heads, self.dtype,
                                       quant=self.quant)
        self.self_attn_layer_norm = nn.LayerNorm(dtype=jnp.float32)
        self.encoder_attn = BartAttention(d.d_model, d.attn_heads, self.dtype,
                                          quant=self.quant)
        self.encoder_attn_layer_norm = nn.LayerNorm(dtype=jnp.float32)
        self.fc1 = dense(d.ffn_dim)
        self.fc2 = dense(d.d_model)
        self.final_layer_norm = nn.LayerNorm(dtype=jnp.float32)

    def cross_kv(self, enc):
        """Precompute this layer's cross-attention K/V from encoder states
        (hoisted out of the decode scan — the encoder sequence is fixed)."""
        return self.encoder_attn.project_kv(enc)

    def __call__(self, x, enc, self_mask, cross_mask, cache=None,
                 cache_index=None, cross_kv=None):
        y, cache = self.self_attn(x, mask=self_mask, cache=cache, cache_index=cache_index)
        x = self.self_attn_layer_norm(x + y).astype(self.dtype)
        y, _ = self.encoder_attn(x, kv=enc, mask=cross_mask, kv_heads=cross_kv)
        x = self.encoder_attn_layer_norm(x + y).astype(self.dtype)
        y = self.fc1(x)
        y = nn.gelu(y, approximate=False)
        y = self.fc2(y)
        return self.final_layer_norm(x + y).astype(self.dtype), cache


class Florence2LM(nn.Module):
    """BART-style encoder/decoder over (image tokens ++ prompt tokens)."""

    dims: FlorenceDims = BASE
    dtype: Any = jnp.bfloat16
    # int8 weight-only decoder + LM head (models/quant.py). The encoder
    # runs once per generate (compute-bound); the decoder re-reads its
    # weights max_new_tokens times (bandwidth-bound) — quantize only it.
    quant: bool = False

    def setup(self):
        d = self.dims
        if not self.quant:
            # quant mode drops the fp32 table entirely: lookups and the LM
            # head both read the int8 lm_head_kernel (per-row scales)
            self.shared = nn.Embed(d.vocab_size, d.d_model, dtype=self.dtype,
                                   name="shared")
        # BART's learned positions start at offset 2
        self.enc_pos = nn.Embed(d.max_positions + 2, d.d_model, dtype=self.dtype,
                                name="encoder_embed_positions")
        self.dec_pos = nn.Embed(d.max_positions + 2, d.d_model, dtype=self.dtype,
                                name="decoder_embed_positions")
        self.enc_ln = nn.LayerNorm(dtype=jnp.float32, name="encoder_layernorm_embedding")
        self.dec_ln = nn.LayerNorm(dtype=jnp.float32, name="decoder_layernorm_embedding")
        self.enc_layers = [
            BartEncoderLayer(d, self.dtype, name=f"encoder_layer{i}")
            for i in range(d.encoder_layers)
        ]
        self.dec_layers = [
            BartDecoderLayer(d, self.dtype, quant=self.quant,
                             name=f"decoder_layer{i}")
            for i in range(d.decoder_layers)
        ]
        self.final_logits_bias = self.param(
            "final_logits_bias", nn.initializers.zeros, (d.vocab_size,)
        )
        if self.quant:
            # untied int8 LM head, materialized from the shared embedding
            # by quantize_florence_params (per-vocab-row scales)
            self.lm_head_kernel = self.param(
                "lm_head_kernel", nn.initializers.zeros,
                (d.vocab_size, d.d_model), jnp.int8,
            )
            self.lm_head_scale = self.param(
                "lm_head_scale", nn.initializers.ones,
                (d.vocab_size,), jnp.float32,
            )

    def encode(self, inputs_embeds, attn_mask):
        """inputs_embeds: [B, S, D] (image features ++ token embeds);
        attn_mask: [B, S] bool."""
        s = inputs_embeds.shape[1]
        pos = self.enc_pos(jnp.arange(s) + 2)
        h = self.enc_ln(inputs_embeds + pos[None]).astype(self.dtype)
        m = attn_mask[:, None, None, :]  # [B,1,1,S]
        for layer in self.enc_layers:
            h = layer(h, m)
        return h

    def embed_tokens(self, ids):
        # BART scale_embedding=False for florence-2 language config
        if self.quant:
            # int8 row gather + per-row dequant (reads B rows, not the table)
            rows = jnp.take(self.lm_head_kernel, ids, axis=0).astype(self.dtype)
            return rows * jnp.take(self.lm_head_scale, ids)[..., None].astype(self.dtype)
        return self.shared(ids)

    def cross_kvs(self, enc):
        """Per-layer precomputed cross-attention (k, v) — compute once per
        generate call, not once per decode step."""
        return [layer.cross_kv(enc) for layer in self.dec_layers]

    def _logits(self, h):
        """Hidden states -> vocab logits (tied fp head, or the int8 head
        when quant: HBM reads the int8 table; fp32 accumulation)."""
        if self.quant:
            logits = jnp.einsum(
                "bqd,vd->bqv", h.astype(self.dtype),
                self.lm_head_kernel.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            return logits * self.lm_head_scale + self.final_logits_bias
        logits = h.astype(jnp.float32) @ self.shared.embedding.T.astype(jnp.float32)
        return logits + self.final_logits_bias

    def decode_step(self, token_ids, step, enc_mask, caches, cross_kvs):
        """One greedy step: token_ids [B,1] at position `step`.
        caches: per-layer (k,v) [B, max_len, H, hd];
        cross_kvs: per-layer precomputed encoder (k, v).
        Returns (logits, caches)."""
        h = self.embed_tokens(token_ids) + self.dec_pos(step + 2)[None, None]
        h = self.dec_ln(h).astype(self.dtype)
        max_len = caches[0][0].shape[1]
        # causal within cache: positions <= step are visible
        self_mask = (jnp.arange(max_len) <= step)[None, None, None, :]
        cross_mask = enc_mask[:, None, None, :]
        new_caches = []
        for layer, cache, ckv in zip(self.dec_layers, caches, cross_kvs):
            h, cache = layer(h, None, self_mask, cross_mask,
                             cache=cache, cache_index=step, cross_kv=ckv)
            new_caches.append(cache)
        return self._logits(h), new_caches

    def decode_train(self, token_ids, enc, enc_mask):
        """Teacher-forced decode (training / tests): token_ids [B, T]."""
        t = token_ids.shape[1]
        pos = self.dec_pos(jnp.arange(t) + 2)
        h = self.dec_ln(self.embed_tokens(token_ids) + pos[None]).astype(self.dtype)
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        cross = enc_mask[:, None, None, :]
        for layer in self.dec_layers:
            h, _ = layer(h, enc, causal, cross)
        return self._logits(h)

    def __call__(self, inputs_embeds, attn_mask, decoder_ids):
        """Training-style forward (used for init + loss)."""
        enc = self.encode(inputs_embeds, attn_mask)
        return self.decode_train(decoder_ids, enc, attn_mask)


class Florence2(nn.Module):
    """Vision encoder + language model, with a scan-based greedy generate."""

    dims: FlorenceDims = BASE
    dtype: Any = jnp.bfloat16
    quant: bool = False  # int8 weight-only decode (models/quant.py)

    def setup(self):
        self.vision = Florence2VisionEncoder(self.dims, self.dtype, name="vision")
        self.lm = Florence2LM(self.dims, self.dtype, quant=self.quant,
                              name="language_model")

    def __call__(self, pixel_values, prompt_ids, decoder_ids):
        """Teacher-forced forward for init/training.
        pixel_values [B,H,W,3] in [0,1]; prompt_ids [B,P]; decoder_ids [B,T]."""
        embeds, mask = self._build_encoder_inputs(pixel_values, prompt_ids)
        enc = self.lm.encode(embeds, mask)
        return self.lm.decode_train(decoder_ids, enc, mask)

    def _build_encoder_inputs(self, pixel_values, prompt_ids):
        img = self.vision(pixel_values)  # [B, I, D]
        txt = self.lm.embed_tokens(prompt_ids)  # [B, P, D]
        embeds = jnp.concatenate([img, txt.astype(img.dtype)], axis=1)
        b = embeds.shape[0]
        img_mask = jnp.ones((b, img.shape[1]), bool)
        txt_mask = prompt_ids != self.dims.pad_token_id
        return embeds, jnp.concatenate([img_mask, txt_mask], axis=1)

    def encode_inputs(self, pixel_values, prompt_ids):
        """Encoder half of generate: returns (per-layer cross K/V, enc mask).
        The encoder states themselves are not needed downstream — only
        their cross-attention projections, computed here once."""
        embeds, mask = self._build_encoder_inputs(pixel_values, prompt_ids)
        enc = self.lm.encode(embeds, mask)
        return self.lm.cross_kvs(enc), mask

    def decode_one(self, token_ids, step, enc_mask, caches, cross_kvs):
        """One greedy decode step (exposed for the lax.scan loop in
        FlorenceCaptioner / greedy_generate)."""
        return self.lm.decode_step(token_ids, step, enc_mask, caches, cross_kvs)


def greedy_generate(model: Florence2, params, pixel_values, prompt_ids,
                    max_new_tokens: int = 20, with_scores: bool = False):
    """Greedy KV-cache decode as one lax.scan — jit this whole function.

    Returns [B, max_new_tokens] int32 token ids, eos-stopped and pad-filled
    (matches the reference's generation args at util/utils.py:115).
    With ``with_scores`` also returns the per-sequence MEAN log-prob of
    the chosen tokens (pre-EOS) — a calibration-free decode-confidence
    signal (the log_softmax adds one [B,V] reduction per step, noise next
    to the matmuls).
    """
    d = model.dims
    cross_kvs, mask = model.apply(
        params, pixel_values, prompt_ids, method=Florence2.encode_inputs
    )
    b = mask.shape[0]
    dt = cross_kvs[0][0].dtype
    heads, hd = d.attn_heads, d.d_model // d.attn_heads
    caches = tuple(
        (
            jnp.zeros((b, max_new_tokens, heads, hd), dt),
            jnp.zeros((b, max_new_tokens, heads, hd), dt),
        )
        for _ in range(d.decoder_layers)
    )
    start = jnp.full((b, 1), d.decoder_start_token_id, jnp.int32)
    cross_kvs = tuple(tuple(kv) for kv in cross_kvs)

    def step(carry, t):
        tok, caches, done, acc, cnt = carry
        logits, caches = model.apply(
            params, tok, t, mask, list(caches), list(cross_kvs),
            method=Florence2.decode_one,
        )
        last = logits[:, -1]
        nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
        if with_scores:
            lp = jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)
            tok_lp = jnp.take_along_axis(lp, nxt[:, None], axis=-1)[:, 0]
            acc = acc + jnp.where(done, 0.0, tok_lp)
            cnt = cnt + jnp.where(done, 0, 1)
        nxt = jnp.where(done, d.pad_token_id, nxt)
        done = done | (nxt == d.eos_token_id)
        return (nxt[:, None], tuple(caches), done, acc, cnt), nxt

    (_, _, _, acc, cnt), tokens = jax.lax.scan(
        step,
        (start, caches, jnp.zeros((b,), bool), jnp.zeros((b,), jnp.float32),
         jnp.zeros((b,), jnp.int32)),
        jnp.arange(max_new_tokens),
    )
    if with_scores:
        return tokens.T, acc / jnp.maximum(cnt, 1)
    return tokens.T  # [B, T]


# --------------------------------------------------------------------- #
# Captioner wrapper (pipeline interface)
# --------------------------------------------------------------------- #

# Florence's processor maps task tokens to natural-language prompts; the
# reference always uses '<CAPTION>' (util/utils.py:100).
TASK_PROMPTS = {
    "<CAPTION>": "What does the image describe?",
    "<DETAILED_CAPTION>": "Describe in detail what is shown in the image.",
    "<MORE_DETAILED_CAPTION>": "Describe with a paragraph what is shown in the image.",
}

# CLIP normalization used by the Florence processor
_IMAGE_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGE_STD = np.array([0.229, 0.224, 0.225], np.float32)


def default_captioner_weights():
    """The shipped synthetic-GUI-glyph captioner checkpoint
    (train/train_captioner.py), when present.  Mirrors the detector/OCR
    'auto' defaults: every entry point gets functional captions without
    external weights (the reference fetches its fine-tuned icon_caption
    weights from HF — README.md:39)."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "weights", "cap_synth")
    if os.path.isfile(os.path.join(path, "dims.json")):
        return os.path.abspath(path)
    return None


class FlorenceCaptioner:
    """Pipeline captioner: batched crops -> greedy captions.

    With converted weights + tokenizer this reproduces the reference's
    captions; with random init it exercises the identical compute graph.
    """

    fusable = True  # greedy KV-cache decode composes into the fused parse step

    def __init__(
        self,
        config: CaptionerConfig,
        dims: FlorenceDims = BASE,
        params=None,
        tokenizer=None,
        rng: Optional[jax.Array] = None,
    ):
        self.config = config
        self.dims = dims
        quant = config.quant == "int8"
        self.model = Florence2(dims=dims, quant=quant)
        if tokenizer is None:
            from omniparser_tpu.models.tokenizer import load_tokenizer

            tokenizer = load_tokenizer(None)
        self.tokenizer = tokenizer
        self.prompt_ids = np.asarray(
            tokenizer.encode(TASK_PROMPTS[config.prompt]), np.int32
        )

        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            s = config.crop_size
            p = len(self.prompt_ids)
            # always init the fp model (realistic magnitudes), quantize below
            params = jax.jit(Florence2(dims=dims).init)(
                rng,
                jnp.zeros((1, s, s, 3), jnp.float32),
                jnp.zeros((1, p), jnp.int32),
                jnp.zeros((1, 1), jnp.int32),
            )
        if quant:
            from omniparser_tpu.models.quant import quantize_florence_params

            params = quantize_florence_params(params)
        self.params = params
        self._generate = jax.jit(
            lambda p, px, ids: greedy_generate(
                self.model, p, px, ids, max_new_tokens=config.max_new_tokens,
                with_scores=True,
            )
        )

    @classmethod
    def from_checkpoint(cls, path: str, config: CaptionerConfig):
        from omniparser_tpu.weights.convert_florence import load_florence_params
        from omniparser_tpu.models.tokenizer import load_tokenizer

        params, dims, tok_path = load_florence_params(path)
        return cls(config, dims=dims, params=params, tokenizer=load_tokenizer(tok_path))

    @classmethod
    def from_synth_checkpoint(cls, path: str, config: CaptionerConfig):
        """Load a first-party trained checkpoint (orbax tree saved by
        train/train_captioner.py with a dims.json sidecar) — the shipped
        synthetic-GUI-glyph captioner.  The reference analogue is the HF
        fine-tuned icon_caption weights (util/utils.py:61-68)."""
        import json
        import os

        import numpy as np

        from omniparser_tpu.weights.checkpoints import load_checkpoint

        with open(os.path.join(path, "dims.json")) as f:
            raw = json.load(f)
        # checkpoints written before the patch_prenorm fix trained with
        # post-norm conv embeds everywhere; keep loading them faithfully
        raw.setdefault("patch_prenorm", (False, False, False, False))
        dims = FlorenceDims(**{
            k: tuple(v) if isinstance(v, list) else v for k, v in raw.items()
        })
        model = Florence2(dims=dims)
        from omniparser_tpu.models.tokenizer import load_tokenizer

        tokenizer = load_tokenizer(None)
        prompt = tokenizer.encode(TASK_PROMPTS[config.prompt])
        like_vars = jax.eval_shape(
            partial(model.init, jax.random.PRNGKey(0)),
            jnp.zeros((1, config.crop_size, config.crop_size, 3), jnp.float32),
            jnp.zeros((1, len(prompt)), jnp.int32),
            jnp.zeros((1, 1), jnp.int32),
        )
        like = {"cap": jax.tree.map(
            lambda a: np.zeros(a.shape, a.dtype), like_vars)}
        restored = load_checkpoint(path, like=like)
        # device-resident ONCE (orbax restores host numpy; host trees
        # re-upload through the tunnel per dispatch — CLAUDE.md)
        params = jax.device_put(restored["cap"])
        return cls(config, dims=dims, params=params, tokenizer=tokenizer)

    def preprocess(self, crops_u8: jnp.ndarray) -> jnp.ndarray:
        """[N, S, S, 3] float crops in [0,255] -> CLIP-normalized."""
        x = crops_u8 / 255.0
        return (x - _IMAGE_MEAN) / _IMAGE_STD

    def tokens_to_text(self, token_row) -> str:
        """One generated token row -> caption string (specials stripped)."""
        ids = [int(t) for t in token_row if t not in
               (self.dims.pad_token_id, self.dims.eos_token_id, self.dims.bos_token_id)]
        return self.tokenizer.decode(ids).strip()

    def gate_caption(self, text: str, logp: float) -> str:
        """Decode-confidence gate (CaptionerConfig.min_logp): captions
        whose mean chosen-token log-prob falls below the floor become the
        junk-class phrase.  Real junk detector boxes (chrome fragments,
        partial widgets) that happen to greedy-decode a glyph phrase do
        so at visibly lower confidence than true glyphs; emitting them
        verbatim creates DUPLICATE captions on icon-dense screens, and a
        grounder (scripted or LLM) must then guess among them."""
        floor = self.config.min_logp
        if floor is not None and logp < floor:
            return "image icon"
        return text

    def caption_crops(self, crops, valid) -> List[str]:
        """crops: [N, S, S, 3] float in [0,255] (device); valid: [N] bool.
        Returns captions for valid slots, in order."""
        n = crops.shape[0]
        prompt = jnp.asarray(np.tile(self.prompt_ids[None], (n, 1)))
        tokens, logp = self._generate(self.params, self.preprocess(crops), prompt)
        tokens, logp = np.asarray(tokens), np.asarray(logp)
        return [self.gate_caption(self.tokens_to_text(tokens[i]), float(logp[i]))
                for i in range(n) if valid[i]]

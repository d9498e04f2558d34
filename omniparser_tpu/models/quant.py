"""Weight-only int8 quantization for the caption decode path.

The reference serves Florence-2 in fp16 on CUDA (util/utils.py:61-68) and
never quantizes.  On TPU the greedy KV-cache decode is HBM-bandwidth-bound:
with <=128 caption rows against 768-wide kernels the arithmetic intensity
sits far below the MXU roofline, so every decode step's cost is dominated
by re-reading the decoder + LM-head weights from HBM.  The win is therefore
not lower-precision math but HALVED WEIGHT TRAFFIC:

  * kernels are stored int8 with per-output-channel fp32 scales,
  * the int8 -> bf16 convert is fused by XLA into the dot's operand load
    (the tensor stays int8 in HBM),
  * accumulation is forced fp32 via preferred_element_type (TPU matmuls
    accumulate fp32 regardless of operand dtype),
  * the per-channel post-scale is algebraically the rescale the
    quantization divided out, so confident greedy argmax decisions are
    preserved (tests/test_quant.py gates caption exact-match on the
    shipped trained checkpoint).

Only the decoder + LM head are quantized: the vision tower and BART
encoder run ONCE per generate and are compute-bound, while the decoder
stack re-reads its weights max_new_tokens (20) times per caption batch.
The fp32 embedding table is dropped entirely — token lookups read int8
rows of the same table that serves the LM head (per-row dequant).

Measured on the tunneled dev chip (PERF.md "int8 decode"): on the shipped
cap_synth checkpoint, K=64 generate p50 drops 56.5 -> 41.8 ms (-26%) and
params 47 -> 29 MB; at full florence-2-base dims, resident params drop
926 -> 638 MB (-31%).  Captions are gate-tested to match the fp path
exactly (tests/test_quant.py).  The default stays 'none' for reference
parity; flip CaptionerConfig.quant='int8' for speed or when packing
multiple models (Phi-3V-class) onto one chip.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def quantize_columns(w):
    """fp kernel [in, out] -> (int8 [in, out], fp32 scale [out]).

    Symmetric per-output-channel: scale = max|col| / 127.
    """
    w = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_rows(w):
    """fp matrix [out, in] -> (int8 [out, in], fp32 scale [out]).

    Row-major variant for the LM head (vocab-major embedding table).
    """
    w = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / s[:, None]), -127, 127).astype(jnp.int8)
    return q, s


class QDense(nn.Module):
    """Drop-in nn.Dense with an int8 kernel + per-channel fp32 scale.

    Param tree: {kernel: int8 [in, out], scale: fp32 [out], bias: fp32 [out]}
    — same "kernel"/"bias" names as nn.Dense so quantize_florence_params is
    a leaf-local rewrite.  Init values are placeholders (zeros/ones); real
    trees always come from quantizing a trained fp tree.
    """

    features: int
    dtype: Any = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.zeros, (x.shape[-1], self.features), jnp.int8
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        x = x.astype(self.dtype)
        y = jnp.einsum(
            "...d,df->...f", x, kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        y = (y * scale).astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


_ATTN_PROJS = ("q_proj", "k_proj", "v_proj", "out_proj")


def _quantize_dense(mod: dict) -> None:
    q, s = quantize_columns(mod["kernel"])
    mod["kernel"] = q
    mod["scale"] = s  # bias stays fp32; QDense reads it unchanged


def quantize_florence_params(variables):
    """fp Florence-2 variables -> the tree Florence2(quant=True) expects.

    Rewrites every decoder layer's attention/FFN kernels to int8+scale and
    materializes a quantized LM head from the (tied) shared embedding; the
    fp table is then dropped — token lookups dequantize rows of the int8
    head table instead (Florence2LM.embed_tokens).
    """
    from flax.core import FrozenDict, freeze, unfreeze

    was_frozen = isinstance(variables, FrozenDict)
    tree = unfreeze(variables) if was_frozen else variables
    import jax

    tree = jax.tree.map(lambda x: x, tree)  # deep-copy containers via rebuild
    lm = tree["params"]["language_model"]
    for name, layer in lm.items():
        # 'decoder_layer{i}' only ('decoder_layernorm_embedding' also
        # shares the prefix)
        if not (name.startswith("decoder_layer") and name[13:].isdigit()):
            continue
        for attn in ("self_attn", "encoder_attn"):
            for proj in _ATTN_PROJS:
                _quantize_dense(layer[attn][proj])
        for fc in ("fc1", "fc2"):
            _quantize_dense(layer[fc])
    q, s = quantize_rows(lm["shared"]["embedding"])
    lm["lm_head_kernel"] = q
    lm["lm_head_scale"] = s
    # the int8 table serves BOTH the LM head and token lookups
    # (Florence2LM.embed_tokens); the fp32 table is dropped entirely
    del lm["shared"]
    return freeze(tree) if was_frozen else tree

"""CLIP zero-shot classifier (ViT + text transformer) in JAX.

Replaces the torch forward pass of the reference's CLIP labeling stage
(reference scripts/prepare_dataset.py:111-143, OpenAI ViT-B/32): the
reference runs `clip.load("ViT-B/32")` on CUDA and zero-shot classifies
every dataset image against the class prompts.  Here the same computation
runs as a jitted JAX program on TPU, with weights imported from a local
transformers `CLIPModel` checkpoint (zero-egress environment — same policy
as models/lpips.py / models/inception.py).

Semantics mirror transformers' eager CLIP exactly (pinned by
tests/test_clip.py against a runtime torch oracle at <=1e-4):

  * vision tower: patch conv (no bias) -> class token -> learned position
    embeddings -> pre-LN transformer -> post-LN on the [CLS] token ->
    visual projection (no bias)
  * text tower: token+position embeddings -> causal (+padding) masked
    pre-LN transformer -> final LN -> pooled at the first EOS position
    (transformers' non-legacy branch; the legacy argmax(input_ids) branch
    is used when config.eos_token_id == 2, matching modeling_clip.py)
  * logits_per_image = exp(logit_scale) * norm(img) @ norm(txt).T
  * activation: quick_gelu (x * sigmoid(1.702 x)) for the OpenAI configs

Everything is fp32 with precision="highest" — labeling is a one-shot
dataset pass; exactness over the torch oracle beats bf16 speed here.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_NEG = np.float32(np.finfo(np.float32).min)  # HF masks with finfo(dtype).min


def _layer_norm(x, scale, bias, eps=1e-5):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * scale + bias


def _linear(x, p):
    # p["w"] is stored input-major (in, out) — transposed from torch's (out, in)
    return jnp.einsum("...i,io->...o", x, p["w"],
                      precision=jax.lax.Precision.HIGHEST) + p["b"]


def _attention(x, p, num_heads, mask):
    """HF CLIPAttention eager path: q scaled by head_dim**-0.5, additive
    mask (already combined causal+padding, or None), fp32 softmax."""
    B, L, D = x.shape
    h = num_heads
    d = D // h
    q = _linear(x, p["q"]) * (d ** -0.5)
    k = _linear(x, p["k"])
    v = _linear(x, p["v"])
    q, k, v = (t.reshape(B, L, h, d).transpose(0, 2, 1, 3) for t in (q, k, v))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        precision=jax.lax.Precision.HIGHEST)
    if mask is not None:
        logits = logits + mask
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
    return _linear(out, p["o"])


def _mlp(x, p, act):
    x = _linear(x, p["fc1"])
    if act == "quick_gelu":
        x = x * jax.nn.sigmoid(1.702 * x)
    elif act == "gelu":
        x = jax.nn.gelu(x, approximate=False)
    else:  # pragma: no cover - other acts unused by CLIP configs
        raise ValueError(f"unsupported hidden_act {act!r}")
    return _linear(x, p["fc2"])


def _encoder(x, layers, num_heads, act, mask=None):
    for p in layers:
        x = x + _attention(_layer_norm(x, *p["ln1"]), p["attn"], num_heads, mask)
        x = x + _mlp(_layer_norm(x, *p["ln2"]), p["mlp"], act)
    return x


@functools.partial(jax.jit, static_argnames=("num_heads", "patch_size", "act"))
def _image_embeds(vision, pixel_nhwc, *, num_heads, patch_size, act):
    x = jax.lax.conv_general_dilated(
        pixel_nhwc.astype(jnp.float32), vision["patch_w"],
        (patch_size, patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    B = x.shape[0]
    x = x.reshape(B, -1, x.shape[-1])  # (B, Hp*Wp, D) row-major == torch flatten(2)
    cls = jnp.broadcast_to(vision["class_emb"], (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + vision["pos_emb"][None]
    x = _layer_norm(x, *vision["pre_ln"])
    x = _encoder(x, vision["layers"], num_heads, act)
    pooled = _layer_norm(x[:, 0], *vision["post_ln"])
    return jnp.einsum("bi,io->bo", pooled, vision["proj"],
                      precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("num_heads", "act"))
def _text_embeds(text, input_ids, attention_mask, eot_idx, *, num_heads, act):
    B, L = input_ids.shape
    x = text["tok_emb"][input_ids] + text["pos_emb"][:L][None]
    causal = jnp.triu(jnp.full((L, L), _NEG, jnp.float32), k=1)[None, None]
    mask = causal + (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * _NEG
    x = _encoder(x, text["layers"], num_heads, act, mask)
    x = _layer_norm(x, *text["final_ln"])
    pooled = x[jnp.arange(B), eot_idx]
    return jnp.einsum("bi,io->bo", pooled, text["proj"],
                      precision=jax.lax.Precision.HIGHEST)


class CLIPZeroShot:
    """Frozen functional CLIP. Construct via from_torch_model()."""

    def __init__(self, params: dict, *, vision_heads: int, text_heads: int,
                 patch_size: int, hidden_act: str, eos_token_id: int):
        self.params = jax.tree.map(jnp.asarray, params)
        self.vision_heads = vision_heads
        self.text_heads = text_heads
        self.patch_size = patch_size
        self.hidden_act = hidden_act
        self.eos_token_id = eos_token_id

    # ---- public API ----

    def _eot_index(self, input_ids: np.ndarray) -> np.ndarray:
        """transformers' pooling index, computed host-side: legacy models
        (eos_token_id == 2) pool at argmax(input_ids) — EOS is the largest
        id in the CLIP vocab — otherwise at the FIRST eos_token_id hit."""
        ids = np.asarray(input_ids)
        if self.eos_token_id == 2:
            return ids.argmax(-1)
        return (ids == self.eos_token_id).argmax(-1)

    def encode_images(self, pixel_values) -> jax.Array:
        """pixel_values: processor output, (B, 3, H, W) CHW float (torch
        convention) or (B, H, W, 3) NHWC; returns unnormalized embeds."""
        pv = np.asarray(pixel_values)
        if pv.shape[1] == 3 and pv.shape[-1] != 3:
            pv = pv.transpose(0, 2, 3, 1)
        return _image_embeds(
            self.params["vision"], jnp.asarray(pv),
            num_heads=self.vision_heads, patch_size=self.patch_size,
            act=self.hidden_act,
        )

    def encode_text(self, input_ids, attention_mask=None) -> jax.Array:
        ids = np.asarray(input_ids)
        am = np.ones_like(ids) if attention_mask is None else np.asarray(attention_mask)
        return _text_embeds(
            self.params["text"], jnp.asarray(ids, jnp.int32),
            jnp.asarray(am, jnp.int32),
            jnp.asarray(self._eot_index(ids), jnp.int32),
            num_heads=self.text_heads, act=self.hidden_act,
        )

    def logits_per_image(self, pixel_values, input_ids, attention_mask=None) -> jax.Array:
        img = self.encode_images(pixel_values)
        txt = self.encode_text(input_ids, attention_mask)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return jnp.exp(self.params["logit_scale"]) * img @ txt.T

    # ---- import ----

    @classmethod
    def from_torch_model(cls, model: Any) -> "CLIPZeroShot":
        """Import a transformers `CLIPModel` (weights + config)."""
        state = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
        vc, tc = model.config.vision_config, model.config.text_config
        return cls.from_state_dict(
            state,
            vision_heads=vc.num_attention_heads,
            text_heads=tc.num_attention_heads,
            patch_size=vc.patch_size,
            hidden_act=vc.hidden_act,
            eos_token_id=tc.eos_token_id,
        )

    @classmethod
    def from_state_dict(cls, state: dict[str, np.ndarray], *, vision_heads: int,
                        text_heads: int, patch_size: int,
                        hidden_act: str = "quick_gelu",
                        eos_token_id: int = 49407) -> "CLIPZeroShot":
        f32 = lambda k: np.asarray(state[k], np.float32)
        lin = lambda k: {"w": f32(k + ".weight").T, "b": f32(k + ".bias")}
        ln = lambda k: (f32(k + ".weight"), f32(k + ".bias"))

        def layers(prefix):
            out = []
            for i in range(10**6):
                base = f"{prefix}.encoder.layers.{i}"
                if base + ".layer_norm1.weight" not in state:
                    break
                out.append({
                    "ln1": ln(base + ".layer_norm1"),
                    "attn": {
                        "q": lin(base + ".self_attn.q_proj"),
                        "k": lin(base + ".self_attn.k_proj"),
                        "v": lin(base + ".self_attn.v_proj"),
                        "o": lin(base + ".self_attn.out_proj"),
                    },
                    "ln2": ln(base + ".layer_norm2"),
                    "mlp": {"fc1": lin(base + ".mlp.fc1"),
                            "fc2": lin(base + ".mlp.fc2")},
                })
            return out

        params = {
            "logit_scale": f32("logit_scale"),
            "vision": {
                # torch conv OIHW -> HWIO
                "patch_w": f32("vision_model.embeddings.patch_embedding.weight")
                           .transpose(2, 3, 1, 0),
                "class_emb": f32("vision_model.embeddings.class_embedding"),
                "pos_emb": f32("vision_model.embeddings.position_embedding.weight"),
                # transformers' key really is spelled "pre_layrnorm"
                "pre_ln": ln("vision_model.pre_layrnorm"),
                "layers": layers("vision_model"),
                "post_ln": ln("vision_model.post_layernorm"),
                "proj": f32("visual_projection.weight").T,
            },
            "text": {
                "tok_emb": f32("text_model.embeddings.token_embedding.weight"),
                "pos_emb": f32("text_model.embeddings.position_embedding.weight"),
                "layers": layers("text_model"),
                "final_ln": ln("text_model.final_layer_norm"),
                "proj": f32("text_projection.weight").T,
            },
        }
        return cls(params, vision_heads=vision_heads, text_heads=text_heads,
                   patch_size=patch_size, hidden_act=hidden_act,
                   eos_token_id=eos_token_id)

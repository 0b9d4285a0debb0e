"""Numerical parity of the JAX CLIP port vs a runtime transformers oracle.

The reference labels its diffusion dataset by zero-shot CLIP classification
(reference scripts/prepare_dataset.py:111-143).  models/clip.py re-implements
the CLIP forward (ViT + causal text transformer + projection + logit scale)
as a jitted JAX program; these tests pin it at <=1e-4 against a random-weight
transformers `CLIPModel` run in-process — same policy as the LPIPS/Inception
oracle tests (tests/test_pretrained_parity.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from image_diffusion_tpu.models.clip import CLIPZeroShot  # noqa: E402


def tiny_model(seed=0, eos_token_id=None):
    from transformers import CLIPConfig, CLIPModel

    text = dict(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, projection_dim=16,
    )
    if eos_token_id is not None:
        text["eos_token_id"] = eos_token_id
    cfg = CLIPConfig(
        text_config=text,
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8,
            projection_dim=16,
        ),
        projection_dim=16,
    )
    torch.manual_seed(seed)
    return CLIPModel(cfg).eval()


def random_batch(seed, eos_id, n=3, b=4, L=9, size=32):
    """Random pixel values (CHW, processor convention) and padded token
    batches: bos, random body, eos, pad — mirroring CLIPTokenizer output."""
    rng = np.random.default_rng(seed)
    pixel = rng.normal(0, 1, (b, 3, size, size)).astype(np.float32)
    lens = rng.integers(3, L + 1, (n,))
    ids = np.full((n, L), 0, np.int64)
    am = np.zeros((n, L), np.int64)
    for i, ln in enumerate(lens):
        ids[i, 0] = 2  # bos-ish (any id; parity doesn't care)
        ids[i, 1:ln - 1] = rng.integers(3, 60, (ln - 2,))
        ids[i, ln - 1] = eos_id
        am[i, :ln] = 1
    return pixel, ids, am


@pytest.mark.parametrize("eos_token_id", [63, 2])
def test_logits_match_transformers(eos_token_id):
    """Both pooling branches: the modern first-EOS branch (any id != 2;
    the real config uses 49407, here 63 to stay inside the tiny vocab) and
    the legacy argmax branch (eos_token_id == 2)."""
    model = tiny_model(seed=1 if eos_token_id == 2 else 0,
                       eos_token_id=eos_token_id)
    eos = model.config.text_config.eos_token_id
    # for the legacy branch, EOS must be the max id in each row (true of the
    # real CLIP vocab); cap body ids below it
    pixel, ids, am = random_batch(5, eos_id=63 if eos == 2 else eos)
    if eos == 2:
        ids[ids == 63] = 61
        ids[(np.arange(ids.shape[1])[None] == (am.sum(-1) - 1)[:, None])] = 63

    with torch.no_grad():
        out = model(
            pixel_values=torch.from_numpy(pixel),
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(am),
        )
    want = out.logits_per_image.numpy()

    port = CLIPZeroShot.from_torch_model(model)
    got = np.asarray(port.logits_per_image(pixel, ids, am))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_embeds_and_layouts():
    """Tower embeds match; NHWC input is accepted identically to CHW."""
    model = tiny_model(seed=3, eos_token_id=63)
    eos = model.config.text_config.eos_token_id
    pixel, ids, am = random_batch(11, eos_id=eos)

    with torch.no_grad():
        want_img = model.get_image_features(torch.from_numpy(pixel)).numpy()
        want_txt = model.get_text_features(
            torch.from_numpy(ids), torch.from_numpy(am)
        ).numpy()

    port = CLIPZeroShot.from_torch_model(model)
    np.testing.assert_allclose(
        np.asarray(port.encode_images(pixel)), want_img, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(port.encode_text(ids, am)), want_txt, atol=1e-4, rtol=1e-4)
    # NHWC layout detection
    np.testing.assert_allclose(
        np.asarray(port.encode_images(pixel.transpose(0, 2, 3, 1))),
        want_img, atol=1e-4, rtol=1e-4)


def test_no_attention_mask_defaults_to_ones():
    model = tiny_model(seed=4, eos_token_id=63)
    eos = model.config.text_config.eos_token_id
    _, ids, _ = random_batch(13, eos_id=eos)
    am = np.ones_like(ids)
    with torch.no_grad():
        want = model.get_text_features(
            torch.from_numpy(ids), torch.from_numpy(am)).numpy()
    port = CLIPZeroShot.from_torch_model(model)
    np.testing.assert_allclose(
        np.asarray(port.encode_text(ids)), want, atol=1e-4, rtol=1e-4)

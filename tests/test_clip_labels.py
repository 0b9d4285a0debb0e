"""CLIP zero-shot labeling branch of scripts/prepare_dataset.py.

The reference labels every image by zero-shot CLIP classification against
the class prompts (reference scripts/prepare_dataset.py:111-143).  These
tests execute our equivalent end to end — as a CLI subprocess — against a
tiny *random-weight* transformers CLIP saved locally (no network), and pin
the CLI's labels to an in-process oracle running the same model, proving
the wiring (image order, preprocessing, prompt batch, argmax) rather than
just the shape.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")
CLASSES = ["a hot place", "a cold place", "a mild place"]


@pytest.fixture(scope="module")
def tiny_clip(tmp_path_factory):
    """A complete from_pretrained-loadable CLIP dir: random tiny CLIPModel,
    hand-made BPE vocab/merges, image processor — built offline."""
    from transformers import (
        CLIPConfig,
        CLIPImageProcessor,
        CLIPModel,
        CLIPProcessor,
        CLIPTokenizer,
    )

    d = tmp_path_factory.mktemp("tiny_clip")
    # minimal CLIP-BPE vocab: specials, whole words for the prompts, and
    # single chars (plain + word-final </w>) as fallback
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for w in "a hot cold mild place".split():
        vocab.setdefault(w + "</w>", len(vocab))
    for ch in "abcdefghijklmnopqrstuvwxyz":
        vocab.setdefault(ch, len(vocab))
        vocab.setdefault(ch + "</w>", len(vocab))
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")

    tok = CLIPTokenizer(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt")
    )
    cfg = CLIPConfig(
        text_config=dict(
            vocab_size=tok.vocab_size, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16, projection_dim=16,
        ),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8,
            projection_dim=16,
        ),
        projection_dim=16,
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg)
    improc = CLIPImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32}
    )
    CLIPProcessor(image_processor=improc, tokenizer=tok).save_pretrained(str(d))
    model.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """(images npy, tiny VAE checkpoint) for the diffusion-prepare CLI."""
    import jax
    import jax.numpy as jnp

    from image_diffusion_tpu.core.config import VAEArch
    from image_diffusion_tpu.models import build_vae
    from image_diffusion_tpu.models.io import save_vae

    d = tmp_path_factory.mktemp("clip_ds")
    rng = np.random.default_rng(7)
    images = rng.integers(0, 256, (6, 16, 16, 3), dtype=np.uint8)
    np.save(d / "images.npy", images)

    arch = VAEArch(
        in_channels=3, channels=(8, 16), z_dim=3, bottleneck="kl",
        enc_num_res_blocks=1, dec_num_res_blocks=1, attn_resolutions=(),
        num_heads=2, init_resolution=16, num_groups=4,
    )
    vae = build_vae(arch, dtype=jnp.float32)
    variables = jax.jit(
        lambda: vae.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            jnp.zeros((1, 16, 16, 3)), sample=False,
        )
    )()
    save_vae(str(d / "vae.ckpt"), arch, variables)
    return str(d / "images.npy"), str(d / "vae.ckpt")


def _run_prepare(images, vae_ckpt, clip_dir, out):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "prepare_dataset.py"),
         "diffusion", "--diffusion-images", images, "--vae-checkpoint",
         vae_ckpt, "--out", out, "--labels-mode", "clip", "--clip", clip_dir,
         "--batch-size", "4", "--classes", ",".join(CLASSES), "--use-cpu"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"--- stdout ---\n{proc.stdout[-4000:]}\n--- stderr ---\n{proc.stderr[-4000:]}"
    )


def test_clip_labeling_cli_end_to_end(tiny_clip, dataset, tmp_path):
    images_path, vae_ckpt = dataset
    out1 = str(tmp_path / "out1")
    _run_prepare(images_path, vae_ckpt, tiny_clip, out1)

    labels = np.load(os.path.join(out1, "diffusion_labels.npy"))
    latents = np.load(os.path.join(out1, "diffusion_dataset.npy"))
    assert labels.shape == (6,) and labels.dtype == np.uint8
    assert labels.max() < len(CLASSES)
    assert latents.shape == (6, 8, 8, 6) and latents.dtype == np.float16

    # oracle: zero-shot argmax with the same model run in-process, matching
    # the reference's logits_per_image softmax-argmax semantics
    # (reference scripts/prepare_dataset.py:134-143)
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(tiny_clip).eval()
    proc = CLIPProcessor.from_pretrained(tiny_clip)
    imgs = np.load(images_path)
    with torch.no_grad():
        text = proc(text=CLASSES, return_tensors="pt", padding=True)
        pixel = proc(images=list(imgs), return_tensors="pt")["pixel_values"]
        out = model(pixel_values=pixel, **text)
        expect = out.logits_per_image.softmax(-1).argmax(-1).numpy().astype(np.uint8)
    np.testing.assert_array_equal(labels, expect)

    # determinism: a second CLI run reproduces the labels byte-for-byte
    out2 = str(tmp_path / "out2")
    _run_prepare(images_path, vae_ckpt, tiny_clip, out2)
    np.testing.assert_array_equal(
        labels, np.load(os.path.join(out2, "diffusion_labels.npy"))
    )

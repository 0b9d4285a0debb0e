#!/usr/bin/env python
"""Dataset preparation (parity with reference scripts/prepare_dataset.py).

  vae mode:       folder of jpg/png -> RGB resize to NxN -> one uint8 .npy blob
  diffusion mode: images .npy + VAE checkpoint -> fp16 latent blob (the raw
                  KL mean||log_var map, NHWC) + uint8 CLIP zero-shot labels

The latent extraction runs as a jitted batched encode on TPU with async
host->device prefetch.  CLIP labeling uses a local transformers CLIP when
weights are available (`--clip` path or HF cache); with no weights it can
fall back to `--labels-mode random` (documented, for pipeline testing only).

    python scripts/prepare_dataset.py vae --vae-images ./lhq --out ./data
    python scripts/prepare_dataset.py diffusion --diffusion-images ./data/vae_dataset.npy \
        --vae-checkpoint ./checkpoints/vae.ckpt --out ./data/diffusion
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(levelname)s : %(message)s",
    datefmt="[%H:%M:%S]",
)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("type", choices=["vae", "diffusion"])
    p.add_argument("--out", type=str, default="./")
    # vae mode
    p.add_argument("--vae-images", type=str, help="Folder with images.")
    p.add_argument("--image-size", type=int, default=128)
    # diffusion mode
    p.add_argument("--diffusion-images", type=str, help=".npy of resized [0,255] images.")
    p.add_argument("--vae-checkpoint", type=str)
    p.add_argument("--clip", type=str, default=None,
                   help="Path / HF id of a CLIP model for zero-shot labels.")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--classes", type=str, default="a hot place,a cold place,a mild place")
    p.add_argument("--labels-mode", choices=["clip", "random"], default="clip",
                   help="'random' assigns uniform labels (pipeline testing without CLIP weights).")
    p.add_argument("--clip-backend", choices=["jax", "torch"], default="jax",
                   help="Run the CLIP forward as a jitted JAX program on the "
                        "accelerator (default; oracle-pinned port) or via "
                        "transformers eager torch.")
    p.add_argument("--use-cpu", action="store_true")
    return p.parse_args()


def vae_dataset(args):
    from PIL import Image

    # sorted: os.listdir order is filesystem-dependent, and the row order
    # defines the dataset identity downstream (latents, labels, dev split)
    names = sorted(
        f for f in os.listdir(args.vae_images)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    logging.info(f"Creating VAE dataset. Found {len(names)} files.")
    size = args.image_size
    buffer = np.zeros((len(names), size, size, 3), np.uint8)
    logging.info(f"Buffer requires ~{buffer.nbytes / 1024**3:,.2f}GB of memory.")

    for i, name in enumerate(names):
        with Image.open(os.path.join(args.vae_images, name)) as img:
            img = img.convert("RGB") if img.mode != "RGB" else img
            buffer[i] = np.asarray(img.resize((size, size)), np.uint8)
        if (i + 1) % 5000 == 0:
            logging.info(f"resized {i + 1}/{len(names)}")

    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "vae_dataset.npy"), buffer)
    logging.info("Saved vae_dataset.npy")


def diffusion_dataset(args):
    import jax
    import jax.numpy as jnp

    from image_diffusion_tpu.models.io import load_vae

    images = np.load(args.diffusion_images, mmap_mode="r")
    n = images.shape[0]
    logging.info(f"Creating Diffusion dataset. Found {n} images.")

    model, variables, arch = load_vae(args.vae_checkpoint, dtype=jnp.bfloat16)

    @jax.jit
    def encode(batch_u8):
        x = batch_u8.astype(jnp.float32) / 127.5 - 1.0
        z, _, _ = model.apply(variables, x, sample=False, method="encode")
        return z.astype(jnp.float16)

    bs = args.batch_size
    # probe latent shape with one batch (static-shape batches thereafter)
    probe = encode(jnp.asarray(images[:bs]))
    lat_shape = probe.shape[1:]
    buffer = np.zeros((n, *lat_shape), np.float16)
    logging.info(f"Latent shape {lat_shape}; buffer ~{buffer.nbytes / 1024**3:,.2f}GB.")

    for i in range(0, n - bs + 1, bs):
        buffer[i : i + bs] = np.asarray(encode(jnp.asarray(images[i : i + bs])))
    rem = n % bs
    if rem:
        tail = np.zeros((bs, *images.shape[1:]), images.dtype)
        tail[:rem] = images[n - rem :]
        buffer[n - rem :] = np.asarray(encode(jnp.asarray(tail)))[:rem]
    logging.info("Latent extraction done.")

    classes = args.classes.split(",")
    if args.labels_mode == "random":
        logging.warning("Assigning RANDOM labels (--labels-mode random) — "
                        "use only for pipeline testing.")
        labels = np.random.default_rng(0).integers(0, len(classes), size=(n,)).astype(np.uint8)
    else:
        labels = clip_labels(images, classes, args)

    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "diffusion_dataset.npy"), buffer)
    np.save(os.path.join(args.out, "diffusion_labels.npy"), labels)
    logging.info("Saved diffusion_dataset.npy + diffusion_labels.npy")


def clip_labels(images, classes, args) -> np.ndarray:
    """Zero-shot classify each image against the class prompts with CLIP
    (reference scripts/prepare_dataset.py:111-143 runs OpenAI ViT-B/32 on
    CUDA).  Preprocessing/tokenization stay on host via CLIPProcessor;
    the model forward runs through the JAX port (models/clip.py, oracle-
    pinned <=1e-4) as one fixed-shape jitted executable on TPU — pass
    --clip-backend torch to use the transformers eager forward instead."""
    import torch
    from transformers import CLIPModel, CLIPProcessor

    source = args.clip or "openai/clip-vit-base-patch32"
    logging.info(f"Loading CLIP from {source} (backend={args.clip_backend})")
    model = CLIPModel.from_pretrained(source).eval()
    processor = CLIPProcessor.from_pretrained(source)

    n = images.shape[0]
    labels = np.zeros((n,), np.uint8)
    bs = args.batch_size
    text = processor(text=classes, return_tensors="np", padding=True)

    if args.clip_backend == "jax":
        import jax

        from image_diffusion_tpu.models.clip import CLIPZeroShot

        port = CLIPZeroShot.from_torch_model(model)
        del model
        # text side is one shot; normalize once, reuse across image batches
        txt = port.encode_text(text["input_ids"], text.get("attention_mask"))
        txt = txt / jax.numpy.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jax.numpy.exp(port.params["logit_scale"])

        for i in range(0, n, bs):
            batch = [images[j] for j in range(i, min(i + bs, n))]
            pixel = processor(images=batch, return_tensors="np")["pixel_values"]
            if len(batch) < bs:  # pad the tail: one compiled executable per run
                pixel = np.concatenate(
                    [pixel, np.zeros((bs - len(batch), *pixel.shape[1:]), pixel.dtype)]
                )
            img = port.encode_images(pixel)
            img = img / jax.numpy.linalg.norm(img, axis=-1, keepdims=True)
            logits = scale * img @ txt.T
            # softmax then argmax == argmax (monotone), matching the
            # reference's logits_per_image.softmax(-1).argmax(-1)
            labels[i : i + len(batch)] = np.asarray(
                jax.numpy.argmax(logits, -1), np.uint8
            )[: len(batch)]
            if (i // bs) % 50 == 0:
                logging.info(f"labeled {i}/{n}")
        return labels

    tt = {k: torch.from_numpy(np.asarray(v)) for k, v in text.items()}
    with torch.no_grad():
        for i in range(0, n, bs):
            batch = [images[j] for j in range(i, min(i + bs, n))]
            pixel = processor(images=batch, return_tensors="pt")["pixel_values"]
            out = model(pixel_values=pixel, **tt)
            labels[i : i + len(batch)] = (
                out.logits_per_image.softmax(-1).argmax(-1).numpy().astype(np.uint8)
            )
            if (i // bs) % 50 == 0:
                logging.info(f"labeled {i}/{n}")
    return labels


def main():
    args = parse_args()
    if args.use_cpu:
        from image_diffusion_tpu.core.cli import force_cpu

        force_cpu()
    if args.type == "vae":
        vae_dataset(args)
    else:
        diffusion_dataset(args)


if __name__ == "__main__":
    main()

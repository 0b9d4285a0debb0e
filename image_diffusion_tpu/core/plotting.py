"""Figure helpers: reconstruction pairs and CFG sample grids.

Equivalent of reference modules/util.py:146-176 (plot_images) and the grid
assembly in scripts/sample_grid.py:45-77 — torchvision-free (grids are
assembled with numpy).  Images arrive as NHWC arrays in [-1, 1].
"""

from __future__ import annotations

import numpy as np


def to_uint8(x: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> [0, 255] uint8."""
    x = np.asarray(x, np.float32)
    x = np.clip((x + 1.0) / 2.0, 0.0, 1.0) * 255.0
    return x.astype(np.uint8)


def plot_reconstructions(images: np.ndarray, reconstructed: np.ndarray):
    """Original-vs-reconstruction column figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = images.shape[0]
    fig, axs = plt.subplots(n, 2, figsize=(10, n * 5), squeeze=False)
    for i in range(n):
        axs[i, 0].imshow(to_uint8(images[i]))
        axs[i, 0].axis("off")
        axs[i, 1].imshow(to_uint8(reconstructed[i]))
        axs[i, 1].axis("off")
    axs[0, 0].set_title("Original", fontsize=16)
    axs[0, 1].set_title("Reconstructed", fontsize=16)
    plt.tight_layout()
    return fig


def make_grid(images: np.ndarray, nrow: int, padding: int = 2) -> np.ndarray:
    """Tile (B, H, W, C) into a (gh*H', gw*W', C) grid image (uint8)."""
    imgs = to_uint8(images)
    b, h, w, c = imgs.shape
    ncol = nrow
    nrows = (b + ncol - 1) // ncol
    hp, wp = h + padding, w + padding
    grid = np.zeros((nrows * hp + padding, ncol * wp + padding, c), np.uint8)
    for i in range(b):
        r, col = divmod(i, ncol)
        grid[padding + r * hp : padding + r * hp + h,
             padding + col * wp : padding + col * wp + w] = imgs[i]
    return grid


def plot_cfg_grid(images: np.ndarray, classes: list[str], cfg_scales: list) :
    """Annotated classes-x-scales grid figure (classes across the top,
    scales down the left), matching the reference figure layout."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    grid = make_grid(images, nrow=len(classes))
    fig, ax = plt.subplots(figsize=(15, 15))
    ax.imshow(grid)
    ax.axis("off")
    for i, name in enumerate(classes):
        ax.text(
            i * grid.shape[1] // len(classes) + grid.shape[1] // (2 * len(classes)),
            -10, name, ha="center", va="center", fontsize=12, color="black",
        )
    for i, scale in enumerate(cfg_scales):
        ax.text(
            -20,
            i * grid.shape[0] // len(cfg_scales) + grid.shape[0] // (2 * len(cfg_scales)),
            str(scale), ha="center", va="center", fontsize=12, color="black",
        )
    return fig

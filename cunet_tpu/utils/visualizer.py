"""Prediction visualization + HTML image-grid reports.

Behavioral rebuild of the display half of ref:utils/visualizer.py (landmark
dots drawn on de-normalized crops, :91-104) and ref:utils/html.py (dominate-
based image-grid page). Visdom is replaced by on-disk PNG dumps + a stdlib
HTML writer — no display server or extra dependency required.
"""

from __future__ import annotations

import html
import os
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw


def draw_landmarks(img: np.ndarray, pts: np.ndarray, radius: int = 3) -> np.ndarray:
    """White dots at (x, y) landmarks on an HWC [0,1] image
    (ref:pylib/HumanPts.py:24-31)."""
    pil = Image.fromarray(np.clip(img * 255, 0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(pil)
    for x, y in np.asarray(pts, float):
        draw.ellipse((x - radius, y - radius, x + radius, y + radius), fill="white")
    return np.asarray(pil, np.float32) / 255.0


def save_image_grid(
    images: Sequence[np.ndarray], path: str, cols: int = 4
) -> None:
    """Tile HWC [0,1] images into one PNG."""
    n = len(images)
    cols = min(cols, n)
    rows = -(-n // cols)
    h, w = images[0].shape[:2]
    grid = np.zeros((rows * h, cols * w, 3), np.float32)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = im[:, :, :3]
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)


def colorize_heatmap(hm: np.ndarray) -> np.ndarray:
    """Single-channel heatmap -> RGB (red-hot ramp), matching the intent of
    ref:utils/imutils.py:107-147."""
    x = np.clip(hm, 0, 1)
    rgb = np.stack([x, x**2, x**4], axis=-1)
    return rgb.astype(np.float32)


class HtmlReport:
    """Image-grid web page (ref:utils/html.py semantics, stdlib only)."""

    def __init__(self, web_dir: str, title: str):
        self.web_dir = web_dir
        self.img_dir = os.path.join(web_dir, "images")
        os.makedirs(self.img_dir, exist_ok=True)
        self.title = title
        self._body: List[str] = []

    def add_header(self, text: str):
        self._body.append(f"<h3>{html.escape(text)}</h3>")

    def add_images(self, ims: Sequence[str], txts: Sequence[str], width: int = 256):
        cells = []
        for im, txt in zip(ims, txts):
            cells.append(
                f'<td style="text-align:center"><a href="images/{im}">'
                f'<img src="images/{im}" width="{width}"></a>'
                f"<br><p>{html.escape(txt)}</p></td>"
            )
        self._body.append(
            '<table style="border-collapse:collapse"><tr>' + "".join(cells) + "</tr></table>"
        )

    def save(self):
        doc = (
            f"<!DOCTYPE html><html><head><title>{html.escape(self.title)}</title>"
            f"</head><body><h1>{html.escape(self.title)}</h1>"
            + "".join(self._body)
            + "</body></html>"
        )
        with open(os.path.join(self.web_dir, "index.html"), "w") as f:
            f.write(doc)


class Visualizer:
    """Experiment display sink: landmark overlays -> PNG grids + HTML report
    (replaces the visdom path of ref:utils/visualizer.py:30-67,91-104)."""

    def __init__(self, exp_dir: str, use_html: bool = True):
        self.exp_dir = exp_dir
        self.vis_dir = os.path.join(exp_dir, "vis")
        os.makedirs(self.vis_dir, exist_ok=True)
        self.report = HtmlReport(self.vis_dir, "predictions") if use_html else None

    def display_imgpts(
        self, imgs: np.ndarray, pts: np.ndarray, epoch: int, tag: str = "val"
    ) -> str:
        """imgs: (N,H,W,C) [0,1]; pts: (N,L,2) in image coords."""
        tiles = [draw_landmarks(imgs[i], pts[i]) for i in range(len(imgs))]
        fname = f"{tag}-epoch{epoch}.png"
        save_image_grid(tiles, os.path.join(self.vis_dir, "images", fname)) \
            if self.report else save_image_grid(tiles, os.path.join(self.vis_dir, fname))
        if self.report:
            self.report.add_header(f"epoch {epoch} [{tag}]")
            self.report.add_images([fname], [f"{tag} epoch {epoch}"])
            self.report.save()
        return fname

"""Prediction visualization: panoptic overlays + scene-graph triplet lists.

Counterpart of tools/vis_results.py + tools/vis_tools/ (ref: SURVEY.md §2.6;
the reference renders with detectron2 + graphviz). Here rendering is
PIL-based and dependency-free: colored panoptic overlay, per-triplet
subject/object mask outlines, and a text panel of top-k triplets.
"""

from __future__ import annotations

import numpy as np


def _colormap(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cmap = rng.integers(40, 255, size=(n, 3)).astype(np.uint8)
    return cmap


def render_panoptic(
    image: np.ndarray,  # (H, W, 3) uint8
    pan_seg: np.ndarray,  # (H, W) int (m_id * offset + label)
    alpha: float = 0.5,
) -> np.ndarray:
    ids = np.unique(pan_seg)
    cmap = _colormap(len(ids))
    overlay = np.zeros_like(image)
    for i, sid in enumerate(ids):
        overlay[pan_seg == sid] = cmap[i]
    out = (image.astype(np.float32) * (1 - alpha) + overlay * alpha).astype(
        np.uint8
    )
    return out


def render_triplets(
    image: np.ndarray,
    masks: np.ndarray,  # (2K, H, W) bool sub then obj
    labels: np.ndarray,  # (2K,) 1-based
    rel_pairs: np.ndarray,  # (K, 2)
    r_labels: np.ndarray,  # (K,) 1-based predicates
    r_scores: np.ndarray,  # (K,)
    class_names: list[str],
    predicate_names: list[str],
    topk: int = 10,
) -> tuple[np.ndarray, list[str]]:
    """Returns (rendered image, list of 'subject --predicate--> object' strings)."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(image.copy())
    draw = ImageDraw.Draw(img)
    cmap = _colormap(topk, seed=3)
    lines = []
    order = np.argsort(-np.asarray(r_scores))[:topk]
    arr = np.asarray(img, np.uint8).copy()
    for rank, k in enumerate(order):
        s_i, o_i = (int(x) for x in rel_pairs[k])
        s_name = class_names[int(labels[s_i]) - 1]
        o_name = class_names[int(labels[o_i]) - 1]
        p_name = predicate_names[int(r_labels[k]) - 1]
        lines.append(f"{s_name} --{p_name}--> {o_name} ({float(r_scores[k]):.3f})")
        color = cmap[rank]
        for idx in (s_i, o_i):
            m = np.asarray(masks[idx], bool)
            if m.shape != arr.shape[:2] or not m.any():
                continue
            edge = m ^ np.roll(m, 1, 0) | (m ^ np.roll(m, 1, 1))
            arr[edge] = color
    return arr, lines


def save_visualization(path: str, image, pan_seg=None, **triplet_kwargs):
    from PIL import Image

    panels = [np.asarray(image, np.uint8)]
    if pan_seg is not None:
        panels.append(render_panoptic(panels[0], np.asarray(pan_seg)))
    lines: list[str] = []
    if triplet_kwargs:
        rendered, lines = render_triplets(panels[0], **triplet_kwargs)
        panels.append(rendered)
    canvas = np.concatenate(panels, axis=1)
    Image.fromarray(canvas).save(path)
    if lines:
        with open(path + ".triplets.txt", "w") as f:
            f.write("\n".join(lines))
    return lines

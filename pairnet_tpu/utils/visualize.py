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


def render_scene_graph(
    labels: np.ndarray,  # (2K,) 1-based entity labels
    rel_pairs: np.ndarray,  # (K, 2)
    r_labels: np.ndarray,  # (K,) 1-based predicates
    r_scores: np.ndarray,  # (K,)
    class_names: list[str],
    predicate_names: list[str],
    topk: int = 10,
    size: tuple[int, int] = (480, 480),
) -> tuple[np.ndarray, str]:
    """Graph-layout scene-graph panel + graphviz DOT export.

    Counterpart of the reference's graphviz rendering (ref: tools/vis_tools/
    viz.py:1-926): nodes = unique entities of the top-k triplets laid out on
    a circle, directed labeled edges for predicates. Pure PIL (this image
    has no graphviz); the DOT string reproduces the reference's exportable
    graph for external tooling. Returns (panel (H, W, 3) uint8, dot text).
    """
    import math

    from PIL import Image, ImageDraw

    order = np.argsort(-np.asarray(r_scores))[:topk]
    # unique nodes in first-appearance order
    node_ids: list[int] = []
    edges = []
    for k in order:
        s_i, o_i = (int(x) for x in rel_pairs[k])
        for idx in (s_i, o_i):
            if idx not in node_ids:
                node_ids.append(idx)
        edges.append((s_i, o_i, int(r_labels[k]), float(r_scores[k])))

    W, H = size
    img = Image.new("RGB", (W, H), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    n = max(len(node_ids), 1)
    cx, cy, r = W / 2, H / 2, min(W, H) / 2 - 60
    pos = {}
    for i, idx in enumerate(node_ids):
        a = 2 * math.pi * i / n - math.pi / 2
        pos[idx] = (cx + r * math.cos(a), cy + r * math.sin(a))

    cmap = _colormap(max(n, 1), seed=5)
    dot = ["digraph scene_graph {"]
    for s_i, o_i, p, score in edges:
        x1, y1 = pos[s_i]
        x2, y2 = pos[o_i]
        # shorten so arrows stop at the node circles
        dx, dy = x2 - x1, y2 - y1
        d = max((dx * dx + dy * dy) ** 0.5, 1e-6)
        ux, uy = dx / d, dy / d
        sx, sy = x1 + ux * 22, y1 + uy * 22
        ex, ey = x2 - ux * 22, y2 - uy * 22
        draw.line([(sx, sy), (ex, ey)], fill=(90, 90, 90), width=2)
        # arrowhead
        left = (ex - ux * 10 - uy * 5, ey - uy * 10 + ux * 5)
        right = (ex - ux * 10 + uy * 5, ey - uy * 10 - ux * 5)
        draw.polygon([(ex, ey), left, right], fill=(90, 90, 90))
        p_name = predicate_names[p - 1]
        mx, my = (sx + ex) / 2, (sy + ey) / 2
        tw = draw.textlength(p_name)
        draw.rectangle(
            [mx - tw / 2 - 2, my - 7, mx + tw / 2 + 2, my + 7],
            fill=(255, 255, 255),
        )
        draw.text((mx - tw / 2, my - 6), p_name, fill=(180, 40, 40))
        dot.append(
            f'  n{s_i} -> n{o_i} [label="{p_name}" weight={score:.3f}];'
        )
    for i, idx in enumerate(node_ids):
        x, y = pos[idx]
        name = class_names[int(labels[idx]) - 1]
        color = tuple(int(c) for c in cmap[i])
        draw.ellipse([x - 20, y - 20, x + 20, y + 20], outline=color, width=3)
        tw = draw.textlength(name)
        draw.rectangle(
            [x - tw / 2 - 2, y + 22, x + tw / 2 + 2, y + 36],
            fill=(255, 255, 255),
        )
        draw.text((x - tw / 2, y + 23), name, fill=(0, 0, 0))
        dot.append(f'  n{idx} [label="{name}"];')
    dot.append("}")
    return np.asarray(img, np.uint8), "\n".join(dot)


def save_visualization(path: str, image, pan_seg=None, **triplet_kwargs):
    from PIL import Image

    panels = [np.asarray(image, np.uint8)]
    if pan_seg is not None:
        panels.append(render_panoptic(panels[0], np.asarray(pan_seg)))
    lines: list[str] = []
    if triplet_kwargs:
        rendered, lines = render_triplets(panels[0], **triplet_kwargs)
        panels.append(rendered)
        graph, dot = render_scene_graph(
            triplet_kwargs["labels"],
            triplet_kwargs["rel_pairs"],
            triplet_kwargs["r_labels"],
            triplet_kwargs["r_scores"],
            triplet_kwargs["class_names"],
            triplet_kwargs["predicate_names"],
            topk=triplet_kwargs.get("topk", 10),
            size=(panels[0].shape[0], panels[0].shape[0]),
        )
        if graph.shape[0] != panels[0].shape[0]:
            graph = np.asarray(
                Image.fromarray(graph).resize(
                    (graph.shape[1], panels[0].shape[0])
                ),
                np.uint8,
            )
        panels.append(graph)
        with open(path + ".dot", "w") as f:
            f.write(dot)
    canvas = np.concatenate(panels, axis=1)
    Image.fromarray(canvas).save(path)
    if lines:
        with open(path + ".triplets.txt", "w") as f:
            f.write("\n".join(lines))
    return lines

"""Layout visualization (reference: `layout_predictor/.../vis.py`,
`utils/vis.py` — draw predicted layouts for inspection)."""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

_COLORS = [
    (230, 80, 60), (60, 130, 230), (70, 190, 100), (235, 180, 50),
    (170, 90, 220), (60, 200, 200), (240, 130, 180), (150, 150, 150),
]


def draw_layout(
    layout: Dict[str, Sequence[float]],
    size: int = 512,
    radius: float = 0.2,
    image: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Render predicted (x, y) centers with their control circles.

    layout: {phrase: (x, y)} as produced by LayoutInference.
    image: optional [H, W, 3] uint8 background (e.g. the generated image).
    Returns [size, size, 3] uint8.
    """
    from PIL import Image, ImageDraw

    if image is not None:
        img = Image.fromarray(image).resize((size, size))
    else:
        img = Image.new("RGB", (size, size), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    r = radius * size
    for i, (phrase, (x, y)) in enumerate(layout.items()):
        cx, cy = x * size, y * size
        color = _COLORS[i % len(_COLORS)]
        draw.ellipse([cx - r, cy - r, cx + r, cy + r], outline=color, width=3)
        draw.ellipse([cx - 4, cy - 4, cx + 4, cy + 4], fill=color)
        draw.text((min(cx + 6, size - 60), min(cy + 6, size - 14)), phrase, fill=color)
    return np.asarray(img)


def save_layout_vis(layout, path: str, **kw) -> None:
    from PIL import Image

    Image.fromarray(draw_layout(layout, **kw)).save(path)

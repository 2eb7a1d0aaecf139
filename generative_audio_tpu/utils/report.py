"""Self-contained HTML run report (the reference's plotly dashboard analogue).

Reference: nppc/restoration.py log_html :803-917 and nppc/nppc.py :751-871
write a single-file HTML per run with loss/benchmark curves, sample image
grids, and run metadata. This builds the same artifact with matplotlib
figures embedded as base64 PNGs — no JS dependencies, safe for air-gapped
TPU pods; plus the image-grid helpers from nppc/auxil.py:151-207.
"""
from __future__ import annotations

import base64
import html
import io
import time
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["imgs_to_grid", "img_to_png_base64", "HTMLReport",
           "write_training_report"]


def imgs_to_grid(imgs: np.ndarray, nrow: Optional[int] = None,
                 pad: int = 2, pad_value: float = 1.0) -> np.ndarray:
    """[N, C, H, W] -> [C, H', W'] tiled grid (ref auxil.py:151-178)."""
    imgs = np.asarray(imgs)
    n, c, h, w = imgs.shape
    nrow = nrow or int(np.ceil(np.sqrt(n)))
    ncol = int(np.ceil(n / nrow))
    grid = np.full((c, ncol * (h + pad) + pad, nrow * (w + pad) + pad),
                   pad_value, imgs.dtype)
    for i in range(n):
        r, col = divmod(i, nrow)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[:, y:y + h, x:x + w] = imgs[i]
    return grid


def img_to_png_base64(img: np.ndarray) -> str:
    """[C, H, W] or [H, W] float [0,1] -> base64 PNG string
    (ref auxil.py:180-207)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    from PIL import Image as _PIL  # noqa: F401  (probe)
    img = np.asarray(img)
    if img.ndim == 3:
        img = np.transpose(img, (1, 2, 0))
        if img.shape[-1] == 1:
            img = img[..., 0]
    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="png")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _fig_to_base64(fig) -> str:
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=110, bbox_inches="tight")
    import matplotlib.pyplot as plt
    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode("ascii")


class HTMLReport:
    """Accumulate sections, write one self-contained HTML file."""

    def __init__(self, title: str):
        self.title = title
        self._sections = []

    def add_scalars(self, name: str, values: Dict[str, float]):
        rows = "".join(
            f"<tr><td>{html.escape(str(k))}</td>"
            f"<td>{v:.6g}</td></tr>" if isinstance(v, (int, float))
            else f"<tr><td>{html.escape(str(k))}</td>"
                 f"<td>{html.escape(str(v))}</td></tr>"
            for k, v in values.items())
        self._sections.append(
            f"<h2>{html.escape(name)}</h2><table>{rows}</table>")

    def add_curve(self, name: str, series: Dict[str, Sequence[float]],
                  xlabel: str = "step", ylabel: str = "value",
                  logy: bool = False):
        import matplotlib
        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 3.2))
        for label, ys in series.items():
            ys = np.asarray(ys)
            if ys.ndim == 2 and ys.shape[1] == 2:  # (step, value) pairs
                ax.plot(ys[:, 0], ys[:, 1], label=label)
            else:
                ax.plot(ys, label=label)
        if logy:
            ax.set_yscale("log")
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
        self._sections.append(
            f"<h2>{html.escape(name)}</h2>"
            f'<img src="data:image/png;base64,{_fig_to_base64(fig)}"/>')

    def add_image_grid(self, name: str, imgs: np.ndarray,
                       nrow: Optional[int] = None):
        grid = imgs_to_grid(np.asarray(imgs), nrow=nrow)
        self._sections.append(
            f"<h2>{html.escape(name)}</h2>"
            f'<img src="data:image/png;base64,{img_to_png_base64(grid)}"'
            f' style="image-rendering: pixelated; min-width: 40%"/>')

    def add_html(self, fragment: str):
        self._sections.append(fragment)

    def write(self, path) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        body = "\n".join(self._sections)
        path.write_text(f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{html.escape(self.title)}</title>
<style>
 body {{ font-family: sans-serif; margin: 2em; background: #fafafa; }}
 table {{ border-collapse: collapse; }}
 td {{ border: 1px solid #ccc; padding: 4px 10px; }}
 img {{ max-width: 100%; }}
 h2 {{ border-bottom: 1px solid #ddd; }}
</style></head><body>
<h1>{html.escape(self.title)}</h1>
<p>written {time.strftime('%Y-%m-%d %H:%M:%S')}</p>
{body}
</body></html>
""")
        return path


def write_training_report(path, title: str, loss_history,
                          val_history=None, metrics=None) -> Path:
    """One-call run report: loss curve (+validation overlay) and a final
    metric table — the reference's per-run HTML dashboard
    (nppc/restoration.py:803-917)."""
    rep = HTMLReport(title)
    series = {"train": list(loss_history)}
    if val_history:
        series["validation"] = np.asarray(
            [(s, v) for s, v in val_history], np.float64)
    if loss_history or val_history:
        rep.add_curve("loss", series, logy=bool(
            loss_history and min(loss_history) > 0))
    if metrics:
        rep.add_scalars("final metrics", metrics)
    return rep.write(path)

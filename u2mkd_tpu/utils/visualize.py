"""Point-cloud / image visualization utilities.

Equivalent of the reference ``visualize_utils.py`` (open3d interactive
viewer + PIL/matplotlib overlays + cross-dataset label maps). open3d is not
available in this environment, so rendering uses matplotlib (headless-safe
scatter projections) and PIL; the label tables and cross-dataset maps are
kept as data.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

NUSC_CLASS_COLORS = np.array(
    [
        [0, 0, 0], [112, 128, 144], [220, 20, 60], [255, 127, 80],
        [255, 158, 0], [233, 150, 70], [255, 61, 99], [0, 0, 230],
        [47, 79, 79], [255, 140, 0], [255, 99, 71], [0, 207, 191],
        [175, 0, 75], [75, 0, 75], [112, 180, 60], [222, 184, 135],
        [0, 175, 0],
    ],
    np.uint8,
)

# cross-dataset label maps (reference ``visualize_utils.py:164-210``)
MAP_SEMKITTI_TO_NUSC = {
    0: 0, 1: 4, 2: 2, 3: 6, 4: 10, 5: 5, 6: 7, 7: 2, 8: 6, 9: 11, 10: 9,
    11: 13, 12: 12, 13: 15, 14: 15, 15: 16, 16: 14, 17: 14, 18: 15, 19: 16,
}


def save_bev_png(path: str, xyz: np.ndarray, labels: Optional[np.ndarray] = None,
                 extent: float = 50.0, size: int = 800):
    """Rasterize a bird's-eye-view of the cloud to a PNG (PIL only)."""
    from PIL import Image

    img = np.zeros((size, size, 3), np.uint8)
    u = ((xyz[:, 0] + extent) / (2 * extent) * (size - 1)).astype(int)
    v = ((xyz[:, 1] + extent) / (2 * extent) * (size - 1)).astype(int)
    ok = (u >= 0) & (u < size) & (v >= 0) & (v < size)
    if labels is not None:
        colors = NUSC_CLASS_COLORS[np.clip(labels, 0, len(NUSC_CLASS_COLORS) - 1)]
    else:
        z = xyz[:, 2]
        zn = np.clip((z - z.min()) / max(z.ptp(), 1e-6), 0, 1)
        colors = np.stack([(zn * 255)] * 3, -1).astype(np.uint8)
    img[size - 1 - v[ok], u[ok]] = colors[ok]
    Image.fromarray(img).save(path)


def save_projection_overlay(path: str, image: np.ndarray, uv_norm: np.ndarray,
                            mask: np.ndarray, labels: Optional[np.ndarray] = None):
    """Draw projected points over a camera image (uv in [-1,1])."""
    from PIL import Image

    img = np.ascontiguousarray(image.astype(np.uint8))
    h, w = img.shape[:2]
    u = ((uv_norm[:, 0] + 1) / 2 * (w - 1)).astype(int)
    v = ((uv_norm[:, 1] + 1) / 2 * (h - 1)).astype(int)
    ok = mask & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    if labels is not None:
        colors = NUSC_CLASS_COLORS[np.clip(labels, 0, len(NUSC_CLASS_COLORS) - 1)]
    else:
        colors = np.full((len(u), 3), [255, 0, 0], np.uint8)
    img[v[ok], u[ok]] = colors[ok]
    Image.fromarray(img).save(path)


def confusion_matrix(pred: np.ndarray, target: np.ndarray, num_classes: int,
                     ignore_label: int = 0) -> np.ndarray:
    keep = target != ignore_label
    idx = target[keep] * num_classes + pred[keep]
    return np.bincount(idx, minlength=num_classes ** 2).reshape(
        num_classes, num_classes
    )


def export_html_viewer(path: str, xyz: np.ndarray,
                       labels: Optional[np.ndarray] = None,
                       class_names: Optional[list] = None,
                       max_points: int = 200000,
                       title: str = "point cloud") -> str:
    """Interactive point-cloud viewer as ONE self-contained HTML file.

    Replacement for the reference's open3d window (``visualize_utils.py:
    164-210``) that works in a headless environment: drag = orbit, wheel =
    zoom, keys 1..9 toggle classes — open the file in any browser, no
    dependencies or network. Colors follow the label palette used by
    ``save_bev_png``.
    """
    import json as _json

    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    if labels is None:
        labels = np.zeros(n, np.int32)
    labels = np.asarray(labels, np.int32)
    if n > max_points:
        sel = np.random.RandomState(0).choice(n, max_points, replace=False)
        xyz, labels = xyz[sel], labels[sel]
    center = xyz.mean(0)
    xyz = xyz - center
    k = int(labels.max()) + 1 if len(labels) else 1
    rng = np.random.RandomState(7)
    palette = (rng.rand(max(k, 1), 3) * 200 + 40).astype(int).tolist()
    payload = {
        "pts": np.round(xyz, 3).tolist(),
        "lab": labels.tolist(),
        "palette": palette,
        "names": list(class_names) if class_names else
                 [f"class {i}" for i in range(k)],
    }
    html = """<!DOCTYPE html><html><head><meta charset="utf-8">
<title>%TITLE%</title><style>
body{margin:0;background:#111;color:#ccc;font:12px monospace;overflow:hidden}
#hud{position:fixed;top:8px;left:8px;z-index:2;white-space:pre}
canvas{display:block}</style></head><body>
<div id="hud">%TITLE% — drag: orbit, wheel: zoom, keys 0-9: toggle class</div>
<canvas id="c"></canvas><script>
const D=%DATA%;
const cv=document.getElementById('c'),ctx=cv.getContext('2d');
let W,H;function rs(){W=cv.width=innerWidth;H=cv.height=innerHeight;}
rs();addEventListener('resize',()=>{rs();draw();});
let ry=0.7,rx=-1.0,zoom=9,hidden=new Set();
function draw(){
 ctx.fillStyle='#111';ctx.fillRect(0,0,W,H);
 const cy=Math.cos(ry),sy=Math.sin(ry),cx=Math.cos(rx),sx=Math.sin(rx);
 const s=Math.min(W,H)/zoom;
 const pts=D.pts,lab=D.lab,pal=D.palette;
 for(let i=0;i<pts.length;i++){
  const l=lab[i];if(hidden.has(l))continue;
  const p=pts[i];
  const x1=p[0]*cy-p[1]*sy, y1=p[0]*sy+p[1]*cy;
  const y2=y1*cx-p[2]*sx, z2=y1*sx+p[2]*cx;
  const px=W/2+x1*s, py=H/2-z2*s;
  if(px<0||px>W||py<0||py>H)continue;
  const c=pal[l%pal.length];
  ctx.fillStyle=`rgb(${c[0]},${c[1]},${c[2]})`;
  ctx.fillRect(px,py,1.6,1.6);
 }
 ctx.fillStyle='#ccc';let y=40;
 for(let l=0;l<D.names.length;l++){
  const c=pal[l%pal.length];
  ctx.fillStyle=hidden.has(l)?'#444':`rgb(${c[0]},${c[1]},${c[2]})`;
  ctx.fillText(`${l}: ${D.names[l]}`,8,y);y+=14;}
}
let drag=false,lx=0,ly=0;
cv.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY;};
onmouseup=()=>drag=false;
onmousemove=e=>{if(!drag)return;ry+=(e.clientX-lx)*0.01;rx+=(e.clientY-ly)*0.01;
 lx=e.clientX;ly=e.clientY;draw();};
onwheel=e=>{zoom*=e.deltaY>0?1.1:0.9;draw();};
onkeydown=e=>{const l=parseInt(e.key);if(!isNaN(l)){
 hidden.has(l)?hidden.delete(l):hidden.add(l);draw();}};
draw();</script></body></html>"""
    html = html.replace("%TITLE%", title).replace("%DATA%", _json.dumps(payload))
    with open(path, "w") as f:
        f.write(html)
    return path

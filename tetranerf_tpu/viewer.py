"""Interactive web viewer — the nerfstudio-viewer equivalent (SURVEY L0).

The reference gets its viewer from nerfstudio (``setup.py:136-141``
wiring; SURVEY §3.5: the viewer drives the same per-chunk forward
pass). This is the standalone TPU-native counterpart: a zero-dependency
HTTP server (stdlib only) serving an orbit-control page that requests
frames from the model's render path.

Speed model:
- while the camera MOVES, frames render in fast mode (coarse-only,
  reduced samples, reduced resolution);
- when the camera HOLDS still, the march for that pose is computed once
  (``Trainer.cache_camera``) and subsequent refinement frames re-shade
  the cached traversal against the current parameters at full quality —
  ~1s per 800² frame on one v5e chip (benchmarks/bench_render.py).

Usage::

    python -m tetranerf_tpu.scripts.viewer --checkpoint out/final \
        --data data/scene [--port 7007]

or programmatically during training::

    viewer = ViewerServer(trainer, port=7007)
    viewer.start()          # serves in a background thread
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>tetranerf-tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font:13px sans-serif; }
#hud { position:fixed; top:8px; left:8px; background:#0008; padding:6px 10px;
       border-radius:6px; }
img { width:100vw; height:100vh; object-fit:contain; display:block;
      image-rendering:auto; }
</style></head><body>
<div id="hud">drag: orbit &middot; wheel: dolly &middot; quality refines on
hold &middot; keys 1/2/3: rgb/depth/acc &middot; <span id="mode"></span>
<span id="stat"></span></div>
<img id="view" />
<script>
let az = 0.6, el = 0.3, r = 2.5, busy = false, still = 0, gen = 0;
let mode = 'rgb';
const img = document.getElementById('view');
const stat = document.getElementById('stat');
const modeEl = document.getElementById('mode');
window.addEventListener('keydown', e => {
  const m = {'1':'rgb', '2':'depth', '3':'accumulation'}[e.key];
  if (m) { mode = m; modeEl.textContent = m + ' '; still = 0; render('fast'); }
});
function pose() {
  const cx = Math.cos(az)*Math.cos(el)*r, cy = Math.sin(az)*Math.cos(el)*r,
        cz = Math.sin(el)*r;
  return [cx, cy, cz];
}
async function render(quality) {
  if (busy) return; busy = true;
  try { await renderInner(quality); }
  catch (e) { stat.textContent = 'error: ' + e; }
  finally { busy = false; }
}
async function renderInner(quality) {
  const myGen = ++gen;
  const t0 = performance.now();
  if (quality == 'full') {
    // Progressive: full-res frame arrives in row-band tiles, each
    // composited as soon as its strip renders.
    const side = 800, tiles = 8, band = side / tiles;
    const cv = document.createElement('canvas');
    cv.width = side; cv.height = side;
    const ctx = cv.getContext('2d');
    if (img.complete && img.naturalWidth)
      ctx.drawImage(img, 0, 0, side, side);  // last frame as backdrop
    for (let t = 0; t < tiles; t++) {
      const res = await fetch('/render', {method:'POST',
        body: JSON.stringify({position: pose(), quality: 'full',
          mode: mode, side: side, rows: [t*band, (t+1)*band]})});
      if (myGen !== gen) return;
      const bmp = await createImageBitmap(await res.blob());
      ctx.drawImage(bmp, 0, t*band);
      img.src = cv.toDataURL();
      stat.textContent = 'full ' + (t+1) + '/' + tiles + ' ' +
        ((performance.now()-t0)/1000).toFixed(2) + 's';
    }
  } else {
    const res = await fetch('/render', {method:'POST', body: JSON.stringify(
      {position: pose(), quality: quality, mode: mode, side: 400})});
    const blob = await res.blob();
    if (myGen === gen) {
      img.src = URL.createObjectURL(blob);
      stat.textContent = quality + ' ' +
        ((performance.now()-t0)/1000).toFixed(2) + 's';
    }
  }
}
let dragging = false, px = 0, py = 0;
window.addEventListener('mousedown', e => {dragging = true; px = e.x; py = e.y;});
window.addEventListener('mouseup', () => dragging = false);
window.addEventListener('mousemove', e => {
  if (!dragging) return;
  az -= (e.x - px) * 0.01; el += (e.y - py) * 0.01;
  el = Math.max(-1.4, Math.min(1.4, el));
  px = e.x; py = e.y; still = 0; render('fast');
});
window.addEventListener('wheel', e => {
  r *= Math.exp(e.deltaY * 0.001); r = Math.max(1.2, Math.min(8, r));
  still = 0; render('fast');
});
setInterval(() => { if (++still == 3) render('full'); }, 350);
render('fast');
</script></body></html>"""


def _colorize(out, shape, mode: str) -> np.ndarray:
    """Map a render-output dict to a uint8 image of ``shape=(h, w)``."""
    h, w = shape
    if mode == "depth":
        depth = np.asarray(out["depth"]).reshape(h, w)
        acc = np.asarray(out["accumulation"]).reshape(h, w)
        covered = depth[acc > 0.5]
        # Normalize to the covered range so the geometry uses the full
        # gray ramp regardless of scene scale (empty pixels -> black).
        lo = float(covered.min()) if covered.size else 0.0
        hi = float(np.percentile(covered, 99.0)) if covered.size else 1.0
        g = np.clip((depth - lo) / max(hi - lo, 1e-9), 0.0, 1.0)
        g = np.where(acc > 0.05, 1.0 - g * 0.9, 0.0)  # near=bright
        return (g * 255).astype(np.uint8)
    if mode == "accumulation":
        acc = np.clip(np.asarray(out["accumulation"]).reshape(h, w), 0, 1)
        return (acc * 255).astype(np.uint8)
    rgb = np.clip(np.asarray(out["rgb"]).reshape(h, w, 3), 0, 1)
    return (rgb * 255).astype(np.uint8)


def _look_at(pos):
    pos = np.asarray(pos, np.float64)
    forward = -pos / np.linalg.norm(pos)
    upw = np.array([0.0, 0.0, 1.0])
    if abs(forward @ upw) > 0.98:
        upw = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, upw)
    right /= np.linalg.norm(right)
    up = np.cross(right, forward)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -forward, pos
    return c2w


def _camera_rays(c2w, side, camera_angle_x=0.8):
    focal = 0.5 * side / np.tan(0.5 * camera_angle_x)
    j, i = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    dirs = np.stack(
        [
            (i - side / 2 + 0.5) / focal,
            -(j - side / 2 + 0.5) / focal,
            -np.ones_like(i, np.float64),
        ],
        axis=-1,
    )
    d = dirs @ c2w[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:3, 3], d.shape)
    return (
        np.ascontiguousarray(o.reshape(-1, 3), np.float32),
        np.ascontiguousarray(d.reshape(-1, 3), np.float32),
    )


class ViewerServer:
    """Serves the orbit viewer for a :class:`Trainer`'s current model.

    Thread-safe with ongoing training: renders use the trainer's
    current ``state.params`` snapshot. ``fast`` frames render coarse-only
    at reduced resolution; ``full`` frames for a held pose march once
    and re-shade from the cache.
    """

    def __init__(
        self,
        trainer,
        port: int = 7007,
        camera_angle_x: float = 0.8,
        fast_samples: int = 32,
        chunk: int = 16384,
    ):
        self.trainer = trainer
        self.port = port
        self.camera_angle_x = camera_angle_x
        self.fast_samples = fast_samples
        self.chunk = chunk
        # March caches keyed by (pose, side, rows); bounded FIFO sized
        # for ONE progressive pose (8 row bands). Each entry holds
        # per-ray interval+stream device arrays — sizable on HBM next to
        # training state, so the cap is deliberately tight.
        self._caches: "dict[bytes, object]" = {}
        self._max_caches = 8
        self._lock = threading.Lock()
        self._httpd: Optional[ThreadingHTTPServer] = None

    # ------------------------------------------------------------- render
    def render_frame(
        self,
        position,
        side: int,
        quality: str,
        mode: str = "rgb",
        rows: Optional[tuple] = None,
    ) -> bytes:
        """PNG bytes for a camera at ``position`` looking at the origin.

        ``mode`` selects the rendered quantity: ``"rgb"`` (default),
        ``"depth"`` (normalized, grayscale) or ``"accumulation"``
        (opacity, grayscale) — the reference's viewer output heads
        (``model.py:632-638`` renderers). ``rows=(y0, y1)`` renders only
        that horizontal band (progressive full-quality tiles; the band's
        march is cached independently, so refinement frames re-shade it).
        """
        from PIL import Image

        c2w = _look_at(position)
        o, d = _camera_rays(c2w, side, self.camera_angle_x)
        y0, y1 = (0, side) if rows is None else (int(rows[0]), int(rows[1]))
        if not 0 <= y0 < y1 <= side:
            raise ValueError(f"bad rows {rows} for side {side}")
        o = o.reshape(side, side, 3)[y0:y1].reshape(-1, 3)
        d = d.reshape(side, side, 3)[y0:y1].reshape(-1, 3)
        with self._lock:
            # One retry: a concurrent train step may donate the params
            # snapshot captured at dispatch (live-training viewer);
            # re-dispatching against the fresh state always succeeds.
            for attempt in range(2):
                try:
                    out = self._render(o, d, c2w, side, quality, y0, y1)
                    break
                except Exception:
                    # A deterministic error still surfaces (with its
                    # traceback) on the second attempt; the cost of one
                    # re-march is accepted to keep live-training frames
                    # flowing.
                    if attempt:
                        raise
                    if quality == "full":
                        # Cached marches may hold donated (stale)
                        # arrays; the fast path never touches them.
                        self._caches.clear()
        img = Image.fromarray(_colorize(out, (y1 - y0, side), mode))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def _render(self, o, d, c2w, side: int, quality: str, y0: int, y1: int):
        if quality == "full":
            # The trainer's march_version advances whenever occupancy /
            # termination-cap / tuned-bound state changes — a march
            # cached under the OLD termination state could permanently
            # miss geometry that later density updates reveal (the
            # march bakes the density field into the cached intervals).
            version = getattr(self.trainer, "march_version", 0)
            key = (
                c2w.tobytes()
                + np.int64([side, y0, y1, version]).tobytes()
            )
            cache = self._caches.get(key)
            if cache is None:
                # Depth-sorted cache: each chunk re-shades at its own
                # depth bound + proportional sample budget — the refine
                # pays the scene's real depth profile, not the camera
                # max (sub-frame refine latency; docs/RESULTS.md r3).
                cache = self.trainer.cache_camera(
                    o, d, chunk=self.chunk, sort_by_depth=True
                )
                while len(self._caches) >= self._max_caches:
                    self._caches.pop(next(iter(self._caches)))
                self._caches[key] = cache
            return self.trainer.render_cached(cache, adaptive_samples=True)
        return self.trainer.render_rays(
            o,
            d,
            chunk=self.chunk,
            num_samples=self.fast_samples,
            num_fine_samples=0,
        )

    # ------------------------------------------------------------- server
    def _handler(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path not in ("/", "/index.html"):
                    self.send_error(404)
                    return
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path != "/render":
                    self.send_error(404)
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(n))
                    png = viewer.render_frame(
                        req["position"],
                        int(req.get("side", 400)),
                        str(req.get("quality", "fast")),
                        str(req.get("mode", "rgb")),
                        req.get("rows"),
                    )
                except Exception as exc:  # surface render errors to the UI
                    self.send_error(500, str(exc))
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)

        return Handler

    def start(self, background: bool = True):
        self._httpd = ThreadingHTTPServer(
            ("0.0.0.0", self.port), self._handler()
        )
        if background:
            t = threading.Thread(
                target=self._httpd.serve_forever, daemon=True
            )
            t.start()
        else:
            self._httpd.serve_forever()
        return self

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None

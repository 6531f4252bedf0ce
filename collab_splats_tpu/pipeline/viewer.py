"""Interactive splat viewer: dependency-free HTTP + canvas orbit controls.

Fills the role of the reference's ``ns-viewer`` (viser websockets, driven at
wrapper/splatter.py:355-371): inspect a trained splat interactively.  Here
the model's own rasterizer is the renderer — every mode the model outputs
(rgb / depth / median depth / normals / accumulation) is viewable — served
over plain ``http.server`` with a tiny HTML page (drag to orbit, wheel to
zoom), so it needs no websocket or viewer dependency and works through any
port forward.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..data.synthetic import look_at_c2w
from ..core.cameras import make_camera
from ..models import rade_gs
from ..utils.visualization import visualize_splat

_PAGE = """<!DOCTYPE html>
<html><head><title>collab-splats-tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font-family:monospace; }
#hud { position:fixed; top:8px; left:8px; }
select { background:#222; color:#ddd; }
</style></head><body>
<div id="hud">mode <select id="mode">
<option>rgb</option><option>depth</option><option>median_depth</option>
<option>normals</option><option>accumulation</option></select>
<span id="stat"></span></div>
<img id="view" draggable="false" style="user-select:none"/>
<script>
let theta = 0.8, phi = 0.5, radius = 3.0, drag = null, inflight = false;
const img = document.getElementById('view');
const stat = document.getElementById('stat');
function refresh() {
  if (inflight) return; inflight = true;
  const mode = document.getElementById('mode').value;
  const t0 = performance.now();
  const u = `/render?theta=${theta}&phi=${phi}&r=${radius}&mode=${mode}`;
  fetch(u).then(r => r.blob()).then(b => {
    img.src = URL.createObjectURL(b);
    stat.textContent = ` ${(performance.now()-t0).toFixed(0)}ms`;
    inflight = false;
  }).catch(() => { inflight = false; });
}
window.addEventListener('mousedown', e => drag = [e.clientX, e.clientY]);
window.addEventListener('mouseup', () => drag = null);
window.addEventListener('mousemove', e => {
  if (!drag) return;
  theta += (e.clientX - drag[0]) * 0.01;
  phi = Math.max(-1.4, Math.min(1.4, phi + (e.clientY - drag[1]) * 0.01));
  drag = [e.clientX, e.clientY];
  refresh();
});
window.addEventListener('wheel', e => {
  radius = Math.max(0.3, radius * (e.deltaY > 0 ? 1.1 : 0.9)); refresh();
});
document.getElementById('mode').addEventListener('change', refresh);
refresh();
</script></body></html>"""


class SplatViewer:
    """Serve an interactive view of a trained splat."""

    def __init__(
        self,
        params,
        alive,
        model_config: Optional[rade_gs.RadeGSConfig] = None,
        width: int = 640,
        height: int = 480,
        focal: Optional[float] = None,
    ):
        self.params = params
        self.alive = alive
        self.config = model_config or rade_gs.RadeGSConfig(
            sh_degree=0, background="black"
        )
        self.width = width
        self.height = height
        self.focal = focal or 0.9 * max(width, height)
        means = np.asarray(params["means"])[np.asarray(alive)]
        self.center = means.mean(axis=0)
        self._server: Optional[ThreadingHTTPServer] = None

    def render(self, theta: float, phi: float, radius: float,
               mode: str = "rgb") -> np.ndarray:
        eye = self.center + radius * np.array([
            np.cos(phi) * np.cos(theta),
            np.cos(phi) * np.sin(theta),
            np.sin(phi),
        ])
        cam = make_camera(
            self.focal, self.focal, self.width / 2, self.height / 2,
            self.width, self.height, look_at_c2w(eye, self.center),
        )
        return visualize_splat(self.params, self.alive, cam, self.config, mode)

    def _handler(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if url.path == "/render":
                    q = parse_qs(url.query)
                    img = viewer.render(
                        float(q.get("theta", ["0.8"])[0]),
                        float(q.get("phi", ["0.5"])[0]),
                        float(q.get("r", ["3.0"])[0]),
                        q.get("mode", ["rgb"])[0],
                    )
                    from PIL import Image

                    buf = io.BytesIO()
                    Image.fromarray(
                        (np.clip(img, 0, 1) * 255).astype(np.uint8)
                    ).save(buf, "PNG")
                    body = buf.getvalue()
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if url.path == "/info":
                    body = json.dumps({
                        "num_gaussians": int(np.asarray(viewer.alive).sum()),
                        "center": viewer.center.tolist(),
                    }).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                self.send_response(404)
                self.end_headers()

        return Handler

    def serve(self, port: int = 7007, blocking: bool = True) -> int:
        """Start serving; returns the bound port."""
        self._server = ThreadingHTTPServer(("0.0.0.0", port), self._handler())
        port = self._server.server_address[1]
        print(f"splat viewer on http://localhost:{port}")
        if blocking:
            self._server.serve_forever()
        else:
            threading.Thread(
                target=self._server.serve_forever, daemon=True
            ).start()
        return port

    def shutdown(self):
        if self._server is not None:
            self._server.shutdown()
            self._server = None

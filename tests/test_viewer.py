"""Interactive viewer: orbit-frame rendering and the HTTP surface."""
import io
import threading
import urllib.request

import jax
import numpy as np
import pytest

from reduced_3dgs_tpu.shculling import VariableSHGaussianModel
from reduced_3dgs_tpu.viewer import INDEX_HTML, ViewerApp, make_handler
from .helpers import random_cloud


def _make_model(n=60):
    cloud = random_cloud(jax.random.PRNGKey(7), n, spread=0.6)
    model = VariableSHGaussianModel(3, render_backend="xla")
    model.set_parameters(dict(
        xyz=cloud["xyz"], features_dc=cloud["features"][:, :1],
        features_rest=cloud["features"][:, 1:], scaling=cloud["scaling"],
        rotation=cloud["rotation"], opacity=cloud["opacity"]))
    model.init_degrees()
    model.active_sh_degree = 3
    return model


def test_render_frame_png():
    app = ViewerApp(_make_model(), height=48, width=64)
    png = app.render_frame(yaw=0.3, pitch=0.1)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image
    img = Image.open(io.BytesIO(png))
    assert img.size == (64, 48)
    # different viewpoint renders a different image
    png2 = app.render_frame(yaw=2.5, pitch=-0.4)
    assert png2 != png
    # scale modifier / sh degree overrides restore model state
    model = app.model
    png3 = app.render_frame(scale=0.5, sh_degree=0)
    assert model.scale_modifier == 1.0
    assert model.active_sh_degree == 3
    assert png3[:8] == b"\x89PNG\r\n\x1a\n"


def test_http_surface():
    from http.server import ThreadingHTTPServer
    app = ViewerApp(_make_model(), height=32, width=32)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read().decode()
        assert "<html" in html and "/render?" in html
        resp = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?yaw=0.2&pitch=0.1&scale=1&sh=2",
            timeout=120)
        body = resp.read()
        assert resp.headers["Content-Type"] == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"
        assert float(resp.headers["X-Radius"]) > 0
    finally:
        server.shutdown()

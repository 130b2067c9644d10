"""HTTP render service (apps/serve.py): train a tiny checkpoint, stand the
server up on an ephemeral port, and drive every endpoint over real HTTP —
spherical-pose GET renders, explicit-c2w POST renders, health/info/metrics,
and the error contract (bad pose shape -> 400, unknown route -> 404)."""

import io
import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from nerf_shared_tpu.apps.serve import (
    RenderService,
    make_server,
    serve_parser,
)
from nerf_shared_tpu.apps.train import run
from tests.test_e2e import _write_config, _write_scene


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve"))
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(root, datadir, logdir)
    run(serve_parser().parse_args(["--config", cfg_path]))

    args = serve_parser().parse_args(
        ["--config", cfg_path, "--chunk", "256", "--port", "0"])
    service = RenderService(args)
    server = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    yield service, f"http://{host}:{port}"
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_health_and_info(served):
    service, base = served
    code, _, body = _get(base + "/health")
    assert code == 200
    health = json.loads(body)
    assert health["status"] == "ok"
    assert health["step"] == 24  # N_iters of the tiny config

    code, _, body = _get(base + "/info")
    info = json.loads(body)
    # the 8-virtual-device test mesh promotes the dense path to the
    # mesh-sharded renderer, exactly like render_only
    assert info["engine"] in ("dense", "sharded-dense")
    assert (info["height"], info["width"]) == (16, 16)
    assert info["model_type"] == "nerf"


def test_render_get_spherical_png(served):
    _, base = served
    code, ctype, body = _get(base + "/render?theta=30&phi=-20&radius=4")
    assert code == 200
    assert ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_render_get_npy_is_finite_float_image(served):
    _, base = served
    code, ctype, body = _get(base + "/render?theta=0&fmt=npy")
    assert code == 200
    assert ctype == "application/octet-stream"
    rgb = np.load(io.BytesIO(body))
    assert rgb.shape == (16, 16, 3)
    assert np.isfinite(rgb).all()
    # a real render, not a constant: pixel values in range and varying
    # (24 training steps is too few to assert pure-white corners)
    assert rgb.min() >= -1e-4 and rgb.max() <= 1.0 + 1e-4
    assert rgb.std() > 1e-3


def test_render_post_c2w_matches_get(served):
    service, base = served
    from nerf_shared_tpu.data.poses import pose_spherical

    c2w = pose_spherical(25.0, -15.0, 4.0)
    code, _, body = _post(base + "/render",
                          {"c2w": c2w.tolist(), "fmt": "npy"})
    assert code == 200
    via_http = np.load(io.BytesIO(body))
    direct = service.render_spherical(25.0, -15.0, 4.0)
    np.testing.assert_allclose(via_http, np.asarray(direct), atol=1e-5)


def test_render_post_bad_pose_is_400(served):
    _, base = served
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(base + "/render", {"c2w": [[1.0, 0.0], [0.0, 1.0]]})
    assert exc.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(base + "/render", {})
    assert exc.value.code == 400


def test_unknown_route_is_404(served):
    _, base = served
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(base + "/nope")
    assert exc.value.code == 404


def test_metrics_counts_frames(served):
    service, base = served
    before = service._frames
    _get(base + "/render?theta=0&fmt=npy")
    code, ctype, body = _get(base + "/metrics")
    assert code == 200
    assert ctype.startswith("text/plain")
    text = body.decode()
    assert f"nerf_render_frames_total {before + 1}" in text
    assert 'nerf_render_latency_seconds{quantile="0.5"}' in text


def test_service_serves_occ_engine(tmp_path):
    """The service dispatches through the same engine rules as render_only:
    with --occ_grid the gated froxel path serves the frames (engine name
    reflects it) and pixels stay finite."""
    root = str(tmp_path)
    datadir = os.path.join(root, "scene")
    logdir = os.path.join(root, "logs")
    os.makedirs(datadir)
    _write_scene(datadir)
    cfg_path = _write_config(root, datadir, logdir, expname="tiny_serve_occ")
    run(serve_parser().parse_args(["--config", cfg_path]))
    args = serve_parser().parse_args(
        ["--config", cfg_path, "--chunk", "256",
         "--occ_grid", "8", "--occ_candidates", "8", "--occ_keep", "4",
         "--occ_fine", "4"])
    service = RenderService(args)
    assert service.info()["engine"] in ("occ-froxel", "sharded-froxel")
    rgb = service.render_spherical(10.0, -30.0, 4.0)
    assert np.asarray(rgb).shape == (16, 16, 3)
    assert np.isfinite(np.asarray(rgb)).all()

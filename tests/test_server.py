"""HTTP API tests against a live server (route parity with
cmd/routes.go:25-112 and handler validation with cmd/handlers)."""

import json
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from steroscopic_hardware_tpu.io.png import read_png, write_png
from steroscopic_hardware_tpu.models.blockmatch import BlockMatcher
from steroscopic_hardware_tpu.runtime.emitter import CameraEmitter
from steroscopic_hardware_tpu.runtime.manager import CameraManager
from steroscopic_hardware_tpu.runtime.pipeline import DepthPipeline
from steroscopic_hardware_tpu.runtime.server import AppContext, Server
from steroscopic_hardware_tpu.runtime.sources import SyntheticSource


def _get(url, timeout=5.0):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.read(), dict(r.headers)


def _post(url, data: bytes, ctype, timeout=5.0):
    req = urllib.request.Request(url, data=data, method="POST",
                                 headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


@pytest.fixture()
def server(rng):
    mgr = CameraManager()
    mgr.set_source("left", SyntheticSource(
        mgr.bus, "left", shape=(24, 48), fps=50.0, seed=3))
    mgr.set_source("right", SyntheticSource(
        mgr.bus, "right", shape=(24, 48), fps=50.0, shift=3, seed=3))
    pipe = DepthPipeline(mgr.bus, BlockMatcher(backend="xla"))
    srv = Server(AppContext(manager=mgr, pipeline=pipe)).start()
    base = f"http://127.0.0.1:{srv.port}"
    # wait for first depth frame
    t0 = time.time()
    while mgr.bus.latest("out") is None and time.time() - t0 < 20:
        time.sleep(0.05)
    yield base
    srv.shutdown()


def test_health_and_root(server):
    status, body, _ = _get(server + "/checkhealth")
    assert status == 200 and body == b"OK"
    status, body, _ = _get(server + "/live")
    assert status == 200 and b"stereo depth" in body


def test_stream_endpoints_serve_png(server):
    for name in ("left", "right", "out"):
        status, body, headers = _get(f"{server}/stream/{name}")
        assert status == 200
        assert headers["Content-Type"] == "image/png"
        img = read_png(body)
        assert img.shape == (24, 48)


def test_stream_unknown_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server + "/stream/nope")
    assert e.value.code == 404


def test_update_params_valid_and_invalid(server):
    status, body = _post(
        server + "/update-params",
        b"blockSize=9&maxDisparity=128",
        "application/x-www-form-urlencoded",
    )
    assert status == 200
    assert json.loads(body) == {"blockSize": 9, "maxDisparity": 128}
    status, _ = _get(server + "/params")[:2]
    # invalid: even block (params.go:37), off-grid disparity (params.go:51)
    for bad in (b"blockSize=8&maxDisparity=64",
                b"blockSize=7&maxDisparity=100"):
        status, body = _post(server + "/update-params", bad,
                             "application/x-www-form-urlencoded")
        assert status == 400
        assert b"error" in body


def test_metrics(server):
    status, body, _ = _get(server + "/metrics")
    m = json.loads(body)
    assert "pipeline" in m and "sources" in m
    assert m["sources"]["left"]["type"] == "SyntheticSource"


def test_upload_swaps_camera(server, rng):
    img = rng.integers(0, 256, (16, 20), dtype=np.uint8)
    png = write_png(None, img)
    boundary = "XBOUND"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="type"\r\n\r\nleft\r\n'
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="image"; filename="x.png"\r\n'
        "Content-Type: image/png\r\n\r\n"
    ).encode() + png + f"\r\n--{boundary}--\r\n".encode()
    status, resp = _post(server + "/upload", body,
                         f"multipart/form-data; boundary={boundary}")
    assert status == 200, resp
    assert json.loads(resp) == {"uploaded": "left", "shape": [16, 20]}
    # the left stream now serves the uploaded image
    t0 = time.time()
    while time.time() - t0 < 5:
        _, data, _ = _get(server + "/stream/left")
        if read_png(data).shape == (16, 20):
            break
        time.sleep(0.05)
    assert read_png(data).shape == (16, 20)


def test_configure_tcp_camera(server, rng):
    base_img = rng.integers(0, 256, (12, 16), dtype=np.uint8)
    emitter = CameraEmitter(lambda n: base_img, fps=100.0).start()
    try:
        status, resp = _post(
            server + "/right/configure",
            f"host=127.0.0.1&port={emitter.port}".encode(),
            "application/x-www-form-urlencoded",
        )
        assert status == 200, resp
        t0 = time.time()
        shape = None
        while time.time() - t0 < 5:
            _, data, _ = _get(server + "/stream/right")
            shape = read_png(data).shape
            if shape == (12, 16):
                break
            time.sleep(0.05)
        assert shape == (12, 16)
    finally:
        emitter.close()


def test_update_params_non_integer_is_400(server):
    status, body = _post(server + "/update-params",
                         b"blockSize=banana&maxDisparity=64",
                         "application/x-www-form-urlencoded")
    assert status == 400
    assert b"non-integer" in body


def test_mjpeg_stream_pushes_frames(server):
    """The multipart push stream must deliver at least one PNG part."""
    req = urllib.request.Request(server + "/mjpeg/left")
    with urllib.request.urlopen(req, timeout=5) as r:
        assert r.headers["Content-Type"].startswith(
            "multipart/x-mixed-replace"
        )
        head = r.read(64)
    assert head.startswith(b"--frame\r\nContent-Type: image/png")


def test_metrics_reports_pipeline_state(server):
    status, body, _ = _get(server + "/metrics")
    m = json.loads(body)
    assert "state" in m["pipeline"]


def test_exit_dumps_log(server):
    status, body, _ = _get(server + "/exit")
    assert status == 200
    assert b"shtpu" in body or len(body) >= 0  # buffer may include records


def test_slam_endpoint(rng):
    """Live SLAM surface: /slam serves the running trajectory."""
    from steroscopic_hardware_tpu.models.slam import StereoCamera
    from steroscopic_hardware_tpu.runtime.pipeline import SlamPipeline

    mgr = CameraManager()
    mgr.set_source("left", SyntheticSource(
        mgr.bus, "left", shape=(64, 96), fps=20.0, seed=9))
    mgr.set_source("right", SyntheticSource(
        mgr.bus, "right", shape=(64, 96), fps=20.0, shift=4, seed=9))
    cam = StereoCamera(fx=120.0, fy=120.0, cx=48.0, cy=32.0, baseline=0.2)
    slam = SlamPipeline(mgr.bus, cam, slam_kwargs=dict(
        block_size=7, max_disparity=16, max_keypoints=64,
        fast_threshold=15))
    pipe = DepthPipeline(mgr.bus, BlockMatcher(backend="xla"))
    srv = Server(AppContext(manager=mgr, pipeline=pipe,
                            slam_pipeline=slam)).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        t0 = time.time()
        frames = 0
        # 90 s budget: the first two frames pay the one-time jit compiles
        # of the whole front-end + windowed BA (~27 s on the CPU mesh,
        # more under parallel test load); steady state is ~0.1 s/frame
        while time.time() - t0 < 90:
            status, body, _ = _get(base + "/slam")
            d = json.loads(body)
            frames = d.get("frames", 0)
            if frames >= 2:
                break
            time.sleep(0.2)
        assert frames >= 2, d
        assert d["enabled"] is True
        assert len(d["positions"]) == frames
    finally:
        srv.shutdown()


def test_slam_endpoint_disabled_404(server):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server + "/slam")
    assert e.value.code == 404


def test_colorized_depth_stream(server):
    """The pipeline also publishes a Turbo-colorized RGB depth view."""
    t0 = time.time()
    while time.time() - t0 < 10:
        try:
            _, body, _ = _get(server + "/stream/depth")
            break
        except urllib.error.HTTPError:
            time.sleep(0.1)
    img = read_png(body)
    assert img.shape == (24, 48, 3)


def test_live_page_operational_affordances(server):
    """UI parity with the reference shell (app.templ:92-127,145+):
    version stamp, 1 s health poller, collapsible status-log panel, and
    ingest endpoint discovery."""
    from steroscopic_hardware_tpu.version import __version__

    status, body, _ = _get(server + "/live")
    assert status == 200
    page = body.decode()
    assert f"v{__version__}" in page          # build-version display
    assert "/checkhealth" in page             # health poller wiring
    assert 'id="health"' in page
    assert 'id="loglines"' in page            # status/log panel (/exit)
    assert 'id="ports"' in page               # endpoint discovery


def test_ports_advertises_emitters_and_configured_sources(server, rng):
    """GET /ports — the TCP analog of the reference's real serial
    enumeration (cmd/handlers/ports.go:14-61): live CameraEmitters and
    configured TcpSource endpoints appear; the stub '[]' days are over."""
    from steroscopic_hardware_tpu.runtime import wire

    base = rng.integers(0, 256, (8, 16), dtype=np.uint8)
    em = CameraEmitter(lambda n: base, fps=50.0,
                       codec=wire.CODEC_LZMA).start()
    try:
        status, body, _ = _get(server + "/ports")
        assert status == 200
        d = json.loads(body)
        em_rows = [p for p in d["ports"] if p["kind"] == "emitter"
                   and p["port"] == em.port]
        assert em_rows and em_rows[0]["codec"] == wire.CODEC_LZMA
        # configure a TCP source pointing at the emitter -> appears too
        status, _b = _post(
            server + "/left/configure",
            f"host=127.0.0.1&port={em.port}".encode(),
            "application/x-www-form-urlencoded",
        )
        assert status == 200
        status, body, _ = _get(server + "/ports")
        d = json.loads(body)
        cfg = [p for p in d["ports"] if p["kind"] == "configured"]
        assert any(p["port"] == em.port and p["slot"] == "left"
                   for p in cfg)
    finally:
        em.close()


def test_hx_request_serves_fragments(server):
    """htmx-style partial rendering (reference MorphableHandler,
    cmd/handlers/api.go:48-60): the same route serves the full page (or
    JSON) normally and an HTML fragment when HX-Request: true."""
    req = urllib.request.Request(server + "/metrics",
                                 headers={"HX-Request": "true"})
    with urllib.request.urlopen(req, timeout=5) as r:
        assert "text/html" in r.headers.get("Content-Type", "")
        body = r.read()
    assert body.startswith(b"<pre") and b"pipeline" in body

    req = urllib.request.Request(server + "/live",
                                 headers={"HX-Request": "true"})
    with urllib.request.urlopen(req, timeout=5) as r:
        frag = r.read()
    assert frag.startswith(b"<div") and b"<html" not in frag

    # without the header: JSON and the full page
    _, body, _ = _get(server + "/metrics")
    json.loads(body)
    _, page, _ = _get(server + "/live")
    assert b"<html" in page


def test_slam_trajectory_export_tum_and_json():
    """GET /slam/trajectory serves the FULL trajectory as TUM lines
    (idx tx ty tz qx qy qz qw, camera-to-world) and as raw twists with
    ?format=json — the offline-evaluation export surface."""
    import json
    import urllib.request

    import numpy as np

    from steroscopic_hardware_tpu.models.slam import StereoCamera
    from steroscopic_hardware_tpu.runtime.manager import CameraManager
    from steroscopic_hardware_tpu.runtime.pipeline import (
        DepthPipeline,
        SlamPipeline,
    )
    from steroscopic_hardware_tpu.runtime.server import AppContext, Server

    manager = CameraManager()
    cam = StereoCamera(fx=240.0, fy=240.0, cx=160.0, cy=120.0,
                       baseline=0.4)
    slam_pipe = SlamPipeline(manager.bus, cam)
    # hand-plant a small trajectory (no live compute needed)
    slam_pipe.slam.vo.trajectory = [
        np.array([0, 0, 0, 0, 0, 0], np.float32),
        np.array([0.1, 0, 0, 0, 0.05, 0], np.float32),
        np.array([0.2, 0, 0.1, 0.02, 0.1, 0], np.float32),
    ]
    ctx = AppContext(manager=manager,
                     pipeline=DepthPipeline(manager.bus, colorize=False),
                     slam_pipeline=slam_pipe)
    server = Server(ctx, port=0)
    # serve without starting the pipelines: the handler reads state only
    import threading

    t = threading.Thread(target=server.httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        with urllib.request.urlopen(base + "/slam/trajectory") as r:
            lines = r.read().decode().strip().splitlines()
        assert len(lines) == 3
        first = lines[0].split()
        assert len(first) == 8 and first[0] == "0"
        # identity pose: zero translation, identity quaternion
        vals = [float(v) for v in first[1:]]
        np.testing.assert_allclose(vals[:3], [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(vals[3:], [0, 0, 0, 1], atol=1e-6)

        with urllib.request.urlopen(
                base + "/slam/trajectory?format=json") as r:
            d = json.loads(r.read())
        assert np.asarray(d["xi"]).shape == (3, 6)
    finally:
        server.httpd.shutdown()
        server.httpd.server_close()

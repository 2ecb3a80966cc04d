"""Serving-path hardening: auth token, TLS, MJPEG backpressure."""

import json
import ssl
import subprocess
import time
import urllib.error
import urllib.request

import pytest

from steroscopic_hardware_tpu.models.blockmatch import BlockMatcher
from steroscopic_hardware_tpu.runtime.manager import CameraManager
from steroscopic_hardware_tpu.runtime.pipeline import DepthPipeline
from steroscopic_hardware_tpu.runtime.server import AppContext, Server
from steroscopic_hardware_tpu.runtime.sources import SyntheticSource


def _mgr():
    mgr = CameraManager()
    mgr.set_source("left", SyntheticSource(
        mgr.bus, "left", shape=(24, 48), fps=50.0, seed=3))
    mgr.set_source("right", SyntheticSource(
        mgr.bus, "right", shape=(24, 48), fps=50.0, shift=3, seed=3))
    return mgr


def _server(**ctx_kwargs):
    mgr = _mgr()
    pipe = DepthPipeline(mgr.bus, BlockMatcher(backend="xla"))
    ctx = AppContext(manager=mgr, pipeline=pipe, **ctx_kwargs)
    return Server(ctx)


def _get(url, timeout=5.0, headers=None, sslctx=None):
    req = urllib.request.Request(url, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=timeout,
                                    context=sslctx) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_auth_token_enforced():
    srv = _server(auth_token="sekrit").start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        # liveness stays open
        assert _get(base + "/checkhealth")[0] == 200
        # everything else requires the token
        assert _get(base + "/metrics")[0] == 401
        assert _get(base + "/live")[0] == 401
        code, body = _get(base + "/metrics",
                          headers={"Authorization": "Bearer sekrit"})
        assert code == 200 and b"pipeline" in body
        # query-param form (for <img> tags that can't set headers)
        assert _get(base + "/metrics?token=sekrit")[0] == 200
        assert _get(base + "/metrics?token=wrong")[0] == 401
        # POST also guarded
        req = urllib.request.Request(
            base + "/update-params", data=b"blockSize=7&maxDisparity=64",
            method="POST",
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        try:
            with urllib.request.urlopen(req, timeout=5) as r:
                code = r.status
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 401
    finally:
        srv.shutdown()


def test_tls_serving(tmp_path):
    cert = tmp_path / "cert.pem"
    key = tmp_path / "key.pem"
    p = subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout",
         str(key), "-out", str(cert), "-days", "1", "-nodes", "-subj",
         "/CN=localhost"],
        capture_output=True,
    )
    if p.returncode != 0:
        pytest.skip("openssl unavailable")
    mgr = _mgr()
    pipe = DepthPipeline(mgr.bus, BlockMatcher(backend="xla"))
    srv = Server(AppContext(manager=mgr, pipeline=pipe),
                 tls_cert=str(cert), tls_key=str(key)).start()
    try:
        sctx = ssl.create_default_context()
        sctx.check_hostname = False
        sctx.verify_mode = ssl.CERT_NONE
        code, body = _get(f"https://127.0.0.1:{srv.port}/checkhealth",
                          sslctx=sctx)
        assert code == 200 and body == b"OK"
    finally:
        srv.shutdown()


def test_mjpeg_client_cap():
    srv = _server(max_stream_clients=2).start()
    base = f"http://127.0.0.1:{srv.port}"
    opened = []
    try:
        t0 = time.time()
        while srv.ctx.bus.latest("left") is None and time.time() - t0 < 10:
            time.sleep(0.05)
        for _ in range(2):
            r = urllib.request.urlopen(base + "/mjpeg/left", timeout=5)
            r.read(10)  # ensure the stream is established
            opened.append(r)
        # wait until both streams are registered
        t0 = time.time()
        while srv.ctx.stream_clients < 2 and time.time() - t0 < 5:
            time.sleep(0.02)
        code, body = _get(base + "/mjpeg/left")
        assert code == 503 and b"too many" in body
        # metrics surfaces the count
        code, body = _get(base + "/metrics")
        assert json.loads(body)["stream_clients"] == 2
    finally:
        for r in opened:
            r.close()
        srv.shutdown()


def test_shared_encode_cache():
    """Concurrent viewers of one slot share PNG encodes: the cache returns
    the identical object for the same (slot, seq)."""
    srv = _server().start()
    bus = srv.ctx.bus
    t0 = time.time()
    while bus.latest("left") is None and time.time() - t0 < 10:
        time.sleep(0.05)
    f = bus.latest("left")
    a = srv.ctx.encode_frame("left", f)
    b = srv.ctx.encode_frame("left", f)
    assert a is b  # second call is the cache hit
    srv.shutdown()


def test_multi_rig_routing():
    """A named rig runs its own pipeline over prefixed slots with its own
    parameters; the default rig is untouched."""
    from steroscopic_hardware_tpu.runtime.server import split_slot

    assert split_slot("left") == ("", "left")
    assert split_slot("rig1.right") == ("rig1", "right")
    from steroscopic_hardware_tpu.utils.params import ParamValidationError
    for bad in ("up", "rig1.mid", ".left", "a b.left"):
        with pytest.raises(ParamValidationError):
            split_slot(bad)

    mgr = _mgr()
    mgr.set_source("cam2.left", SyntheticSource(
        mgr.bus, "cam2.left", shape=(24, 48), fps=50.0, seed=5))
    mgr.set_source("cam2.right", SyntheticSource(
        mgr.bus, "cam2.right", shape=(24, 48), fps=50.0, shift=2, seed=5))
    pipe = DepthPipeline(mgr.bus, BlockMatcher(backend="xla"))
    rig = DepthPipeline(mgr.bus, BlockMatcher(backend="xla"),
                        left_slot="cam2.left", right_slot="cam2.right",
                        out_slot="cam2.out", depth_slot="cam2.depth")
    srv = Server(AppContext(manager=mgr, pipeline=pipe,
                            rigs={"cam2": rig})).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        t0 = time.time()
        while (mgr.bus.latest("cam2.out") is None
               or mgr.bus.latest("out") is None) and time.time() - t0 < 20:
            time.sleep(0.05)
        # both rigs stream independently
        assert _get(base + "/stream/out")[0] == 200
        code, body = _get(base + "/stream/cam2.out")
        assert code == 200 and body[:4] == b"\x89PNG"
        assert _get(base + "/stream/cam2.depth")[0] == 200
        # per-rig parameter update
        req = urllib.request.Request(
            base + "/update-params",
            data=b"blockSize=9&maxDisparity=32&rig=cam2", method="POST",
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req, timeout=5) as r:
            assert r.status == 200
        assert rig.matcher.get_params().block_size == 9
        assert pipe.matcher.get_params().block_size != 9
        # unknown rig -> 400
        req = urllib.request.Request(
            base + "/update-params",
            data=b"blockSize=9&maxDisparity=32&rig=nope", method="POST",
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        try:
            with urllib.request.urlopen(req, timeout=5) as r:
                code = r.status
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 400
        # /metrics reports the rig
        code, body = _get(base + "/metrics")
        assert "cam2" in json.loads(body).get("rigs", {})
    finally:
        srv.shutdown()

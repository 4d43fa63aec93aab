"""cli/serve.py: HTTP serving of exported artifacts matches the live fn."""

import io
import json
import threading
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest


def _start(server):
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return f"http://127.0.0.1:{server.server_port}"


def _post_npy(url, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(url + "/predict", data=buf.getvalue(),
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        return np.load(io.BytesIO(r.read()))


def test_serve_single_artifact(tmp_path):
    from eventpretrain_tpu.cli.serve import make_server
    from eventpretrain_tpu.utils.export_infer import export_inference

    f = lambda x: jnp.tanh(x) @ jnp.ones((8, 4)) + 2.0
    art = str(tmp_path / "f.stablehlo")
    export_inference(f, jnp.zeros((1, 8)), art)

    srv = make_server(art, port=0)
    url = _start(srv)
    try:
        with urllib.request.urlopen(url + "/healthz") as r:
            h = json.loads(r.read())
        assert h["ok"] and h["kind"] == "single"

        x = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)
        got = _post_npy(url, x)
        np.testing.assert_allclose(got, f(x), atol=1e-5, rtol=1e-5)
    finally:
        srv.shutdown()


def test_serve_bundle_pads_and_chunks(tmp_path):
    from eventpretrain_tpu.cli.serve import make_server
    from eventpretrain_tpu.utils.export_infer import export_inference_bundle

    f = lambda x: jnp.cumsum(x, axis=-1)
    art = str(tmp_path / "f.eptb")
    export_inference_bundle(f, jnp.zeros((1, 6)), art,
                            batch_sizes=(2, 4), native=False)

    srv = make_server(art, port=0)
    url = _start(srv)
    try:
        with urllib.request.urlopen(url + "/healthz") as r:
            assert json.loads(r.read())["kind"] == "bundle"
        rng = np.random.default_rng(1)
        for n in (1, 4, 9):  # pad, exact, chunk
            x = rng.normal(size=(n, 6)).astype(np.float32)
            np.testing.assert_allclose(_post_npy(url, x), f(x),
                                       atol=1e-6, rtol=1e-6)
    finally:
        srv.shutdown()


def test_serve_error_surface(tmp_path):
    from eventpretrain_tpu.cli.serve import make_server
    from eventpretrain_tpu.utils.export_infer import export_inference

    f = lambda x: x * 2.0
    art = str(tmp_path / "f.stablehlo")
    export_inference(f, jnp.zeros((1, 3)), art)
    srv = make_server(art, port=0)
    url = _start(srv)
    try:
        req = urllib.request.Request(url + "/predict", data=b"garbage",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        assert not json.loads(ei.value.read())["ok"]
    finally:
        srv.shutdown()

"""Minimal serving process for exported inference artifacts.

The reference has no serving story at all (inference = the val loop inside
its training scripts, e.g. trainer/finetune_cls/ft_cls_trainer.py:111-192);
this completes ours: the artifacts produced by ``--export_serving`` /
``utils/export_infer.py`` (portable StableHLO or TPU-native bucketed
bundles — auto-detected by magic) are served over HTTP with nothing but
jax + numpy + the Python stdlib. No model code, config, or checkpoints on
the serving host.

Run::

    python -m eventpretrain_tpu.cli.serve --artifact serving/cls.eptb \\
        --host 0.0.0.0 --port 8000

Protocol (numpy .npy bodies — dtype/shape self-describing, zero deps):

- ``GET /healthz``   -> 200 ``{"ok": true, "artifact": ..., "kind": ...}``
- ``POST /predict``  body = one ``.npy`` array (the batched input; models
  with several inputs send one ``.npz`` with arrays in call order)
  -> 200 body = ``.npy`` of the output (or ``.npz`` for tuple outputs)

Client example::

    buf = io.BytesIO(); np.save(buf, evg_batch)
    out = np.load(io.BytesIO(requests.post(url, data=buf.getvalue()).content))
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import jax


def load_artifact(path: str):
    """Return (callable, kind) for a single artifact or a bundle."""
    from eventpretrain_tpu.utils.export_infer import (
        _BUNDLE_MAGIC,
        load_inference,
        load_inference_bundle,
    )

    with open(path, "rb") as f:
        head = f.read(len(_BUNDLE_MAGIC))
    if head == _BUNDLE_MAGIC:
        return load_inference_bundle(path), "bundle"
    return load_inference(path), "single"


def _decode_body(body: bytes) -> tuple:
    """One .npy array -> 1 arg; .npz -> args in file order."""
    if body[:4] == b"PK\x03\x04":  # zip = .npz
        z = np.load(io.BytesIO(body))
        return tuple(z[k] for k in z.files)
    return (np.load(io.BytesIO(body)),)


def _as_wire_array(a) -> np.ndarray:
    """Clients speak stock numpy: widen ml_dtypes outputs (bf16 models
    return bf16 logits) to float32 at the HTTP boundary."""
    a = np.asarray(a)
    if a.dtype.kind == "V" or a.dtype.name == "bfloat16":
        a = a.astype(np.float32)
    return a


def _encode_result(out) -> bytes:
    buf = io.BytesIO()
    leaves = jax.tree.leaves(out)
    if len(leaves) == 1:
        np.save(buf, _as_wire_array(leaves[0]))
    else:
        np.savez(buf, *[_as_wire_array(a) for a in leaves])
    return buf.getvalue()


def make_handler(infer, artifact: str, kind: str):
    lock = threading.Lock()  # one device queue; serialize dispatch

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; errors still raise
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                payload = json.dumps(
                    {"ok": True, "artifact": artifact, "kind": kind}
                ).encode()
                self._send(200, payload, "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                args = _decode_body(self.rfile.read(n))
                with lock:
                    out = infer(*args)
                body = _encode_result(out)
            except Exception as e:  # surface the error to the client
                msg = json.dumps(
                    {"ok": False, "error": f"{type(e).__name__}: {e}"}
                ).encode()
                self._send(400, msg, "application/json")
                return
            self._send(200, body, "application/octet-stream")

    return Handler


def make_server(artifact: str, host: str = "127.0.0.1", port: int = 8000):
    """Build (but do not start) the HTTP server; port 0 = ephemeral."""
    infer, kind = load_artifact(artifact)
    handler = make_handler(infer, artifact, kind)
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--artifact", required=True,
                   help="path from --export_serving / export_inference[_bundle]")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args(argv)

    srv = make_server(args.artifact, args.host, args.port)
    print(f"serving {args.artifact} on http://{args.host}:{srv.server_port} "
          f"(POST /predict, GET /healthz)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()

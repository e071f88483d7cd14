"""Remote dataset REST server (stdlib http.server; the flask-based
scripts/remote_dataset.py equivalent). Routes: /len, /get/<i>."""
from __future__ import annotations

import base64
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

from rave_tpu.data.store import ArsReader


def serve(db_path: str, port: int = 5000):
    reader = ArsReader(db_path)

    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/len":
                return self._json({"length": len(reader)})
            if self.path.startswith("/get/"):
                try:
                    i = int(self.path.split("/")[-1])
                    rec = reader[i]
                except (ValueError, IndexError):
                    return self._json({"error": "bad index"}, 404)
                return self._json(
                    {
                        "data": base64.b64encode(
                            np.ascontiguousarray(rec, "<i2").tobytes()
                        ).decode(),
                        "channels": int(rec.shape[1]),
                        "sr": reader.meta["sr"],
                    }
                )
            return self._json({"error": "not found"}, 404)

        def log_message(self, *a):
            pass

    print(f"serving {db_path} ({len(reader)} examples) on :{port}")
    HTTPServer(("0.0.0.0", port), Handler).serve_forever()

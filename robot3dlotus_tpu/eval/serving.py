"""Challenge-style HTTP serving (reference challenges/server.py:17-45,
challenges/client.py:21-128, challenges/actioner.py:10-107).

Same wire contract as the reference: POST /predict with a msgpack-encoded
dict {taskvar, episode_id, step_id, instruction, obs_state_dict}; response is
a msgpack-encoded {action}. Flask is replaced by stdlib http.server (no
external deps); numpy arrays ride the msgpack extension from datasets.store.
"""
from __future__ import annotations

import http.server
import threading
from typing import Callable, Dict

import numpy as np

from ..train.datasets.store import _pack_np, _unpack_np


class RandomActioner:
    """No-model stand-in exercising the wire format
    (reference challenges/actioner.py:10-29)."""

    def predict(self, taskvar=None, episode_id=None, step_id=None,
                instruction=None, obs_state_dict=None, **kw):
        action = np.random.randn(8).astype(np.float32)
        action[3:7] /= np.linalg.norm(action[3:7])
        action[7] = float(action[7] > 0)
        return {"action": action}


class ThreeDLotusActioner:
    """Challenge wrapper around the 3D-LOTUS policy Actioner
    (reference challenges/actioner.py:32-66)."""

    def __init__(self, expr_dir, ckpt_step=150000, **actioner_kw):
        import os
        from .actioner import Actioner
        self.actioner = Actioner(
            os.path.join(expr_dir, "logs", "training_config.yaml"),
            checkpoint=os.path.join(
                expr_dir, "ckpts", f"model_step_{ckpt_step}.msgpack"),
            **actioner_kw)

    def predict(self, taskvar=None, episode_id=None, step_id=None,
                instruction=None, obs_state_dict=None, **kw):
        task_str, variation = taskvar.split("+")
        out = self.actioner.predict(
            task_str, int(variation), step_id, obs_state_dict, episode_id,
            instructions=[instruction] if instruction else None)
        return {"action": np.asarray(out["action"], np.float32)}


class ThreeDLotusPlusActioner:
    """Challenge wrapper around the stateful 3D-LOTUS++ RobotPipeline
    (reference challenges/actioner.py:69-107): the per-episode cache lives
    in the actioner and resets at step 0."""

    def __init__(self, pipeline_config, **pipeline_kw):
        from .robot_pipeline import RobotPipeline
        self.pipeline = RobotPipeline(pipeline_config, **pipeline_kw)
        self.cache = None

    def predict(self, taskvar=None, episode_id=None, step_id=None,
                instruction=None, obs_state_dict=None, **kw):
        task_str, variation = taskvar.split("+")
        if step_id == 0:
            self.cache = None
        out = self.pipeline.predict(
            task_str=task_str, variation=int(variation),
            episode_id=episode_id, step_id=step_id,
            instructions=[instruction] if instruction else None,
            obs_state_dict=obs_state_dict, cache=self.cache)
        self.cache = out["cache"]
        return {"action": np.asarray(out["action"], np.float32)}


class PolicyHTTPServer:
    """Serves any actioner with .predict(**payload) over POST /predict."""

    def __init__(self, actioner, host="127.0.0.1", port=13000):
        self.actioner = actioner
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                if self.path != "/predict":
                    self.send_response(404)
                    self.end_headers()
                    return
                length = int(self.headers.get("Content-Length", 0))
                payload = _unpack_np(self.rfile.read(length))
                try:
                    out = outer.actioner.predict(**payload)
                except Exception as e:  # 500 with the error, keep serving
                    body = _pack_np({"error": repr(e)})
                    self.send_response(500)
                    self.send_header("Content-Type", "application/msgpack")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                body = _pack_np(out)
                self.send_response(200)
                self.send_header("Content-Type", "application/msgpack")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):
                pass

        self.httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = host, self.httpd.server_address[1]

    def serve_forever(self):
        self.httpd.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()


class PolicyHTTPClient:
    """reference challenges/client.py:21-128 (requests + msgpack)."""

    def __init__(self, url="http://127.0.0.1:13000"):
        import requests
        self._requests = requests
        self.url = url.rstrip("/")

    def predict(self, **payload) -> Dict:
        resp = self._requests.post(
            self.url + "/predict", data=_pack_np(payload),
            headers={"Content-Type": "application/msgpack"})
        resp.raise_for_status()
        return _unpack_np(resp.content)


def main(argv=None):
    """CLI: serve one of the three actioner families
    (reference challenges/run_server.sh + server.py __main__)."""
    import argparse
    import yaml

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--actioner", default="random",
                   choices=["random", "3dlotus", "3dlotus++"])
    p.add_argument("--expr_dir", help="3dlotus: experiment directory")
    p.add_argument("--ckpt_step", type=int, default=150000)
    p.add_argument("--pipeline_config", help="3dlotus++: pipeline yaml")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=13000)
    args = p.parse_args(argv)

    if args.actioner == "3dlotus":
        if not args.expr_dir:
            p.error("--expr_dir is required for --actioner 3dlotus")
        actioner = ThreeDLotusActioner(args.expr_dir,
                                       ckpt_step=args.ckpt_step)
    elif args.actioner == "3dlotus++":
        if not args.pipeline_config:
            p.error("--pipeline_config is required for --actioner 3dlotus++")
        from ..utils.assets import resolve_asset
        with open(resolve_asset(args.pipeline_config)) as f:
            actioner = ThreeDLotusPlusActioner(yaml.safe_load(f))
    else:
        actioner = RandomActioner()

    server = PolicyHTTPServer(actioner, host=args.host, port=args.port)
    print(f"serving {args.actioner} on http://{server.host}:{server.port}"
          "/predict", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()

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


class HTTPActioner:
    """Adapts the RLBenchEnv.evaluate actioner API (predict with
    task_str/variation/instructions, environments.py:167-170) to the
    challenge wire format (taskvar/instruction) over an HTTP client."""

    def __init__(self, client):
        self.client = client
        self._episode_instr = {}  # (taskvar, episode_id) -> instruction

    def predict(self, task_str=None, variation=None, step_id=None,
                obs_state_dict=None, episode_id=None, instructions=None):
        import random
        taskvar = f"{task_str}+{variation}"
        # one instruction per episode, reused across its steps (the reference
        # challenge client picks once per episode, challenges/client.py:83-96).
        # Without an episode_id there is no episode boundary to re-roll on —
        # be deterministic (instructions[0], the reference Actioner default)
        # instead of caching one random choice forever. The cache is bounded
        # (not single-slot) so interleaved episodes don't thrash it back to
        # per-step re-rolls.
        if episode_id is None:
            instr = instructions[0] if instructions else None
        else:
            key = (taskvar, episode_id)
            # step 0 is an episode reset: re-roll even on a cache hit, so a
            # reused (taskvar, episode_id) — e.g. the same demo key across two
            # evaluate() runs with one long-lived actioner — draws a fresh
            # instruction like the reference client does at every reset
            if step_id == 0:
                self._episode_instr.pop(key, None)
            if key not in self._episode_instr:
                if len(self._episode_instr) >= 32:
                    self._episode_instr.pop(next(iter(self._episode_instr)))
                self._episode_instr[key] = (
                    random.choice(instructions) if instructions else None)
            instr = self._episode_instr[key]
        out = self.client.predict(
            taskvar=taskvar, episode_id=episode_id,
            step_id=step_id,
            instruction=instr,
            obs_state_dict=obs_state_dict)
        if "error" in out:
            raise RuntimeError(f"server error: {out['error']}")
        return {"action": np.asarray(out["action"])}


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


def run_client(taskvar, client, env, num_episodes=25, max_steps=25,
               output_file=None, seed=100):
    """Closed-loop challenge client (reference challenges/client.py:21-128):
    rolls `num_episodes` episodes of one taskvar against a policy server,
    POSTing each observation and executing the returned action; appends one
    jsonl record with the success rate. `env` is any object with the
    ReplayEnv/RLBenchEnv driver API (reset/step/instructions/close)."""
    import random

    from .common import write_to_file

    task_str, variation = taskvar.split("+")
    success = 0
    for episode_id in range(num_episodes):
        try:
            obs = env.reset(task_str, int(variation), episode_id, seed=seed)
        except Exception:
            continue
        instruction = random.choice(env.instructions(taskvar))
        reward = 0.0
        for step_id in range(max_steps):
            out = client.predict(
                taskvar=taskvar, episode_id=episode_id, step_id=step_id,
                instruction=instruction, obs_state_dict=obs)
            if "error" in out:
                raise RuntimeError(f"server error: {out['error']}")
            try:
                obs, reward, done = env.step(np.asarray(out["action"]))
            except Exception:  # IK/path/invalid-action fails the episode
                reward, done = 0.0, True
            if done or reward == 1:
                break
        success += int(reward == 1)
    rec = {"task": task_str, "variation": int(variation),
           "num_demos": num_episodes, "sr": success / max(num_episodes, 1)}
    if output_file:
        write_to_file(output_file, rec)
    return rec


def client_main(argv=None):
    """CLI twin of reference challenges/client.py __main__: drive a live
    RLBench sim (or, with --replay_store, the sim-free ReplayEnv) against a
    running policy server."""
    import argparse

    p = argparse.ArgumentParser(description=run_client.__doc__)
    p.add_argument("--taskvar", required=True, help="e.g. push_button+0")
    p.add_argument("--server_addr", default="http://127.0.0.1:13000")
    p.add_argument("--num_episodes", type=int, default=25)
    p.add_argument("--max_steps", type=int, default=25)
    p.add_argument("--microstep_data_dir", default="",
                   help="replay recorded demo states instead of live resets")
    p.add_argument("--replay_store", default=None,
                   help="LMDB keystep store path: evaluate sim-free against "
                        "ReplayEnv instead of launching RLBench")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--output_file", default=None)
    args = p.parse_args(argv)

    client = PolicyHTTPClient(args.server_addr)
    if args.replay_store:
        from ..train.datasets.store import open_store
        from .server import ReplayEnv
        env = ReplayEnv(open_store(args.replay_store))
        rec = run_client(args.taskvar, client, env,
                         num_episodes=args.num_episodes,
                         max_steps=args.max_steps,
                         output_file=args.output_file)
        env.close()
    else:
        from .common import write_to_file
        from ..rlbench.environments import RLBenchEnv
        env = RLBenchEnv(
            data_path=args.microstep_data_dir, apply_rgb=True, apply_pc=True,
            apply_mask=False, headless=True,
            image_size=(args.image_size, args.image_size))
        task_str, variation = args.taskvar.split("+")
        sr = env.evaluate(
            task_str, int(variation), max_episodes=args.max_steps,
            num_demos=args.num_episodes, log_dir=None,
            actioner=HTTPActioner(client), max_tries=10)
        rec = {"task": task_str, "variation": int(variation),
               "num_demos": args.num_episodes, "sr": sr}
        if args.output_file:
            write_to_file(args.output_file, rec)
    print(rec, flush=True)


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
    import sys as _sys
    # `python -m robot3dlotus_tpu.eval.serving client ...` runs the
    # closed-loop challenge client; anything else serves.
    if len(_sys.argv) > 1 and _sys.argv[1] == "client":
        client_main(_sys.argv[2:])
    else:
        main()

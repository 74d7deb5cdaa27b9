"""Asset-path resolution.

The reference configs point at repo-relative data files ('assets/
taskvars_train.json', 'prompts/rlbench/in_context_examples.txt', ...:
assets/ holds task splits, instructions, GT labels; prompts/ holds the LLM
planner prompts). Those benchmark metadata files are vendored at the repo
root (assets/, prompts/rlbench/); resolution order:

  1. absolute paths that exist are returned as-is;
  2. $GEMBENCH_ASSETS_ROOT/<path> when set (explicit user override);
  3. the path itself, cwd-relative;
  4. <repo_root>/<path> (the vendored copies).

Returns the first hit, or the original path (callers raise their own
FileNotFoundError with full context).
"""
from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def resolve_asset(path):
    if not path:
        return path
    path = str(path)
    if os.path.isabs(path):
        return path
    env_root = os.environ.get("GEMBENCH_ASSETS_ROOT")
    if env_root:
        cand = os.path.join(env_root, path)
        if os.path.exists(cand):
            return cand
    if os.path.exists(path):
        return path
    cand = os.path.join(_REPO_ROOT, path)
    if os.path.exists(cand):
        return cand
    return path

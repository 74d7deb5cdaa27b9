"""Asset-path resolution.

The reference configs point at repo-relative data files ('assets/
taskvars_train.json', 'prompts/rlbench/in_context_examples.txt', ...:
assets/ holds task splits, instructions, GT labels; prompts/ holds the LLM
planner prompts). Those are benchmark *data*, not code, and live outside this
repo; resolve them through an indirection instead of vendoring:

  1. the path itself, if it exists (absolute or cwd-relative);
  2. $GEMBENCH_ASSETS_ROOT/<path> when set;
  3. <repo_root>/<path> (user-provided checkouts);
  4. /root/reference/<path> (the read-only upstream in this environment).

Returns the first hit, or the original path (callers raise their own
FileNotFoundError with full context).
"""
from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_FALLBACK_ROOTS = ("/root/reference",)


def resolve_asset(path):
    if not path:
        return path
    path = str(path)
    if os.path.exists(path):
        return path
    roots = []
    env_root = os.environ.get("GEMBENCH_ASSETS_ROOT")
    if env_root:
        roots.append(env_root)
    roots.append(_REPO_ROOT)
    roots.extend(_FALLBACK_ROOTS)
    for root in roots:
        cand = os.path.join(root, path)
        if os.path.exists(cand):
            return cand
    return path

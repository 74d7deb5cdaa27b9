"""Populate a standalone GemBench assets root for this framework.

The benchmark data files (task splits, instructions, GT action labels,
LLM-planner prompts — reference assets/ and prompts/rlbench/) are *data*,
not code; vendored copies live at the repo root (assets/, prompts/). This
script refreshes or re-materializes
them into a directory which `utils.assets.resolve_asset` then finds via
$GEMBENCH_ASSETS_ROOT (or by passing the directory as the repo root).

Two sources:
  * --src <path>: copy from a local checkout of the upstream repository
    (e.g. a clone of github.com/vlc-robot/robot-3dlotus);
  * --url-base <url>: download over HTTP(S) (needs egress). Default is the
    public GitHub raw URL of the upstream repository's main branch.

The CLIP text-embedding caches referenced by the training configs
(instr_embeds_clip.npy etc.) are *generated*, not fetched — run
preprocess/gen_text_embeds.py after fetching (it needs the instruction
JSONs from this script).

Usage:
  python -m robot3dlotus_tpu.scripts.fetch_assets --src /path/to/upstream \
      --dst /data/gembench_assets
  export GEMBENCH_ASSETS_ROOT=/data/gembench_assets
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

# every repo-relative data file the framework's configs/pipelines reference
ASSET_FILES = [
    "assets/taskvars_train.json",
    "assets/taskvars_test_l2.json",
    "assets/taskvars_test_l3.json",
    "assets/taskvars_test_l4.json",
    "assets/taskvars_peract.json",
    "assets/taskvars_instructions_new.json",
    "assets/taskvars_instructions_peract.json",
    "assets/taskvars_target_label_zrange.json",
    "assets/task_new_keystep_ids.json",
    "prompts/rlbench/system_prompt.txt",
    "prompts/rlbench/planner_prompts.txt",
    "prompts/rlbench/in_context_examples.txt",
    "prompts/rlbench/height_range_prompts.json",
]

DEFAULT_URL_BASE = \
    "https://raw.githubusercontent.com/vlc-robot/robot-3dlotus/main"


def fetch(dst, src=None, url_base=None, files=None):
    """Copy (src) or download (url_base) every asset file into dst.
    Returns the list of files written; raises on any missing file."""
    files = files or ASSET_FILES
    written = []
    for rel in files:
        out = os.path.join(dst, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        if src:
            path = os.path.join(src, rel)
            if not os.path.exists(path):
                raise FileNotFoundError(f"{path} (from --src {src})")
            shutil.copyfile(path, out)
        else:
            import urllib.request
            url = f"{url_base or DEFAULT_URL_BASE}/{rel}"
            with urllib.request.urlopen(url) as r, open(out, "wb") as f:
                shutil.copyfileobj(r, f)
        written.append(out)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dst", required=True, help="assets root to populate")
    p.add_argument("--src", default=None,
                   help="local upstream checkout to copy from")
    p.add_argument("--url-base", default=None,
                   help=f"HTTP base to download from "
                        f"(default {DEFAULT_URL_BASE})")
    args = p.parse_args(argv)
    written = fetch(args.dst, src=args.src, url_base=args.url_base)
    print(f"wrote {len(written)} files under {args.dst}")
    print("next: export GEMBENCH_ASSETS_ROOT=" + os.path.abspath(args.dst))


if __name__ == "__main__":
    sys.exit(main())

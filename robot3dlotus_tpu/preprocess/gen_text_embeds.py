"""Text-embedding caches (reference preprocess/gen_instr_text_embeds.py:12-43
and gen_action_text_embeds.py:13-53): per-token CLIP hidden states for every
instruction / action name, saved as the .npy dicts the training configs point
at (instr_embed_file / action_embed_file).

  python -m robot3dlotus_tpu.preprocess.gen_text_embeds instr \
      --input_file assets/taskvars_instructions_new.json --output_dir ...
  python -m robot3dlotus_tpu.preprocess.gen_text_embeds action \
      --label_file assets/taskvars_target_label_zrange.json --output_dir ... \
      [--include_objects]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..utils.assets import resolve_asset
from ..vlm.clip_encoder import ClipTextEncoder


def collect_instructions(taskvar_instr_file):
    taskvars_instrs = json.load(open(resolve_asset(taskvar_instr_file)))
    all_instrs = set()
    for instrs in taskvars_instrs.values():
        all_instrs.update(instrs)
    return sorted(all_instrs)


def collect_action_names(label_file, include_objects=False):
    """Action names from the GT label file (reference
    gen_action_text_embeds.py:29-40)."""
    taskvars_target_labels = json.load(open(resolve_asset(label_file)))
    action_names = set()
    for target_labels in taskvars_target_labels.values():
        for target_label in target_labels:
            name = target_label["action"]
            if include_objects:
                if "object" in target_label:
                    name = f"{name} {target_label['object']['name']}"
                if "target" in target_label:
                    name = f"{name} to {target_label['target']['name']}"
            action_names.add(name)
    return sorted(action_names)


def encode_to_file(texts, output_file, encoder=None):
    if os.path.exists(output_file):
        return output_file
    encoder = encoder or ClipTextEncoder()
    embeds = {}
    for text in texts:
        embeds[text] = encoder.encode_tokens(text)
    os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
    np.save(output_file, embeds)
    return output_file


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("kind", choices=["instr", "action"])
    parser.add_argument("--input_file",
                        default="assets/taskvars_instructions_new.json")
    parser.add_argument("--label_file",
                        default="assets/taskvars_target_label_zrange.json")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--model_name", default="clip")
    parser.add_argument("--include_objects", action="store_true")
    args = parser.parse_args(argv)

    if args.kind == "instr":
        texts = collect_instructions(args.input_file)
        out = os.path.join(args.output_dir,
                           f"instr_embeds_{args.model_name}.npy")
    else:
        texts = collect_action_names(args.label_file, args.include_objects)
        stem = ("action-object_embeds" if args.include_objects
                else "action_embeds")
        out = os.path.join(args.output_dir, f"{stem}_{args.model_name}.npy")
    print(f"encoding {len(texts)} texts -> {out}")
    return encode_to_file(texts, out)


if __name__ == "__main__":
    main()

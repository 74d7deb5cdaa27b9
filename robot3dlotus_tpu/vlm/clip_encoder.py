"""CLIP text/image encoder wrapper (reference vlm_models/clip_encoder.py:43-159).

Host-side frozen foundation model (HF transformers). The training/eval hot
path never needs this — instruction/action embeddings are precomputed caches
(preprocess/gen_*_text_embeds.py) — so this wrapper is only exercised for
unseen instructions at eval time. Zero-egress environments must point
`model_path` at a local checkout; otherwise calls raise a clear error.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

PROMPT_TEMPLATES = {
    "point cloud": "a point cloud of a {}.",
    "plain": "{}",
}


class ClipTextEncoder:
    def __init__(self, model_path: Optional[str] = None,
                 model_name="openai/clip-vit-base-patch32", device="cpu"):
        self.model_name = model_path or os.environ.get(
            "CLIP_MODEL_PATH", model_name)
        self.device = device
        self._model = None
        self._tokenizer = None

    def _load(self):
        if self._model is None:
            try:
                from transformers import CLIPTextModel, CLIPTokenizerFast
                self._tokenizer = CLIPTokenizerFast.from_pretrained(
                    self.model_name)
                self._model = CLIPTextModel.from_pretrained(self.model_name)
                self._model.eval()
            except Exception as e:
                raise RuntimeError(
                    f"CLIP text model unavailable ({e}); precompute "
                    "instruction embeddings (gen_instr_text_embeds) or set "
                    "CLIP_MODEL_PATH to a local checkout.") from e

    def encode_tokens(self, text: str, use_prompt=False) -> np.ndarray:
        """Returns per-token last_hidden_state (T, 512), matching the
        reference's 'all' instr_embed_type (clip_encoder.py:59-84)."""
        self._load()
        import torch
        if use_prompt:
            text = PROMPT_TEMPLATES["point cloud"].format(text)
        with torch.no_grad():
            toks = self._tokenizer([text], return_tensors="pt",
                                   truncation=True, max_length=77)
            out = self._model(**toks)
        return out.last_hidden_state[0].numpy().astype(np.float32)

    def encode_last(self, text: str, **kw) -> np.ndarray:
        return self.encode_tokens(text, **kw)[-1:]


def batch_encode_instructions(instructions: List[str], out_file: str,
                              encoder: Optional[ClipTextEncoder] = None):
    """Parity with preprocess/gen_instr_text_embeds.py: cache per-token CLIP
    hidden states for a list of instructions into an .npy dict."""
    encoder = encoder or ClipTextEncoder()
    cache = {}
    for instr in instructions:
        cache[instr] = encoder.encode_tokens(instr)
    np.save(out_file, cache)
    return cache

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

# 3D-caption prompt ensemble (reference clip_encoder.py:11-40): 20 prefixes
# x 3 suffixes = 60 prompts per label, averaged downstream by callers.
_PROMPT_PREFIXES = (
    "", "A ", "A model of ", "A model of a ", "A image of ",
    "A image of a ", "A 3D model of ", "A 3D model of a ",
    "A rendering model of ", "A rendering model of a ",
    "A point cloud of ", "A point cloud of a ",
    "A point cloud model of ", "A point cloud model of a ",
    "A 3D rendering model of ", "A 3D rendering model of a ",
    "A rendering image of ", "A rendering image of a ",
    "A 3D rendering image of ", "A 3D rendering image of a ",
)
_PROMPT_SUFFIXES = (".", " with white background.", " with black context.")


def get_prompts_from_label(text: str) -> List[str]:
    return [p + text + s for p in _PROMPT_PREFIXES for s in _PROMPT_SUFFIXES]


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


class ClipEncoder(ClipTextEncoder):
    """Full CLIP wrapper: pooled/projected text features, image features,
    and the 60-prompt 3D-caption ensemble — reference ClipEncoder parity
    (clip_encoder.py:43-100). Uses the full CLIPModel (text projection +
    vision tower) instead of the text-only tower of ClipTextEncoder."""

    def _load(self):
        if self._model is None:
            try:
                from transformers import (
                    CLIPModel, CLIPTokenizerFast, CLIPImageProcessor)
                self._tokenizer = CLIPTokenizerFast.from_pretrained(
                    self.model_name)
                self._processor = CLIPImageProcessor.from_pretrained(
                    self.model_name)
                self._model = CLIPModel.from_pretrained(self.model_name)
                self._model.eval()
            except Exception as e:
                raise RuntimeError(
                    f"CLIP model unavailable ({e}); set CLIP_MODEL_PATH to "
                    "a local checkout.") from e

    def forward_text(self, text, use_prompt=True,
                     output_hidden_states=False) -> np.ndarray:
        """Projected pooled text features (B, 512), or per-token hidden
        states (B, T, 512) when output_hidden_states. With use_prompt the
        input label is expanded to the 60-prompt ensemble
        (clip_encoder.py:59-84)."""
        self._load()
        import torch
        captions = get_prompts_from_label(text) if use_prompt else (
            [text] if isinstance(text, str) else list(text))
        with torch.no_grad():
            toks = self._tokenizer(captions, return_tensors="pt",
                                   padding=True, truncation=True,
                                   max_length=77)
            out = self._model.text_model(
                input_ids=toks["input_ids"],
                attention_mask=toks["attention_mask"],
                return_dict=True)
            if output_hidden_states:
                return out.last_hidden_state.numpy().astype(np.float32)
            pooled = self._model.text_projection(out.pooler_output)
        return pooled.numpy().astype(np.float32)

    def forward_image(self, images) -> np.ndarray:
        """Projected image features (B, 512). Accepts PIL images or HWC
        uint8 numpy arrays (clip_encoder.py:87-92)."""
        self._load()
        import torch
        pixel_values = self._processor(
            images=images, return_tensors="pt")["pixel_values"]
        with torch.no_grad():
            fts = self._model.get_image_features(pixel_values=pixel_values)
        return fts.numpy().astype(np.float32)

    def __call__(self, enc_type, inputs, **kw):
        if enc_type == "text":
            return self.forward_text(inputs, **kw)
        if enc_type == "image":
            return self.forward_image(inputs, **kw)
        raise NotImplementedError(f"Unknown enc_type: {enc_type}")


class OpenClipEncoder:
    """OpenCLIP ViT-bigG alternative (reference clip_encoder.py:102-159).
    open_clip is not baked into this image, so construction is lazily
    gated: a clear error points at the precomputed-embedding path if the
    package is absent."""

    def __init__(self, model_name="ViT-bigG-14",
                 pretrained="laion2b_s39b_b160k"):
        self.model_name, self.pretrained = model_name, pretrained
        self._model = self._tokenizer = self._preprocess = None

    def _load(self):
        if self._model is None:
            try:
                import open_clip
            except ImportError as e:
                raise RuntimeError(
                    "open_clip is not installed in this environment; use "
                    "ClipEncoder (HF CLIP) or precomputed text-embed "
                    "caches instead.") from e
            self._model, _, self._preprocess = (
                open_clip.create_model_and_transforms(
                    self.model_name, pretrained=self.pretrained))
            self._tokenizer = open_clip.get_tokenizer(self.model_name)
            self._model.eval()

    def forward_text(self, text, use_prompt=True,
                     output_hidden_states=False):
        self._load()
        import torch
        captions = get_prompts_from_label(text) if use_prompt else (
            [text] if isinstance(text, str) else list(text))
        toks = self._tokenizer(captions, context_length=77)
        with torch.no_grad():
            if output_hidden_states:
                # per-token hidden states up to (and including) EOT,
                # reference clip_encoder.py:125-145
                m = self._model
                x = m.token_embedding(toks)
                x = x + m.positional_embedding
                x = m.transformer(x, attn_mask=m.attn_mask)
                x = m.ln_final(x)
                num_tokens = toks.argmax(dim=-1) + 1
                return [v[:num_tokens[i]].numpy().astype(np.float32)
                        for i, v in enumerate(x)]
            fts = self._model.encode_text(toks)
        return fts.numpy().astype(np.float32)

    def forward_image(self, images):
        self._load()
        import torch
        imgs = torch.stack(
            [self._preprocess(im.convert("RGB")) for im in images], 0)
        with torch.no_grad():
            fts = self._model.encode_image(imgs)
        return fts.numpy().astype(np.float32)

    def __call__(self, enc_type, inputs, **kw):
        if enc_type == "text":
            return self.forward_text(inputs, **kw)
        if enc_type == "image":
            return self.forward_image(inputs, **kw)
        raise NotImplementedError(f"Unknown enc_type: {enc_type}")


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

"""OWLv2 class-agnostic objectness detector
(reference vlm_models/owlv2_detector.py:76-277).

The algorithmic post-processing (size filters, topk, Gaussian soft-NMS) is
pure numpy here; only encode_images/encode_texts touch HF transformers, and
they load lazily (zero-egress envs must point OWLV2_MODEL_PATH at a local
checkout).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

MODEL_IDS = {
    "base": "google/owlv2-base-patch16-ensemble",
    "large": "google/owlv2-large-patch14-ensemble",
}


def soft_nms(boxes: np.ndarray, scores: np.ndarray, sigma=0.5, thresh=0.001):
    """Gaussian soft-NMS; returns kept ORIGINAL indices, in the greedy
    max-score visiting order (reference soft_nms_pytorch semantics,
    owlv2_detector.py:17-74)."""
    boxes = np.asarray(boxes, np.float64).copy()
    scores = np.asarray(scores, np.float64).copy()
    N = len(boxes)
    idx = np.arange(N, dtype=np.int64)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    for i in range(N):
        pos = i + 1
        if i != N - 1:
            maxpos = int(np.argmax(scores[pos:])) + pos
            if scores[i] < scores[maxpos]:
                boxes[[i, maxpos]] = boxes[[maxpos, i]]
                scores[[i, maxpos]] = scores[[maxpos, i]]
                areas[[i, maxpos]] = areas[[maxpos, i]]
                idx[[i, maxpos]] = idx[[maxpos, i]]
        xx1 = np.maximum(boxes[i, 0], boxes[pos:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[pos:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[pos:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[pos:, 3])
        w = np.maximum(0.0, xx2 - xx1)
        h = np.maximum(0.0, yy2 - yy1)
        inter = w * h
        ovr = inter / np.maximum(areas[i] + areas[pos:] - inter, 1e-12)
        scores[pos:] *= np.exp(-(ovr * ovr) / sigma)

    return idx[scores > thresh]


def post_process_objectness(
    objectness_logits, pred_boxes_cxcywh, threshold=0.1, target_sizes=None,
    min_size_ratio=None, max_size_ratio=0.8, min_return_topk=None,
    max_return_topk=None, use_nms=False, nms_sigma=0.2, nms_thresh=0.1,
    sqrt_num_patches=60,
) -> List[Dict]:
    """Numpy port of reference post_process_objectness_detection
    (owlv2_detector.py:214-277). Inputs are (B, P) logits and (B, P, 4)
    center-format boxes; returns per-image dicts of scores/boxes/patch ids."""
    objectness = 1.0 / (1.0 + np.exp(-np.asarray(objectness_logits)))
    pred_boxes = np.asarray(pred_boxes_cxcywh)
    box_sizes = np.prod(pred_boxes[..., 2:], -1)
    # center -> corners
    boxes = np.concatenate([
        pred_boxes[..., :2] - pred_boxes[..., 2:] / 2,
        pred_boxes[..., :2] + pred_boxes[..., 2:] / 2,
    ], axis=-1)

    results = []
    for s, b, bsize in zip(objectness, boxes, box_sizes):
        obj_ids = np.arange(s.shape[0])
        if min_size_ratio is not None:
            obj_ids = obj_ids[bsize[obj_ids] > min_size_ratio]
        if max_size_ratio is not None:
            obj_ids = obj_ids[bsize[obj_ids] < max_size_ratio]
        tmp = obj_ids[s[obj_ids] >= threshold]
        if len(tmp) == 0 and min_return_topk is not None:
            top = np.argsort(-s[obj_ids])[:min_return_topk]
            obj_ids = obj_ids[top]
        else:
            obj_ids = tmp
        obj_ids = obj_ids[np.argsort(-s[obj_ids], kind="stable")]
        if max_return_topk is not None:
            obj_ids = obj_ids[:max_return_topk]

        score = s[obj_ids]
        box = b[obj_ids]
        patch_index = obj_ids.astype(np.int64)
        patch_coord = np.stack(
            [patch_index % sqrt_num_patches,
             patch_index // sqrt_num_patches], -1) / sqrt_num_patches

        if target_sizes is not None:
            img_size = max(target_sizes)
            box = box * img_size
            patch_coord = patch_coord * img_size

        if use_nms:
            keep = soft_nms(box, score, sigma=nms_sigma, thresh=nms_thresh)
            score, box = score[keep], box[keep]
            patch_index, patch_coord = patch_index[keep], patch_coord[keep]

        results.append({"scores": score, "boxes": box,
                        "patch_indexs": patch_index,
                        "patch_coords": patch_coord})
    return results


class Owlv2ObjectDetector:
    """Lazy HF wrapper; encode_images returns the same field set as the
    reference (image_embeds/pred_boxes/objectness_logits/image_class_embeds/
    class_logit_shift/class_logit_scale), as numpy."""

    def __init__(self, model_id="large", device="cpu"):
        self.model_name = os.environ.get(
            "OWLV2_MODEL_PATH", MODEL_IDS.get(model_id, model_id))
        self.device = device
        self._model = None
        self._processor = None
        self.sqrt_num_patches = 60

    def _load(self):
        if self._model is None:
            try:
                from transformers import (
                    Owlv2Processor, Owlv2ForObjectDetection,
                )
                self._processor = Owlv2Processor.from_pretrained(
                    self.model_name)
                self._model = Owlv2ForObjectDetection.from_pretrained(
                    self.model_name)
                self._model.eval()
                self.sqrt_num_patches = self._model.sqrt_num_patches
            except Exception as e:
                raise RuntimeError(
                    f"OWLv2 unavailable ({e}); set OWLV2_MODEL_PATH to a "
                    "local checkout for the 3D-LOTUS++ auto-grounding "
                    "pipeline, or use the groundtruth pipeline.") from e

    def encode_images(self, images):
        self._load()
        import torch
        from PIL import Image
        pil = [Image.fromarray(im) for im in images]
        inputs = self._processor(images=pil, return_tensors="pt")
        with torch.no_grad():
            m = self._model
            vision = m.owlv2.vision_model(
                pixel_values=inputs["pixel_values"], return_dict=True)
            image_embeds = m.owlv2.vision_model.post_layernorm(
                vision.last_hidden_state)
            class_tok = torch.broadcast_to(
                image_embeds[:, :1, :], image_embeds[:, :-1].shape)
            image_embeds = image_embeds[:, 1:, :] * class_tok
            image_embeds = m.layer_norm(image_embeds)
            bsz = image_embeds.shape[0]
            p = m.sqrt_num_patches
            fmap = image_embeds.reshape(bsz, p, p, image_embeds.shape[-1])
            image_class_embeds = m.class_head.dense0(image_embeds)
            shift = m.class_head.logit_shift(image_embeds)
            scale = m.class_head.elu(
                m.class_head.logit_scale(image_embeds)) + 1
            objectness = m.objectness_predictor(image_embeds)
            pred_boxes = m.box_predictor(image_embeds, fmap)
        return {
            "image_embeds": fmap.numpy(),
            "pred_boxes": pred_boxes.numpy(),
            "objectness_logits": objectness.numpy(),
            "image_class_embeds": image_class_embeds.numpy(),
            "class_logit_shift": shift.numpy(),
            "class_logit_scale": scale.numpy(),
        }

    def encode_texts(self, texts):
        self._load()
        import torch
        inputs = self._processor(text=texts, return_tensors="pt")
        with torch.no_grad():
            out = self._model.owlv2.text_model(
                input_ids=inputs["input_ids"],
                attention_mask=inputs["attention_mask"], return_dict=True)
            text_embeds = self._model.owlv2.text_projection(out.pooler_output)
        return {"text_embeds": text_embeds.numpy()}

    def post_process_objectness_detection(self, image_outputs, **kw):
        return post_process_objectness(
            image_outputs["objectness_logits"], image_outputs["pred_boxes"],
            sqrt_num_patches=self.sqrt_num_patches, **kw)

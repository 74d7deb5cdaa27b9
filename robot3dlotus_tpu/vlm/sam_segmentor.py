"""SAM box-prompted segmentation wrapper
(reference vlm_models/sam_segmentor.py:12-88): shared image embeddings per
batch, best-of-3 mask per box. Lazy HF load; SAM_MODEL_PATH for local
checkouts."""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

MODEL_IDS = {
    "base": "facebook/sam-vit-base",
    "huge": "facebook/sam-vit-huge",
    "large": "facebook/sam-vit-huge",
}


def select_best_masks(scores, masks):
    """Best-of-3 mask selection (reference sam_segmentor.py:76-83): per box,
    keep the mask whose IoU score is highest.

    scores: (n, 3) float; masks: (n, 3, H, W).
    Returns (scores (n, 1), masks (n, 1, H, W))."""
    scores = np.asarray(scores)
    masks = np.asarray(masks)
    best = np.argmax(scores, axis=1)
    rows = np.arange(scores.shape[0])
    return scores[rows, best][:, None], masks[rows, best][:, None]


class SAMSegmentor:
    def __init__(self, model_id="huge", device="cpu"):
        self.model_name = os.environ.get(
            "SAM_MODEL_PATH", MODEL_IDS.get(model_id, model_id))
        self.device = device
        self._model = None
        self._processor = None

    def _load(self):
        if self._model is None:
            try:
                from transformers import SamModel, SamProcessor
                self._processor = SamProcessor.from_pretrained(self.model_name)
                self._model = SamModel.from_pretrained(self.model_name)
                self._model.eval()
            except Exception as e:
                raise RuntimeError(
                    f"SAM unavailable ({e}); set SAM_MODEL_PATH to a local "
                    "checkout for auto-grounding, or use the groundtruth "
                    "pipeline.") from e

    def __call__(self, images, boxes, points=None, keep_best_mask=True):
        """images: (B, H, W, 3) uint8; boxes: list per image of (n, 4) pixel
        boxes. Returns list of {'scores': (n, 1), 'masks': (n, 1, H, W)} or
        None when an image has no boxes."""
        self._load()
        import torch
        inputs = self._processor(list(images), return_tensors="pt")
        with torch.no_grad():
            image_embeddings = self._model.get_image_embeddings(
                inputs["pixel_values"])

        results = []
        for i in range(len(images)):
            if len(boxes[i]) == 0:
                results.append(None)
                continue
            i_inputs = self._processor(
                images[i], input_boxes=[list(map(list, boxes[i]))],
                return_tensors="pt")
            i_inputs.pop("pixel_values", None)
            i_inputs["image_embeddings"] = image_embeddings[i][None]
            with torch.no_grad():
                out = self._model(**i_inputs)
            masks = self._processor.image_processor.post_process_masks(
                out.pred_masks.cpu(), i_inputs["original_sizes"].cpu(),
                i_inputs["reshaped_input_sizes"].cpu())[0]
            scores = out.iou_scores.cpu()[0].numpy()  # (n, 3)
            masks = masks.numpy()
            if keep_best_mask:
                scores, masks = select_best_masks(scores, masks)
            results.append({"scores": scores,
                            "masks": masks.astype(bool)})
        return results

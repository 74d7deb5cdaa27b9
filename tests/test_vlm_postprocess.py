"""Golden tests for the VLM postprocess rewrites vs the ACTUAL reference
torch implementations (no model weights needed):

  * Gaussian soft-NMS (reference vlm_models/owlv2_detector.py:17-74)
  * OWLv2 objectness box postprocess (owlv2_detector.py:214-277)
  * SAM best-of-3 mask selection (sam_segmentor.py:76-83)

The reference functions run as-is from /root/reference (its module-level
imports only need transformers + the easydict shim, not checkpoints).
"""
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
import torch_ref_shims as shims

from robot3dlotus_tpu.vlm.owlv2_detector import (
    post_process_objectness, soft_nms,
)
from robot3dlotus_tpu.vlm.sam_segmentor import select_best_masks

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_owlv2():
    shims.install()  # easydict
    ref = "/root/reference"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    from genrobo3d.vlm_models import owlv2_detector as mod
    return mod


def _random_boxes(rng, n, scale=1.0):
    """(n, 4) corner boxes with positive extents."""
    xy = rng.rand(n, 2) * 0.6 * scale
    wh = (rng.rand(n, 2) * 0.35 + 0.02) * scale
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("sigma,thresh", [(0.5, 0.001), (0.2, 0.1)])
def test_soft_nms_matches_reference(ref_owlv2, seed, sigma, thresh):
    rng = np.random.RandomState(seed)
    boxes = _random_boxes(rng, 40, scale=960)
    scores = rng.rand(40).astype(np.float32)

    ref_keep = ref_owlv2.soft_nms_pytorch(
        torch.from_numpy(boxes.copy()), torch.from_numpy(scores.copy()),
        sigma=sigma, thresh=thresh).numpy()
    my_keep = soft_nms(boxes, scores, sigma=sigma, thresh=thresh)
    np.testing.assert_array_equal(np.asarray(my_keep, np.int64),
                                  np.asarray(ref_keep, np.int64))


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("kw", [
    dict(threshold=0.1, max_size_ratio=0.8, use_nms=False),
    dict(threshold=0.1, min_size_ratio=0.002, max_size_ratio=0.6,
         max_return_topk=20, use_nms=True, nms_sigma=0.2, nms_thresh=0.1,
         target_sizes=(256, 256)),
    # all-below-threshold -> min_return_topk fallback
    dict(threshold=0.999, min_return_topk=5, max_size_ratio=0.8),
])
def test_post_process_objectness_matches_reference(ref_owlv2, seed, kw):
    rng = np.random.RandomState(seed)
    B, P = 2, 144  # 12x12 patch grid stand-in
    sqrt_p = 12
    logits = rng.randn(B, P).astype(np.float32) * 2
    # cxcywh in [0, 1]
    cxy = rng.rand(B, P, 2) * 0.8 + 0.1
    wh = rng.rand(B, P, 2) * 0.4 + 0.01
    pred_boxes = np.concatenate([cxy, wh], -1).astype(np.float32)

    from easydict import EasyDict
    fake_self = types.SimpleNamespace(
        model=types.SimpleNamespace(sqrt_num_patches=sqrt_p))
    ref_out = ref_owlv2.Owlv2ObjectDetector.post_process_objectness_detection(
        fake_self,
        EasyDict(objectness_logits=torch.from_numpy(logits),
                 pred_boxes=torch.from_numpy(pred_boxes)),
        **kw)
    my_out = post_process_objectness(logits, pred_boxes,
                                     sqrt_num_patches=sqrt_p, **kw)

    assert len(ref_out) == len(my_out) == B
    for r, m in zip(ref_out, my_out):
        np.testing.assert_array_equal(
            np.asarray(m["patch_indexs"]), r["patch_indexs"].numpy())
        np.testing.assert_allclose(
            np.asarray(m["scores"]), r["scores"].numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(m["boxes"]), r["boxes"].numpy(), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(m["patch_coords"]), r["patch_coords"].numpy(),
            atol=1e-5)


def test_sam_best_of_three_matches_reference():
    """Reference keep_best_mask logic (sam_segmentor.py:76-83), run verbatim
    in torch, vs our numpy select_best_masks."""
    rng = np.random.RandomState(5)
    n, H, W = 7, 16, 16
    scores = rng.rand(n, 3).astype(np.float32)
    masks = rng.rand(n, 3, H, W) > 0.5

    i_scores = torch.from_numpy(scores.copy())
    i_masks = torch.from_numpy(masks.copy())
    best_mask_id = i_scores.argmax(dim=1)
    ref_scores = i_scores.gather(1, best_mask_id[:, None])
    idx = best_mask_id[:, None, None, None].expand(-1, -1, H, W)
    ref_masks = i_masks.gather(1, idx)

    my_scores, my_masks = select_best_masks(scores, masks)
    np.testing.assert_allclose(my_scores, ref_scores.numpy())
    np.testing.assert_array_equal(my_masks, ref_masks.numpy())

"""High-level API: build/init models, jitted predict & train functions.

Parity surface: mmdet.apis (init_detector / inference_detector / train_detector,
reference mmdet/apis/train.py:47-221, inference.py:16-96) re-expressed as pure
functions over explicit state.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kgdet_tpu.config import KGDetConfig
from kgdet_tpu.core.postprocess import decode_detections
from kgdet_tpu.models.detector import KGDetDetector
from kgdet_tpu.parallel.train import build_level_geometry


def build_model(cfg: KGDetConfig):
    dt = cfg.detector_type
    if dt in ('cascade_rcnn', 'htc'):
        from kgdet_tpu.models.two_stage import CascadeRCNN
        return CascadeRCNN(cfg, with_mask=dt == 'htc',
                           with_semantic=getattr(cfg, 'with_semantic',
                                                 False),
                           num_proposals_train=cfg.num_proposals_train,
                           num_proposals_test=cfg.num_proposals_test)
    if dt == 'rpn':
        from kgdet_tpu.models.two_stage import RPNDetector
        return RPNDetector(cfg,
                           num_proposals_train=cfg.num_proposals_train,
                           num_proposals_test=cfg.num_proposals_test)
    if dt in ('faster_rcnn', 'fast_rcnn', 'mask_rcnn', 'ms_rcnn',
              'double_head_rcnn', 'grid_rcnn'):
        from kgdet_tpu.models.two_stage import FasterRCNN
        return FasterRCNN(cfg,
                          with_mask=dt in ('mask_rcnn', 'ms_rcnn'),
                          with_maskiou=dt == 'ms_rcnn',
                          with_grid=dt == 'grid_rcnn',
                          external_proposals=dt == 'fast_rcnn',
                          num_proposals_train=cfg.num_proposals_train,
                          num_proposals_test=cfg.num_proposals_test)
    return KGDetDetector(cfg)


def init_variables(model, cfg: KGDetConfig, rng=None, canvas_hw=(64, 64)):
    if rng is None:
        rng = jax.random.PRNGKey(cfg.seed)
    x = jnp.zeros((1, canvas_hw[0], canvas_hw[1], 3), jnp.float32)
    # jit the init: eager op-by-op init is pathologically slow on small hosts
    variables = jax.jit(model.init)(rng, x)
    return dict(variables)


def make_predict_fn(model, cfg: KGDetConfig, canvas_hw):
    """Jitted (variables, batch) -> padded detections on device.

    batch needs: image (B, H, W, 3), img_hw (B, 2) resized extents,
    scale_factor (B,). Decode is resolved through the family registry.
    """
    from kgdet_tpu.eval_loop import make_predict_fns
    return make_predict_fns(model, cfg, [tuple(canvas_hw)])[
        tuple(canvas_hw)]


def make_forward_fn(model, cfg: KGDetConfig):
    """Raw jitted forward (for benchmarking / feature extraction)."""

    @jax.jit
    def forward(variables, images):
        return model.apply(variables, images)

    return forward


# --------------------------------------------------- single-image inference
class Detector:
    """Convenience single-image inference handle.

    Parity surface: init_detector / inference_detector
    (reference mmdet/apis/inference.py:16-96). Jit caches are keyed by canvas
    bucket, so repeated calls of any image size stay compiled.
    """

    def __init__(self, cfg: KGDetConfig, variables):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.variables = variables
        self._predict_fns = {}
        self._raw_predict_fns = {}

    def _predict_for(self, canvas):
        if canvas not in self._predict_fns:
            self._predict_fns[canvas] = make_predict_fn(
                self.model, self.cfg, canvas)
        return self._predict_fns[canvas]

    def __call__(self, img):
        """img: BGR uint8 (H, W, 3) array or image path.

        Returns (dets (N, 5) xyxy+score, labels (N,), kpts (N, K, 3)) in
        original image coordinates.
        """
        import cv2

        from kgdet_tpu.data.transforms import (
            imnormalize, imrescale, pad_to_canvas)

        if isinstance(img, str):
            img = cv2.imread(img)
            if img is None:
                raise FileNotFoundError(img)
        h, w = img.shape[:2]
        data = self.cfg.val_data
        resized, sf = imrescale(img, data.img_scale)
        rh, rw = resized.shape[:2]
        # smallest configured canvas that fits the resized image (min padded
        # area); /32-rounded fallback bucket when none fits
        fitting = [c for c in data.canvas_hw if c[0] >= rh and c[1] >= rw]
        if fitting:
            canvas = min(fitting, key=lambda c: c[0] * c[1])
        else:
            div = data.size_divisor
            canvas = (-(-rh // div) * div, -(-rw // div) * div)
        x = pad_to_canvas(imnormalize(resized).astype(np.float32), canvas)
        feed = {
            'image': jnp.asarray(x[None]),
            'img_hw': jnp.asarray([[rh, rw]], jnp.float32),
            'scale_factor': jnp.asarray([sf], jnp.float32),
        }
        dets = self._predict_for(tuple(canvas))(self.variables, feed)
        valid = np.asarray(dets['valid'][0])
        boxes = np.asarray(dets['det_bboxes'][0])[valid]
        labels = np.asarray(dets['det_labels'][0])[valid]
        kpts = np.asarray(dets['det_kpts'][0])[valid].reshape(
            -1, self.cfg.head.num_keypts, 3)
        return boxes, labels, kpts


    def _raw_predict_for(self, canvas):
        """Jitted pre-NMS decode for one canvas (TTA merge path)."""
        if canvas not in self._raw_predict_fns:
            from kgdet_tpu.core.postprocess import decode_raw
            grids = build_level_geometry(self.cfg, canvas)
            cfg = self.cfg

            @jax.jit
            def raw(variables, batch):
                from kgdet_tpu.ops.image import device_normalize
                outs = self.model.apply(variables, device_normalize(
                    batch['image'], batch['img_hw']))
                return decode_raw(outs, grids, batch['img_hw'],
                                  batch['scale_factor'], cfg.test,
                                  num_keypts=cfg.head.num_keypts)

            self._raw_predict_fns[canvas] = raw
        return self._raw_predict_fns[canvas]

    def aug_call(self, img, scales=None, flip=True, score_thr=None):
        """Multi-scale / flip test-time augmentation (boxes only).

        Reference merge order (reppoints_detector_kp.py:93-148): raw
        pre-NMS decoded boxes from every aug variant are mapped back to
        original coordinates, concatenated, and suppressed by ONE
        multiclass NMS; keypoints are dropped in aug mode.
        """
        import cv2

        from kgdet_tpu.data.transforms import (
            imnormalize, imrescale, pad_to_canvas)
        from kgdet_tpu.ops.nms import multiclass_nms_kp

        if isinstance(img, str):
            img = cv2.imread(img)
            if img is None:
                raise FileNotFoundError(img)
        data = self.cfg.val_data
        scales = [tuple(s) for s in (scales or [data.img_scale])]
        all_boxes, all_scores = [], []
        for scale in scales:
            for do_flip in ([False, True] if flip else [False]):
                resized, sf = imrescale(img, scale)
                rh, rw = resized.shape[:2]
                if do_flip:
                    resized = resized[:, ::-1]
                fitting = [c for c in data.canvas_hw
                           if c[0] >= rh and c[1] >= rw]
                if fitting:
                    canvas = min(fitting, key=lambda c: c[0] * c[1])
                else:
                    div = data.size_divisor
                    canvas = (-(-rh // div) * div, -(-rw // div) * div)
                x = pad_to_canvas(
                    imnormalize(np.ascontiguousarray(resized)).astype(
                        np.float32), canvas)
                feed = {
                    'image': jnp.asarray(x[None]),
                    'img_hw': jnp.asarray([[rh, rw]], jnp.float32),
                    'scale_factor': jnp.asarray([sf], jnp.float32),
                }
                bboxes, sc, _ = self._raw_predict_for(tuple(canvas))(
                    self.variables, feed)
                b = np.asarray(bboxes[0])
                if do_flip:
                    lim = (rw - 1) / sf
                    b = b.copy()
                    b[:, [0, 2]] = lim - b[:, [2, 0]]
                all_boxes.append(b)
                all_scores.append(np.asarray(sc[0]))
        boxes = np.concatenate(all_boxes, axis=0)
        scores = np.concatenate(all_scores, axis=0)
        t = self.cfg.test
        det_b, det_l, _, valid = multiclass_nms_kp(
            jnp.asarray(boxes), jnp.asarray(scores),
            jnp.zeros((len(boxes), 3), jnp.float32),
            score_thr if score_thr is not None else t.score_thr,
            t.nms_iou_thr, max_per_class=t.max_per_class,
            max_per_img=t.max_per_img)
        v = np.asarray(valid)
        return np.asarray(det_b)[v], np.asarray(det_l)[v]


def init_detector(config_path_or_cfg, checkpoint=None, pth=None) -> Detector:
    """Build a ready-to-call Detector from a config + checkpoint."""
    from kgdet_tpu.config import load_config

    cfg = config_path_or_cfg
    if isinstance(cfg, str):
        cfg = load_config(cfg)
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    if pth is not None:
        from kgdet_tpu.utils.torch_convert import (
            convert_pth, merge_into_variables)
        params, stats, _ = convert_pth(pth)
        variables = merge_into_variables(variables, params, stats)
    elif checkpoint is not None:
        from kgdet_tpu.utils.checkpoint import load_params
        restored = load_params(checkpoint)
        variables = {'params': restored.get('params', restored),
                     'batch_stats': restored.get('batch_stats', {})}
    return Detector(cfg, variables)


def inference_detector(detector: Detector, img):
    """Functional alias matching the reference API name."""
    return detector(img)

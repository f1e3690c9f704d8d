"""Dataset-level inference + COCO bbox/keypoint evaluation.

Replaces the reference's tools/test.py multi_gpu_test + filesystem rendezvous
(tools/test.py:38-100): inference runs in canvas-bucketed batches under jit,
results are deduped by image id (the grouped loader wrap-pads partial
batches), converted to COCO JSON, and scored by the pure-NumPy DeepFashion2
evaluator (294-sigma OKS).
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kgdet_tpu.config import KGDetConfig
from kgdet_tpu.core.postprocess import decode_detections
from kgdet_tpu.data.loader import DataLoader
from kgdet_tpu.eval.cocoeval import CocoEvaluator
from kgdet_tpu.eval.json_writer import dump_results
from kgdet_tpu.parallel.train import build_level_geometry


def make_predict_fns(model, cfg: KGDetConfig, canvases):
    """One jitted predict per canvas bucket (static shapes).

    Dispatch rides the head-family registry (models/families.py): two-stage
    detectors decode via their detector_type record, single-stage families
    via their HeadFamily.make_decode."""
    from kgdet_tpu.models.families import (
        get_head_family, is_two_stage, two_stage_decoder)
    fns = {}
    for canvas in canvases:
        if is_two_stage(cfg.detector_type):
            decode = two_stage_decoder(cfg.detector_type)

            def predict(variables, batch, decode=decode):
                from kgdet_tpu.ops.image import device_normalize
                kw = {}
                if 'proposals' in batch:    # Fast R-CNN external proposals
                    kw = dict(proposals=batch['proposals'],
                              proposals_valid=batch['proposals_valid'])
                image = device_normalize(batch['image'], batch['img_hw'])
                fwd = model.apply(variables, image,
                                  batch['img_hw'], train=False, **kw)
                return decode(
                    fwd, batch['img_hw'], batch['scale_factor'], cfg.test,
                    num_classes=cfg.head.num_classes)
        else:
            decode = get_head_family(cfg.head.type).make_decode(cfg, canvas)

            def predict(variables, batch, decode=decode):
                from kgdet_tpu.ops.image import device_normalize
                outs = model.apply(variables, device_normalize(
                    batch['image'], batch['img_hw']))
                return decode(outs, batch['img_hw'],
                              batch['scale_factor'])

        fns[tuple(canvas)] = jax.jit(predict)
    return fns


class TTAVariant:
    """Dataset view emitting one (img_scale, flip) test variant
    (reference custom.py prepare_test_img:316-381 builds these inline)."""

    def __init__(self, base, img_scale=None, flip=False):
        self.base = base
        self.img_scale = tuple(img_scale) if img_scale else None
        self.flip = flip
        self.flags = base.flags

    def __len__(self):
        return len(self.base)

    def prepare_test(self, idx):
        return self.base.prepare_test(idx, flip=self.flip,
                                      img_scale=self.img_scale)


def make_raw_predict_fns(model, cfg: KGDetConfig, canvases):
    """Per-canvas jitted pre-NMS decode (raw boxes/scores) for TTA."""
    from kgdet_tpu.core.postprocess import decode_raw
    fns = {}
    for canvas in canvases:
        grids = build_level_geometry(cfg, canvas)

        def predict(variables, batch, grids=grids):
            from kgdet_tpu.ops.image import device_normalize
            outs = model.apply(variables, device_normalize(
                batch['image'], batch['img_hw']))
            return decode_raw(outs, grids, batch['img_hw'],
                              batch['scale_factor'], cfg.test,
                              num_keypts=cfg.head.num_keypts)

        fns[tuple(canvas)] = jax.jit(predict)
    return fns


def run_inference_tta(model, variables, cfg: KGDetConfig, dataset,
                      scales=None, flip=True, batch_size=None,
                      verbose: bool = True):
    """Multi-scale/flip TTA over a dataset: each image's raw decoded boxes
    are merged across variants BEFORE one multiclass NMS — the reference's
    aug_test merge order (reppoints_detector_kp.py:93-148). Boxes only;
    keypoints are zeroed like the reference's aug path.
    """
    from functools import partial

    from kgdet_tpu.core.postprocess import nms_detections

    scales = [tuple(s) for s in scales] if scales \
        else [tuple(cfg.val_data.img_scale)]
    variants = [(s, f) for s in scales
                for f in ((False, True) if flip else (False,))]
    fns = make_raw_predict_fns(model, cfg, cfg.val_data.canvas_hw)
    per_img_boxes: Dict[int, list] = {}
    per_img_scores: Dict[int, list] = {}
    t0 = time.time()
    for scale, f in variants:
        view = TTAVariant(dataset, img_scale=scale, flip=f)
        loader = DataLoader(
            view, batch_size or max(cfg.val_data.batch_size, 1),
            train=False, num_workers=2, num_shards=jax.process_count(),
            shard_id=jax.process_index())
        seen = set()
        for batch in loader:
            canvas = tuple(batch['image'].shape[1:3])
            feed = {'image': jnp.asarray(batch['image']),
                    'img_hw': jnp.asarray(batch['img_hw']),
                    'scale_factor': jnp.asarray(batch['scale_factor'])}
            fn = fns.get(canvas)
            if fn is None:
                # TTA scale beyond the configured buckets: build the missing
                # canvas's decode lazily (api.Detector._predict_for pattern)
                fn = make_raw_predict_fns(model, cfg, [canvas])[canvas]
                fns[canvas] = fn
            bboxes, scores, _ = fn(variables, feed)
            bb = np.asarray(bboxes)
            sc = np.asarray(scores)
            for i, img_id in enumerate(batch['img_id'].tolist()):
                if img_id in seen:
                    continue
                seen.add(img_id)
                b = bb[i]
                if f:
                    # flip-back: x' = (w_resized - 1)/sf - x, swap x1/x2
                    # (bbox_mapping_back: flip in resized coords, /sf)
                    lim = (batch['img_hw'][i][1] - 1) / \
                        batch['scale_factor'][i]
                    b = b.copy()
                    b[:, [0, 2]] = lim - b[:, [2, 0]]
                per_img_boxes.setdefault(img_id, []).append(b)
                per_img_scores.setdefault(img_id, []).append(sc[i])
        if verbose:
            print(f'[tta] scale={scale} flip={f}: '
                  f'{len(seen)} imgs, {time.time() - t0:.1f}s', flush=True)

    nms_fn = jax.jit(partial(nms_detections, cfg=cfg.test))
    K3 = cfg.head.num_keypts * 3
    results: Dict[int, tuple] = {}
    for img_id, blist in per_img_boxes.items():
        boxes = jnp.asarray(np.concatenate(blist))[None]
        scores = jnp.asarray(np.concatenate(per_img_scores[img_id]))[None]
        kpts = jnp.zeros(boxes.shape[:2] + (K3,), boxes.dtype)
        dets = nms_fn(boxes, scores, kpts)
        v = np.asarray(dets['valid'][0])
        results[img_id] = (np.asarray(dets['det_bboxes'][0])[v],
                           np.asarray(dets['det_labels'][0])[v],
                           np.asarray(dets['det_kpts'][0])[v])
    return results


def run_inference(model, variables, cfg: KGDetConfig, loader: DataLoader,
                  verbose: bool = True):
    """Run the detector over a test loader; returns {img_id: detections}.

    Detections are (dets (N, 5), labels (N,), kpts (N, K*3)) numpy tuples in
    original-image coordinates, deduped by img_id.
    """
    predict_fns = make_predict_fns(
        model, cfg, cfg.val_data.canvas_hw)
    results: Dict[int, tuple] = {}
    t0 = time.time()
    n_done = 0
    for batch in loader:
        canvas = tuple(batch['image'].shape[1:3])
        if canvas not in predict_fns:
            raise KeyError(f'no predict fn for canvas {canvas}; '
                           f'have {list(predict_fns)}')
        feed = {
            'image': jnp.asarray(batch['image']),
            'img_hw': jnp.asarray(batch['img_hw']),
            'scale_factor': jnp.asarray(batch['scale_factor']),
        }
        if 'proposals' in batch:
            feed['proposals'] = jnp.asarray(batch['proposals'])
            feed['proposals_valid'] = jnp.asarray(
                batch['proposals_valid'])
        dets = predict_fns[canvas](variables, feed)
        det_bboxes = np.asarray(dets['det_bboxes'])
        det_labels = np.asarray(dets['det_labels'])
        det_kpts = np.asarray(dets['det_kpts'])
        det_masks = (np.asarray(dets['det_masks'])
                     if 'det_masks' in dets else None)
        mask_scores = (np.asarray(dets['det_mask_scores'])
                       if 'det_mask_scores' in dets else None)
        valid = np.asarray(dets['valid'])
        for i, img_id in enumerate(batch['img_id'].tolist()):
            if img_id in results:
                continue
            v = valid[i]
            entry = [det_bboxes[i][v], det_labels[i][v], det_kpts[i][v]]
            if det_masks is not None:
                entry.append(det_masks[i][v])
                if mask_scores is not None:
                    entry.append(mask_scores[i][v])
            results[img_id] = tuple(entry)
            n_done += 1
        if verbose:
            dt = time.time() - t0
            print(f'\r[eval] {n_done} imgs, {n_done / max(dt, 1e-6):.1f} '
                  f'img/s', end='', flush=True)
    if verbose:
        print()
    return results


def gather_results_across_processes(results: Dict[int, tuple]):
    """All-gather per-process result dicts onto every host.

    TPU-native replacement for the reference's pickle-file + NCCL-broadcast
    filesystem rendezvous (tools/test.py:56-100): results are pickled,
    padded to the global max length, and exchanged with
    multihost_utils.process_allgather over the ICI/DCN fabric.
    No-op for single-process runs.
    """
    if jax.process_count() == 1:
        return results
    import pickle

    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(results), dtype=np.uint8)
    n = np.asarray([blob.size], np.int64)
    sizes = multihost_utils.process_allgather(n)
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[:blob.size] = blob
    blobs = multihost_utils.process_allgather(padded)
    merged: Dict[int, tuple] = {}
    for i in range(jax.process_count()):
        size = int(sizes[i][0] if sizes.ndim > 1 else sizes[i])
        merged.update(pickle.loads(bytes(blobs[i][:size])))
    return merged


def evaluate_results(results: Dict[int, tuple], dataset,
                     out_prefix: Optional[str] = None,
                     iou_types=('bbox', 'keypoints'), verbose: bool = True):
    """results -> COCO JSON -> AP stats dict (parity: coco_utils.coco_eval)."""
    img_ids = sorted(results.keys())
    per_img = [results[i][:3] for i in img_ids]
    if out_prefix is None:
        out_prefix = '/tmp/kgdet_eval'
    os.makedirs(os.path.dirname(os.path.abspath(out_prefix)), exist_ok=True)
    files = dump_results(per_img, img_ids, dataset.cat_ids, out_prefix)

    if 'segm' in iou_types:
        files['segm'] = f'{out_prefix}.segm.json'
        _write_segm_json(results, img_ids, dataset, files['segm'])

    stats = {}
    for iou_type in iou_types:
        res_file = files[iou_type if iou_type in files else 'keypoints']
        dt = dataset.coco.load_results(res_file)
        ev = CocoEvaluator(dataset.coco, dt, iou_type)
        ev.params.img_ids = img_ids
        ev.evaluate()
        ev.accumulate()
        s = ev.summarize(verbose=verbose)
        stats[iou_type] = s
    return stats, files


def _write_segm_json(results, img_ids, dataset, path):
    """Paste per-detection mask probs to image size and RLE-encode.

    Parity: fcn_mask_head.get_seg_masks + segm2json (mask score = box
    score). Requires 4-tuple results carrying (N, S, S) mask probs.
    """
    import json

    from kgdet_tpu.models.mask_head import paste_masks
    from kgdet_tpu.native import RLE

    out = []
    for img_id in img_ids:
        entry = results[img_id]
        if len(entry) < 4:
            continue
        dets, labels, _, masks = entry[:4]
        # Mask Scoring R-CNN carries rescored mask scores as a 5th slot
        scores = entry[4] if len(entry) > 4 else dets[:, 4]
        info = dataset.coco.imgs[img_id]
        h, w = info['height'], info['width']
        full = paste_masks(dets, masks, h, w)
        for i in range(len(dets)):
            rle = RLE.encode(full[i])
            out.append({
                'image_id': int(img_id),
                'category_id': int(dataset.cat_ids[int(labels[i])]),
                'score': round(float(scores[i]), 4),
                'segmentation': {'size': [h, w],
                                 'counts': rle.to_string().decode()},
            })
    with open(path, 'w') as f:
        json.dump(out, f)


def run_eval(model, variables, cfg: KGDetConfig, dataset,
             batch_size: Optional[int] = None, out_prefix=None,
             num_workers: int = 2, verbose: bool = True,
             tta: bool = False, tta_scales=None, tta_flip: bool = True):
    """Full inference + evaluation pipeline; returns the AP stats dict.

    tta=True runs dataset-level multi-scale/flip test-time augmentation
    (merge raw boxes across variants, one NMS; boxes only).
    """
    if tta:
        results = run_inference_tta(
            model, variables, cfg, dataset, scales=tta_scales,
            flip=tta_flip, batch_size=batch_size, verbose=verbose)
        iou_types = ('bbox',)
    else:
        loader = DataLoader(
            dataset, batch_size or max(cfg.val_data.batch_size, 1),
            train=False, num_workers=num_workers,
            num_shards=jax.process_count(), shard_id=jax.process_index())
        results = run_inference(model, variables, cfg, loader,
                                verbose=verbose)
        iou_types = ('bbox', 'keypoints')
    results = gather_results_across_processes(results)
    return evaluate_results(results, dataset, out_prefix,
                            iou_types=iou_types, verbose=verbose)

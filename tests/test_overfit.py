"""Learning proof: the tiny KGDet cascade overfits fixed images to high AP.

Round-1 gap: train-side tests only asserted loss finiteness, so a
sign-flipped loss term or broken assigner would pass the suite. This test
trains for a few hundred steps on two fixed synthetic images and requires
the detector to actually localize the GT boxes (bbox AP@0.5 on the training
images), which fails under any broken loss/target/optimizer wiring.

(The full-size analog — demo-set overfit on TPU with recorded bbox/kpt AP —
is documented in docs/training_proof.md.)
"""
import numpy as np
import jax
import jax.numpy as jnp

from kgdet_tpu.api import build_model, init_variables, make_predict_fn
from kgdet_tpu.config import OptimConfig
from kgdet_tpu.core.postprocess import detections_to_per_class
from kgdet_tpu.eval.mean_ap import eval_map
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS, TINY_KPTS, tiny_cfg

H, W = TINY_CANVAS
K = TINY_KPTS
# (x1, y1, x2, y2, label): two well-separated garments per image
GT_SPEC = [[(10, 8, 44, 40, 3), (56, 30, 90, 60, 7)],
           [(16, 20, 52, 56, 3), (60, 6, 88, 30, 11)]]


def overfit_batch():
    rng = np.random.RandomState(7)
    B, G = 2, 4
    img = rng.randn(B, H, W, 3).astype(np.float32)
    boxes = np.zeros((B, G, 4), np.float32)
    labels = np.zeros((B, G), np.int32)
    mask = np.zeros((B, G), bool)
    kpts = np.zeros((B, G, K, 3), np.float32)
    for b, lst in enumerate(GT_SPEC):
        for g, (x1, y1, x2, y2, c) in enumerate(lst):
            boxes[b, g] = (x1, y1, x2, y2)
            labels[b, g] = c
            mask[b, g] = True
            kpts[b, g, :, 0] = np.linspace(x1 + 2, x2 - 2, K)
            kpts[b, g, :, 1] = np.linspace(y1 + 2, y2 - 2, K)[::-1]
            kpts[b, g, :, 2] = 1
    return {'image': img,
            'valid_hw': np.tile(np.asarray((H, W), np.int32), (B, 1)),
            'gt_bboxes': boxes, 'gt_labels': labels, 'gt_kpts': kpts,
            'gt_mask': mask}


def test_overfit_reaches_high_ap_and_kpt_accuracy():
    cfg = tiny_cfg().replace(optim=OptimConfig(
        type='adam', lr=2e-3, warmup_iters=10, lr_step_epochs=(1000,),
        total_epochs=1))
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=TINY_CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=10 ** 6)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, TINY_CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, overfit_batch())

    predict = make_predict_fn(model, cfg, TINY_CANVAS)
    feed = {'image': batch['image'],
            'img_hw': jnp.asarray([[H, W]] * 2, jnp.float32),
            'scale_factor': jnp.ones((2,), jnp.float32)}
    gt_b = [np.asarray(batch['gt_bboxes'][b])[np.asarray(batch['gt_mask'][b])]
            for b in range(2)]
    gt_l = [np.asarray(batch['gt_labels'][b])[np.asarray(batch['gt_mask'][b])]
            for b in range(2)]

    def evaluate(p):
        dets = predict({'params': p, 'batch_stats': stats}, feed)
        per = detections_to_per_class(dets, num_classes=13)
        m, _ = eval_map([r[0] for r in per], gt_b, gt_l, iou_thr=0.5)
        # keypoint accuracy of the best-scoring detection of image 0 GT 0:
        # mean |pred - gt| distance in pixels
        b0 = np.asarray(dets['det_bboxes'][0])
        v0 = np.asarray(dets['valid'][0])
        kerr = np.inf
        if v0.any():
            i = int(np.argmax(np.where(v0, b0[:, 4], -1)))
            kp = np.asarray(dets['det_kpts'][0][i]).reshape(K, 3)
            gt_kp = np.asarray(batch['gt_kpts'][0, 0])
            kerr = float(np.linalg.norm(
                kp[:, :2] - gt_kp[:, :2], axis=-1).mean())
        return m, kerr

    ap0, _ = evaluate(params)

    losses = []
    ap, kerr = 0.0, np.inf
    for i in range(300):
        params, opt_state, logs = step(params, stats, opt_state, batch)
        losses.append(float(logs['loss']))
        if i >= 149 and (i + 1) % 50 == 0:
            ap, kerr = evaluate(params)
            if ap >= 0.99 and kerr < 4.0:
                break

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.25, (losses[0], losses[-1])
    # the real assertion: training made the detector localize the GTs
    assert ap >= 0.5, f'train-set AP@0.5 {ap} (untrained {ap0})'
    assert ap > ap0 + 0.3
    # and place keypoints near their targets (box diag ~45px, so <4px is
    # genuinely learned, not box-center default)
    assert kerr < 4.0, f'mean keypoint error {kerr}px'

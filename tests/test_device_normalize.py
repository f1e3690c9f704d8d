"""uint8-shipped batches + on-device normalize == host-normalized float32."""
import numpy as np
import jax.numpy as jnp

from kgdet_tpu.data.transforms import imnormalize, pad_to_canvas
from kgdet_tpu.ops.image import device_normalize


def test_device_normalize_matches_host_path():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 53, 3), np.uint8)
    canvas = (48, 64)

    # host path: normalize (BGR->RGB, (x-mean)/std) then zero-pad
    host = pad_to_canvas(imnormalize(img), canvas)[None]

    # device path: zero-pad uint8, ship, normalize + margin re-zero in-graph
    dev_in = pad_to_canvas(img, canvas)[None]
    assert dev_in.dtype == np.uint8
    extents = jnp.asarray([[37, 53]], jnp.int32)
    dev = device_normalize(jnp.asarray(dev_in), extents)

    np.testing.assert_allclose(np.asarray(dev), host, atol=1e-5)


def test_device_normalize_passes_float_through():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 3),
                    jnp.float32)
    assert device_normalize(x, jnp.asarray([[8, 8]])) is x


def test_dataset_emits_uint8_when_device_normalize(tmp_path):
    from tests.test_data import make_synth_coco
    from kgdet_tpu.config import DataConfig
    from kgdet_tpu.data.dataset import DeepFashion2Dataset

    ann = make_synth_coco(str(tmp_path))
    base = dict(ann_file=ann, img_prefix=str(tmp_path), img_scale=(128, 96),
                max_gts=8, canvas_hw=((96, 128), (128, 96)))
    ds_u8 = DeepFashion2Dataset(
        DataConfig(device_normalize=True, **base), train=False)
    ds_f32 = DeepFashion2Dataset(
        DataConfig(device_normalize=False, **base), train=False)
    s_u8 = ds_u8.prepare_test(0)
    s_f32 = ds_f32.prepare_test(0)
    assert s_u8['image'].dtype == np.uint8
    assert s_f32['image'].dtype == np.float32
    got = device_normalize(jnp.asarray(s_u8['image'][None]),
                           jnp.asarray(s_u8['img_hw'][None]))
    np.testing.assert_allclose(np.asarray(got[0]), s_f32['image'],
                               atol=1e-5)

"""Native RLE maskops: round trips, area/bbox/iou/merge, string coding."""
import numpy as np
import pytest

from kgdet_tpu.native import RLE, mask_iou_matrix


def rand_mask(h, w, seed):
    rng = np.random.RandomState(seed)
    m = np.zeros((h, w), np.uint8)
    for _ in range(rng.randint(1, 4)):
        y, x = rng.randint(0, h - 5), rng.randint(0, w - 5)
        hh, ww = rng.randint(2, h - y), rng.randint(2, w - x)
        m[y:y + hh, x:x + ww] = 1
    return m


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_encode_decode_roundtrip(seed):
    m = rand_mask(23, 31, seed)
    rle = RLE.encode(m)
    np.testing.assert_array_equal(rle.decode(), m)


def test_area_and_bbox():
    m = np.zeros((20, 30), np.uint8)
    m[5:10, 7:19] = 1
    rle = RLE.encode(m)
    assert rle.area() == 5 * 12
    np.testing.assert_allclose(rle.to_bbox(), [7, 5, 12, 5])


def test_string_roundtrip():
    m = rand_mask(17, 13, 3)
    rle = RLE.encode(m)
    s = rle.to_string()
    rle2 = RLE.from_string(s, 17, 13)
    np.testing.assert_array_equal(rle2.counts, rle.counts)
    np.testing.assert_array_equal(rle2.decode(), m)


def test_merge_and_iou():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[0:5, 0:10] = 1   # area 50
    b[0:10, 0:5] = 1   # area 50, intersection 25
    ra, rb = RLE.encode(a), RLE.encode(b)
    union = ra.merge(rb)
    inter = ra.merge(rb, intersect=True)
    assert union.area() == 75
    assert inter.area() == 25
    assert ra.iou(rb) == pytest.approx(25 / 75)
    assert ra.iou(rb, iscrowd=True) == pytest.approx(25 / 50)
    np.testing.assert_array_equal(union.decode(), a | b)
    np.testing.assert_array_equal(inter.decode(), a & b)


def test_iou_matrix_matches_dense():
    dts = [RLE.encode(rand_mask(15, 15, s)) for s in range(3)]
    gts = [RLE.encode(rand_mask(15, 15, s + 10)) for s in range(2)]
    got = mask_iou_matrix(dts, gts)
    for i, d in enumerate(dts):
        dm = d.decode().astype(bool)
        for j, g in enumerate(gts):
            gm = g.decode().astype(bool)
            want = (dm & gm).sum() / max((dm | gm).sum(), 1)
            assert got[i, j] == pytest.approx(want)


def test_polygon_rasterization():
    # axis-aligned square polygon
    rle = RLE.from_poly([2, 2, 8, 2, 8, 8, 2, 8], 12, 12)
    m = rle.decode()
    # pixel centers strictly inside [2, 8) x [2, 8)
    assert m[3, 3] == 1 and m[7, 7] == 1
    assert m[0, 0] == 0 and m[9, 9] == 0
    assert 30 <= rle.area() <= 40   # ~36


def test_empty_and_full_masks():
    z = RLE.encode(np.zeros((8, 8), np.uint8))
    f = RLE.encode(np.ones((8, 8), np.uint8))
    assert z.area() == 0 and f.area() == 64
    np.testing.assert_allclose(z.to_bbox(), [0, 0, 0, 0])
    np.testing.assert_allclose(f.to_bbox(), [0, 0, 8, 8])
    assert z.iou(f) == 0.0


def test_frpoly_integer_rectangle_exact():
    """COCO frPoly on an integer rectangle fills exactly [x0,x1)x[y0,y1)."""
    rle = RLE.from_poly([1, 1, 4, 1, 4, 3, 1, 3], 5, 6)
    m = rle.decode()
    want = np.zeros((5, 6), np.uint8)
    want[1:3, 1:4] = 1
    np.testing.assert_array_equal(m, want)
    assert rle.area() == 6


def test_frpoly_fractional_triangle_properties():
    """Fractional-coordinate polygon: area close to analytic, valid RLE."""
    # triangle (0.5,0.5)-(9.5,0.5)-(0.5,9.5): analytic area 40.5
    rle = RLE.from_poly([0.5, 0.5, 9.5, 0.5, 0.5, 9.5], 10, 10)
    m = rle.decode()
    assert abs(int(rle.area()) - 40.5) <= 6
    # mask is upper-left triangular-ish: far corner empty
    assert m[9, 9] == 0
    # round-trip through encode stays identical
    again = RLE.encode(m)
    np.testing.assert_array_equal(again.counts, rle.counts)


def test_frpoly_out_of_canvas_clip():
    """Polygon extending past the canvas clips without error."""
    rle = RLE.from_poly([-2, -2, 7, -2, 7, 7, -2, 7], 4, 4)
    m = rle.decode()
    np.testing.assert_array_equal(m, np.ones((4, 4), np.uint8))


def test_frpoly_degenerate():
    assert RLE.from_poly([1, 1, 2, 2], 4, 4).area() == 0

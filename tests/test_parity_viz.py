"""Pixel-parity for the cv2 wireframe/tiling kit vs the reference
``lib/utils/vis_cv2_util.py`` (loaded directly — it only needs cv2/numpy/
PIL). Drawing vocabulary constants, the generic wireframe renderer, hand
wireframe variants, grid/coordinate helpers and mask blending must match
exactly; the caption banner is geometry-parity only (we draw text with
cv2 instead of a bundled .ttf)."""

import importlib.util
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.parity


@pytest.fixture(scope="module")
def ref_viz():
    spec = importlib.util.spec_from_file_location(
        "ref_vis_cv2_util", "/root/reference/lib/utils/vis_cv2_util.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_vis_cv2_util"] = mod
    spec.loader.exec_module(mod)
    yield mod
    sys.modules.pop("ref_vis_cv2_util", None)


def test_vocabulary_constants_match(ref_viz):
    from poem_v2_tpu.viztools import wireframe as wf

    np.testing.assert_array_equal(wf.EDGE_LIST_HAND, ref_viz.edge_list_hand)
    np.testing.assert_allclose(wf.VERT_COLOR_HAND, ref_viz.vert_color_hand)
    np.testing.assert_allclose(wf.EDGE_COLOR_HAND, ref_viz.edge_color_hand)
    assert wf.VERT_TYPE_HAND == ref_viz.vert_type_hand
    np.testing.assert_array_equal(wf.EDGE_LIST_HAND_KP, ref_viz.edge_list_hand_kp)
    np.testing.assert_allclose(
        wf.VERT_COLOR_MARKERSET_BODY, ref_viz.vert_color_markerset_body)
    np.testing.assert_allclose(
        wf.EDGE_COLOR_MARKERSET_BODY, ref_viz.edge_color_markerset_body)
    np.testing.assert_array_equal(
        wf.EDGE_LIST_MARKERSET_BODY, ref_viz.edge_list_markerset_body)
    np.testing.assert_allclose(
        wf.VERT_COLOR_MARKERSET_HAND, ref_viz.vert_color_markerset_hand)
    np.testing.assert_allclose(
        wf.EDGE_COLOR_MARKERSET_HAND, ref_viz.edge_color_markerset_hand)
    np.testing.assert_array_equal(
        wf.EDGE_LIST_MARKERSET_HAND, ref_viz.edge_list_markerset_hand)
    np.testing.assert_array_equal(wf.EDGE_LIST_BBOX, ref_viz.edge_list_bbox)


def _joints(seed=0, n=21, size=128, spread=0.9):
    rs = np.random.RandomState(seed)
    pts = rs.rand(n, 2) * size * spread + size * (1 - spread) / 2
    # push two joints out of frame to exercise the clip rules
    pts[3] = (-10.0, 40.0)
    pts[n - 4] = (size + 5.0, size + 5.0)
    return pts


@pytest.mark.parametrize("variant", ["hand", "hand_large", "hand_kp", "hand_kp_large"])
def test_hand_wireframe_pixel_parity(ref_viz, variant):
    from poem_v2_tpu.viztools import wireframe as wf

    pts = _joints()
    mask = np.ones(21, bool)
    mask[7] = False  # masked joint: its edges and marker must vanish
    ours = np.zeros((128, 128, 3), np.uint8)
    ref = np.zeros((128, 128, 3), np.uint8)
    getattr(wf, f"draw_wireframe_{variant}")(ours, pts, mask)
    getattr(ref_viz, f"draw_wireframe_{variant}")(ref, pts, mask)
    np.testing.assert_array_equal(ours, ref)


def test_markerset_wireframes_pixel_parity(ref_viz):
    from poem_v2_tpu.viztools import wireframe as wf

    body = _joints(seed=1, n=19)
    hand = _joints(seed=2, n=10)
    for ours_fn, ref_fn, pts in (
        (wf.draw_wireframe_markerset_body, ref_viz.draw_wireframe_markerset_body, body),
        (wf.draw_wireframe_markerset_hand, ref_viz.draw_wireframe_markerset_hand, hand),
    ):
        ours = np.zeros((128, 128, 3), np.uint8)
        ref = np.zeros((128, 128, 3), np.uint8)
        ours_fn(ours, pts, np.ones(len(pts), bool))
        ref_fn(ref, pts, np.ones(len(pts), bool))
        np.testing.assert_array_equal(ours, ref)


def test_grid_helpers_match(ref_viz):
    from poem_v2_tpu.viztools import wireframe as wf

    views = [np.full((32, 32, 3), i * 10, np.uint8) for i in range(8)]
    ours = wf.combine_view(views, ncol=4)
    ref = ref_viz.combine_view(views, ncol=4)
    np.testing.assert_array_equal(ours, ref)
    # default ncol = floor(sqrt(n)) with ragged final row padded
    ours_d = wf.combine_view(views[:4])
    ref_d = ref_viz.combine_view(views[:4])
    np.testing.assert_array_equal(ours_d, ref_d)

    shape = (32, 32)
    for pos in [(5, 7), (37, 60), (100, 95)]:
        assert (wf.get_combined_image_offset(pos, shape, 8, ncol=4)
                == ref_viz.get_combined_image_offset(pos, shape, 8, ncol=4))
        assert (wf.get_combined_image_pos(pos, shape)
                == ref_viz.get_combined_image_pos(pos, shape))
        assert (wf.get_combined_image_pos_fix_offset(pos, shape, 5, 8, ncol=4)
                == ref_viz.get_combined_image_pos_fix_offset(pos, shape, 5, 8, ncol=4))
        assert (wf.offset_combined_image_pos(pos, shape, 5, 8, ncol=4)
                == ref_viz.offset_combined_image_pos(pos, shape, 5, 8, ncol=4))
        assert wf.decaption_pos(pos) == ref_viz.decaption_pos(pos)


def test_blend_mask_parity(ref_viz):
    from poem_v2_tpu.viztools import wireframe as wf

    rs = np.random.RandomState(3)
    img = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = (rs.rand(64, 64) > 0.5).astype(np.float32)
    np.testing.assert_array_equal(
        wf.blend_mask(img, mask), ref_viz.blend_mask(img, mask))


def test_caption_banner_geometry(ref_viz):
    from poem_v2_tpu.viztools import wireframe as wf

    img = np.zeros((32, 64, 3), np.uint8)
    ours = wf.caption_combined_view(img, "view 0")
    assert ours.shape == (32 + wf.CAPTION_HEIGHT, 64, 3)
    # banner is white background with dark text, content region untouched
    assert ours[:5].min() == 255
    np.testing.assert_array_equal(ours[wf.CAPTION_HEIGHT:], img)

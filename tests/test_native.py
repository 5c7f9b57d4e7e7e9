"""Native C++ warp+normalize vs the cv2+numpy reference path."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from poem_v2_tpu.data.native_ops import get_lib, warp_affine_normalize
from poem_v2_tpu.data.transforms import affine_transform


@pytest.mark.skipif(get_lib() is None, reason="no native toolchain")
class TestNativeWarp:
    def test_matches_cv2(self):
        rs = np.random.RandomState(0)
        img = (rs.rand(200, 180, 3) * 255).astype(np.uint8)
        aff = affine_transform(np.array([90.0, 100.0]), 120.0, (128, 128), rot=0.35)

        got = warp_affine_normalize(img, aff[:2], (128, 128))
        want = cv2.warpAffine(
            img, aff[:2], (128, 128), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT
        ).astype(np.float32) / 255.0 - 0.5
        # identical bilinear math up to cv2's fixed-point quantisation
        assert np.abs(got - want).max() < 2e-2
        assert np.abs(got - want).mean() < 2e-3

    def test_color_jitter_and_threads(self):
        rs = np.random.RandomState(1)
        img = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
        aff = affine_transform(np.array([32.0, 32.0]), 64.0, (64, 64), rot=0.0)
        cj = np.array([1.2, 0.8, 1.0], dtype=np.float32)
        got = warp_affine_normalize(img, aff[:2], (64, 64), color_jitter=cj, n_threads=4)
        want = np.clip(img.astype(np.float32) * cj, 0, 255) / 255.0 - 0.5
        assert np.abs(got - want).max() < 2e-2

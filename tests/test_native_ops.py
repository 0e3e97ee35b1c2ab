"""Native C++ host ops: numeric parity with the PIL/NumPy reference paths."""

import numpy as np
import pytest

from veto_tpu import native
from veto_tpu.data.transforms import normalize_depth, normalize_image, pad_to

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for native host ops"
)


def _pil_resize(image, oh, ow):
    from PIL import Image

    chans = []
    for c in range(image.shape[2]):
        im = Image.fromarray(np.asarray(image[..., c], np.float32), mode="F")
        chans.append(np.asarray(im.resize((ow, oh), Image.BILINEAR)))
    return np.stack(chans, axis=-1).astype(np.float32)


@pytest.mark.parametrize("shape,target", [
    ((64, 48, 3), (128, 96)),    # upscale
    ((128, 96, 3), (37, 29)),    # downscale (antialias path)
    ((50, 50, 1), (75, 33)),     # mixed
])
def test_resize_matches_pil(rng, shape, target):
    img = rng.rand(*shape).astype(np.float32)
    oh, ow = target
    got = native.resize_bilinear(img, oh, ow)
    want = _pil_resize(img, oh, ow)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_normalize_bgr255_pad(rng):
    img = rng.rand(20, 30, 3).astype(np.float32)
    mean = (102.9801, 115.9465, 122.7717)
    std = (1.0, 1.0, 1.0)
    got = native.normalize_bgr255_pad(img, 32, 40, mean, std)
    want = pad_to(normalize_image(img, mean, std, True), 32, 40)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_standardize_pad(rng):
    d = (rng.rand(25, 35, 1) * 1000).astype(np.float32)
    got = native.standardize_pad(d, 32, 40)
    want = pad_to(normalize_depth(d), 32, 40)
    np.testing.assert_allclose(got, want, atol=1e-3)
    # padding zeros
    assert got[25:].sum() == 0 and got[:, 35:].sum() == 0
